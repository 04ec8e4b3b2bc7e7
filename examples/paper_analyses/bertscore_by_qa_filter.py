"""Caption quality stratified by QA-filter score (native equivalent of
bertscore_by_qa_filter.ipynb, ED Fig 3): does the post-hoc QA filter
(scripts/qa_filter_captions.py yes-prob) predict caption quality
(BERTScore F1 vs references)?

Input CSV columns: entity_id, caption, qa_score, reference (repeated rows
for multi-reference). --synthetic fabricates a correlated fixture.
"""
import argparse
import csv
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--synthetic", type=lambda s: s.lower() == "true",
                   default=False)
    p.add_argument("--input", default=None)
    p.add_argument("--n_bins", type=int, default=4)
    p.add_argument("--bertscore_model_dir", default=None)
    args = p.parse_args()

    if args.synthetic:
        rng = np.random.default_rng(0)
        rows = []
        for i in range(24):
            q = float(rng.uniform())
            ref = f"protein {i} kinase phosphorylates serine substrate"
            # higher qa score -> caption closer to the reference
            cap = ref if q > 0.5 else f"unrelated text about membrane {i}"
            rows.append((i, cap, q, ref))
    else:
        rows = []
        with open(args.input, newline="") as f:
            for r in csv.DictReader(f):
                rows.append((r["entity_id"], r["caption"],
                             float(r["qa_score"]), r["reference"]))

    preds, refs, scores = {}, {}, {}
    for ent, cap, q, ref in rows:
        preds[ent] = cap
        scores[ent] = q
        refs.setdefault(ent, []).append(ref)

    from procyon_tpu.evaluate.bertscore import make_scorer

    scorer = make_scorer(args.bertscore_model_dir)
    ents = sorted(preds)
    res = scorer.score([preds[e] for e in ents],
                       [refs[e] for e in ents])
    f1 = {e: float(v) for e, v in zip(ents, res.f1)}

    qa = np.asarray([scores[e] for e in ents])
    edges = np.quantile(qa, np.linspace(0, 1, args.n_bins + 1))
    bins = []
    for b in range(args.n_bins):
        lo, hi = edges[b], edges[b + 1]
        mask = (qa >= lo) & ((qa < hi) if b < args.n_bins - 1
                             else (qa <= hi))
        sel = [f1[e] for e, m in zip(ents, mask) if m]
        bins.append({"qa_lo": float(lo), "qa_hi": float(hi),
                     "n": len(sel),
                     "bertscore_f1_mean": float(np.mean(sel))
                     if sel else float("nan")})
    corr = float(np.corrcoef(qa, [f1[e] for e in ents])[0, 1])
    print(json.dumps({"bins": bins, "pearson_qa_vs_f1": corr}))


if __name__ == "__main__":
    main()
