"""Compute BERTScore rescaling-baseline constants (VERDICT r3 missing #3).

bert_score's rescale_with_baseline=True (the reference's setting,
procyon/evaluate/framework/caption.py:85-95) maps raw scores through
(s - b) / (1 - b), where b is the mean score of UNRELATED sentence pairs
under the (model, layer). bert_score ships en-sci constants averaged over
~1M random Common Crawl pairs; this container has no such corpus, so the
baseline is computed over random pairs from a user-supplied corpus (the
caption reference texts are the natural choice). Documented deviation:
rescaled scores are comparable across runs sharing a baseline file, and
differ from bert_score's shipped constants by the corpus-distribution
delta.

Usage:
  python scripts/compute_bertscore_baseline.py \
      --sentences refs.txt [--model_dir <scibert dir>] \
      [--layer 8] [--n_pairs 1000] --out baseline.json
  # then: run_eval_framework.py --use_bertscore \
  #           --bertscore_baseline_file baseline.json
Synthetic smoke (no files needed):
  python scripts/compute_bertscore_baseline.py --synthetic \
      --out /tmp/baseline.json
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sentences", type=str, default=None,
                   help="text file, one sentence per line (the corpus b is "
                        "computed over)")
    p.add_argument("--synthetic", action="store_true",
                   help="generated toy corpus + synthetic weights (smoke)")
    p.add_argument("--model_dir", type=str, default=None,
                   help="local HF BERT/SciBERT checkpoint dir; omitted = "
                        "synthetic weights")
    p.add_argument("--layer", type=int, default=None)
    p.add_argument("--idf", action="store_true")
    p.add_argument("--n_pairs", type=int, default=1000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default="bertscore_baseline.json")
    args = p.parse_args()

    from procyon_tpu.evaluate.bertscore import (DEFAULT_LAYER,
                                                compute_baseline,
                                                make_scorer)

    if args.sentences:
        with open(args.sentences) as f:
            sentences = [ln.strip() for ln in f if ln.strip()]
    elif args.synthetic:
        import numpy as np

        rng = np.random.default_rng(args.seed)
        words = ["protein", "binding", "membrane", "kinase", "phenotype",
                 "signal", "transport", "enzyme", "pathway", "receptor",
                 "domain", "complex", "nuclear", "growth", "response"]
        sentences = [" ".join(rng.choice(words, rng.integers(5, 12)))
                     for _ in range(64)]
    else:
        p.error("need --sentences or --synthetic")

    kw = {} if args.layer is None else {"layer": args.layer}
    scorer = make_scorer(args.model_dir, idf=args.idf, **kw)
    bp, br, bf = compute_baseline(scorer, sentences, n_pairs=args.n_pairs,
                                  seed=args.seed)
    record = {
        "precision": bp, "recall": br, "f1": bf,
        "layer": scorer.layer, "idf": bool(args.idf),
        "n_pairs": args.n_pairs, "n_sentences": len(sentences),
        "seed": args.seed,
        "model_dir": args.model_dir or "synthetic",
        "method": "random unrelated pairs from the supplied corpus "
                  "(bert_score baseline method; see module docstring for "
                  "the corpus deviation from the shipped en-sci file)",
    }
    with open(args.out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
