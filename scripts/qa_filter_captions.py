"""QA-based caption filtering CLI.

Equivalent of the reference's scripts/qa_filter_captions.py: score generated
captions with the model's QA yes-probability and keep those above threshold
(post-hoc hallucination filtering, scripts/README.md:44-49).

Synthetic smoke run:
  python scripts/caption_bulk.py --synthetic --n_proteins 4 \
      --max_new_tokens 8 --out /tmp/captions.csv
  python scripts/qa_filter_captions.py --synthetic \
      --captions /tmp/captions.csv --out /tmp/filtered.csv
"""

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--captions", type=str, required=True)
    p.add_argument("--task", type=str, default="uniprot_all_qa")
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--out", type=str, default="filtered_captions.csv")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from procyon_tpu.data import collators as C
    from procyon_tpu.data import datasets, instruct
    from procyon_tpu.data.text_tokenizer import load_tokenizer
    from procyon_tpu.evaluate.qa import qa_yes_prob
    from procyon_tpu.models import llama, unified

    if args.synthetic:
        cfg = unified.UnifiedConfig(
            llama=llama.LlamaConfig(vocab_size=4096, dim=128, n_layers=2,
                                    n_heads=4, n_kv_heads=2,
                                    intermediate=256, max_seq_len=512,
                                    dtype=jnp.float32,
                                    attn_backend=None if
                                    jax.default_backend() == "tpu"
                                    else "ref"),
            esm=None, protein_embed_dim=64, token_projector_layers=2,
            token_projector_hidden=64, retrieval_dim=32, dtype=jnp.float32)
        params = unified.init_params(jax.random.PRNGKey(0), cfg)
        store = datasets.SyntheticStore(n_proteins=64, embed_dim=64)
        tokenizer = load_tokenizer(vocab_size=4096)
    else:
        from procyon_tpu.models.checkpoint_io import load_model

        params, cfg, tokenizer = load_model(args.checkpoint)
        store = datasets.ProCyonDataStore()

    rows = []
    with open(args.captions) as f:
        for row in csv.DictReader(f):
            rows.append((int(row["protein_id"]), row["caption"]))

    lib = instruct.TaskLibrary()
    task = lib.get(args.task)
    prompt = instruct.get_prompt(task, num_examples=1)
    ccfg = C.CollatorConfig(protein_embed_dim=cfg.encoder_out_dim)

    class _CaptionStore:
        def __init__(self, base, captions):
            self.base = base
            self.captions = captions

        def protein_sequence(self, i):
            return self.base.protein_sequence(i)

        def protein_embedding(self, i):
            return self.base.protein_embedding(i)

        def text(self, i):
            return self.captions.get(i, self.base.text(i))

    cap_by_id = {10 ** 9 + n: cap for n, (_, cap) in enumerate(rows)}
    cstore = _CaptionStore(store, cap_by_id)
    coll = C.QACollator(ccfg, tokenizer, cstore, task)
    spec = tokenizer.spec

    out_rows = []
    for i in range(0, len(rows), args.batch_size):
        chunk = rows[i:i + args.batch_size]
        samples = [(pid, 10 ** 9 + i + n, True)
                   for n, (pid, _) in enumerate(chunk)]
        batch = coll(samples, prompt)
        dev = {k: jnp.asarray(v) for k, v in batch.items()
               if k != "reference_indices" and not np.isscalar(v)}
        out = unified.forward(params, cfg, dev)
        logits = np.asarray(out["logits"], np.float32)
        at = logits[np.arange(len(chunk)), batch["answer_pos"]]
        probs = qa_yes_prob(at, spec.yes_id, spec.no_id)
        for (pid, cap), prob in zip(chunk, probs):
            out_rows.append((pid, cap, float(prob)))

    kept = [(p, c, s) for p, c, s in out_rows if s >= args.threshold]
    with open(args.out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["protein_id", "caption", "qa_yes_prob"])
        for r in kept:
            w.writerow(r)
    print(f"kept {len(kept)}/{len(out_rows)} captions -> {args.out}")


if __name__ == "__main__":
    main()
