"""Peptide-binding QA scores (native equivalent of
examples/paper_analyses/protpep_qa_scores.py, Fig 4c): score every
(receptor-description, peptide) pair with the ProCyon-Bind QA head and
write the prediction table prot_pep analysis consumes (the reference's
ace2_preds.pickle shape: per-pair yes-probabilities).

Synthetic smoke: python examples/paper_analyses/protpep_qa_scores.py \
    --synthetic true --out /tmp/pep_preds.json
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--synthetic", type=lambda s: s.lower() == "true",
                   default=False)
    p.add_argument("--model_dir", default=None)
    p.add_argument("--data_dir", default=os.environ.get("DATA_DIR"))
    p.add_argument("--n_peptides", type=int, default=32)
    p.add_argument("--receptor_text",
                   default="the angiotensin converting enzyme 2 receptor "
                           "ectodomain binding interface")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--out", default="pep_preds.json")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from procyon_tpu.data import collators as C
    from procyon_tpu.data import instruct
    from procyon_tpu.data.datasets import SyntheticStore
    from procyon_tpu.data.text_tokenizer import load_tokenizer
    from procyon_tpu.evaluate.qa import qa_yes_prob
    from procyon_tpu.models import llama, unified

    if args.synthetic:
        store = SyntheticStore(n_proteins=args.n_peptides, n_texts=64,
                               embed_dim=32, min_len=8, max_len=30)
        tokenizer = load_tokenizer(vocab_size=4096)
        cfg = unified.UnifiedConfig(
            llama=llama.tiny_config(vocab_size=4096, dim=64, n_layers=2,
                                    attn_backend=None
                                    if jax.default_backend() == "tpu"
                                    else "ref", remat=False),
            esm=None, protein_embed_dim=32, token_projector_layers=1,
            token_projector_hidden=32, retrieval_dim=16,
            dtype=jnp.float32)
        params = unified.init_params(jax.random.PRNGKey(0), cfg)
    else:
        from procyon_tpu.data.datasets import ProCyonDataStore

        from procyon_tpu.models.checkpoint_io import load_model

        params, cfg, tokenizer = load_model(args.model_dir)
        store = ProCyonDataStore(args.data_dir, aaseq_type="peptide")

    lib = instruct.TaskLibrary()
    task = lib.get("peptide_all_qa")
    prompt = instruct.get_prompt(task, num_examples=1,
                                 aaseq_type="peptide")

    from procyon_tpu.inference.prompts import _InlineStore

    qstore = _InlineStore(store, {10_000: args.receptor_text})
    ccfg = C.CollatorConfig(max_text_len=256,
                            protein_embed_dim=cfg.encoder_out_dim)
    coll = C.QACollator(ccfg, tokenizer, qstore, task)

    spec = tokenizer.spec
    preds = {}
    for s in range(0, args.n_peptides, args.batch_size):
        pep_ids = list(range(s, min(s + args.batch_size,
                                    args.n_peptides)))
        samples = [(a, 10_000, True) for a in pep_ids]
        batch = coll(samples, prompt)
        dev = {k: jnp.asarray(v) for k, v in batch.items()
               if k != "reference_indices"}
        out = unified.forward(params, cfg, dev)
        logits = np.asarray(out["logits"], np.float32)
        at = logits[np.arange(len(pep_ids)), batch["answer_pos"]]
        probs = qa_yes_prob(at, spec.yes_id, spec.no_id)
        for a, pr in zip(pep_ids, probs):
            preds[a] = float(pr)

    with open(args.out, "w") as f:
        json.dump({"receptor_text": args.receptor_text,
                   "yes_prob": preds}, f)
    print(json.dumps({"n_scored": len(preds), "out": args.out,
                      "mean_yes_prob": float(np.mean(list(
                          preds.values())))}))


if __name__ == "__main__":
    main()
