"""Protein retrieval demo — examples/retrieval.ipynb equivalent.

Load a model, build a retrieval prompt from a free-text phenotype
description, rank all proteins. Runs out of the box in synthetic mode:

    python examples/retrieval.py
    python examples/retrieval.py --checkpoint /path/to/model_dir \
        --desc "mitochondrial disease with lactic acidosis"
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--desc", default="progressive muscle weakness with "
                                     "elevated creatine kinase levels")
    p.add_argument("--source", default="disgenet",
                   choices=["disgenet", "omim"])
    p.add_argument("--k", type=int, default=10)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from procyon_tpu.data import datasets
    from procyon_tpu.data.text_tokenizer import load_tokenizer
    from procyon_tpu.inference.retrieval_service import startup_retrieval
    from procyon_tpu.models import llama, unified

    if args.checkpoint:
        from procyon_tpu.models.checkpoint_io import load_model

        params, cfg, tokenizer = load_model(args.checkpoint)
        store = datasets.ProCyonDataStore()
        ids = list(range(int(os.environ.get("NUM_PROTEINS", "57000"))))
    else:
        print("(no checkpoint given: synthetic demo model)")
        cfg = unified.UnifiedConfig(
            llama=llama.LlamaConfig(vocab_size=4096, dim=128, n_layers=2,
                                    n_heads=4, n_kv_heads=2,
                                    intermediate=256, max_seq_len=512,
                                    dtype=jnp.float32,
                                    attn_backend=None if
                                    jax.default_backend() == "tpu"
                                    else "ref"),
            esm=None, protein_embed_dim=64, token_projector_layers=2,
            token_projector_hidden=64, retrieval_dim=32,
            dtype=jnp.float32)
        params = unified.init_params(jax.random.PRNGKey(0), cfg)
        store = datasets.SyntheticStore(n_proteins=128, embed_dim=64)
        tokenizer = load_tokenizer(vocab_size=4096)
        ids = list(range(128))

    service = startup_retrieval(params, cfg, tokenizer, store, ids)
    results = service.retrieve(task_id=f"{args.source}_all_retrieval",
                               disease_desc=args.desc, k=args.k)
    print(f"\nquery: {args.desc!r}\n")
    print(f"{'rank':<6}{'protein':<12}{'score':<10}")
    for r in results:
        print(f"{r['rank']:<6}{r['protein_id']:<12}{r['score']:<10.4f}")


if __name__ == "__main__":
    main()
