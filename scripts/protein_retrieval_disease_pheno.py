"""Single disease-phenotype retrieval CLI.

Equivalent of the reference's scripts/protein_retrieval_disease_pheno.py
(:14-85): task + disease description (inline or files) -> ranked proteins.

Synthetic smoke run:
  python scripts/protein_retrieval_disease_pheno.py --synthetic \
      --disease_desc "progressive muscle weakness with elevated CK" --k 5
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--task_desc_infile", type=str, default=None)
    p.add_argument("--disease_desc_infile", type=str, default=None)
    p.add_argument("--disease_desc", type=str, default=None)
    p.add_argument("--instruction_source_dataset", type=str,
                   default="disgenet", choices=["disgenet", "omim"])
    p.add_argument("--k", type=int, default=10)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from procyon_tpu.data import datasets
    from procyon_tpu.data.text_tokenizer import load_tokenizer
    from procyon_tpu.inference.retrieval_service import startup_retrieval
    from procyon_tpu.models import llama, unified

    desc = args.disease_desc
    if args.disease_desc_infile:
        with open(args.disease_desc_infile) as f:
            desc = f.read().strip()
    if not desc:
        raise SystemExit("provide --disease_desc or --disease_desc_infile")

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
        store = datasets.SyntheticStore(n_proteins=128, embed_dim=64)
        tokenizer = load_tokenizer(vocab_size=4096)
        ids = list(range(128))
    else:
        from procyon_tpu.models.checkpoint_io import load_model

        params, cfg, tokenizer = load_model(args.checkpoint)
        store = datasets.ProCyonDataStore()
        ids = list(range(int(os.environ.get("NUM_PROTEINS", "57000"))))

    service = startup_retrieval(params, cfg, tokenizer, store, ids)
    task_id = f"{args.instruction_source_dataset}_all_retrieval"
    results = service.retrieve(task_id=task_id, disease_desc=desc, k=args.k)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
