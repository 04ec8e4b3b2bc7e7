"""Retrieval paper-analyses driver (native equivalent of
composition_retrieval.ipynb / protein_retrieval_multiple_sources.ipynb /
sting_retrieval.ipynb / fig5_function_retrieval.ipynb).

Modes:
  single_query   one curated description -> ranked protein table (Fig 2h /
                 Fig 5d: the STING / function-retrieval panels)
  multi_source   the same description issued through several instruction
                 datasets; per-dataset ranks + mean-rank aggregation
                 (Fig 2f)
  composition    the same query under different entity-description
                 compositions (description perturbations as the public
                 proxy — Fig 2e's composition sweep)

Synthetic smoke: python examples/paper_analyses/retrieval_analysis.py \
    --synthetic true --mode multi_source
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def build_service(args):
    import jax
    import jax.numpy as jnp

    from procyon_tpu.data.datasets import ProCyonDataStore, SyntheticStore
    from procyon_tpu.data.text_tokenizer import load_tokenizer
    from procyon_tpu.inference.retrieval_service import startup_retrieval
    from procyon_tpu.models import llama, unified

    if args.synthetic:
        store = SyntheticStore(n_proteins=96, n_texts=96, embed_dim=32)
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
        ids = list(range(store.n_proteins))
    else:
        from procyon_tpu.models.checkpoint_io import load_model

        params, cfg, tokenizer = load_model(args.model_dir)
        store = ProCyonDataStore(args.data_dir)
        ids = list(range(args.n_proteins))
    return startup_retrieval(params, cfg, tokenizer, store, ids,
                             cache_path=args.cache_path)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="single_query",
                   choices=("single_query", "multi_source", "composition"))
    p.add_argument("--synthetic", type=lambda s: s.lower() == "true",
                   default=False)
    p.add_argument("--model_dir", default=None)
    p.add_argument("--data_dir", default=os.environ.get("DATA_DIR"))
    p.add_argument("--n_proteins", type=int, default=57000)
    p.add_argument("--cache_path", default=None)
    p.add_argument("--description",
                   default="stimulator of interferon response, activates "
                           "innate immune signaling upon cytosolic DNA")
    p.add_argument("--datasets", nargs="+",
                   default=["go", "uniprot", "disgenet"])
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--n_variants", type=int, default=6)
    args = p.parse_args()

    service = build_service(args)

    if args.mode == "single_query":
        out = service.retrieve(
            task_id=f"{args.datasets[0]}_all_retrieval"
            if args.datasets[0] != "go" else "go_process_retrieval",
            disease_desc=args.description, k=args.k)
        print(json.dumps({"mode": "single_query", "ranked": out}))
        return

    if args.mode == "multi_source":
        # same query through several instruction datasets; aggregate by
        # mean rank (protein_retrieval_multiple_sources.ipynb)
        per_ds = {}
        rank_sum = {}
        for ds in args.datasets:
            tid = "go_process_retrieval" if ds == "go" \
                else f"{ds}_all_retrieval"
            ranked = service.retrieve(task_id=tid,
                                      disease_desc=args.description,
                                      k=len(service.protein_ids))
            per_ds[ds] = [r["protein_id"] for r in ranked[:args.k]]
            for rank, r in enumerate(ranked):
                rank_sum.setdefault(r["protein_id"], []).append(rank)
        agg = sorted(rank_sum.items(), key=lambda kv: np.mean(kv[1]))
        print(json.dumps({
            "mode": "multi_source",
            "per_dataset_top": per_ds,
            "aggregated_top": [int(p_) for p_, _ in agg[:args.k]],
        }))
        return

    # composition: rank stability across description variants
    from procyon_tpu.inference.prompts import perturb_description

    rng = np.random.default_rng(0)
    tops = []
    for i in range(args.n_variants):
        desc = args.description if i == 0 else perturb_description(
            args.description, rng, n_variants=1)[0]
        ranked = service.retrieve(task_id="go_process_retrieval",
                                  disease_desc=desc, k=args.k)
        tops.append([r["protein_id"] for r in ranked])
    base = set(tops[0])
    overlaps = [len(base & set(t)) / max(len(base), 1) for t in tops[1:]]
    print(json.dumps({
        "mode": "composition",
        "top_k_per_variant": tops,
        "overlap_with_canonical": overlaps,
        "mean_overlap": float(np.mean(overlaps)) if overlaps else 1.0,
    }))


if __name__ == "__main__":
    main()
