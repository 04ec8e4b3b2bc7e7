"""Retrieval-inference throughput — tracked workload #2 (BASELINE.md:
ProCyon-Split retrieval, examples/retrieval.ipynb path).

A retrieval query = one decoder forward over the prompt (the [PROT]-token
hidden state through the shared projector) + a dense score against the
cached all-protein target embedding bank (startup_retrieval semantics,
inference/retrieval_service.py). Queries are prefill-shaped, so the W8A8
s8xs8 MXU path applies (quant_mode="w8a8").

python scripts/bench_retrieval.py [--dim 4096 --layers 32 --batch 16
                                   --prompt_len 256 --n_targets 57000]
"""
import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _canary():
    """Chip-state probe fields for the JSON line (VERDICT r3 weak #4)."""
    from procyon_tpu.utils.timing import canary_fields

    return canary_fields()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dim", type=int, default=4096)
    p.add_argument("--layers", type=int, default=30)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--prompt_len", type=int, default=256)
    p.add_argument("--n_targets", type=int, default=57000,
                   help="cached target-embedding bank size (the reference "
                        "scores all ~57k proteins)")
    p.add_argument("--quant_mode", default="w8a8",
                   choices=("w8a8", "dequant"))
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from procyon_tpu.models import llama, unified
    from procyon_tpu.utils.timing import time_fn

    cfg = unified.UnifiedConfig(
        llama=llama.LlamaConfig(
            vocab_size=32000, dim=args.dim, n_layers=args.layers,
            n_heads=args.dim // 128, n_kv_heads=max(args.dim // 512, 1),
            intermediate=int(args.dim * 2.6875),
            max_seq_len=args.prompt_len, dtype=jnp.bfloat16,
            quant_mode=args.quant_mode),
        esm=None, protein_embed_dim=2560, token_projector_layers=3,
        token_projector_hidden=2560, retrieval_dim=1024,
        dtype=jnp.bfloat16)

    # int8 tree on device from eval_shape (throughput doesn't depend on
    # weight values; a 6B bf16 init would not fit next to activations)
    def build():
        p_ = dict(unified.init_params(jax.random.PRNGKey(0), cfg))
        p_["llama"] = llama.quantize_params(p_["llama"], cfg.llama)
        return p_

    shapes = jax.eval_shape(build)

    @jax.jit
    def materialize():
        return jax.tree_util.tree_map(
            lambda sd: jnp.full(sd.shape, 1, sd.dtype)
            if sd.dtype == jnp.int8 else jnp.full(sd.shape, 0.01, sd.dtype),
            shapes)

    params = materialize()
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(shapes["llama"]))

    B, L = args.batch, args.prompt_len
    rng = np.random.default_rng(0)
    soft_map = np.full((B, L), -1, np.int32)
    soft_map[:, 2] = 0
    batch = {
        "input_ids": jnp.asarray(rng.integers(4, 32000, (B, L)), jnp.int32),
        "seg_ids": jnp.ones((B, L), jnp.int32),
        "positions": jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32),
                                      (B, L)),
        "soft_map": jnp.asarray(soft_map),
        "protein_embeds": jnp.asarray(
            rng.standard_normal((1, 2560)), jnp.float32),
        "ret_pos": jnp.full((B,), L - 1, jnp.int32),
    }
    targets = jnp.asarray(
        rng.standard_normal((args.n_targets, 1024)) / 32, jnp.bfloat16)

    @jax.jit
    def retrieve(params, batch, targets):
        q = unified.retrieval_query_embedding(params, cfg, batch)  # [B, R]
        scores = q.astype(jnp.bfloat16) @ targets.T          # [B, N]
        # top-k ranks (do_retrieval contract, retrieval_service.py)
        top = jax.lax.top_k(scores.astype(jnp.float32), 10)
        return top

    t = time_fn(lambda: retrieve(params, batch, targets)[0])
    print(json.dumps({
        "metric": "retrieval_queries_per_sec_chip",
        "value": round(B / t, 2),
        "unit": f"queries/sec (L={L} prompt, ~{n_params/1e9:.1f}B decoder "
                f"{args.quant_mode}, {args.n_targets} cached targets, "
                f"top-10)",
        "per_batch_ms": round(t * 1e3, 2),
        **_canary(),
    }))


if __name__ == "__main__":
    main()
