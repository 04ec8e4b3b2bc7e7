"""Training-step throughput benchmark: supervised tokens/sec/chip on the
fusion model (QA LM + retrieval steps, AdamW updates, frozen-table protein
mode like ProCyon-Full).

python scripts/bench_train.py [--dim 1024 --layers 8 --batch 8 --seq 512]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dim", type=int, default=1024)
    p.add_argument("--layers", type=int, default=8)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seq", type=int, default=512)
    p.add_argument("--steps_small", type=int, default=4)
    p.add_argument("--steps_big", type=int, default=12)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from procyon_tpu.models import llama, unified
    from procyon_tpu.training import train_step as ts
    from procyon_tpu.training.optimizer import OptimizerConfig, build_optimizer

    cfg = unified.UnifiedConfig(
        llama=llama.LlamaConfig(
            vocab_size=32000, dim=args.dim, n_layers=args.layers,
            n_heads=args.dim // 128, n_kv_heads=max(args.dim // 256, 1),
            intermediate=int(args.dim * 2.6875), max_seq_len=args.seq,
            dtype=jnp.bfloat16),
        esm=None, protein_embed_dim=2560, token_projector_layers=3,
        token_projector_hidden=2560, retrieval_dim=1024,
        dtype=jnp.bfloat16)
    params = unified.init_params(jax.random.PRNGKey(0), cfg)
    n_params = sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(
        params))

    rng = np.random.default_rng(0)
    B, L, U = args.batch, args.seq, 8
    soft_map = np.full((B, L), -1, np.int32)
    soft_map[:, 2] = np.arange(B) % U
    labels = rng.integers(0, 32000, (B, L)).astype(np.int32)
    labels[:, : L // 2] = -100
    batch = {
        "input_ids": jnp.asarray(rng.integers(4, 32000, (B, L)), jnp.int32),
        "seg_ids": jnp.ones((B, L), jnp.int32),
        "positions": jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32),
                                      (B, L)),
        "soft_map": jnp.asarray(soft_map),
        "protein_embeds": jnp.asarray(
            rng.standard_normal((U, 2560)), jnp.float32),
        "labels": jnp.asarray(labels),
        "ret_pos": jnp.full((B,), L - 1, jnp.int32),
        "ret_target_pos": jnp.asarray((np.arange(B) % U).astype(np.int32)),
        "ret_valid": jnp.ones((B,), bool),
    }

    ocfg = OptimizerConfig(lr=1e-4, warmup_steps=10, total_steps=1000)
    optimizer = build_optimizer(ocfg, params)
    state = ts.init_train_state(params, optimizer)
    step = ts.make_train_step(cfg, optimizer, "qa", donate=True)

    def run(state, n):
        t0 = time.perf_counter()
        m = None
        for _ in range(n):
            state, m = step(state, batch)
        float(m["loss"])  # sync
        return time.perf_counter() - t0, state

    _, state = run(state, 2)  # compile + warm
    t_small, state = run(state, args.steps_small)
    t_big, state = run(state, args.steps_big)
    per_step = (t_big - t_small) / (args.steps_big - args.steps_small)
    tokens_per_step = args.batch * args.seq
    print(json.dumps({
        "metric": "train_tokens_per_sec_chip",
        "value": round(tokens_per_step / per_step, 1),
        "unit": f"tok/s (qa step, B{args.batch} S{args.seq}, "
                f"~{n_params/1e9:.1f}B params, bf16, AdamW)",
        "per_step_ms": round(per_step * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
