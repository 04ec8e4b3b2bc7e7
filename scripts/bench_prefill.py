"""Prefill (teacher-forcing) throughput on an int8 Llama-class decoder:
weight-only ("dequant") vs s8xs8 MXU ("w8a8") matmul modes.

Covers STATUS's "Llama W8A8 prefill plumbed but not benched" gap; the
reference has no prefill-speed surface (HF forward), so the comparison
is against our own weight-only path.

python scripts/bench_prefill.py [--dim 4096 --layers 30 --batch 4 --seq 2048]
"""
import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dim", type=int, default=4096)
    p.add_argument("--layers", type=int, default=30)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--seq", type=int, default=2048)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from procyon_tpu.models import llama
    from procyon_tpu.ops import quant
    from procyon_tpu.utils.timing import time_fn

    cfg = llama.LlamaConfig(
        vocab_size=32000, dim=args.dim, n_layers=args.layers,
        n_heads=args.dim // 128, n_kv_heads=max(args.dim // 512, 1),
        intermediate=int(args.dim * 2.6875),
        max_seq_len=args.seq, dtype=jnp.bfloat16)

    # int8 tree on device from eval_shape (a 6B bf16 init would not fit
    # next to activations; throughput doesn't depend on weight values)
    shapes = jax.eval_shape(lambda: llama.init_params(
        jax.random.PRNGKey(0), cfg))

    def make_quantized(s):
        @jax.jit
        def mk():
            p = jax.tree_util.tree_map(
                lambda sh: jnp.zeros(sh.shape, sh.dtype), s)
            return llama.quantize_params(p, cfg, bits=8)
        return mk()

    qparams = make_quantized(shapes)
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(shapes))
    print(f"params: {n_params/1e9:.2f}B", flush=True)

    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(4, 32000, (args.batch, args.seq)),
                         jnp.int32)
    seg = jnp.ones((args.batch, args.seq), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(args.seq, dtype=jnp.int32),
                           (args.batch, args.seq))

    toks_per_call = args.batch * args.seq
    for mode in ("dequant", "w8a8"):
        c = dataclasses.replace(cfg, quant_mode=mode)

        @jax.jit
        def fwd(params, tokens, seg, pos, c=c):
            out = llama.forward(params, c, tokens=tokens,
                                seg_ids=seg, positions=pos)
            return jnp.sum(out["logits"][:, -1])

        t = time_fn(lambda: fwd(qparams, tokens, seg, pos))
        print(f"{mode:8s}: {t*1e3:8.2f} ms  "
              f"{toks_per_call/t:,.0f} prefill tok/s/chip", flush=True)


if __name__ == "__main__":
    main()
