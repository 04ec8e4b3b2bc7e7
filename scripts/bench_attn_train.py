"""Micro-benchmark: training flash attention fwd / fwd+bwd on the real
chip (the VERDICT round-1 perf item: training kernel ~18 TFLOP/s, VPU
bound). Reports achieved TFLOP/s per phase.

python scripts/bench_attn_train.py [--batch 8 --seq 2048 --heads 32
                                    --kv_heads 32 --head_dim 128]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seq", type=int, default=2048)
    p.add_argument("--heads", type=int, default=32)
    p.add_argument("--kv_heads", type=int, default=32)
    p.add_argument("--head_dim", type=int, default=128)
    p.add_argument("--causal", default=True,
                   type=lambda s: s not in ("0", "false", "False"))
    p.add_argument("--backend", default="pallas")
    args = p.parse_args()

    from procyon_tpu.ops.flash_attention import flash_attention
    from procyon_tpu.utils.timing import time_fn

    B, S, H, Hkv, D = (args.batch, args.seq, args.heads, args.kv_heads,
                       args.head_dim)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.bfloat16)
    seg = jnp.ones((B, S), jnp.int32)

    flops_fwd = 4 * B * H * S * S * D * (0.5 if args.causal else 1.0)

    @jax.jit
    def fwd(q, k, v):
        return flash_attention(q, k, v, seg, seg, causal=args.causal,
                               backend=args.backend)

    @jax.jit
    def fwdbwd(q, k, v):
        def loss(q, k, v):
            return jnp.sum(flash_attention(
                q, k, v, seg, seg, causal=args.causal,
                backend=args.backend).astype(jnp.float32))
        dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        # one tensor output that depends on all three grads (keeps the
        # timing sync chain honest without a tuple return)
        return dq + dk.astype(dq.dtype).sum() + dv.astype(dq.dtype).sum()

    t = time_fn(lambda: fwd(q, k, v))
    print(f"fwd:     {t*1e3:8.3f} ms  {flops_fwd/t/1e12:7.2f} TFLOP/s",
          flush=True)
    t2 = time_fn(lambda: fwdbwd(q, k, v))
    # bwd recomputes scores twice (dq, dkv) + 4 extra matmuls: ~2.5x fwd
    print(f"fwd+bwd: {t2*1e3:8.3f} ms  {flops_fwd*3.5/t2/1e12:7.2f} "
          f"TFLOP/s (3.5x fwd flops)", flush=True)
    tb = t2 - t
    print(f"bwd-only: {tb*1e3:7.3f} ms  {flops_fwd*2.5/tb/1e12:7.2f} "
          f"TFLOP/s (2.5x fwd flops)", flush=True)


if __name__ == "__main__":
    main()
