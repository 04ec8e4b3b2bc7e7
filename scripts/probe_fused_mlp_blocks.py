"""Probe fused LN+int8-MLP block configs at ESM2-3B shape on the chip.

The 3B W8A8 embed is weight-streaming bound in the MLP: at the current
(block_m 128, block_n 1024) config the [d,H]+[H,d] int8 pair (52 MB) is
re-fetched 256x per layer (~13.4 GB/layer). Larger block_m halves that,
but Mosaic's 16 MB scoped-vmem stack rejects some configs (the observed
scoped cost tracks the [block_m, d] row buffers, not the formula).

This compiles + times ONE kernel call per config and prints ms and the
implied weight-streaming bandwidth, so the winner can be pinned in the
model heuristic. Run on the real chip, sequentially with other benches.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import procyon_tpu  # noqa: F401  (compile cache + platform hooks)
import jax
import jax.numpy as jnp

from procyon_tpu.ops.fused_mlp import fused_ln_mlp_int8
from procyon_tpu.utils.timing import time_fn


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=2560)
    ap.add_argument("--ffn", type=int, default=10240)
    ap.add_argument("--rows", type=int, default=32768)
    ap.add_argument("--configs", default="128x1024,256x256,256x512,512x256")
    ap.add_argument("--scoped_kib", type=int, default=0,
                    help="if >0, raise the Mosaic scoped-vmem limit via "
                         "per-compile XLA options (forwarded by the axon "
                         "terminal)")
    a = ap.parse_args()

    M, d, H = a.rows, a.dim, a.ffn
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, d)) * 0.5, jnp.bfloat16)
    ln_w = jnp.ones((d,), jnp.float32)
    ln_b = jnp.zeros((d,), jnp.float32)
    w1q = jnp.asarray(rng.integers(-127, 128, (d, H)), jnp.int8)
    s1 = jnp.full((1, H), 2e-4, jnp.float32)
    b1 = jnp.zeros((H,), jnp.float32)
    w2q = jnp.asarray(rng.integers(-127, 128, (H, d)), jnp.int8)
    s2 = jnp.full((1, d), 2e-4, jnp.float32)
    b2 = jnp.zeros((d,), jnp.float32)

    weight_bytes_once = 2 * d * H
    flops = 4 * M * d * H  # two int8 matmuls

    from procyon_tpu.ops.fused_mlp import fused_mlp_int8_prequant

    for spec in a.configs.split(","):
        prequant = spec.startswith("pq")
        bm, bn = (int(v) for v in spec.lstrip("pq").split("x"))

        # weights as jit ARGUMENTS (captured arrays embed as HLO
        # constants -> HTTP 413 on the remote compile; CLAUDE.md)
        def f(x, w1q, s1, b1, w2q, s2, b2, bm=bm, bn=bn,
              prequant=prequant):
            if prequant:
                return fused_mlp_int8_prequant(
                    x, ln_w, ln_b, w1q, s1, b1, w2q, s2, b2,
                    block_m=bm, block_n=bn, add_residual=True)
            return fused_ln_mlp_int8(
                x, ln_w, ln_b, w1q, s1, b1, w2q, s2, b2,
                block_m=bm, block_n=bn, add_residual=True,
                auto_blocks=False)

        opts = ({"xla_tpu_scoped_vmem_limit_kib": str(a.scoped_kib)}
                if a.scoped_kib else None)
        jf = jax.jit(f, compiler_options=opts)
        try:
            dt = time_fn(jf, x, w1q, s1, b1, w2q, s2, b2)
        except Exception as e:  # noqa: BLE001 — report and continue probing
            msg = str(e)
            i = msg.find("Scoped allocation")
            key = msg[i:i + 120] if i >= 0 else msg[:200]
            print(f"{bm}x{bn}: FAILED ({key})")
            continue
        n_m = M // bm
        stream_gb = n_m * weight_bytes_once / 1e9
        print(f"{bm}x{bn}: {dt*1e3:7.3f} ms  "
              f"{flops/dt/1e12:6.1f} TOP/s  "
              f"weight-stream {stream_gb:5.2f} GB -> "
              f"{stream_gb/dt:6.0f} GB/s equiv")


if __name__ == "__main__":
    main()
