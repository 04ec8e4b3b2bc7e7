"""Probe int4 dequant-matmul kernel impls at decode shapes (chained).

The int4 decode step runs ~2.9x above its weight-streaming bound (6.2B:
22 ms/step vs int8's 15.1 at HALF the bytes), so the fused kernel — not
bandwidth — is the limiter. Isolated single-matmul timings are unusable
over the tunnel (per-dispatch variance >> op time; measured 0-763 us for
the same op), so this probe chains DEPTH data-dependent matmuls over
DISTINCT stacked weights inside one jit — every weight must stream from
HBM exactly as in a real decode step — and reports per-matmul cost and
implied packed-bytes bandwidth. The int8 weight-only XLA path (the known
410 GB/s decode config) calibrates the harness.

Run on the real chip, sequentially with other benches.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import procyon_tpu  # noqa: F401  (compile cache + platform hooks)
import jax
import jax.numpy as jnp

from procyon_tpu.ops import quant
from procyon_tpu.ops.int4_matmul import qmatvec4
from procyon_tpu.utils.timing import time_fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=40,
                    help="x rows (caption: batch 4 x beam 10)")
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--depth", type=int, default=32,
                    help="chained matmuls (= layers' worth of streaming)")
    ap.add_argument("--group", type=int, default=128)
    ap.add_argument("--impls", default="affine,dq,xla4,int8")
    a = ap.parse_args()

    k = a.k
    rng = np.random.default_rng(0)
    # distinct square weights so the chain must stream DEPTH matrices
    w = jnp.asarray(rng.standard_normal((a.depth, k, k)) / np.sqrt(k),
                    jnp.float32)
    q4 = quant.quantize4(w, group=a.group)
    q8 = quant.quantize(w)
    x0 = jnp.asarray(rng.standard_normal((a.rows, k)), jnp.bfloat16)
    packed = k // 2 * k + 4 * q4["s"][0].size
    int8_bytes = k * k + 4 * q8["s"][0].size

    # weights enter as jit ARGUMENTS — captured arrays embed as HLO
    # constants and the remote compile request hits HTTP 413 (CLAUDE.md)
    def chain4(impl):
        def f(x, qp, qs):
            for i in range(a.depth):
                lay = {"p": qp[i], "s": qs[i]}
                if impl == "xla4":
                    x = (x @ quant.dequantize4(lay, x.dtype)).astype(
                        jnp.bfloat16)
                else:
                    x = qmatvec4(x, lay, impl=impl).astype(jnp.bfloat16)
            return x
        return f

    def chain8(x, qq, qs):
        for i in range(a.depth):
            x = quant.qmatmul(x, {"q": qq[i],
                                  "s": qs[i]}).astype(jnp.bfloat16)
        return x

    for impl in a.impls.split(","):
        bytes_per = int8_bytes if impl == "int8" else packed
        if impl == "int8":
            f, wargs = jax.jit(chain8), (q8["q"], q8["s"])
        else:
            f, wargs = jax.jit(chain4(impl)), (q4["p"], q4["s"])
        try:
            dt = time_fn(f, x0, *wargs)
        except Exception as e:  # noqa: BLE001 — report, keep probing
            print(f"{impl:7s} FAILED: {str(e)[:200]}")
            continue
        per = dt / a.depth
        print(f"{impl:7s} {dt*1e3:8.3f} ms/chain  {per*1e6:7.1f} us/matmul"
              f"  {bytes_per/per/1e9:6.0f} GB/s on streamed bytes",
              flush=True)


if __name__ == "__main__":
    main()
