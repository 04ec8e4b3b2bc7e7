"""Probe: does an s8xs8 MXU dot beat XLA's fused-dequant bf16 dot at the
FLAGSHIP beam-decode row count (M = batch 8 x beam 10 = 80)?

Context: decode steps hard-force weight-only dequant
(models/llama.py::_block, "right for bandwidth-bound decode") — a design
choice validated at M=8 (probe_fused_decode.py) but never at M=80, and
the r5 caption attribution (profile_paged_beam.py) charges ~2.8 ms/step
to dequant-fused MLP work ON TOP of the near-floor matmul time. If the
inline s8->bf16 convert is the cost, `quant.qmatmul_w8a8` (s8 dot at 2x
MXU rate + f32 row/col rescale epilogue, no convert) could reclaim it —
at the price of dynamic per-row activation quantization error (covered
by the quality gates if wired).

Chains L distinct-weight decode-MLP layers (rms_norm -> gate/up ->
SwiGLU -> down -> residual) per probe_fused_decode.py's double-diff
timing and reports per-layer microseconds for both modes at --m rows.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import procyon_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from procyon_tpu.ops import quant
from procyon_tpu.ops.norms import rms_norm
from procyon_tpu.utils.timing import time_fn, canary_fields


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=4096)
    ap.add_argument("--inter", type=int, default=14336)  # llama3-8B MLP
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--layers_small", type=int, default=4)
    ap.add_argument("--m", type=int, default=80)
    a = ap.parse_args()
    d, I, L, M = a.dim, a.inter, a.layers, a.m

    def build():
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 3)
        mkq = lambda k, sh: jax.random.randint(k, sh, -127, 128, jnp.int8)
        sc = 1.0 / (127.0 * np.sqrt(d))
        return {
            "nw": jnp.ones((L, d), jnp.bfloat16),
            "wg": {"q": mkq(ks[0], (L, d, I)),
                   "s": jnp.full((L, 1, I), sc, jnp.float32)},
            "wu": {"q": mkq(ks[1], (L, d, I)),
                   "s": jnp.full((L, 1, I), sc, jnp.float32)},
            "wd": {"q": mkq(ks[2], (L, I, d)),
                   "s": jnp.full((L, 1, d), sc / 2, jnp.float32)},
        }

    layers = jax.jit(build)()
    x0 = jnp.asarray(np.random.default_rng(0).standard_normal((M, d)),
                     jnp.bfloat16)

    def chain(mode):
        @jax.jit
        def run(x, layers):
            def body(x, lp):
                h = rms_norm(x, lp["nw"], eps=1e-5)
                gate = jax.nn.silu(quant.mm(h, lp["wg"], mode))
                up = quant.mm(h, lp["wu"], mode)
                y = quant.mm((gate * up).astype(x.dtype), lp["wd"], mode)
                return x + y, None
            x, _ = jax.lax.scan(body, x, layers)
            return x
        return run

    Ls = a.layers_small
    small = jax.tree_util.tree_map(lambda v: v[:Ls], layers)

    def timed(fn):
        t_big = time_fn(fn, x0, layers)
        t_small = time_fn(fn, x0, small)
        return (t_big - t_small) / (L - Ls) * 1e6, fn(x0, layers)

    deq_us, dr = timed(chain("dequant"))
    w8_us, wr = timed(chain("w8a8"))
    err = float(jnp.max(jnp.abs(dr.astype(jnp.float32)
                                - wr.astype(jnp.float32))))
    ref = float(jnp.max(jnp.abs(dr.astype(jnp.float32))))
    floor = (2 * d * I + I * d) / 819e9 * 1e6
    print(f"M={M} dim={d} inter={I}")
    print(f"dequant: {deq_us:8.1f} us/layer")
    print(f"w8a8:    {w8_us:8.1f} us/layer ({deq_us / w8_us:.3f}x)")
    print(f"floor:   {floor:8.1f} us/layer (int8 weight streaming)")
    print(f"max abs diff {err:.4f} (ref max {ref:.2f}; activation-quant "
          "error expected)")
    print(canary_fields())


if __name__ == "__main__":
    main()
