"""Probe: can a Pallas fused decode-MLP kernel beat the XLA chain at M=8?

Chains N_LAYERS distinct-weight MLP layers (rms_norm -> int8-dequant
gate/up -> SwiGLU -> int8-dequant down -> residual) and times per-layer
microseconds for (a) the production XLA route (ops/quant.qmatmul) and
(b) a Pallas kernel that streams all three weight matrices once per
layer with the norm, SwiGLU, and residual folded in. Single sub-ms jits
are unmeasurable over the tunnel (CLAUDE.md) — hence the chain.

XLA floor at dim 4096 / I 11008: 135 MB int8 weights -> 165 us/layer at
819 GB/s; the XLA route profiled 63+63+65 us (matmuls) + 25 us (norm).
"""
import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import procyon_tpu  # noqa: F401
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from procyon_tpu.ops import quant
from procyon_tpu.ops.norms import rms_norm
from procyon_tpu.utils.timing import time_fn


def _kernel(x_ref, nw_ref, wg_ref, sg_ref, wu_ref, su_ref, wd_ref,
            sd_ref, o_ref, xn_ref, acc_ref, *, nblocks, eps):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _prep():
        xf = x_ref[...].astype(jnp.float32)
        ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
        xn = xf * jax.lax.rsqrt(ms + eps) * nw_ref[...].astype(jnp.float32)
        xn_ref[...] = xn.astype(xn_ref.dtype)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xn = xn_ref[...]
    g = jax.lax.dot_general(
        xn, wg_ref[...].astype(xn.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * sg_ref[...]
    u = jax.lax.dot_general(
        xn, wu_ref[...].astype(xn.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * su_ref[...]
    a = (g * jax.nn.sigmoid(g) * u).astype(xn.dtype)
    acc_ref[...] += jax.lax.dot_general(
        a, wd_ref[...].astype(xn.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == nblocks - 1)
    def _emit():
        o_ref[...] = (x_ref[...].astype(jnp.float32)
                      + acc_ref[...] * sd_ref[...]).astype(o_ref.dtype)


def fused_decode_mlp(x, nw, wg, wu, wd, *, block_n=256, eps=1e-5,
                     sd_out=None, interpret=False):
    """x [M, d] bf16 + int8 leaves {q, s} -> x + mlp(rms_norm(x)).
    The down-projection's per-out-channel scale is applied outside (one
    [M, d] multiply) so the accumulator stays scale-free."""
    M, d = x.shape
    I = wg["q"].shape[1]
    nb = I // block_n
    assert nb * block_n == I
    out = pl.pallas_call(
        functools.partial(_kernel, nblocks=nb, eps=eps),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((M, d), lambda j: (0, 0)),
            pl.BlockSpec((1, d), lambda j: (0, 0)),
            pl.BlockSpec((d, block_n), lambda j: (0, j)),
            pl.BlockSpec((1, block_n), lambda j: (0, j)),
            pl.BlockSpec((d, block_n), lambda j: (0, j)),
            pl.BlockSpec((1, block_n), lambda j: (0, j)),
            pl.BlockSpec((block_n, d), lambda j: (j, 0)),
            pl.BlockSpec((1, d), lambda j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((M, d), lambda j: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((M, d), x.dtype),
            pltpu.VMEM((M, d), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((M, d), x.dtype),
        interpret=interpret,
    )(x, nw.reshape(1, d), wg["q"], wg["s"].astype(jnp.float32),
      wu["q"], wu["s"].astype(jnp.float32), wd["q"],
      wd["s"].astype(jnp.float32))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=4096)
    ap.add_argument("--inter", type=int, default=11008)
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--layers", type=int, default=80)
    ap.add_argument("--layers_small", type=int, default=16)
    ap.add_argument("--block_n", type=int, default=256)
    ap.add_argument("--interpret", action="store_true")
    a = ap.parse_args()
    d, I, L, M = a.dim, a.inter, a.layers, a.m

    def build():
        # synthesize int8 leaves directly on device (materializing f32
        # randoms at [L, d, I] would OOM; throughput is value-free)
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 3)
        mkq = lambda k, sh: jax.random.randint(k, sh, -127, 128, jnp.int8)
        sc = 1.0 / (127.0 * np.sqrt(d))
        layers = {
            "nw": jnp.ones((L, d), jnp.bfloat16),
            "wg": {"q": mkq(ks[0], (L, d, I)),
                   "s": jnp.full((L, 1, I), sc, jnp.float32)},
            "wu": {"q": mkq(ks[1], (L, d, I)),
                   "s": jnp.full((L, 1, I), sc, jnp.float32)},
            "wd": {"q": mkq(ks[2], (L, I, d)),
                   "s": jnp.full((L, 1, d), sc / 2, jnp.float32)},
        }
        return layers

    layers = jax.jit(build)()
    x0 = jnp.asarray(np.random.default_rng(0).standard_normal((M, d)),
                     jnp.bfloat16)

    @jax.jit
    def xla_chain(x, layers):
        def body(x, lp):
            h = rms_norm(x, lp["nw"], eps=1e-5)
            gate = jax.nn.silu(quant.qmatmul(h, lp["wg"]))
            up = quant.qmatmul(h, lp["wu"])
            return x + quant.qmatmul((gate * up).astype(x.dtype),
                                     lp["wd"]), None
        x, _ = jax.lax.scan(body, x, layers)
        return x

    @jax.jit
    def pallas_chain(x, layers):
        def body(x, lp):
            return fused_decode_mlp(
                x, lp["nw"], lp["wg"], lp["wu"], lp["wd"],
                block_n=a.block_n, interpret=a.interpret), None
        x, _ = jax.lax.scan(body, x, layers)
        return x

    Ls = a.layers_small
    small = jax.tree_util.tree_map(lambda v: v[:Ls], layers)

    def timed(fn):
        # double differencing: time_fn's iteration two-point cancels the
        # tunnel RTT per chain (CLAUDE.md timing rule), and differencing
        # the two chain LENGTHS then cancels per-dispatch fixed cost
        t_big = time_fn(fn, x0, layers)
        t_small = time_fn(fn, x0, small)
        return (t_big - t_small) / (L - Ls) * 1e6, fn(x0, layers)

    xla_us, xr = timed(xla_chain)
    pal_us, pr = timed(pallas_chain)
    err = float(jnp.max(jnp.abs(xr.astype(jnp.float32)
                                - pr.astype(jnp.float32))))
    ref = float(jnp.max(jnp.abs(xr.astype(jnp.float32))))
    floor = (2 * d * I + I * d) / 819e9 * 1e6
    print(f"xla:    {xla_us:8.1f} us/layer")
    print(f"pallas: {pal_us:8.1f} us/layer (block_n {a.block_n})")
    print(f"floor:  {floor:8.1f} us/layer (int8 weight streaming)")
    print(f"max abs diff {err:.4f} (ref max {ref:.2f})")


if __name__ == "__main__":
    main()
