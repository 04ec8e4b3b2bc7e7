"""Fused int4 dequant + matmul for weight-streaming decode (TPU Pallas).

The decode hot path is HBM-bandwidth bound: every step streams every
decoder weight once. Packed int4 halves the bytes of int8 — but only if
the packed form is what actually crosses HBM. The XLA path
(quant.dequantize4 + dot) materializes the dequantized bf16 weight in HBM
each step, QUADRUPLING traffic instead. This kernel reads the packed
[k/2, n] int8 nibbles into VMEM, unpacks each 128-row group in registers
(one mask+xor-sign-extend for the low slab, one arithmetic shift for the
high slab — split-half packing, quant.quantize4), applies the f32 group
scale post-dot, and accumulates [rows, n_block] in f32.

Reference surface: bitsandbytes NF4 QLoRA decode (procyon/model/
esm.py:444-449, pmc_llama.py:457-463); the kernel is the TPU-native
equivalent of its fused CUDA dequant-gemv.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(x_ref, p_ref, s_ref, o_ref, *, group, n_groups_lo, n_groups):
    B = x_ref.shape[0]
    n_blk = p_ref.shape[1]

    def partial_dot(g, acc, hi):
        # Mosaic legalizes int8 vector and/xor but NOT sub/shl/sar — the
        # low nibble's bias correction happens after the float cast
        # (values are in [0, 15], exact in bf16) and the high nibble's
        # arithmetic shift runs widened to int32
        dt = x_ref.dtype
        if hi:
            pr = p_ref[pl.ds((g - n_groups_lo) * group, group), :]
            qb = jax.lax.shift_right_arithmetic(
                pr.astype(jnp.int32), jnp.int32(4)).astype(dt)
        else:
            pr = p_ref[pl.ds(g * group, group), :]
            qb = ((pr & jnp.int8(0x0F)) ^ jnp.int8(8)).astype(dt) - \
                jnp.asarray(8.0, dt)
        xg = x_ref[:, pl.ds(g * group, group)]
        part = jax.lax.dot_general(
            xg, qb,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # [B, n_blk]
        return acc + part * s_ref[pl.ds(g, 1), :]    # f32 group scale

    acc = jnp.zeros((B, n_blk), jnp.float32)
    acc = jax.lax.fori_loop(
        0, n_groups_lo, lambda g, a: partial_dot(g, a, False), acc)
    acc = jax.lax.fori_loop(
        n_groups_lo, n_groups, lambda g, a: partial_dot(g, a, True), acc)
    o_ref[...] = acc.astype(o_ref.dtype)


def qmatvec4(x, qw, *, interpret=False):
    """x [..., k] @ split-half-packed int4 weights -> [..., n].

    qw: {"p": int8 [k/2, n], "s": f32 [G, 1, n]} (quant.quantize4).
    Intended for decode-shaped x (total rows <= ~256; the whole x block
    sits in VMEM across the n-grid)."""
    p, s = qw["p"], qw["s"]
    k2, n = p.shape
    k = 2 * k2
    G = s.shape[0]
    group = k // G
    assert x.shape[-1] == k, (x.shape, k)
    assert k2 % group == 0, (k, group)

    lead = x.shape[:-1]
    x2 = x.reshape(-1, k)
    B = x2.shape[0]
    Bp = -(-B // 8) * 8  # pad rows to the 8-sublane tile
    if Bp != B:
        x2 = jnp.pad(x2, ((0, Bp - B), (0, 0)))

    n_blk = next(c for c in (512, 256, 128) if n % c == 0)
    kernel = functools.partial(_kernel, group=group,
                               n_groups_lo=k2 // group, n_groups=G)
    out = pl.pallas_call(
        kernel,
        grid=(n // n_blk,),
        in_specs=[
            pl.BlockSpec((Bp, k), lambda j: (0, 0)),
            pl.BlockSpec((k2, n_blk), lambda j: (0, j)),
            pl.BlockSpec((G, n_blk), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((Bp, n_blk), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((Bp, n), x.dtype),
        interpret=interpret,
    )(x2, p, s.reshape(G, n))
    return out[:B].reshape(*lead, n)
