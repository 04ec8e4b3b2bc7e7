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
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# default kernel impl for the decode dispatch (quant.qmatmul4):
# "affine" = raw-byte-plane dots; "dq" = in-VMEM bf16 decode + two
# large-contraction dots. Overridable per process for probes.
DEFAULT_IMPL = os.environ.get("PROCYON_INT4_IMPL", "affine")


def _kernel(x_ref, p_ref, s_ref, o_ref, *, group, n_groups_lo, n_groups):
    B = x_ref.shape[0]
    n_blk = p_ref.shape[1]
    assert n_groups == 2 * n_groups_lo
    dt = x_ref.dtype

    def pair(g, acc):
        # AFFINE nibble decode (quant.quantize4): the signed byte is
        # exactly q_hi*16 + lub with lub = byte & 0xF = q_lo + 8, so
        # both nibble planes decode from dots of the raw byte planes:
        #   x_lo @ q_lo = x_lo @ lub - 8*rowsum(x_lo)
        #   x_hi @ q_hi = (x_hi @ byte - x_hi @ lub) / 16
        # Per byte only 3 VPU passes (one int8 mask, two float casts) —
        # Mosaic legalizes no int8 vector shift/sub, and the previous
        # shift-widened-to-int32 decode was VPU-bound at ~2x this cost.
        pr = p_ref[pl.ds(g * group, group), :]
        lub = (pr & jnp.int8(0x0F)).astype(dt)       # [group, n_blk]
        pf = pr.astype(dt)
        x_lo = x_ref[:, pl.ds(g * group, group)]
        x_hi = x_ref[:, pl.ds((g + n_groups_lo) * group, group)]
        d_lo_lu = jax.lax.dot_general(
            x_lo, lub, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # [B, n_blk]
        d_hi_lu = jax.lax.dot_general(
            x_hi, lub, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        d_hi_pf = jax.lax.dot_general(
            x_hi, pf, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        xs_lo = jnp.sum(x_lo.astype(jnp.float32), axis=1,
                        keepdims=True)               # [B, 1]
        s_lo = s_ref[pl.ds(g, 1), :]                 # [1, n_blk] f32
        s_hi = s_ref[pl.ds(g + n_groups_lo, 1), :]
        acc = acc + (d_lo_lu - 8.0 * xs_lo) * s_lo
        return acc + (d_hi_pf - d_hi_lu) * (s_hi * (1.0 / 16.0))

    acc = jnp.zeros((B, n_blk), jnp.float32)
    acc = jax.lax.fori_loop(0, n_groups_lo, pair, acc)
    o_ref[...] = acc.astype(o_ref.dtype)


def _kernel_dq(x_ref, p_ref, s_ref, o_ref, w_ref, *, group, n_groups_lo,
               n_groups):
    """Dequant-in-VMEM variant: decode the packed block group-by-group
    into a scaled bf16 weight scratch tile, then ONE large-contraction
    MXU dot — versus the affine kernel's 3 dots per 128-row group (48
    tiny contraction-128 dots at k=4096, measured pipeline-fill bound
    at ~55 GB/s effective). Every decode op is a 2D [group, n_blk]
    slice multiply (no 3D reshapes — those relayout). The nibble
    decode is EXACT in bf16: |byte| <= 127 and the /16 is a power of
    two, so only the group-scale multiply rounds — the same rounding
    as the XLA dequantize4 path."""
    del n_groups
    k2 = p_ref.shape[0]

    def dec(g, _):
        rows = pl.ds(g * group, group)
        pr = p_ref[rows, :]
        lub = (pr & jnp.int8(0x0F)).astype(jnp.bfloat16)  # q_lo+8, exact
        pf = pr.astype(jnp.bfloat16)                      # exact
        s_lo = s_ref[pl.ds(g, 1), :].astype(jnp.bfloat16)
        s_hi = s_ref[pl.ds(g + n_groups_lo, 1), :].astype(jnp.bfloat16)
        w_ref[rows, :] = (lub - jnp.bfloat16(8.0)) * s_lo
        w_ref[pl.ds(k2 + g * group, group), :] = \
            (pf - lub) * (s_hi * jnp.bfloat16(1.0 / 16.0))
        return 0

    jax.lax.fori_loop(0, n_groups_lo, dec, 0)
    acc = jax.lax.dot_general(
        x_ref[...], w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[...] = acc.astype(o_ref.dtype)


def qmatvec4(x, qw, *, interpret=False, impl=None):
    """x [..., k] @ split-half-packed int4 weights -> [..., n].

    qw: {"p": int8 [k/2, n], "s": f32 [G, 1, n]} (quant.quantize4).
    Intended for decode-shaped x (total rows <= ~256; the whole x block
    sits in VMEM across the n-grid). impl: "affine" = raw-byte-plane
    dots (3 small dots per group pair), "dq" = group-sliced decode into
    a scaled bf16 scratch tile + one large-contraction dot
    (_kernel_dq)."""
    impl = impl or DEFAULT_IMPL
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

    # the dq kernel's scratch weight tile is bf16 [k, n_blk] (plus the
    # packed block and per-group decode temporaries) — cap the block so
    # the scoped stack fits the 16 MB limit
    def fits(c):
        return impl != "dq" or k * c * 4 <= 12 * 1024 * 1024

    n_blk = next(c for c in (512, 256, 128)
                 if n % c == 0 and (fits(c) or c == 128))
    kfn = _kernel_dq if impl == "dq" else _kernel
    kernel = functools.partial(kfn, group=group,
                               n_groups_lo=k2 // group, n_groups=G)
    scratch = []
    if impl == "dq":
        from jax.experimental.pallas import tpu as pltpu
        scratch = [pltpu.VMEM((k, n_blk), jnp.bfloat16)]
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
        scratch_shapes=scratch,
        interpret=interpret,
    )(x2, p, s.reshape(G, n))
    return out[:B].reshape(*lead, n)
