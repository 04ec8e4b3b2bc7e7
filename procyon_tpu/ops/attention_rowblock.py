"""Single-pass row-block attention forward (TPU Pallas).

For bidirectional, moderate-length attention (ESM2: S <= ~2048) the online-
softmax flash forward pays VPU overhead (running max/sum rescaling) it does
not need: a whole score row fits in VMEM. This kernel computes, per q block,
the full [bq, Skv] score rows in VMEM, one softmax pass, one p@V matmul —
no score-matrix HBM round-trip (XLA's fused attention materializes it) and
no per-block rescale ops (the flash kernel's cost).

Layout: operates directly on [B, S, H, D] (the model's native activation
layout) with heads iterated inside the kernel — measured ~3 ms/layer of
transpose/relayout overhead around the [B, H, S, D] flash kernel inside a
scanned model disappears.

Used as flash_attention(backend="rowblock"): forward only; the backward
reuses the flash dq/dkv kernels via the shared custom_vjp (identical lse
definition).
"""

import functools
import importlib

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# ops/__init__ re-exports the flash_attention *function* over the submodule
# attribute; go through sys.modules for the real module.
fa = importlib.import_module("procyon_tpu.ops.flash_attention")


def _rowblock_kernel(q_ref, k_ref, v_ref, sq_ref, skv_ref, qp_ref, kp_ref,
                     o_ref, lse_ref, *, causal, sm_scale, n_heads, group):
    block_q = q_ref.shape[1]
    D = q_ref.shape[3]
    Skv = k_ref.shape[1]

    seg_q = sq_ref[0]                   # [bq, 128] lane-broadcast
    qpos = qp_ref[0]
    seg_k = skv_ref[0, :1, :]           # [1, Skv]
    kpos = kp_ref[0, :1, :]
    allowed = (seg_q[:, :1] == seg_k) & (seg_q[:, :1] > 0)
    if causal:
        allowed = allowed & (qpos[:, :1] >= kpos)

    for h in range(n_heads):
        q = q_ref[0, :, h, :]           # [bq, D]
        kb = k_ref[0, :, h // group, :]  # [Skv, D]
        vb = v_ref[0, :, h // group, :]
        s = jax.lax.dot_general(
            q, kb, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale                    # [bq, Skv]
        s = jnp.where(allowed, s, fa.DEFAULT_MASK_VALUE)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        row_masked = m <= fa.DEFAULT_MASK_VALUE * 0.5
        l_safe = jnp.where(row_masked | (l == 0.0), 1.0, l)
        out = jax.lax.dot_general(
            p.astype(vb.dtype), vb,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) / l_safe
        out = jnp.where(row_masked | (l == 0.0), 0.0, out)
        # store per-head into [B, H, Sq, D] (contiguous last-two-dims store;
        # a strided store into the BSHD middle dim is unsupported by Mosaic)
        o_ref[0, h, :, :] = out.astype(o_ref.dtype)
        lse = m + jnp.log(l_safe)
        lse = jnp.where(row_masked | (l == 0.0), fa.DEFAULT_MASK_VALUE, lse)
        lse_ref[0, h, :, :] = jnp.broadcast_to(lse, (block_q, fa.NUM_LANES))


def rowblock_fwd(q, k, v, seg_q, seg_kv, qpos, kpos, cfg):
    """Same contract as flash_attention._fwd (returns out, compact lse)."""
    causal, sm_scale, interpret, _ = cfg
    B, Sq, Hq, D = q.shape
    _, Skv, Hkv, _ = k.shape
    group = Hq // Hkv
    # block_q=128: with whole-KV residency, the lane-broadcast lse output
    # and double-buffered blocks, 256 exceeds the 16MB scoped-vmem limit at
    # ESM2-650M shapes.
    block_q = 128

    kernel = functools.partial(_rowblock_kernel, causal=causal,
                               sm_scale=sm_scale, n_heads=Hq, group=group)
    out, lse = pl.pallas_call(
        kernel,
        grid=(B, Sq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, Hq, D), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, Skv, Hkv, D), lambda b, i: (b, 0, 0, 0)),
            pl.BlockSpec((1, Skv, Hkv, D), lambda b, i: (b, 0, 0, 0)),
            pl.BlockSpec((1, block_q, fa.NUM_LANES), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, fa.NUM_SUBLANES, Skv), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, block_q, fa.NUM_LANES), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, fa.NUM_SUBLANES, Skv), lambda b, i: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, Hq, block_q, D), lambda b, i: (b, 0, i, 0)),
            pl.BlockSpec((1, Hq, block_q, fa.NUM_LANES),
                         lambda b, i: (b, 0, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Hq, Sq, D), q.dtype),
            jax.ShapeDtypeStruct((B, Hq, Sq, fa.NUM_LANES), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, fa._lane_bcast(seg_q), fa._sublane_bcast(seg_kv),
      fa._lane_bcast(qpos), fa._sublane_bcast(kpos))
    return out.transpose(0, 2, 1, 3), lse[..., 0]
