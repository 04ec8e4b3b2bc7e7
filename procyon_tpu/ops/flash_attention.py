"""Blockwise (flash) attention for TPU in Pallas, forward + backward.

This is the single attention kernel shared by every model in the framework
(SURVEY.md §2.3 item 1): it replaces the reference's flash-attn v1 CUDA path
(reference: procyon/model/pmc_llama.py:250-255, `flash_attn_func`) and the
eager HF/fair-esm attention inside ESM2 (reference: procyon/model/esm.py).

Capabilities:
  * causal (Llama decode/train) and bidirectional (ESM2) masking
  * grouped-query attention (Llama-3-8B: 32 q heads over 8 kv heads)
  * segment ids for padding / packed batches (replaces attention_mask and the
    left-padded-generation masks of model_unified.py:1276-1291)
  * position-based causal masking (q_positions/kv_positions) so KV-cache
    prefill+decode and left-padded prompts share one kernel
  * online-softmax forward with f32 accumulators; flash backward (dq and dkv
    kernels) recomputing probabilities from the saved logsumexp

Layout: q [B, Sq, Hq, D]; k, v [B, Skv, Hkv, D]; Hq % Hkv == 0.
Segment ids are int32 [B, S]; id 0 means padding. Position (i, j) may attend
iff seg_q[i] == seg_kv[j] != 0 (and pos_q[i] >= pos_kv[j] when causal).
Fully-masked query rows produce zeros.

TPU layout notes (Mosaic requires the last two block dims to be divisible by
(8, 128) or equal the array dims): segment ids / positions enter the kernels
broadcast to [B, S, 128] (q side, lanes) / [B, 8, S] (kv side, sublanes); the
logsumexp is emitted lane-broadcast [B, H, Sq, 128] and immediately sliced
back to a compact [B, H, Sq] residual so training does not hold 128x-inflated
per-layer residuals in HBM.

On non-TPU backends the public entry point falls back to `mha_reference`
(identical semantics) so the full model runs on the 8-device CPU test mesh.
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

DEFAULT_MASK_VALUE = -1e30
NUM_LANES = 128
NUM_SUBLANES = 8
BLOCK = 128  # q and kv block size; sequence dims are padded to multiples


def _cdiv(a, b):
    return -(-a // b)


# ---------------------------------------------------------------------------
# Reference implementation (used on CPU and in kernel unit tests)
# ---------------------------------------------------------------------------


def mha_reference(q, k, v, seg_q=None, seg_kv=None, *, causal=False,
                  sm_scale=None, q_positions=None, kv_positions=None):
    """O(S^2)-memory reference attention with identical masking semantics."""
    B, Sq, Hq, D = q.shape
    _, Skv, Hkv, _ = k.shape
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(D)
    group = Hq // Hkv
    kf = jnp.repeat(k, group, axis=2) if group > 1 else k
    vf = jnp.repeat(v, group, axis=2) if group > 1 else v
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                   kf.astype(jnp.float32)) * sm_scale
    allowed = jnp.ones((B, 1, Sq, Skv), dtype=bool)
    if seg_q is not None:
        allowed = (seg_q[:, None, :, None] == seg_kv[:, None, None, :]) & (
            seg_q[:, None, :, None] > 0
        )
    if causal:
        if q_positions is None:
            q_positions = jnp.broadcast_to(jnp.arange(Sq), (B, Sq))
        if kv_positions is None:
            kv_positions = jnp.broadcast_to(jnp.arange(Skv), (B, Skv))
        allowed = allowed & (
            q_positions[:, None, :, None] >= kv_positions[:, None, None, :])
    s = jnp.where(allowed, s, DEFAULT_MASK_VALUE)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = jnp.where(allowed, p, 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    l_safe = jnp.where(l == 0.0, 1.0, l)
    out = jnp.einsum("bhqk,bkhd->bqhd", p / l_safe, vf.astype(jnp.float32))
    row_valid = jnp.any(allowed, axis=-1)  # [B,1|H,Sq]
    row_valid = jnp.broadcast_to(row_valid, (B, Hq, Sq))
    out = jnp.where(row_valid.transpose(0, 2, 1)[..., None], out, 0.0)
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# Shared mask helper (runs inside kernels)
# ---------------------------------------------------------------------------


def _block_mask(seg_q_tile, seg_k_row, qpos_tile, kpos_row, causal):
    """seg_q_tile/qpos_tile [bq, 128] lane-broadcast; *_row [1, bk]."""
    allowed = (seg_q_tile == seg_k_row) & (seg_q_tile > 0)
    if causal:
        allowed = allowed & (qpos_tile >= kpos_row)
    return allowed


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, sq_ref, skv_ref, qp_ref, kp_ref,
                o_ref, lse_ref=None, *, causal, sm_scale, num_kv_blocks,
                bounded):
    iq = pl.program_id(2)
    block_q = q_ref.shape[2]
    block_k = BLOCK
    D = q_ref.shape[3]

    q = q_ref[0, 0]  # [bq, D] native dtype: keep MXU on the bf16 path
    seg_q = sq_ref[0]     # [bq, 128]
    qpos = qp_ref[0]      # [bq, 128]

    if causal and bounded:
        hi = _cdiv((iq + 1) * block_q, block_k)
    else:
        hi = num_kv_blocks

    def body(j, carry):
        acc, m_i, l_i = carry
        kb = k_ref[0, 0, pl.ds(j * block_k, block_k), :]  # [bk, D]
        vb = v_ref[0, 0, pl.ds(j * block_k, block_k), :]
        seg_k = skv_ref[0, :1, pl.ds(j * block_k, block_k)]  # [1, bk]
        kpos = kp_ref[0, :1, pl.ds(j * block_k, block_k)]
        s = jax.lax.dot_general(
            q, kb, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale  # [bq, bk] f32 accumulate, scale post-dot
        allowed = _block_mask(seg_q, seg_k, qpos, kpos, causal)
        s = jnp.where(allowed, s, DEFAULT_MASK_VALUE)
        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_i - m_new)
        # exp(DEFAULT_MASK_VALUE - m_new) underflows to 0 for any row with at
        # least one valid key so far; fully-masked rows (m_new still at the
        # mask value) are zeroed at the end via the m-based check.
        p = jnp.exp(s - m_new)
        l_new = alpha * l_i + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(vb.dtype), vb,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((block_q, D), jnp.float32)
    m0 = jnp.full((block_q, 1), DEFAULT_MASK_VALUE, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, m_i, l_i = jax.lax.fori_loop(0, hi, body, (acc0, m0, l0))

    row_masked = m_i <= DEFAULT_MASK_VALUE * 0.5
    l_safe = jnp.where(row_masked | (l_i == 0.0), 1.0, l_i)
    out = acc / l_safe
    out = jnp.where(row_masked | (l_i == 0.0), 0.0, out)
    o_ref[0, 0] = out.astype(o_ref.dtype)
    lse = m_i + jnp.log(l_safe)
    lse = jnp.where(row_masked | (l_i == 0.0), DEFAULT_MASK_VALUE,
                    lse)  # [bq, 1]
    lse_ref[0, 0] = jnp.broadcast_to(lse, (block_q, NUM_LANES))


def _lane_bcast(x):
    """[B,S] -> [B,S,128]."""
    return jnp.broadcast_to(x[:, :, None], (*x.shape, NUM_LANES))


def _sublane_bcast(x):
    """[B,S] -> [B,8,S]."""
    return jnp.broadcast_to(x[:, None, :], (x.shape[0], NUM_SUBLANES,
                                            x.shape[1]))


def _q_specs(block_q):
    """BlockSpecs for [B,Sq,128] lane-broadcast q-side int arrays."""
    return pl.BlockSpec((1, block_q, NUM_LANES), lambda b, h, i: (b, i, 0))


def _kv_specs(Skv):
    return pl.BlockSpec((1, NUM_SUBLANES, Skv), lambda b, h, i: (b, 0, 0))


def _rope_perm(H, D):
    """Flat lane permutation for the rotate_half convention (per head:
    j -> (j + D/2) % D); an involution. Matches rotary.flat_rotary_tables."""
    j = np.arange(H * D)
    return (j // D) * D + ((j % D) + D // 2) % D


def _apply_rope_4d(x, cos, sin_signed):
    """Apply flat rotary to x [B,S,H,D] using [>=S, H*D] sign-folded tables
    (ops/rotary.flat_rotary_tables). Inverse rotation: negate sin_signed."""
    B, S, H, D = x.shape
    xf = x.reshape(B, S, H * D)
    perm = _rope_perm(H, D)
    c = cos[:S].astype(x.dtype)[None]
    sn = sin_signed[:S].astype(x.dtype)[None]
    return (xf * c + xf[..., perm] * sn).reshape(B, S, H, D)


def _fwd(q, k, v, seg_q, seg_kv, qpos, kpos, cfg, want_lse=True, rope=None):
    """want_lse=False (inference) skips the lane-broadcast logsumexp output
    — at ESM2-650M shapes that output is ~670MB written + re-read per
    layer, needed only by the backward kernels.

    rope: optional (cos_q, sin_q, cos_k, sin_k) flat tables — fused into
    the packed kernel (lane rolls) when that path is taken, else applied
    outside before the kernel."""
    causal, sm_scale, interpret, bounded = cfg[:4]
    if len(cfg) > 4 and cfg[4] == "rowblock":
        from procyon_tpu.ops.attention_rowblock import (rowblock_fwd,
                                                        rowblock_packed_fwd)

        B, Sq, Hq, D = q.shape
        Hkv = k.shape[2]
        if (not want_lse and Hq == Hkv and (Hq * D) % 128 == 0
                and 128 % D == 0):
            return rowblock_packed_fwd(q, k, v, seg_q, seg_kv, qpos, kpos,
                                       cfg[:4], rope=rope)
        if rope is not None:
            q = _apply_rope_4d(q, rope[0], rope[1])
            k = _apply_rope_4d(k, rope[2], rope[3])
        return rowblock_fwd(q, k, v, seg_q, seg_kv, qpos, kpos, cfg[:4],
                            want_lse=want_lse)
    if rope is not None:
        q = _apply_rope_4d(q, rope[0], rope[1])
        k = _apply_rope_4d(k, rope[2], rope[3])
    B, Sq, Hq, D = q.shape
    _, Skv, Hkv, _ = k.shape
    group = Hq // Hkv
    block_q = min(BLOCK, Sq)

    qt = q.transpose(0, 2, 1, 3)  # [B, H, S, D]
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)

    kernel = functools.partial(
        _fwd_kernel, causal=causal, sm_scale=sm_scale,
        num_kv_blocks=Skv // BLOCK, bounded=bounded,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=(B, Hq, Sq // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, Skv, D), lambda b, h, i: (b, h // group, 0, 0)),
            pl.BlockSpec((1, 1, Skv, D), lambda b, h, i: (b, h // group, 0, 0)),
            _q_specs(block_q),
            _kv_specs(Skv),
            _q_specs(block_q),
            _kv_specs(Skv),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, NUM_LANES),
                         lambda b, h, i: (b, h, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Hq, Sq, D), q.dtype),
            jax.ShapeDtypeStruct((B, Hq, Sq, NUM_LANES), jnp.float32),
        ],
        interpret=interpret,
    )(qt, kt, vt, _lane_bcast(seg_q), _sublane_bcast(seg_kv),
      _lane_bcast(qpos), _sublane_bcast(kpos))
    # compact residual: all 128 lanes are identical
    return out.transpose(0, 2, 1, 3), lse[..., 0]


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                   sq_ref, skv_ref, qp_ref, kp_ref, dq_ref, *, causal,
                   sm_scale, num_kv_blocks, bounded):
    iq = pl.program_id(2)
    block_q = q_ref.shape[2]
    block_k = BLOCK
    D = q_ref.shape[3]

    q = q_ref[0, 0]
    do = do_ref[0, 0]
    lse = lse_ref[0, 0][:, :1]  # [bq, 1]
    delta = delta_ref[0, 0][:, :1]
    seg_q = sq_ref[0]
    qpos = qp_ref[0]

    hi = _cdiv((iq + 1) * block_q, block_k) if (causal and bounded) \
        else num_kv_blocks

    def body(j, dq_acc):
        kb = k_ref[0, 0, pl.ds(j * block_k, block_k), :]
        vb = v_ref[0, 0, pl.ds(j * block_k, block_k), :]
        seg_k = skv_ref[0, :1, pl.ds(j * block_k, block_k)]
        kpos = kp_ref[0, :1, pl.ds(j * block_k, block_k)]
        s = jax.lax.dot_general(
            q, kb, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale
        allowed = _block_mask(seg_q, seg_k, qpos, kpos, causal)
        p = jnp.where(allowed, jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(
            do, vb, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - delta)).astype(kb.dtype)
        return dq_acc + jax.lax.dot_general(
            ds, kb, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dq = jax.lax.fori_loop(0, hi, body, jnp.zeros((block_q, D), jnp.float32))
    dq_ref[0, 0] = (dq * sm_scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    sq_ref, skv_ref, qp_ref, kp_ref, dk_ref, dv_ref, *,
                    causal, sm_scale, num_q_blocks, bounded):
    jk = pl.program_id(2)
    block_k = k_ref.shape[2]
    block_q = BLOCK
    D = k_ref.shape[3]

    kb = k_ref[0, 0]  # [bk, D]
    vb = v_ref[0, 0]
    seg_k = skv_ref[0, :1, pl.ds(jk * block_k, block_k)]  # [1, bk]
    kpos = kp_ref[0, :1, pl.ds(jk * block_k, block_k)]

    lo = (jk * block_k) // block_q if (causal and bounded) else 0

    def body(i, carry):
        dk_acc, dv_acc = carry
        qb = q_ref[0, 0, pl.ds(i * block_q, block_q), :]
        dob = do_ref[0, 0, pl.ds(i * block_q, block_q), :]
        lse = lse_ref[0, 0, pl.ds(i * block_q, block_q), :1]  # [bq, 1]
        delta = delta_ref[0, 0, pl.ds(i * block_q, block_q), :1]
        seg_q = sq_ref[0, pl.ds(i * block_q, block_q), :]  # [bq, 128]
        qpos = qp_ref[0, pl.ds(i * block_q, block_q), :]
        s = jax.lax.dot_general(
            qb, kb, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale  # [bq, bk]
        allowed = _block_mask(seg_q, seg_k, qpos, kpos, causal)
        p = jnp.where(allowed, jnp.exp(s - lse), 0.0)
        dv_acc = dv_acc + jax.lax.dot_general(
            p.astype(dob.dtype), dob,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bk, D]
        dp = jax.lax.dot_general(
            dob, vb, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bq, bk]
        ds = (p * (dp - delta)).astype(qb.dtype)
        dk_acc = dk_acc + jax.lax.dot_general(
            ds, qb, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bk, D]
        return dk_acc, dv_acc

    z = jnp.zeros((block_k, D), jnp.float32)
    dk, dv = jax.lax.fori_loop(lo, num_q_blocks, body, (z, z))
    dk_ref[0, 0] = (dk * sm_scale).astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _bwd(q, k, v, seg_q, seg_kv, qpos, kpos, out, lse, do, cfg):
    causal, sm_scale, interpret, bounded = cfg[:4]
    B, Sq, Hq, D = q.shape
    _, Skv, Hkv, _ = k.shape
    group = Hq // Hkv
    block_q = min(BLOCK, Sq)
    block_k = min(BLOCK, Skv)

    delta = jnp.sum(
        do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    ).transpose(0, 2, 1)  # [B, Hq, Sq]
    lse_b = jnp.broadcast_to(lse[..., None], (B, Hq, Sq, NUM_LANES))
    delta_b = jnp.broadcast_to(delta[..., None], (B, Hq, Sq, NUM_LANES))

    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    dot = do.transpose(0, 2, 1, 3)
    sq3, skv3 = _lane_bcast(seg_q), _sublane_bcast(seg_kv)
    qp3, kp3 = _lane_bcast(qpos), _sublane_bcast(kpos)

    dq_kernel = functools.partial(
        _bwd_dq_kernel, causal=causal, sm_scale=sm_scale,
        num_kv_blocks=Skv // block_k, bounded=bounded,
    )
    dq = pl.pallas_call(
        dq_kernel,
        grid=(B, Hq, Sq // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, Skv, D), lambda b, h, i: (b, h // group, 0, 0)),
            pl.BlockSpec((1, 1, Skv, D), lambda b, h, i: (b, h // group, 0, 0)),
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, NUM_LANES),
                         lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, NUM_LANES),
                         lambda b, h, i: (b, h, i, 0)),
            _q_specs(block_q),
            _kv_specs(Skv),
            _q_specs(block_q),
            _kv_specs(Skv),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hq, Sq, D), q.dtype),
        interpret=interpret,
    )(qt, kt, vt, dot, lse_b, delta_b, sq3, skv3, qp3, kp3)
    dq = dq.transpose(0, 2, 1, 3)

    dkv_kernel = functools.partial(
        _bwd_dkv_kernel, causal=causal, sm_scale=sm_scale,
        num_q_blocks=Sq // block_q, bounded=bounded,
    )
    whole_q = pl.BlockSpec((1, 1, Sq, D), lambda b, h, j: (b, h, 0, 0))
    whole_lane = pl.BlockSpec((1, 1, Sq, NUM_LANES),
                              lambda b, h, j: (b, h, 0, 0))
    dk_exp, dv_exp = pl.pallas_call(
        dkv_kernel,
        grid=(B, Hq, Skv // block_k),
        in_specs=[
            whole_q,
            pl.BlockSpec((1, 1, block_k, D),
                         lambda b, h, j: (b, h // group, j, 0)),
            pl.BlockSpec((1, 1, block_k, D),
                         lambda b, h, j: (b, h // group, j, 0)),
            whole_q,
            whole_lane,
            whole_lane,
            pl.BlockSpec((1, Sq, NUM_LANES), lambda b, h, j: (b, 0, 0)),
            _kv_specs(Skv),
            pl.BlockSpec((1, Sq, NUM_LANES), lambda b, h, j: (b, 0, 0)),
            _kv_specs(Skv),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, j: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, j: (b, h, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Hq, Skv, D), k.dtype),
            jax.ShapeDtypeStruct((B, Hq, Skv, D), v.dtype),
        ],
        interpret=interpret,
    )(qt, kt, vt, dot, lse_b, delta_b, sq3, skv3, qp3, kp3)

    if group > 1:
        dk_exp = dk_exp.reshape(B, Hkv, group, Skv, D).sum(axis=2)
        dv_exp = dv_exp.reshape(B, Hkv, group, Skv, D).sum(axis=2)
    dk = dk_exp.transpose(0, 2, 1, 3).astype(k.dtype)
    dv = dv_exp.transpose(0, 2, 1, 3).astype(v.dtype)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# custom_vjp plumbing + public entry point
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def _flash(q, k, v, seg_q, seg_kv, qpos, kpos, rope, cfg):
    # primal (not differentiated): skip the lse output entirely
    out, _ = _fwd(q, k, v, seg_q, seg_kv, qpos, kpos, cfg, want_lse=False,
                  rope=rope)
    return out


def _flash_fwd(q, k, v, seg_q, seg_kv, qpos, kpos, rope, cfg):
    # residuals hold the ROTATED q/k (the bwd kernels recompute scores);
    # the vjp of the rotation itself is applied to dq/dk afterwards
    if rope is not None:
        q = _apply_rope_4d(q, rope[0], rope[1])
        k = _apply_rope_4d(k, rope[2], rope[3])
    out, lse = _fwd(q, k, v, seg_q, seg_kv, qpos, kpos, cfg)
    return out, (q, k, v, seg_q, seg_kv, qpos, kpos, rope, out, lse)


def _flash_bwd(cfg, res, do):
    q, k, v, seg_q, seg_kv, qpos, kpos, rope, out, lse = res
    dq, dk, dv = _bwd(q, k, v, seg_q, seg_kv, qpos, kpos, out, lse, do, cfg)
    if rope is not None:
        # per-pair rotations are orthogonal: the vjp is the inverse
        # rotation, i.e. the same flat form with sin_signed negated
        dq = _apply_rope_4d(dq, rope[0], -rope[1])
        dk = _apply_rope_4d(dk, rope[2], -rope[3])
        drope = tuple(jnp.zeros_like(t) for t in rope)
    else:
        drope = None
    return dq, dk, dv, None, None, None, None, drope


_flash.defvjp(_flash_fwd, _flash_bwd)


def _pad_to(x, target, axis, value=0):
    pad = target - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def flash_attention(q, k, v, seg_q=None, seg_kv=None, *, causal=False,
                    sm_scale=None, q_positions=None, kv_positions=None,
                    backend=None, interpret=False, rope=None):
    """Flash attention entry point. See module docstring for layout/masking.

    backend: None (auto: pallas on TPU, reference elsewhere), "pallas",
    "rowblock" (single-pass pallas fwd for moderate Skv; flash bwd), "ref".
    q_positions/kv_positions [B,S] override positional causal comparison
    (needed for KV-cache decode and left-padded prompts). When omitted and
    causal=True, sequence indices are used and upper kv blocks are skipped.

    rope: optional (cos_q, sin_q, cos_k, sin_k) flat sign-folded rotary
    tables ([>=Sq, H*D] / [>=Skv, H*D], rotary.flat_rotary_tables); q and k
    are then given PRE-rotary and rotary is applied internally — fused into
    the packed inference kernel, applied outside on other paths. Only valid
    when all rows share positions arange(S) (ESM2 encoder).
    """
    B, Sq, Hq, D = q.shape
    _, Skv, Hkv, _ = k.shape
    assert Hq % Hkv == 0, (Hq, Hkv)
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(D)
    if backend is None:
        backend = "pallas" if jax.default_backend() == "tpu" else "ref"
    if seg_q is None:
        seg_q = jnp.ones((B, Sq), jnp.int32)
    if seg_kv is None:
        seg_kv = jnp.ones((B, Skv), jnp.int32)
    seg_q = seg_q.astype(jnp.int32)
    seg_kv = seg_kv.astype(jnp.int32)
    bounded = q_positions is None and kv_positions is None and Sq == Skv
    if q_positions is None:
        q_positions = jnp.broadcast_to(jnp.arange(Sq, dtype=jnp.int32),
                                       (B, Sq))
    if kv_positions is None:
        kv_positions = jnp.broadcast_to(jnp.arange(Skv, dtype=jnp.int32),
                                        (B, Skv))
    q_positions = q_positions.astype(jnp.int32)
    kv_positions = kv_positions.astype(jnp.int32)

    if backend == "ref":
        if rope is not None:
            q = _apply_rope_4d(q, rope[0], rope[1])
            k = _apply_rope_4d(k, rope[2], rope[3])
        return mha_reference(q, k, v, seg_q, seg_kv, causal=causal,
                             sm_scale=sm_scale, q_positions=q_positions,
                             kv_positions=kv_positions)
    impl = "rowblock" if backend == "rowblock" else "flash"

    # Pad sequence dims to the 128 tile; padded positions get segment id 0 so
    # they are masked out, then sliced away.
    Sq_p = _cdiv(Sq, BLOCK) * BLOCK
    Skv_p = _cdiv(Skv, BLOCK) * BLOCK
    qp = _pad_to(q, Sq_p, 1)
    kp = _pad_to(k, Skv_p, 1)
    vp = _pad_to(v, Skv_p, 1)
    sqp = _pad_to(seg_q, Sq_p, 1, value=0)
    skvp = _pad_to(seg_kv, Skv_p, 1, value=0)
    qpp = _pad_to(q_positions, Sq_p, 1, value=0)
    kpp = _pad_to(kv_positions, Skv_p, 1, value=0)

    rope_p = None
    if rope is not None:
        # slice to the live lengths, pad to the tile with the identity
        # rotation (cos=1, sin=0); padded rows are masked anyway
        cos_q = _pad_to(rope[0][:Sq], Sq_p, 0, value=1.0)
        sin_q = _pad_to(rope[1][:Sq], Sq_p, 0, value=0.0)
        cos_k = _pad_to(rope[2][:Skv], Skv_p, 0, value=1.0)
        sin_k = _pad_to(rope[3][:Skv], Skv_p, 0, value=0.0)
        rope_p = (cos_q, sin_q, cos_k, sin_k)

    cfg = (causal, sm_scale, interpret, bounded, impl)
    out = _flash(qp, kp, vp, sqp, skvp, qpp, kpp, rope_p, cfg)
    return out[:, :Sq]
