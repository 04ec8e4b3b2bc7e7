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
(8, 128) or equal the array dims): per-row scalars (segment ids, positions,
logsumexp, delta) enter the kernels as cheap 8-lane broadcasts [*, S, 8]
(read as [bq, 1] columns) or sublane broadcasts [*, 8, S] (read as [1, bk]
rows). The dkv backward kernel works in transposed score space ([bk, bq])
so its q-row scalars broadcast from [8, Sq] rows; the forward emits the
logsumexp 8-lane-broadcast and slices it to a compact [B, H, Sq] residual.

On non-TPU backends the public entry point falls back to `mha_reference`
(identical semantics) so the full model runs on the 8-device CPU test mesh.
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -1e30
NUM_LANES = 128
NUM_SUBLANES = 8
# q-side per-row scalars (segment ids, positions, lse, delta) travel as
# 8-lane broadcasts: Mosaic accepts a block whose last dim equals the
# array dim, and 8 lanes cost 1/16th the HBM traffic of a 128-lane
# broadcast (these arrays are re-read once per head)
LSE_LANES = 8
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


def _block_mask(seg_q_col, seg_k_row, qpos_col, kpos_row, causal):
    """seg_q_col/qpos_col [bq, 1]; *_row [1, bk] -> [bq, bk] bool."""
    allowed = (seg_q_col == seg_k_row) & (seg_q_col > 0)
    if causal:
        allowed = allowed & (qpos_col >= kpos_row)
    return allowed


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, sq_ref, skv_ref, qp_ref, kp_ref,
                o_ref, lse_ref=None, *, causal, sm_scale, num_kv_blocks,
                bounded, block_k):
    iq = pl.program_id(2)
    block_q = q_ref.shape[2]
    D = q_ref.shape[3]

    q = q_ref[0, 0]  # [bq, D] native dtype: keep MXU on the bf16 path
    seg_q = sq_ref[0][:, :1]   # [bq, 1]
    qpos = qp_ref[0][:, :1]

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
    lse_ref[0, 0] = jnp.broadcast_to(lse, (block_q, LSE_LANES))


def _fwd_kernel_twophase(q_ref, k_ref, v_ref, sq_ref, skv_ref, qp_ref,
                         kp_ref, o_ref, lse_ref, s_buf, *, causal, sm_scale,
                         num_kv_blocks, bounded, block_k):
    """Two-phase forward: phase 1 stages masked scores into a VMEM scratch
    row while tracking only the running row max; phase 2 does one exp +
    sum + PV pass over the staged row. Eliminates the online-softmax
    per-block accumulator rescale ([bq, D] multiply + alpha exp + m/l
    bookkeeping) that makes the one-pass kernel VPU-bound. Causal-interior
    kv blocks (entirely below the diagonal under bounded positions) skip
    the causal compare; all blocks keep the segment mask.

    Scores are staged in base-2 space (log2(e) folded into sm_scale) so
    the per-element exponential is a bare exp2 — jnp.exp lowers to
    exp2(x * log2e), costing an extra full-tile multiply. exp2(c*s - c*m)
    == exp(s - m) exactly; the emitted lse converts back to natural log."""
    iq = pl.program_id(2)
    block_q = q_ref.shape[2]
    D = q_ref.shape[3]
    scale2 = sm_scale * 1.4426950408889634  # sm_scale * log2(e)

    q = q_ref[0, 0]
    seg_q = sq_ref[0][:, :1]   # [bq, 1]
    qpos = qp_ref[0][:, :1]

    if causal and bounded:
        hi = _cdiv((iq + 1) * block_q, block_k)
        hi_interior = (iq * block_q) // block_k
    else:
        hi = num_kv_blocks
        hi_interior = 0

    def score_block(j, m_i, with_causal):
        kb = k_ref[0, 0, pl.ds(j * block_k, block_k), :]
        seg_k = skv_ref[0, :1, pl.ds(j * block_k, block_k)]
        s = jax.lax.dot_general(
            q, kb, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale2
        allowed = (seg_q == seg_k) & (seg_q > 0)
        if with_causal:
            kpos = kp_ref[0, :1, pl.ds(j * block_k, block_k)]
            allowed = allowed & (qpos >= kpos)
        s = jnp.where(allowed, s, DEFAULT_MASK_VALUE)
        s_buf[:, pl.ds(j * block_k, block_k)] = s
        return jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))

    m0 = jnp.full((block_q, 1), DEFAULT_MASK_VALUE, jnp.float32)
    m_i = jax.lax.fori_loop(
        0, hi_interior, lambda j, m: score_block(j, m, False), m0)
    m_i = jax.lax.fori_loop(
        hi_interior, hi, lambda j, m: score_block(j, m, causal), m_i)

    row_masked = m_i <= DEFAULT_MASK_VALUE * 0.5
    m_safe = jnp.where(row_masked, 0.0, m_i)

    def pv_block(j, carry):
        acc, l_i = carry
        p = jnp.exp2(s_buf[:, pl.ds(j * block_k, block_k)] - m_safe)
        vb = v_ref[0, 0, pl.ds(j * block_k, block_k), :]
        l_i = l_i + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc + jax.lax.dot_general(
            p.astype(vb.dtype), vb,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, l_i

    acc0 = jnp.zeros((block_q, D), jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, l_i = jax.lax.fori_loop(0, hi, pv_block, (acc0, l0))

    dead = row_masked | (l_i == 0.0)
    l_safe = jnp.where(dead, 1.0, l_i)
    out = jnp.where(dead, 0.0, acc / l_safe)
    o_ref[0, 0] = out.astype(o_ref.dtype)
    # back to natural-log lse for the backward: ln(sum e^s) =
    # m2*ln2 + ln(l) with m2 in base-2 score space
    lse = jnp.where(dead, DEFAULT_MASK_VALUE,
                    m_i * 0.6931471805599453 + jnp.log(l_safe))
    lse_ref[0, 0] = jnp.broadcast_to(lse, (block_q, LSE_LANES))


def _lane_bcast(x):
    """[B,S] -> [B,S,8] (8-lane broadcast; kernels read column [:, :1])."""
    return jnp.broadcast_to(x[:, :, None], (*x.shape, LSE_LANES))


def _sublane_bcast(x):
    """[B,S] -> [B,8,S]."""
    return jnp.broadcast_to(x[:, None, :], (x.shape[0], NUM_SUBLANES,
                                            x.shape[1]))


def _q_specs(block_q):
    """BlockSpecs for [B,Sq,8] lane-broadcast q-side int arrays."""
    return pl.BlockSpec((1, block_q, LSE_LANES), lambda b, h, i: (b, i, 0))


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
    # wider blocks amortize the online-softmax rescale ([bq, D] acc
    # multiply + m/l updates) over more score elements; for bounded causal
    # the kv extent rounds up to block_k, so block_k <= block_q caps the
    # diagonal overshoot at one block_q's worth (12.5% at 256/S=2048)
    block_q = 256 if Sq % 256 == 0 else min(BLOCK, Sq)
    block_k = BLOCK
    for cand in (512, 256):
        if Skv % cand == 0 and (not (causal and bounded)
                                or cand <= block_q):
            block_k = cand
            break

    qt = q.transpose(0, 2, 1, 3)  # [B, H, S, D]
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)

    # two-phase (staged-score) kernel when the f32 score row fits a 4MB
    # VMEM scratch next to the k/v blocks; fall back to the one-pass
    # online-softmax kernel for very long Skv
    twophase = block_q * Skv * 4 <= 4 * 1024 * 1024
    kernel = functools.partial(
        _fwd_kernel_twophase if twophase else _fwd_kernel,
        causal=causal, sm_scale=sm_scale,
        num_kv_blocks=Skv // block_k, bounded=bounded, block_k=block_k,
    )
    scratch = ([pltpu.VMEM((block_q, Skv), jnp.float32)] if twophase
               else [])
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
            pl.BlockSpec((1, 1, block_q, LSE_LANES),
                         lambda b, h, i: (b, h, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Hq, Sq, D), q.dtype),
            jax.ShapeDtypeStruct((B, Hq, Sq, LSE_LANES), jnp.float32),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )(qt, kt, vt, _lane_bcast(seg_q), _sublane_bcast(seg_kv),
      _lane_bcast(qpos), _sublane_bcast(kpos))
    # compact residual: all 8 lanes are identical
    return out.transpose(0, 2, 1, 3), lse[..., 0]


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                   sq_ref, skv_ref, qp_ref, kp_ref, dq_ref, *, causal,
                   sm_scale, num_kv_blocks, bounded, block_k):
    iq = pl.program_id(2)
    block_q = q_ref.shape[2]
    D = q_ref.shape[3]

    q = q_ref[0, 0]
    do = do_ref[0, 0]
    # lse arrives pre-scaled by log2(e); scores are computed in base-2
    # space so p recovers via a bare exp2 (see _fwd_kernel_twophase)
    scale2 = sm_scale * 1.4426950408889634
    lse = lse_ref[0, 0][:, :1]  # [bq, 1]
    delta = delta_ref[0, 0][:, :1]
    seg_q = sq_ref[0][:, :1]
    qpos = qp_ref[0][:, :1]

    if causal and bounded:
        hi = _cdiv((iq + 1) * block_q, block_k)
        hi_interior = (iq * block_q) // block_k
    else:
        hi = num_kv_blocks
        hi_interior = 0

    def body(j, dq_acc, with_causal):
        kb = k_ref[0, 0, pl.ds(j * block_k, block_k), :]
        vb = v_ref[0, 0, pl.ds(j * block_k, block_k), :]
        seg_k = skv_ref[0, :1, pl.ds(j * block_k, block_k)]
        s = jax.lax.dot_general(
            q, kb, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale2
        allowed = (seg_q == seg_k) & (seg_q > 0)
        if with_causal:
            kpos = kp_ref[0, :1, pl.ds(j * block_k, block_k)]
            allowed = allowed & (qpos >= kpos)
        p = jnp.where(allowed, jnp.exp2(s - lse), 0.0)
        dp = jax.lax.dot_general(
            do, vb, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - delta)).astype(kb.dtype)
        return dq_acc + jax.lax.dot_general(
            ds, kb, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dq = jnp.zeros((block_q, D), jnp.float32)
    dq = jax.lax.fori_loop(0, hi_interior,
                           lambda j, a: body(j, a, False), dq)
    dq = jax.lax.fori_loop(hi_interior, hi,
                           lambda j, a: body(j, a, causal), dq)
    dq_ref[0, 0] = (dq * sm_scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    sq_ref, skv_ref, qp_ref, kp_ref, dk_ref, dv_ref, *,
                    causal, sm_scale, num_q_blocks, bounded, block_q):
    """dk/dv in TRANSPOSED score space (s_t [bk, bq]): per-q-row scalars
    (lse, delta, seg_q, qpos) then broadcast as [1, bq] rows from cheap
    sublane-broadcast [8, Sq] inputs — the previous row-oriented design
    needed them as [bq, 1] columns, which forced 128-lane-broadcast
    [Sq, 128] arrays re-read whole per grid step (~2 GB of HBM reads per
    call at B8 H32 S2048)."""
    jk = pl.program_id(2)
    block_k = k_ref.shape[2]
    D = k_ref.shape[3]

    kb = k_ref[0, 0]  # [bk, D]
    vb = v_ref[0, 0]
    scale2 = sm_scale * 1.4426950408889634  # base-2 score space
    seg_k = skv_ref[0][:, :1]   # [bk, 1] (kv-side 8-lane broadcast block)
    kpos = kp_ref[0][:, :1]

    if causal and bounded:
        lo = (jk * block_k) // block_q
        # q blocks whose min qpos >= this tile's max kpos are fully
        # causal-valid: skip the causal compare there
        lo_interior = _cdiv((jk + 1) * block_k, block_q)
    else:
        lo = 0
        lo_interior = 0

    def body(i, carry, with_causal):
        dk_acc, dv_acc = carry
        qb = q_ref[0, 0, pl.ds(i * block_q, block_q), :]
        dob = do_ref[0, 0, pl.ds(i * block_q, block_q), :]
        lse = lse_ref[0, 0, :1, pl.ds(i * block_q, block_q)]    # [1, bq]
        delta = delta_ref[0, 0, :1, pl.ds(i * block_q, block_q)]
        seg_q = sq_ref[0, :1, pl.ds(i * block_q, block_q)]   # [1, bq]
        s_t = jax.lax.dot_general(
            kb, qb, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale2  # [bk, bq]
        allowed = (seg_q == seg_k) & (seg_q > 0)
        if with_causal:
            qpos = qp_ref[0, :1, pl.ds(i * block_q, block_q)]
            allowed = allowed & (qpos >= kpos)
        p_t = jnp.where(allowed, jnp.exp2(s_t - lse), 0.0)  # [bk, bq]
        dv_acc = dv_acc + jax.lax.dot_general(
            p_t.astype(dob.dtype), dob,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bk, D]
        dp_t = jax.lax.dot_general(
            vb, dob, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bk, bq]
        ds_t = (p_t * (dp_t - delta)).astype(qb.dtype)
        dk_acc = dk_acc + jax.lax.dot_general(
            ds_t, qb, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bk, D]
        return dk_acc, dv_acc

    z = jnp.zeros((block_k, D), jnp.float32)
    carry = jax.lax.fori_loop(
        lo, jnp.minimum(lo_interior, num_q_blocks),
        lambda i, c: body(i, c, causal), (z, z))
    dk, dv = jax.lax.fori_loop(
        jnp.minimum(lo_interior, num_q_blocks), num_q_blocks,
        lambda i, c: body(i, c, False), carry)
    dk_ref[0, 0] = (dk * sm_scale).astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _bwd(q, k, v, seg_q, seg_kv, qpos, kpos, out, lse, do, cfg):
    causal, sm_scale, interpret, bounded = cfg[:4]
    B, Sq, Hq, D = q.shape
    _, Skv, Hkv, _ = k.shape
    group = Hq // Hkv
    # wider loop blocks amortize mask/exp bookkeeping (matches _fwd); the
    # grid block (dq: block_q, dkv: block_k) stays at 128-256 so the
    # causal bound skips work at fine granularity
    block_q = 256 if Sq % 256 == 0 else min(BLOCK, Sq)
    block_k = 256 if Skv % 256 == 0 else min(BLOCK, Skv)

    delta = jnp.sum(
        do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    ).transpose(0, 2, 1)  # [B, Hq, Sq]
    # dq reads per-q-row scalars as [bq, 1] columns (8-lane broadcast);
    # the transposed dkv kernel reads them as [1, bq] rows (sublane
    # broadcast [B, H, 8, Sq] — same bytes, no 128x lane inflation)
    lse2 = lse * 1.4426950408889634  # base-2 space for the kernels' exp2
    lse_b = jnp.broadcast_to(lse2[..., None], (B, Hq, Sq, LSE_LANES))
    delta_b = jnp.broadcast_to(delta[..., None], (B, Hq, Sq, LSE_LANES))
    lse_t = jnp.broadcast_to(lse2[:, :, None, :],
                             (B, Hq, NUM_SUBLANES, Sq))
    delta_t = jnp.broadcast_to(delta[:, :, None, :],
                               (B, Hq, NUM_SUBLANES, Sq))

    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    dot = do.transpose(0, 2, 1, 3)
    sq3, skv3 = _lane_bcast(seg_q), _sublane_bcast(seg_kv)
    qp3, kp3 = _lane_bcast(qpos), _sublane_bcast(kpos)
    # swapped-orientation mask arrays for the transposed dkv kernel
    sq_t, skv8 = _sublane_bcast(seg_q), _lane_bcast(seg_kv)
    qp_t, kp8 = _sublane_bcast(qpos), _lane_bcast(kpos)

    dq_kernel = functools.partial(
        _bwd_dq_kernel, causal=causal, sm_scale=sm_scale,
        num_kv_blocks=Skv // block_k, bounded=bounded, block_k=block_k,
    )
    dq = pl.pallas_call(
        dq_kernel,
        grid=(B, Hq, Sq // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, Skv, D), lambda b, h, i: (b, h // group, 0, 0)),
            pl.BlockSpec((1, 1, Skv, D), lambda b, h, i: (b, h // group, 0, 0)),
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, LSE_LANES),
                         lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, LSE_LANES),
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
        num_q_blocks=Sq // block_q, bounded=bounded, block_q=block_q,
    )
    whole_q = pl.BlockSpec((1, 1, Sq, D), lambda b, h, j: (b, h, 0, 0))
    # per-q-row scalars enter sublane-broadcast as [1, 1, 8, Sq] rows
    whole_row = pl.BlockSpec((1, 1, NUM_SUBLANES, Sq),
                             lambda b, h, j: (b, h, 0, 0))
    q_row = pl.BlockSpec((1, NUM_SUBLANES, Sq), lambda b, h, j: (b, 0, 0))
    kv_col = pl.BlockSpec((1, block_k, LSE_LANES),
                          lambda b, h, j: (b, j, 0))
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
            whole_row,
            whole_row,
            q_row,
            kv_col,
            q_row,
            kv_col,
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
    )(qt, kt, vt, dot, lse_t, delta_t, sq_t, skv8, qp_t, kp8)

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
