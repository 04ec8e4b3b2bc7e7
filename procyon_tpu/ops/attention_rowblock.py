"""Single-pass row-block attention forward (TPU Pallas).

For bidirectional, moderate-length attention (ESM2: S <= ~2048) the online-
softmax flash forward pays VPU overhead (running max/sum rescaling) it does
not need: a whole score row fits in VMEM. This kernel computes, per q block,
the full [bq, Skv] score row in VMEM, one softmax pass, one p@V matmul —
no score-matrix HBM round-trip (XLA's fused attention materializes it) and
no per-block rescale ops (the flash kernel's cost).

Used as flash_attention(backend="rowblock"): forward only; the backward
reuses the flash dq/dkv kernels via the shared custom_vjp (identical lse
definition).

Layout note: a BSHD-input variant (no host-side transposes) was tried and
abandoned — Mosaic cannot store into a middle head dim, an unrolled
per-head loop keeps every head's temporaries live on the kernel stack
(scoped-vmem OOM), and XLA inserts layout copies at the custom-call
boundary regardless. The deeper fix is fusing the QKV projection +
attention in one kernel (future work).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

import importlib

# ops/__init__ re-exports the flash_attention *function* over the submodule
# attribute; go through sys.modules for the real module.
fa = importlib.import_module("procyon_tpu.ops.flash_attention")


def _rowblock_kernel(q_ref, k_ref, v_ref, sq_ref, skv_ref, qp_ref, kp_ref,
                     o_ref, lse_ref=None, *, causal, sm_scale):
    block_q = q_ref.shape[2]
    D = q_ref.shape[3]
    Skv = k_ref.shape[2]

    q = q_ref[0, 0]                     # [bq, D]
    kb = k_ref[0, 0]                    # [Skv, D]
    vb = v_ref[0, 0]
    seg_q = sq_ref[0]                   # [bq, 128]
    qpos = qp_ref[0]
    seg_k = skv_ref[0, :1, :]           # [1, Skv]
    kpos = kp_ref[0, :1, :]

    s = jax.lax.dot_general(
        q, kb, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * (sm_scale * 1.4426950408889634)  # [bq, Skv], base-2 score space
    # lane-broadcast seg_q is [bq,128]; compare against [1,Skv] by taking the
    # first lane column (all 128 lanes are identical)
    allowed = (seg_q[:, :1] == seg_k) & (seg_q[:, :1] > 0)
    if causal:
        allowed = allowed & (qpos[:, :1] >= kpos)
    s = jnp.where(allowed, s, fa.DEFAULT_MASK_VALUE)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)   # softmax is base-invariant; exp2 is a bare op
    l = jnp.sum(p, axis=-1, keepdims=True)
    row_masked = m <= fa.DEFAULT_MASK_VALUE * 0.5
    l_safe = jnp.where(row_masked | (l == 0.0), 1.0, l)
    out = jax.lax.dot_general(
        p.astype(vb.dtype), vb,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / l_safe
    out = jnp.where(row_masked | (l == 0.0), 0.0, out)
    o_ref[0, 0] = out.astype(o_ref.dtype)
    if lse_ref is not None:
        # natural-log lse residual: ln(sum e^s) = m2*ln2 + ln(l)
        lse = m * 0.6931471805599453 + jnp.log(l_safe)
        lse = jnp.where(row_masked | (l == 0.0), fa.DEFAULT_MASK_VALUE, lse)
        lse_ref[0, 0] = jnp.broadcast_to(lse, (block_q, fa.LSE_LANES))


def rowblock_fwd(q, k, v, seg_q, seg_kv, qpos, kpos, cfg, want_lse=True):
    """Same contract as flash_attention._fwd (returns out, compact lse)."""
    causal, sm_scale, interpret, _ = cfg
    B, Sq, Hq, D = q.shape
    _, Skv, Hkv, _ = k.shape
    group = Hq // Hkv
    block_q = 128
    for cand in (512, 256, 128):
        if Sq % cand == 0:
            block_q = cand
            break

    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)

    kernel = functools.partial(_rowblock_kernel, causal=causal,
                               sm_scale=sm_scale)
    in_specs = [
        pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0)),
        pl.BlockSpec((1, 1, Skv, D), lambda b, h, i: (b, h // group, 0, 0)),
        pl.BlockSpec((1, 1, Skv, D), lambda b, h, i: (b, h // group, 0, 0)),
        fa._q_specs(block_q),
        fa._kv_specs(Skv),
        fa._q_specs(block_q),
        fa._kv_specs(Skv),
    ]
    o_spec = pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0))
    o_shape = jax.ShapeDtypeStruct((B, Hq, Sq, D), q.dtype)
    args = (qt, kt, vt, fa._lane_bcast(seg_q), fa._sublane_bcast(seg_kv),
            fa._lane_bcast(qpos), fa._sublane_bcast(kpos))
    if not want_lse:
        out = pl.pallas_call(
            kernel, grid=(B, Hq, Sq // block_q), in_specs=in_specs,
            out_specs=o_spec, out_shape=o_shape, interpret=interpret,
        )(*args)
        return out.transpose(0, 2, 1, 3), None
    out, lse = pl.pallas_call(
        kernel,
        grid=(B, Hq, Sq // block_q),
        in_specs=in_specs,
        out_specs=[
            o_spec,
            pl.BlockSpec((1, 1, block_q, fa.LSE_LANES),
                         lambda b, h, i: (b, h, i, 0)),
        ],
        out_shape=[
            o_shape,
            jax.ShapeDtypeStruct((B, Hq, Sq, fa.LSE_LANES), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    return out.transpose(0, 2, 1, 3), lse[..., 0]


# ---------------------------------------------------------------------------
# Packed-lane rowblock forward: reads the flat [B, S, H*D] activation layout
# directly (no BSHD->BHSD transposes around the kernel — profiled at
# ~2 ms/layer in ESM2-650M). Each grid step processes 128 lanes =
# 128//D heads. Inference only (no lse); requires Hq == Hkv and D <= 128
# with (H*D) % 128 == 0.
# ---------------------------------------------------------------------------


def _lane_rotate_half(x, D):
    """Per-head rotate_half permutation y[l] = x[D*(l//D) + (l+D/2) % D]
    over the 128-lane axis, as two full-width rolls + a lane select (VPU
    shuffles; the XLA equivalent gather costs two HBM relayout copies)."""
    from jax.experimental.pallas import tpu as pltpu

    d2 = D // 2
    lanes = x.shape[-1]
    # Mosaic only rotates 32-bit data; the VMEM-local up/downcast is free
    # next to the HBM copies this replaces
    x32 = x if x.dtype.itemsize == 4 else x.astype(jnp.float32)
    r_plus = pltpu.roll(x32, d2, axis=x.ndim - 1)          # x[l - D/2]
    r_minus = pltpu.roll(x32, (lanes - d2) % lanes, axis=x.ndim - 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where((lane % D) < d2, r_minus, r_plus).astype(x.dtype)


def _rowblock_packed_kernel(q_ref, k_ref, v_ref, sq_ref, skv_ref, qp_ref,
                            kp_ref, *rest, causal, sm_scale, head_dim,
                            fused_rope):
    if fused_rope:
        cq_ref, sq_t_ref, ck_ref, sk_ref, o_ref = rest
    else:
        (o_ref,) = rest
    block_q = q_ref.shape[1]
    lanes = q_ref.shape[2]
    Skv = k_ref.shape[1]
    hpb = lanes // head_dim

    seg_q = sq_ref[0]
    qpos = qp_ref[0]
    seg_k = skv_ref[0, :1, :]
    kpos = kp_ref[0, :1, :]
    allowed = (seg_q[:, :1] == seg_k) & (seg_q[:, :1] > 0)
    if causal:
        allowed = allowed & (qpos[:, :1] >= kpos)

    qb = q_ref[0]   # [bq, lanes]
    kb = k_ref[0]   # [Skv, lanes]
    vb = v_ref[0]
    if fused_rope:
        qb = qb * cq_ref[...] + _lane_rotate_half(qb, head_dim) * sq_t_ref[...]
        kb = kb * ck_ref[...] + _lane_rotate_half(kb, head_dim) * sk_ref[...]
    # staged per-head computation (all QK dots, then all softmaxes, then all
    # PV dots) instead of one sequential chain per head: the independent
    # stages give Mosaic's scheduler MXU/VPU overlap across heads
    heads = [slice(h * head_dim, (h + 1) * head_dim) for h in range(hpb)]
    ss = [jax.lax.dot_general(
        qb[:, sl], kb[:, sl],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) for sl in heads]
    if not fused_rope:
        # log2(e) for the exp2 below (softmax is base-invariant); with
        # fused rope the factor is pre-folded into the q-side tables
        ss = [s * (sm_scale * 1.4426950408889634) for s in ss]
    # one additive mask bias shared by every head (a select per head costs
    # a full [bq, Skv] VPU pass each; the bias is computed once)
    bias = jnp.where(allowed, 0.0, fa.DEFAULT_MASK_VALUE)
    ps, scales = [], []
    for s in ss:
        s = s + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        row_masked = m <= fa.DEFAULT_MASK_VALUE * 0.5
        dead = row_masked | (l == 0.0)
        ps.append(p.astype(vb.dtype))
        scales.append(jnp.where(dead, 0.0, 1.0 / jnp.where(dead, 1.0, l)))
    outs = [jax.lax.dot_general(
        p, vb[:, sl],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * sc for p, sl, sc in zip(ps, heads, scales)]
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def rowblock_packed_qkv_fwd(qkv, seg, positions, cfg, *, n_heads, head_dim,
                            rope=None):
    """Attention over a PACKED [B, S, 3*H*D] qkv projection output.

    The q/k/v views never materialize: the kernel's BlockSpec index maps
    read lane-offset blocks of the same array (q at lane block h, k at
    H*D//lanes + h, v at 2*H*D//lanes + h), so the fused [d, 3*H*D] QKV
    matmul feeds attention with ZERO relayout copies — slicing the packed
    output in XLA costs one HBM copy per tensor (measured: fused-QKV was
    net slower without this). Bidirectional, Hq == Hkv, inference (no lse).
    """
    causal, sm_scale, interpret, _ = cfg
    B, Sq, three_hd = qkv.shape
    H, D = n_heads, head_dim
    HD = H * D
    assert three_hd == 3 * HD and HD % 128 == 0 and 128 % D == 0
    Skv = Sq
    lanes = 256 if HD % 256 == 0 else 128
    hpb = lanes // D
    nb = HD // lanes                      # lane blocks per tensor
    block_q = 128
    for cand in (512, 256, 128):
        if Sq % cand == 0:
            block_q = cand
            break

    kernel = functools.partial(_rowblock_packed_kernel, causal=causal,
                               sm_scale=sm_scale, head_dim=D,
                               fused_rope=rope is not None)
    in_specs = [
        pl.BlockSpec((1, block_q, lanes), lambda b, h, i: (b, i, h)),
        pl.BlockSpec((1, Skv, lanes), lambda b, h, i: (b, 0, h + nb)),
        pl.BlockSpec((1, Skv, lanes), lambda b, h, i: (b, 0, h + 2 * nb)),
        fa._q_specs(block_q),
        fa._kv_specs(Skv),
        fa._q_specs(block_q),
        fa._kv_specs(Skv),
    ]
    args = [qkv, qkv, qkv, fa._lane_bcast(seg), fa._sublane_bcast(seg),
            fa._lane_bcast(positions), fa._sublane_bcast(positions)]
    if rope is not None:
        log2e = 1.4426950408889634  # exp2 score space (see kernel)
        rope = (rope[0] * (sm_scale * log2e),
                rope[1] * (sm_scale * log2e), rope[2], rope[3])
        kernel = functools.partial(_rowblock_packed_kernel, causal=causal,
                                   sm_scale=1.0, head_dim=D,
                                   fused_rope=True)
        cos_q, sin_q, cos_k, sin_k = (t.astype(qkv.dtype) for t in rope)
        in_specs += [
            pl.BlockSpec((block_q, lanes), lambda b, h, i: (i, h)),
            pl.BlockSpec((block_q, lanes), lambda b, h, i: (i, h)),
            pl.BlockSpec((Skv, lanes), lambda b, h, i: (0, h)),
            pl.BlockSpec((Skv, lanes), lambda b, h, i: (0, h)),
        ]
        args += [cos_q, sin_q, cos_k, sin_k]
    out = pl.pallas_call(
        kernel,
        grid=(B, nb, Sq // block_q),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, lanes),
                               lambda b, h, i: (b, i, h)),
        out_shape=jax.ShapeDtypeStruct((B, Sq, HD), qkv.dtype),
        interpret=interpret,
    )(*args)
    return out


def rowblock_packed_fwd(q, k, v, seg_q, seg_kv, qpos, kpos, cfg, rope=None):
    """q/k/v [B, S, H, D] -> attention out [B, S, H, D], no transposes.
    Preconditions: Hq == Hkv, (H*D) % 128 == 0, 128 % D == 0.

    rope: optional (cos_q, sin_q, cos_k, sin_k) flat sign-folded tables
    ([Sq, H*D] / [Skv, H*D], see ops/rotary.flat_rotary_tables) — rotary is
    applied to q/k inside the kernel via lane rolls, avoiding the two HBM
    relayout copies XLA emits for the x[..., perm] gather (~1 ms/layer at
    ESM2-650M scale)."""
    causal, sm_scale, interpret, _ = cfg
    B, Sq, Hq, D = q.shape
    _, Skv, Hkv, _ = k.shape
    assert Hq == Hkv and (Hq * D) % 128 == 0 and 128 % D == 0
    # wider lane blocks = fewer grid steps (less dispatch overhead, better
    # DMA/compute pipelining); bounded by VMEM for the f32 score rows
    lanes = 256 if (Hq * D) % 256 == 0 else 128
    hpb = lanes // D
    # largest block that divides Sq: fewer grid steps = fewer k/v HBM
    # refetches and less dispatch overhead (the whole score row is in VMEM
    # regardless); 512 keeps the f32 score/p temporaries ~1MB each at
    # Skv=512, well inside the 16MB scoped-vmem budget
    block_q = 128
    for cand in (512, 256, 128):
        if Sq % cand == 0:
            block_q = cand
            break

    qf = q.reshape(B, Sq, Hq * D)
    kf = k.reshape(B, Skv, Hkv * D)
    vf = v.reshape(B, Skv, Hkv * D)

    kernel = functools.partial(_rowblock_packed_kernel, causal=causal,
                               sm_scale=sm_scale, head_dim=D,
                               fused_rope=rope is not None)
    in_specs = [
        pl.BlockSpec((1, block_q, lanes), lambda b, h, i: (b, i, h)),
        pl.BlockSpec((1, Skv, lanes), lambda b, h, i: (b, 0, h)),
        pl.BlockSpec((1, Skv, lanes), lambda b, h, i: (b, 0, h)),
        fa._q_specs(block_q),
        fa._kv_specs(Skv),
        fa._q_specs(block_q),
        fa._kv_specs(Skv),
    ]
    args = [qf, kf, vf, fa._lane_bcast(seg_q), fa._sublane_bcast(seg_kv),
            fa._lane_bcast(qpos), fa._sublane_bcast(kpos)]
    if rope is not None:
        # fold sm_scale into the q-side tables (scaling q instead of the
        # [bq, Skv] scores saves two full-row f32 multiplies per grid step;
        # exact in f32 before the dtype cast)
        log2e = 1.4426950408889634  # exp2 score space (see kernel)
        rope = (rope[0] * (sm_scale * log2e),
                rope[1] * (sm_scale * log2e), rope[2], rope[3])
        kernel = functools.partial(_rowblock_packed_kernel, causal=causal,
                                   sm_scale=1.0, head_dim=D, fused_rope=True)
        cos_q, sin_q, cos_k, sin_k = (t.astype(q.dtype) for t in rope)
        in_specs += [
            pl.BlockSpec((block_q, lanes), lambda b, h, i: (i, h)),
            pl.BlockSpec((block_q, lanes), lambda b, h, i: (i, h)),
            pl.BlockSpec((Skv, lanes), lambda b, h, i: (0, h)),
            pl.BlockSpec((Skv, lanes), lambda b, h, i: (0, h)),
        ]
        args += [cos_q, sin_q, cos_k, sin_k]
    out = pl.pallas_call(
        kernel,
        grid=(B, Hq // hpb, Sq // block_q),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, lanes),
                               lambda b, h, i: (b, i, h)),
        out_shape=jax.ShapeDtypeStruct((B, Sq, Hq * D), q.dtype),
        interpret=interpret,
    )(*args)
    return out.reshape(B, Sq, Hq, D), None
