"""Paged decode attention (TPU Pallas, scalar-prefetched page table).

Walks the page table of the serving KV pool (inference/kv_pool.py) inside
the kernel: one grid cell = (slot, page), the DMA moves the page's
all-heads [page_size, Hkv*D] slab contiguously, and an online-softmax
accumulator folds pages in sequence — pages are read ONCE, never
materialized into a dense [B, max_ctx, Hkv*D] context copy (the gather
path's extra write+read of the live context per step). All query heads
ride one MXU pass per page via a block-diagonal query layout (head h's
vector in kv-head h//group's D-lane slice): Hkv x the minimal FLOPs, but
decode attention is DMA-bound and the passes are bf16-native.

Measured policy (v5e, two-point timing): the XLA gather path runs near
HBM bandwidth after the flat-pool layout change and WINS at short
contexts (360-ctx Llama-8B shapes: 11.82 vs 12.09 ms/step at B8); the
kernel's one-pass traffic is the asymptotic winner as ctx grows.
models/llama.py gates on pcfg.max_ctx (PROCYON_PAGED_KERNEL overrides).
An earlier per-(slot, head, page) variant DMA'd each head's 128-lane
strip separately — 64 strided 256 B bursts per page — and lost to the
gather everywhere at short contexts; the full-lane walk replaced it.

The reference's equivalent surface is flash-attn v1's contiguous KV-cache
decode (procyon/model/pmc_llama.py:209-255); paged layout is the
TPU-serving redesign (inference/kv_pool.py).
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel_fullpage(pt_ref, len_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                     m_ref, l_ref, acc_ref, *, page_size, n_pages_per_seq,
                     n_kv_heads, head_dim, sm_scale):
    """Full-lane page walk: one grid cell = (slot, page), the DMA moves the
    page's ALL-heads [page, Hkv*D] slab contiguously (256 KB at Llama-8B
    shape) instead of v1's per-head 128-lane strips (64 strided 256 B
    bursts per page — measured 16 ms/step of a 41 ms beam step at short
    contexts). All heads are folded in one MXU pass via a block-diagonal
    query (q head h occupies kv-head h//group's D-lane slice): 16x the
    minimal score FLOPs, but decode attention is DMA-bound and the MXU is
    idle. Accumulator stays in the block-diagonal lane layout [Hq, Hkv*D];
    the caller selects each head's own kv slice (exact zeros elsewhere)."""
    b = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # dead pages clamp to the last live page in the index map (DMA elided
    # by the repeating block index); their compute is skipped here
    @pl.when(j * page_size < len_ref[b])
    def _accumulate():
        # dots stay bf16-in/f32-accum: the block-diagonal form does
        # Hkv x the minimal FLOPs, affordable on native-rate MXU passes
        # but not on f32 (3-8x slower) passes
        q = q_ref[0]                                  # [Hq, Hkv*D] blockdiag
        k = k_ref[0]                                  # [page, Hkv*D]
        v = v_ref[0]

        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale  # [Hq, page]
        token_idx = j * page_size + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1)
        live = token_idx < len_ref[b]
        s = jnp.where(live, s, NEG_INF)

        m_prev = m_ref[...][:, :1]                    # [Hq, 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        safe_m = jnp.where(m_new <= NEG_INF * 0.5, 0.0, m_new)
        alpha = jnp.where(m_prev <= NEG_INF * 0.5, 0.0,
                          jnp.exp(m_prev - safe_m))
        p = jnp.where(live, jnp.exp(s - safe_m), 0.0)  # [Hq, page]
        l_new = alpha * l_ref[...][:, :1] + jnp.sum(p, axis=-1,
                                                    keepdims=True)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [Hq, Hkv*D]
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == n_pages_per_seq - 1)
    def _emit():
        l = l_ref[...][:, :1]
        dead = l == 0.0
        l_safe = jnp.where(dead, 1.0, l)
        o_ref[0] = (acc_ref[...] / l_safe).astype(o_ref.dtype)
        lse = jnp.where(dead, NEG_INF, m_ref[...][:, :1] + jnp.log(l_safe))
        lse_ref[0] = jnp.broadcast_to(lse, (lse_ref.shape[1], 128))


def _kernel_fullpage_q8(pt_ref, len_ref, q_ref, k_ref, v_ref, ks_ref,
                        vs_ref, o_ref, lse_ref, m_ref, l_ref, acc_ref, *,
                        page_size, n_pages_per_seq, n_kv_heads, head_dim,
                        sm_scale):
    """int8-KV page walk (kv_pool quantize_kv pools): pages hold s8 rows
    with per-(token, kv-head) f32 scales [page, Hkv]. The DMA moves HALF
    the page bytes of the bf16 kernel (64 KB + a 2 KB scale slab vs
    128 KB at Llama-8B shape). Scale algebra matches the gather path
    (llama._decode_attention_step): the K scale multiplies each head's
    score row (true score = q . (k_s8 * ks) = (q . k_s8) * ks because the
    block-diagonal query zeroes every other head's lanes and ks is
    constant across a head's D lanes); the V scale folds into the
    UNNORMALIZED probabilities before the PV dot while l accumulates the
    unscaled exp-sums — out = acc / l is exact. Per-head scale rows are
    selected from the [page, Hkv] slab by one tiny f32 MXU pass against
    an in-kernel iota-built head->kv-head one-hot (no transpose/gather of
    the 8-lane slab)."""
    b = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(j * page_size < len_ref[b])
    def _accumulate():
        q = q_ref[0]                                  # [Hq, Hkv*D] blockdiag
        k = k_ref[0].astype(q.dtype)                  # s8 -> bf16, exact
        v = v_ref[0].astype(q.dtype)
        Hq = q.shape[0]
        group = Hq // n_kv_heads
        hq_kv = jax.lax.broadcasted_iota(
            jnp.int32, (Hq, n_kv_heads), 0) // group
        kv_id = jax.lax.broadcasted_iota(
            jnp.int32, (Hq, n_kv_heads), 1)
        sel = (hq_kv == kv_id).astype(jnp.float32)    # [Hq, Hkv] one-hot

        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale  # [Hq, page]
        ks_sel = jax.lax.dot_general(
            sel, ks_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)       # [Hq, page]
        vs_sel = jax.lax.dot_general(
            sel, vs_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = s * ks_sel
        token_idx = j * page_size + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1)
        live = token_idx < len_ref[b]
        s = jnp.where(live, s, NEG_INF)

        m_prev = m_ref[...][:, :1]                    # [Hq, 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        safe_m = jnp.where(m_new <= NEG_INF * 0.5, 0.0, m_new)
        alpha = jnp.where(m_prev <= NEG_INF * 0.5, 0.0,
                          jnp.exp(m_prev - safe_m))
        p = jnp.where(live, jnp.exp(s - safe_m), 0.0)  # [Hq, page]
        l_new = alpha * l_ref[...][:, :1] + jnp.sum(p, axis=-1,
                                                    keepdims=True)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            (p * vs_sel).astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [Hq, Hkv*D]
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == n_pages_per_seq - 1)
    def _emit():
        l = l_ref[...][:, :1]
        dead = l == 0.0
        l_safe = jnp.where(dead, 1.0, l)
        o_ref[0] = (acc_ref[...] / l_safe).astype(o_ref.dtype)
        lse = jnp.where(dead, NEG_INF, m_ref[...][:, :1] + jnp.log(l_safe))
        lse_ref[0] = jnp.broadcast_to(lse, (lse_ref.shape[1], 128))


def paged_decode_attention_fullpage(q_bd, k_pool, v_pool, page_table,
                                    seq_lens, *, n_kv_heads, head_dim,
                                    k_scale_pool=None, v_scale_pool=None,
                                    sm_scale=None, interpret=False):
    """One-token attention over paged KV, full-lane page blocks.

    q_bd       [B, Hq, Hkv*D]  block-diagonal queries (head h's vector in
               kv-head h//group's D-lane slice, zeros elsewhere)
    k_pool     [n_pages, page_size, Hkv*D]  (flat layer-major pool; pass
               page_table pre-offset by layer * pages_per_layer)
    v_pool     same
    page_table [B, P] int32 pool page ids
    seq_lens   [B] int32 live tokens per slot
    k_scale_pool / v_scale_pool: [n_pages, page_size, Hkv] f32 for int8
               pools (kv_pool quantize_kv) — when given, k_pool/v_pool
               hold s8 rows and the q8 kernel applies the exact scale
               algebra in-walk (K scale on score rows, V scale folded
               into unnormalized probabilities).
    -> out [B, Hq, Hkv*D] (block-diagonal lanes; select head slices with
       the caller's sel matrix), lse [B, Hq]
    """
    B, Hq, kvd = q_bd.shape
    n_pages, page_size, kvd2 = k_pool.shape
    assert kvd == kvd2 and kvd == n_kv_heads * head_dim
    P = page_table.shape[1]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(head_dim)
    assert kvd % 128 == 0, "Hkv*D must be a lane multiple"
    quantized = k_scale_pool is not None

    kernel = functools.partial(
        _kernel_fullpage_q8 if quantized else _kernel_fullpage,
        page_size=page_size, n_pages_per_seq=P,
        n_kv_heads=n_kv_heads, head_dim=head_dim, sm_scale=sm_scale)

    def page_spec(width):
        return pl.BlockSpec((1, page_size, width),
                            lambda b, j, pt, ln, ps=page_size:
                            (pt[b, jnp.minimum(
                                j, jnp.maximum(ln[b] - 1, 0) // ps)],
                             0, 0))

    in_specs = [
        pl.BlockSpec((1, Hq, kvd), lambda b, j, pt, ln: (b, 0, 0)),
        page_spec(kvd),
        page_spec(kvd),
    ]
    operands = [page_table, seq_lens, q_bd, k_pool, v_pool]
    if quantized:
        in_specs += [page_spec(n_kv_heads), page_spec(n_kv_heads)]
        operands += [k_scale_pool, v_scale_pool]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, P),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, Hq, kvd), lambda b, j, pt, ln: (b, 0, 0)),
            pl.BlockSpec((1, Hq, 128), lambda b, j, pt, ln: (b, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((Hq, 128), jnp.float32),
            pltpu.VMEM((Hq, 128), jnp.float32),
            pltpu.VMEM((Hq, kvd), jnp.float32),
        ],
    )
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, Hq, kvd), q_bd.dtype),
            jax.ShapeDtypeStruct((B, Hq, 128), jnp.float32)],
        interpret=interpret,
    )(*operands)
    return out, lse[:, :, 0]
