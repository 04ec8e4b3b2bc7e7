"""Paged decode attention (TPU Pallas, scalar-prefetched page table).

Replaces gather_kv + dense one-token attention on the decode hot path
(models/llama.py paged_forward): instead of materializing each slot's
pages into a dense [B, max_ctx, Hkv*D] copy (one full HBM write + read of
the live context per step) and attending over it, the kernel walks the
page table directly — each grid step DMAs one pool page for one kv head
and folds it into an online-softmax accumulator. Decode attention HBM
traffic halves (pages are read once, never copied), and no dense context
buffer exists at all.

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


def _kernel(pt_ref, len_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
            m_ref, l_ref, acc_ref, *, page_size, n_pages_per_seq, group,
            head_dim, sm_scale):
    b = pl.program_id(0)
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # pages past the slot's live length are never DMA'd (the index map
    # clamps to the last live page, so the block index repeats and the
    # pipeline elides the copy); skip their compute entirely
    @pl.when(j * page_size < len_ref[b])
    def _accumulate():
        q = q_ref[0].astype(jnp.float32)              # [group, D]
        k = k_ref[0].astype(jnp.float32)              # [page, D]
        v = v_ref[0].astype(jnp.float32)

        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale  # [group, page]
        token_idx = j * page_size + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1)
        live = token_idx < len_ref[b]
        s = jnp.where(live, s, NEG_INF)

        m_prev = m_ref[...][:, :1]                    # [group, 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        # guard fully-masked prefixes: exp(NEG_INF - NEG_INF) would be 1
        safe_m = jnp.where(m_new <= NEG_INF * 0.5, 0.0, m_new)
        alpha = jnp.where(m_prev <= NEG_INF * 0.5, 0.0,
                          jnp.exp(m_prev - safe_m))
        p = jnp.where(live, jnp.exp(s - safe_m), 0.0)  # [group, page]
        l_new = alpha * l_ref[...][:, :1] + jnp.sum(p, axis=-1,
                                                    keepdims=True)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            p, v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == n_pages_per_seq - 1)
    def _emit():
        l = l_ref[...][:, :1]
        dead = l == 0.0
        l_safe = jnp.where(dead, 1.0, l)
        o_ref[0] = (acc_ref[...] / l_safe).astype(o_ref.dtype)
        # log-sum-exp per q head (for merging the in-flight token's own
        # k/v outside the kernel), lane-broadcast over 128
        lse = jnp.where(dead, NEG_INF, m_ref[...][:, :1] + jnp.log(l_safe))
        lse_ref[0] = jnp.broadcast_to(lse, (group, 128))


def paged_decode_attention(q, k_pool, v_pool, page_table, seq_lens, *,
                           n_kv_heads, head_dim, sm_scale=None,
                           interpret=False):
    """One-token attention over paged KV for every slot.

    q          [B, Hq*D]  (flat lane layout, one decode token per slot)
    k_pool     [n_pages, page_size, Hkv*D]  (one layer's pool)
    v_pool     same
    page_table [B, P] int32 pool page ids (logical page j of slot b)
    seq_lens   [B] int32 live tokens per slot
    -> [B, Hq*D]
    """
    B, qd = q.shape
    n_pages, page_size, kvd = k_pool.shape
    Hq = qd // head_dim
    group = Hq // n_kv_heads
    P = page_table.shape[1]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(head_dim)
    assert head_dim % 128 == 0, "head_dim must be a lane multiple"

    kernel = functools.partial(
        _kernel, page_size=page_size, n_pages_per_seq=P, group=group,
        head_dim=head_dim, sm_scale=sm_scale)

    # q/out laid out [B*Hkv, group, D]: block dims equal the trailing
    # array dims (Mosaic requires the last two block dims be (8,128)-
    # divisible OR equal to the array dims — group is small)
    q3 = q.reshape(B * n_kv_heads, group, head_dim)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, n_kv_heads, P),
        in_specs=[
            pl.BlockSpec((1, group, head_dim),
                         lambda b, h, j, pt, ln, H=n_kv_heads:
                         (b * H + h, 0, 0)),
            # k/v: the page the table names, one head's lane slice; dead
            # pages (past the live length) clamp to the last live page so
            # consecutive identical block indices elide the DMA
            pl.BlockSpec((1, page_size, head_dim),
                         lambda b, h, j, pt, ln, ps=page_size:
                         (pt[b, jnp.minimum(
                             j, jnp.maximum(ln[b] - 1, 0) // ps)], 0, h)),
            pl.BlockSpec((1, page_size, head_dim),
                         lambda b, h, j, pt, ln, ps=page_size:
                         (pt[b, jnp.minimum(
                             j, jnp.maximum(ln[b] - 1, 0) // ps)], 0, h)),
        ],
        out_specs=[
            pl.BlockSpec((1, group, head_dim),
                         lambda b, h, j, pt, ln, H=n_kv_heads:
                         (b * H + h, 0, 0)),
            pl.BlockSpec((1, group, 128),
                         lambda b, h, j, pt, ln, H=n_kv_heads:
                         (b * H + h, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((group, 128), jnp.float32),
            pltpu.VMEM((group, 128), jnp.float32),
            pltpu.VMEM((group, head_dim), jnp.float32),
        ],
    )
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B * n_kv_heads, group, head_dim),
                                 q.dtype),
            jax.ShapeDtypeStruct((B * n_kv_heads, group, 128),
                                 jnp.float32)],
        interpret=interpret,
    )(page_table, seq_lens, q3, k_pool, v_pool)
    return out.reshape(B, qd), lse[:, :, 0].reshape(B, Hq)
