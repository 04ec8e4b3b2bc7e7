"""Llama-2 / Llama-3 decoder, TPU-first.

Functional equivalent of the reference's LlamaPostTokenization wrapper over HF
Llama (reference: procyon/model/pmc_llama.py:415-596): takes either token ids
or pre-built input embeddings (the soft-token fusion path), returns hidden
states and LM logits, and supports an incremental KV cache for decode.

TPU-native design choices (not present in the reference):
  * layer parameters are stacked along a leading [L, ...] axis and the block
    is applied with `lax.scan` — one compiled block regardless of depth,
    FSDP-shardable along any named axis, rematerialization-friendly.
  * attention runs through the shared Pallas flash kernel (ops/flash_attention)
    with segment-id masking instead of additive attention masks.
  * weights live in bf16; all normalization statistics in f32.

Weight layout matches HF `LlamaForCausalLM` module names closely enough for a
mechanical converter (models/checkpoint_io.py).
"""

import dataclasses
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp

from procyon_tpu.models import lora as lora_mod
from procyon_tpu.ops import quant
from procyon_tpu.ops.flash_attention import flash_attention
from procyon_tpu.ops.norms import rms_norm
from procyon_tpu.ops.rotary import (apply_rotary_flat,
                                    apply_rotary_flat_decode,
                                    flat_rotary_tables, rope_frequencies)


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    dim: int = 4096
    n_layers: int = 32
    n_heads: int = 32
    n_kv_heads: int = 32
    intermediate: int = 11008
    norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    max_seq_len: int = 2048
    dtype: Any = jnp.bfloat16
    # int8 matmul mode for quantized params: "dequant" = weight-only bf16
    # dot (right for bandwidth-bound decode); "w8a8" = s8xs8 MXU dot
    # (2x compute for the prefill/teacher-forcing path). Decode steps
    # (S == 1) always use weight-only regardless.
    quant_mode: str = "dequant"
    # attention backend override for tests ("ref" forces the jnp path)
    attn_backend: Optional[str] = None
    remat: bool = True
    # task-banked LoRA on the attention q/v projections (the peft default
    # targets; reference wires MoLoRA there, pmc_llama.py:521-536)
    lora: Optional[lora_mod.LoRAConfig] = None

    @property
    def head_dim(self):
        return self.dim // self.n_heads


def llama2_7b(**kw) -> LlamaConfig:
    return LlamaConfig(**kw)


def llama3_8b(**kw) -> LlamaConfig:
    base = dict(vocab_size=128256, dim=4096, n_layers=32, n_heads=32,
                n_kv_heads=8, intermediate=14336, rope_theta=500000.0,
                max_seq_len=8192)
    base.update(kw)
    return LlamaConfig(**base)


def tiny_config(**kw) -> LlamaConfig:
    """2-layer shrink, the analogue of the reference's text_encoder_debug
    switch (model_unified.py:160-164)."""
    base = dict(vocab_size=256, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                intermediate=128, max_seq_len=128, dtype=jnp.float32)
    base.update(kw)
    return LlamaConfig(**base)


def init_params(key, cfg: LlamaConfig):
    """Random-init params. Layer params are stacked [L, ...]."""
    k_embed, k_layers, k_out = jax.random.split(key, 3)
    hd = cfg.head_dim
    L = cfg.n_layers

    def dense(key, shape, scale=None):
        if scale is None:
            scale = 1.0 / (shape[0] ** 0.5)
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(
            cfg.dtype)

    ks = jax.random.split(k_layers, 7)
    layers = {
        "attn": {
            "wq": dense(ks[0], (L, cfg.dim, cfg.n_heads * hd)),
            "wk": dense(ks[1], (L, cfg.dim, cfg.n_kv_heads * hd)),
            "wv": dense(ks[2], (L, cfg.dim, cfg.n_kv_heads * hd)),
            "wo": dense(ks[3], (L, cfg.n_heads * hd, cfg.dim)),
        },
        "mlp": {
            "w_gate": dense(ks[4], (L, cfg.dim, cfg.intermediate)),
            "w_up": dense(ks[5], (L, cfg.dim, cfg.intermediate)),
            "w_down": dense(ks[6], (L, cfg.intermediate, cfg.dim)),
        },
        "attn_norm": jnp.ones((L, cfg.dim), cfg.dtype),
        "mlp_norm": jnp.ones((L, cfg.dim), cfg.dtype),
    }
    if cfg.lora is not None:
        lkeys = jax.random.split(jax.random.fold_in(key, 7), 2 * L)
        def lora_bank(ks, out_dim):
            ps = [lora_mod.init_params(k, cfg.lora, cfg.dim, out_dim)
                  for k in ks]
            return {"A": jnp.stack([p["A"] for p in ps]),
                    "B": jnp.stack([p["B"] for p in ps])}
        layers["lora_wq"] = lora_bank(lkeys[:L], cfg.n_heads * hd)
        layers["lora_wv"] = lora_bank(lkeys[L:], cfg.n_kv_heads * hd)
    return {
        "embed": dense(k_embed, (cfg.vocab_size, cfg.dim), scale=0.02),
        "layers": layers,
        "final_norm": jnp.ones((cfg.dim,), cfg.dtype),
        "lm_head": dense(k_out, (cfg.dim, cfg.vocab_size)),
    }


def init_kv_cache(cfg: LlamaConfig, batch: int, max_len: Optional[int] = None):
    """Contiguous ring-style KV cache [L, B, Smax, Hkv, D] + filled length."""
    S = max_len or cfg.max_seq_len
    shape = (cfg.n_layers, batch, S, cfg.n_kv_heads, cfg.head_dim)
    return {
        "k": jnp.zeros(shape, cfg.dtype),
        "v": jnp.zeros(shape, cfg.dtype),
        # per-example segment ids of cached positions (0 = empty)
        "seg": jnp.zeros((batch, S), jnp.int32),
        # RoPE positions of cached entries (for positional causal masking)
        "pos": jnp.zeros((batch, S), jnp.int32),
        "length": jnp.zeros((), jnp.int32),
    }


_mm = quant.mm


def _decode_attention_step(q, cache_k, cache_v, seg_ids, cache_seg,
                           positions, cache_pos, k_scale=None,
                           v_scale=None):
    """Short-block attention over the cache. q [B,T,Hq,D] for small T
    (T=1 decode steps; T=K+1 speculative verify blocks); cache
    [B,S,Hkv,D].

    With k_scale/v_scale [B,S,Hkv] the cache holds int8 rows
    (kv_pool quantize_kv): the K scale factors OUT of each head's score
    row (the block-diagonal query zeroes every other head's lanes, and
    the scale is constant across a head's D lanes), and the V scale
    folds INTO the probabilities before the PV dot — the dot outputs for
    OTHER kv-heads' lane groups are mis-scaled but discarded by the
    final head-slice selection. Exact algebra; the int8 convert fuses
    into the dots like the weight-dequant path.

    The cache is consumed in its NATURAL flat-lane layout [B,S,Hkv*D]
    (a free reshape of a contiguous cache or of gathered KV pages).
    Scores use a block-diagonal query — head h's vector occupies kv-head
    h//group's D-lane slice, zeros elsewhere — so the contraction runs
    over all Hkv*D lanes per head. That is Hkv× the minimal score FLOPs,
    but single-token decode is bandwidth-bound (the MXU is idle) and it
    stops XLA from inserting head-major relayout copies of the whole
    gathered cache (profiled: 1.9 ms of a 13.8 ms Llama-8B-class paged
    step were [B,S,Hkv,D] {3,2,1,0}→{3,1,2,0} copies feeding the
    head-batched einsum). Zero lanes contribute exact fp zeros, so the
    math is unchanged up to summation order.

    Masking matches the flash kernel: same segment, nonzero, and cached
    position <= query position.

    Numerics convention: softmax probabilities are cast to the cache
    dtype (bf16 on serving paths) before the PV dot, matching the
    flash/paged kernels' bf16 MXU passes; scores and the PV accumulation
    stay f32 via preferred_element_type. This intentionally applies to
    the dense decode path too (parity-tested)."""
    import math

    B, T, Hq, D = q.shape
    _, S, Hkv, _ = cache_k.shape
    group = Hq // Hkv
    # T > 1 (speculative verify blocks): every query position gets its
    # own block-diagonal row — the flattened [B, T*Hq, S] contraction
    # rides the same natural-layout cache consumption as T == 1, with a
    # per-position causal mask. T == 1 lowers to the original program.
    qh = q.reshape(B, T, Hkv, group, D)
    eye = jnp.eye(Hkv, dtype=qh.dtype)
    q_bd = jnp.einsum("btkgd,kj->btkgjd", qh, eye).reshape(
        B, T * Hq, Hkv * D)
    sel = jnp.repeat(jnp.eye(Hkv, dtype=jnp.float32), group, axis=0)
    sel_t = jnp.tile(sel, (T, 1))                            # [T*Hq, Hkv]
    kf = cache_k.reshape(B, S, Hkv * D).astype(q_bd.dtype)
    s = jax.lax.dot_general(
        q_bd, kf, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) / math.sqrt(D)   # [B,T*Hq,S]
    if k_scale is not None:
        s = s * jnp.einsum("bsk,hk->bhs", k_scale, sel_t)
    allowed = (cache_seg[:, None, :] == seg_ids[:, :, None]) & \
        (cache_seg[:, None, :] > 0) & \
        (cache_pos[:, None, :] <= positions[:, :, None])     # [B, T, S]
    allowed = jnp.broadcast_to(allowed[:, :, None, :],
                               (B, T, Hq, S)).reshape(B, T * Hq, S)
    s = jnp.where(allowed, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    if v_scale is not None:
        p = p * jnp.einsum("bsk,hk->bhs", v_scale, sel_t)
    vf = cache_v.reshape(B, S, Hkv * D).astype(q_bd.dtype)
    out = jax.lax.dot_general(
        p.astype(vf.dtype), vf, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                # [B,T*Hq,Hkv*D]
    # pick each head's own kv-head slice back out (tiny contraction)
    out = jnp.einsum("bhkd,hk->bhd", out.reshape(B, T * Hq, Hkv, D),
                     sel_t.astype(out.dtype))
    return out.reshape(B, T, Hq, D).astype(q.dtype)


def _cascade_decode_attention(q, gsz, kp, vp, pfx_valid, kt, vt,
                              tail_valid, k_scale_p=None, v_scale_p=None,
                              k_scale_t=None, v_scale_t=None):
    """Grouped-prefix (cascade) decode attention for beam pools.

    All `gsz` consecutive slots of a group (a prompt's beams) share the
    prompt's immutable full pages, but the flat per-slot gather reads
    them gsz times: at the flagship caption shape (80 slots x 7 pages)
    that is 560 page reads/layer where only ~128 are distinct — profiled
    3.7 ms/step of gather traffic on a 24 ms step. This splits decode
    attention into two segments and merges their softmax statistics:

      * PREFIX: the group's shared prompt pages, gathered ONCE per group
        (kp/vp [G, Sp, Hkv*D]); the group's gsz queries ride one
        block-diagonal [G, gsz*Hq, Hkv*D] score block — exactly the
        T=gsz lowering of _decode_attention_step, so the gathered pages
        stay in natural flat-lane layout.
      * TAIL: each slot's private pages from its first generation index
        on, plus the in-flight token (kt/vt [B, St, Hkv*D]) — the only
        per-slot traffic, O(generated) instead of O(context).

    Merge is the standard flash-decoding log-sum-exp combine: per
    segment we keep (m, l, acc) = (row max, sum of exp(s - m), their
    V-weighted sum) and combine in f32. A fully-masked prefix (g0 == 0)
    lands m_p = -1e30 so its merge weight underflows to exact 0.

    Same numerics convention as _decode_attention_step: scores and
    accumulation f32, unnormalized probabilities cast to the cache
    dtype for the PV dot; the int8-KV scale algebra (K scale on score
    rows, V scale folded into probabilities pre-normalization, both
    exact under the final head-slice selection) carries over unchanged
    because the merge divides by the UNSCALED exp-sum l.

    Mathematically identical to single-pass attention over the
    concatenated context (CPU-f32 token parity tested); summation order
    differs, so on-chip bf16 the usual same-program-comparison caveat
    applies (CLAUDE.md)."""
    import math

    B, T, Hq, D = q.shape
    assert T == 1
    G = B // gsz
    Hkv = kp.shape[-1] // D
    group = Hq // Hkv
    dt = q.dtype

    # block-diagonal queries for the whole group as one T=gsz block
    qh = q.reshape(G, gsz, Hkv, group, D)
    eye = jnp.eye(Hkv, dtype=dt)
    q_bd = jnp.einsum("btkgd,kj->btkgjd", qh, eye).reshape(
        G, gsz * Hq, Hkv * D)
    sel = jnp.repeat(jnp.eye(Hkv, dtype=jnp.float32), group, axis=0)
    sel_p = jnp.tile(sel, (gsz, 1))                      # [gsz*Hq, Hkv]

    def stats(q_bd_, kf, vf, valid, ks, vs, sel_):
        s = jax.lax.dot_general(
            q_bd_, kf.astype(dt), (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) / math.sqrt(D)
        if ks is not None:
            s = s * jnp.einsum("bsk,hk->bhs", ks, sel_)
        s = jnp.where(valid[:, None, :], s, -1e30)
        m = jnp.max(s, axis=-1)                          # [b, h]
        e = jnp.exp(s - m[..., None])
        e = jnp.where(valid[:, None, :], e, 0.0)
        l = e.sum(-1)
        if vs is not None:
            e = e * jnp.einsum("bsk,hk->bhs", vs, sel_)
        acc = jax.lax.dot_general(
            e.astype(dt), vf.astype(dt), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # [b, h, Hkv*D]
        return m, l, acc

    m_p, l_p, acc_p = stats(q_bd, kp, vp, pfx_valid,
                            k_scale_p, v_scale_p, sel_p)
    m_p = m_p.reshape(B, Hq)
    l_p = l_p.reshape(B, Hq)
    acc_p = acc_p.reshape(B, Hq, Hkv * D)

    q_bd_t = q_bd.reshape(B, Hq, Hkv * D)
    m_t, l_t, acc_t = stats(q_bd_t, kt, vt, tail_valid,
                            k_scale_t, v_scale_t, sel)

    m = jnp.maximum(m_p, m_t)
    a = jnp.exp(m_p - m)
    b = jnp.exp(m_t - m)
    l = a * l_p + b * l_t
    out = (a[..., None] * acc_p + b[..., None] * acc_t) / l[..., None]
    out = jnp.einsum("bhkd,hk->bhd", out.reshape(B, Hq, Hkv, D), sel)
    return out.reshape(B, 1, Hq, D).astype(dt)


def _paged_attention_with_self(q, k_new, v_new, k_pool_l, v_pool_l, table,
                               lens, cfg: LlamaConfig,
                               k_scale_pool=None, v_scale_pool=None):
    """Decode attention = paged kernel over the cached context, merged
    with the in-flight token's own k/v by log-sum-exp (the kernel returns
    per-head lse; the self term is a rank-1 softmax correction).

    q [B, Hq, D]; k_new/v_new [B, Hkv, D] (ALREADY dequantized on int8
    pools — the caller quantize-roundtrips the in-flight token so its
    self-attention sees the same values future steps read from the
    pool); pools [n_pages, page, Hkv*D]. k_scale_pool/v_scale_pool
    [n_pages, page, Hkv] f32 select the int8 page-walk kernel.
    Returns [B, Hq, D]."""
    import math

    from procyon_tpu.ops.paged_attention import (
        paged_decode_attention_fullpage)

    B, Hq, D = q.shape
    Hkv = k_new.shape[1]
    group = Hq // Hkv
    # block-diagonal queries (see _decode_attention_step): head h's
    # vector occupies kv-head h//group's D-lane slice, so the kernel's
    # page DMAs stay full-lane contiguous and one MXU pass serves all
    # heads per page
    qh = q.reshape(B, Hkv, group, D)
    eye = jnp.eye(Hkv, dtype=qh.dtype)
    q_bd = jnp.einsum("bkgd,kj->bkgjd", qh, eye).reshape(B, Hq, Hkv * D)
    out_bd, lse = paged_decode_attention_fullpage(
        q_bd, k_pool_l, v_pool_l, table, lens,
        n_kv_heads=Hkv, head_dim=D,
        k_scale_pool=k_scale_pool, v_scale_pool=v_scale_pool,
        interpret=cfg.attn_backend == "interpret")
    sel = jnp.repeat(jnp.eye(Hkv, dtype=jnp.float32), group, axis=0)
    out_ctx = jnp.einsum("bhkd,hk->bhd",
                         out_bd.reshape(B, Hq, Hkv, D).astype(jnp.float32),
                         sel)
    qg = qh.astype(jnp.float32)
    s_self = jnp.einsum("bhgd,bhd->bhg", qg,
                        k_new.astype(jnp.float32)) / math.sqrt(D)
    s_self = s_self.reshape(B, Hq)
    m = jnp.maximum(lse, s_self)
    w_ctx = jnp.exp(lse - m)
    w_self = jnp.exp(s_self - m)
    v_self = jnp.repeat(v_new.astype(jnp.float32), group, axis=1)  # [B,Hq,D]
    out = (w_ctx[..., None] * out_ctx
           + w_self[..., None] * v_self) / (w_ctx + w_self)[..., None]
    return out.astype(q.dtype)


def _block(x, lp, seg_ids, positions, rot, cfg: LlamaConfig,
           cache_k=None, cache_v=None, cache_seg=None, cache_pos=None,
           cache_len=None, lora_expert=0):
    """One decoder block. x [B,S,dim]. Returns (y, new_k, new_v)."""
    B, S, _ = x.shape
    hd = cfg.head_dim
    cos_q, sin_q, perm_q, cos_k, sin_k, perm_k = rot

    h = rms_norm(x, lp["attn_norm"], eps=cfg.norm_eps)
    mode = cfg.quant_mode if S > 1 else "dequant"
    q_flat = _mm(h, lp["attn"]["wq"], mode)
    v_flat = _mm(h, lp["attn"]["wv"], mode)
    if cfg.lora is not None:
        q_flat = lora_mod.apply(lp["lora_wq"], cfg.lora, h, q_flat,
                                expert_idx=lora_expert)
        v_flat = lora_mod.apply(lp["lora_wv"], cfg.lora, h, v_flat,
                                expert_idx=lora_expert)
    # rotate_half rotary on flat projection outputs (ops/rotary.py);
    # single-token decode takes the slice/concat form (the perm gather
    # lowers to transposed copies at [B, 1, H*D] — ~0.4 ms/step at 6.6B)
    if S == 1:
        q = apply_rotary_flat_decode(q_flat, cos_q, sin_q,
                                     hd).reshape(B, S, cfg.n_heads, hd)
        k = apply_rotary_flat_decode(_mm(h, lp["attn"]["wk"], mode),
                                     cos_k, sin_k,
                                     hd).reshape(B, S, cfg.n_kv_heads, hd)
    else:
        q = apply_rotary_flat(q_flat, cos_q, sin_q,
                              perm_q).reshape(B, S, cfg.n_heads, hd)
        k = apply_rotary_flat(_mm(h, lp["attn"]["wk"], mode), cos_k, sin_k,
                              perm_k).reshape(B, S, cfg.n_kv_heads, hd)
    v = v_flat.reshape(B, S, cfg.n_kv_heads, hd)

    if cache_k is not None:
        # decode: write new k/v at [cache_len, cache_len+S), attend over cache
        upd = jax.lax.dynamic_update_slice
        cache_k = upd(cache_k, k.astype(cache_k.dtype), (0, cache_len, 0, 0))
        cache_v = upd(cache_v, v.astype(cache_v.dtype), (0, cache_len, 0, 0))
        if S == 1:
            # single-token decode: a bandwidth-bound matvec over the cache —
            # plain jnp beats the pallas kernel (which pads the 1-token
            # query to a 128 tile and adds a custom-call per layer)
            attn = _decode_attention_step(
                q, cache_k, cache_v, seg_ids, cache_seg, positions,
                cache_pos)
        else:
            attn = flash_attention(
                q, cache_k, cache_v, seg_ids, cache_seg,
                causal=True, q_positions=positions, kv_positions=cache_pos,
                backend=cfg.attn_backend,
            )
        new_kv = (cache_k, cache_v)
    else:
        attn = flash_attention(q, k, v, seg_ids, seg_ids, causal=True,
                               backend=cfg.attn_backend)
        new_kv = (k, v)
    attn = attn.reshape(B, S, cfg.n_heads * hd).astype(x.dtype)
    x = x + _mm(attn, lp["attn"]["wo"], mode)

    h = rms_norm(x, lp["mlp_norm"], eps=cfg.norm_eps)
    gated = jax.nn.silu(_mm(h, lp["mlp"]["w_gate"], mode)) * \
        _mm(h, lp["mlp"]["w_up"], mode)
    x = x + _mm(gated, lp["mlp"]["w_down"], mode)
    return x, new_kv


def forward(params, cfg: LlamaConfig, *, input_embeds=None, tokens=None,
            seg_ids=None, positions=None, kv_cache=None, lora_expert=0):
    """Run the decoder stack.

    input_embeds [B,S,dim] (fusion path) or tokens [B,S]. seg_ids [B,S]
    (0 = pad). positions [B,S] absolute positions for RoPE.

    Returns dict with "hidden" [B,S,dim], "logits" [B,S,vocab], and
    "kv_cache" (updated) when a cache was passed.
    """
    if input_embeds is None:
        input_embeds = params["embed"][tokens].astype(cfg.dtype)
    x = input_embeds.astype(cfg.dtype)
    B, S, _ = x.shape
    if seg_ids is None:
        seg_ids = jnp.ones((B, S), jnp.int32)
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))

    cos_f, sin_f, perm_q = flat_rotary_tables(
        cfg.head_dim, cfg.n_heads, cfg.max_seq_len, cfg.rope_theta)
    if cfg.n_kv_heads == cfg.n_heads:
        cos_fk, sin_fk, perm_k = cos_f, sin_f, perm_q
    else:
        cos_fk, sin_fk, perm_k = flat_rotary_tables(
            cfg.head_dim, cfg.n_kv_heads, cfg.max_seq_len, cfg.rope_theta)
    rot = (cos_f[positions].astype(cfg.dtype),
           sin_f[positions].astype(cfg.dtype), perm_q,
           cos_fk[positions].astype(cfg.dtype),
           sin_fk[positions].astype(cfg.dtype), perm_k)

    if kv_cache is None:
        def scan_body(x, lp):
            y, _ = _block(x, lp, seg_ids, positions, rot, cfg,
                          lora_expert=lora_expert)
            return y, None

        body = scan_body
        if cfg.remat:
            body = jax.checkpoint(scan_body)
        x, _ = jax.lax.scan(body, x, params["layers"])
        new_cache = None
    else:
        cache_len = kv_cache["length"]
        # cached-position segment ids: mark the S new positions with their
        # (query) segment ids so tokens attend to themselves and the prefix.
        cache_seg = jax.lax.dynamic_update_slice(
            kv_cache["seg"], seg_ids, (0, cache_len))
        cache_pos = jax.lax.dynamic_update_slice(
            kv_cache["pos"], positions, (0, cache_len))

        def scan_body(x, inp):
            lp, ck, cv = inp
            y, (nk, nv) = _block(x, lp, seg_ids, positions, rot, cfg,
                                 cache_k=ck, cache_v=cv, cache_seg=cache_seg,
                                 cache_pos=cache_pos, cache_len=cache_len,
                                 lora_expert=lora_expert)
            return y, (nk, nv)

        x, (nk, nv) = jax.lax.scan(
            scan_body, x, (params["layers"], kv_cache["k"], kv_cache["v"]))
        new_cache = {"k": nk, "v": nv, "seg": cache_seg, "pos": cache_pos,
                     "length": cache_len + S}

    x = rms_norm(x, params["final_norm"], eps=cfg.norm_eps)
    logits = _mm(x, params["lm_head"]).astype(jnp.float32)
    out = {"hidden": x, "logits": logits}
    if new_cache is not None:
        out["kv_cache"] = new_cache
    return out


def quantize_params(params, cfg: LlamaConfig, *, bits: int = 8,
                    group: int = 128):
    """Weight-only quantization of the decoder (ops/quant.py). LoRA banks,
    norms, and the embedding table stay in the original dtype.

    bits=8: per-channel int8 (half the bf16 bytes); bits=4: group-wise
    packed int4 (quarter — the NF4-equivalent, SURVEY.md §2.3 item 4,
    fitting 8B + KV on one 16 GB chip)."""
    out = dict(params)
    if bits == 4:
        out["layers"] = quant.quantize_tree4(params["layers"], group=group)
        out["lm_head"] = quant.quantize4(params["lm_head"], group=group)
    else:
        out["layers"] = quant.quantize_tree(params["layers"])
        out["lm_head"] = quant.quantize(params["lm_head"])
    return out


# ---------------------------------------------------------------------------
# Paged-KV serving path (inference/kv_pool.py): decode/prefill over a shared
# page pool with continuous batching. Gather the live context ONCE before
# the layer scan, emit each layer's new K/V as scan outputs, write them back
# with ONE scatter after — so per-step HBM traffic is proportional to the
# live context, and the step jits once for a fixed slot count.
# ---------------------------------------------------------------------------


def _paged_rot_tables(cfg: LlamaConfig, positions):
    cos_f, sin_f, perm_q = flat_rotary_tables(
        cfg.head_dim, cfg.n_heads, cfg.max_seq_len, cfg.rope_theta)
    if cfg.n_kv_heads == cfg.n_heads:
        cos_fk, sin_fk, perm_k = cos_f, sin_f, perm_q
    else:
        cos_fk, sin_fk, perm_k = flat_rotary_tables(
            cfg.head_dim, cfg.n_kv_heads, cfg.max_seq_len, cfg.rope_theta)
    return (cos_f[positions].astype(cfg.dtype),
            sin_f[positions].astype(cfg.dtype), perm_q,
            cos_fk[positions].astype(cfg.dtype),
            sin_fk[positions].astype(cfg.dtype), perm_k)


# widest token block routed to the block-diagonal short-block attention
# (and, on quantized pools, to the exact scale-algebra path) instead of
# the flash kernel; speculative verify blocks are K+1 <= 16 in practice.
# Override for probes: PROCYON_SHORT_BLOCK_T=1 restores the r3 behavior.
_SHORT_BLOCK_T = int(os.environ.get("PROCYON_SHORT_BLOCK_T", "16"))


def paged_forward(params, cfg: LlamaConfig, pool, pcfg, slot_ids, *,
                  tokens=None, input_embeds=None, seg_ids=None,
                  lora_expert=0, share_gsz: int = 0,
                  share_prefix_pages: int = 0, share_tail_pages: int = 0,
                  share_g0=None):
    """Forward T tokens per slot against the paged pool, then append their
    K/V. T=1 is the decode step; T>1 is (chunked) prefill. Returns
    (logits [B,T,vocab], new_pool).

    `lora_expert` is a scalar (one adapter for the whole batch) OR a [B]
    int array (per-SLOT adapter: multi-tenant task-LoRA serving via
    lora.apply_routed's exact one-hot mixing).

    share_gsz > 1 (with share_prefix_pages/share_tail_pages static and
    share_g0 a [B] per-slot first-generation-page index) enables the
    grouped-prefix CASCADE decode path for beam pools: groups of
    share_gsz consecutive slots share their leading share_g0 page-table
    entries (immutable prompt pages), so those pages are gathered once
    per GROUP and only the tail (share_tail_pages from each slot's g0)
    is gathered per slot — see _cascade_decode_attention. T == 1 only."""
    from procyon_tpu.inference import kv_pool

    if input_embeds is None:
        input_embeds = params["embed"][tokens].astype(cfg.dtype)
    x = input_embeds.astype(cfg.dtype)
    B, T, _ = x.shape
    expert_oh = None
    if (cfg.lora is not None and hasattr(lora_expert, "ndim")
            and getattr(lora_expert, "ndim", 0) == 1):
        expert_oh = jax.nn.one_hot(lora_expert, cfg.lora.num_experts,
                                   dtype=cfg.dtype)               # [B, E]
    hd = cfg.head_dim
    start = pool["seq_len"][slot_ids]                       # [B]
    positions = start[:, None] + jnp.arange(T)[None, :]     # [B, T]
    if seg_ids is None:
        seg_ids = jnp.ones((B, T), jnp.int32)
    rot = _paged_rot_tables(cfg, positions)
    cos_q, sin_q, perm_q, cos_k, sin_k, perm_k = rot

    # one-token decode walks the page table inside a Pallas kernel
    # (ops/paged_attention.py fullpage variant): each page is DMA'd ONCE
    # as a contiguous all-heads [page, Hkv*D] slab and never copied into
    # a dense context buffer — half the HBM traffic of the gather path.
    # Chunked prefill (T > 1) and the reference CPU backend keep the
    # gather + flash path. At SHORT contexts the gather path wins
    # slightly (measured at 360-ctx 6.6B shapes: gather 11.82 vs kernel
    # 12.09 ms/step at B8 — the flat-pool XLA gather runs near HBM
    # bandwidth and the kernel's per-cell latency isn't amortized over
    # few pages); at 2048-ctx they tie (14.31 vs 14.25 at B4) and the
    # kernel's one-pass traffic (no dense-context write+read) is the
    # asymptotic winner beyond, so long-context pools take the kernel.
    # bench/probe override ONLY (read at TRACE time like
    # PROCYON_INT4_IMPL: it bakes into the compiled program, so flipping
    # it in a live process changes nothing until a fresh trace —
    # production selection stays on the measured max_ctx heuristic)
    _kern_env = os.environ.get("PROCYON_PAGED_KERNEL", "auto")
    cascade = (T == 1 and share_gsz > 1 and share_prefix_pages > 0
               and share_g0 is not None)
    # int8 (quantize_kv) pools have a q8 kernel variant (ops/
    # paged_attention._kernel_fullpage_q8: half the page bytes per walk
    # + the exact in-walk scale algebra) but it measured a LOSS against
    # the s8 gather at BOTH probe shapes (verify_paged_tpu arm 1b,
    # 0.9B B8 in-session A/Bs: 512-ctx 3.01 vs 2.88 ms/step, 2048-ctx
    # 5.85 vs 4.90) — the s8 gather already halves its traffic and the
    # kernel's per-page 2 KB scale-slab DMAs + s8->bf16 conversion break
    # even at best — so quantized pools default to the gather path;
    # PROCYON_PAGED_KERNEL=1 (or the interpret test backend) engages the
    # q8 kernel anyway.
    q8_kernel_ok = (not pcfg.quantize_kv
                    or cfg.attn_backend == "interpret"
                    or _kern_env == "1")
    use_paged_kernel = (T == 1 and cfg.attn_backend != "ref"
                        and not cascade and q8_kernel_ok
                        and (cfg.n_kv_heads * hd) % 128 == 0
                        and (pcfg.max_ctx >= 512
                             or cfg.attn_backend == "interpret"
                             or _kern_env == "1")
                        and _kern_env != "0")
    # BOTH paths gather per layer INSIDE the scan body. The gather path
    # used to pre-gather a dense [L, B, ctx, KD] KV for every layer at
    # once — at 34 layers x 40 slots x 192 ctx that is a 535 MB buffer
    # per side, and XLA then paid a full relayout copy of each (2 x
    # 1.3 ms/step profiled) plus the build loops. The pool's layer axis
    # is flattened into the page axis (kv_pool layout note), so each
    # layer is ONE gather with offset page indices — scanning the pool
    # as xs would instead dynamic-slice a full 12.8 MB layer slab per
    # layer before gathering 48 pages from it (profiled 1.2 ms/step).
    table = pool["page_table"][slot_ids]                    # [B, P]
    lens = pool["seq_len"][slot_ids]
    pool_k, pool_v = pool["k"], pool["v"]
    pool_ks = pool.get("k_scale")
    pool_vs = pool.get("v_scale")
    layer_ctx = (params["layers"],
                 jnp.arange(cfg.n_layers, dtype=jnp.int32) * pcfg.n_pages)
    if cascade:
        # layer-independent cascade indices/masks (see the share_gsz
        # docstring note): the prefix gather width and tail width are
        # STATIC (share_prefix_pages/share_tail_pages); validity masks
        # carry the per-row raggedness. A group = share_gsz consecutive
        # slots; its prefix pages are read from slot 0's table (all
        # group slots hold identical entries below g0 — immutable
        # prompt pages, never touched by the beam COW).
        P_ = pcfg.page_size
        n_groups = B // share_gsz
        Sp = share_prefix_pages * P_
        g0_row = share_g0.reshape(n_groups, share_gsz)[:, 0]
        pfx_valid = (jnp.arange(Sp, dtype=jnp.int32)[None, :]
                     < (g0_row * P_)[:, None])              # [G, Sp]
        tail_idx = jnp.clip(
            share_g0[:, None]
            + jnp.arange(share_tail_pages, dtype=share_g0.dtype)[None, :],
            0, pcfg.max_pages_per_seq - 1)                  # [B, Pt]
        St = share_tail_pages * P_
        tail_pos = (share_g0[:, None] * P_
                    + jnp.arange(St, dtype=jnp.int32)[None, :])
        tail_valid = tail_pos < lens[:, None]               # [B, St]
    elif not use_paged_kernel:
        ctx_valid = (jnp.arange(pcfg.max_ctx, dtype=jnp.int32)[None, :]
                     < lens[:, None])
        ctx_seg = ctx_valid.astype(jnp.int32)               # [B, ctx]
        ctx_pos = jnp.broadcast_to(
            jnp.arange(pcfg.max_ctx, dtype=jnp.int32)[None], ctx_seg.shape)

    def scan_body(x, layer_in):
        lp, page_off = layer_in
        table_l = page_off + table                          # [B, P] flat
        h = rms_norm(x, lp["attn_norm"], eps=cfg.norm_eps)
        q_flat = _mm(h, lp["attn"]["wq"])
        v_flat = _mm(h, lp["attn"]["wv"])
        if cfg.lora is not None:
            if expert_oh is not None:
                q_flat = lora_mod.apply_routed(lp["lora_wq"], cfg.lora,
                                               h, q_flat, expert_oh)
                v_flat = lora_mod.apply_routed(lp["lora_wv"], cfg.lora,
                                               h, v_flat, expert_oh)
            else:
                q_flat = lora_mod.apply(lp["lora_wq"], cfg.lora, h,
                                        q_flat, expert_idx=lora_expert)
                v_flat = lora_mod.apply(lp["lora_wv"], cfg.lora, h,
                                        v_flat, expert_idx=lora_expert)
        if T == 1:
            q = apply_rotary_flat_decode(
                q_flat, cos_q, sin_q, hd).reshape(B, T, cfg.n_heads, hd)
            k_new = apply_rotary_flat_decode(
                _mm(h, lp["attn"]["wk"]), cos_k, sin_k,
                hd).reshape(B, T, cfg.n_kv_heads, hd)
        else:
            q = apply_rotary_flat(q_flat, cos_q, sin_q,
                                  perm_q).reshape(B, T, cfg.n_heads, hd)
            k_new = apply_rotary_flat(
                _mm(h, lp["attn"]["wk"]), cos_k, sin_k,
                perm_k).reshape(B, T, cfg.n_kv_heads, hd)
        v_new = v_flat.reshape(B, T, cfg.n_kv_heads, hd)

        kd = cfg.n_kv_heads * hd
        # single-token decode on a quantized pool quantizes the in-flight
        # token's K/V here for its own attention, and write_tokens
        # re-quantizes the bf16 ys post-scan with the SAME
        # kv_pool.quantize_rows (bit-identical by construction — one
        # function, same input). Carrying the int8 codes + f32 scales
        # through the scan ys to write once was measured SLOWER (633.2
        # vs 672.0 tok/s at the 6.6B kv8 shape: four stacked ys arrays
        # cost more than the duplicated VPU quantization).
        quant_decode = pcfg.quantize_kv and T <= _SHORT_BLOCK_T
        if quant_decode:
            knq, kns = kv_pool.quantize_rows(k_new.reshape(B, T, kd),
                                             cfg.n_kv_heads)
            vnq, vns = kv_pool.quantize_rows(v_new.reshape(B, T, kd),
                                             cfg.n_kv_heads)

        if use_paged_kernel:
            # the kernel walks the flat pool via the offset table; on
            # int8 pools the in-flight token's self term uses its
            # quantize-ROUNDTRIPPED k/v (knq*kns), the same values every
            # later step reads back from the pool (write_tokens
            # re-quantizes the bf16 ys with the same quantize_rows)
            if quant_decode:
                KH = cfg.n_kv_heads
                k_self = (knq.reshape(B, KH, hd).astype(cfg.dtype)
                          * kns.reshape(B, KH, 1).astype(cfg.dtype))
                v_self = (vnq.reshape(B, KH, hd).astype(cfg.dtype)
                          * vns.reshape(B, KH, 1).astype(cfg.dtype))
                attn = _paged_attention_with_self(
                    q[:, 0], k_self, v_self, pool_k, pool_v,
                    table_l, lens, cfg,
                    k_scale_pool=pool_ks, v_scale_pool=pool_vs)[:, None]
            else:
                attn = _paged_attention_with_self(
                    q[:, 0], k_new[:, 0], v_new[:, 0], pool_k, pool_v,
                    table_l, lens, cfg)[:, None]
        elif cascade:
            # grouped-prefix cascade: shared prompt pages gathered once
            # per GROUP, private tail (+ the in-flight token) per slot
            KH = cfg.n_kv_heads
            pfx_tab = table_l.reshape(
                n_groups, share_gsz, -1)[:, 0, :share_prefix_pages]
            kp = pool_k[pfx_tab].reshape(n_groups, Sp, KH * hd)
            vp = pool_v[pfx_tab].reshape(n_groups, Sp, KH * hd)
            tail_tab = jnp.take_along_axis(table_l, tail_idx, axis=1)
            kc_t = pool_k[tail_tab].reshape(B, St, KH * hd)
            vc_t = pool_v[tail_tab].reshape(B, St, KH * hd)
            ksp = vsp = kst = vst = None
            if quant_decode:
                ksp = pool_ks[pfx_tab].reshape(n_groups, Sp, KH)
                vsp = pool_vs[pfx_tab].reshape(n_groups, Sp, KH)
                kst = jnp.concatenate(
                    [pool_ks[tail_tab].reshape(B, St, KH), kns], axis=1)
                vst = jnp.concatenate(
                    [pool_vs[tail_tab].reshape(B, St, KH), vns], axis=1)
                k_tok = knq.reshape(B, T, KH * hd)
                v_tok = vnq.reshape(B, T, KH * hd)
            else:
                k_tok = k_new.reshape(B, T, KH * hd).astype(kc_t.dtype)
                v_tok = v_new.reshape(B, T, KH * hd).astype(vc_t.dtype)
            kt = jnp.concatenate([kc_t, k_tok], axis=1)
            vt = jnp.concatenate([vc_t, v_tok], axis=1)
            tvalid = jnp.concatenate(
                [tail_valid, jnp.ones((B, 1), bool)], axis=1)
            attn = _cascade_decode_attention(
                q, share_gsz, kp, vp, pfx_valid, kt, vt, tvalid,
                k_scale_p=ksp, v_scale_p=vsp,
                k_scale_t=kst, v_scale_t=vst)
        else:
            # gather THIS layer's pages dense, kept in the natural flat
            # lane layout [B, ctx, KD] (invalid tail masked via ctx_seg;
            # _decode_attention_step consumes flat lanes — no head-split
            # relayout)
            KH = cfg.n_kv_heads
            kc = pool_k[table_l].reshape(B, pcfg.max_ctx, KH, hd)
            vc = pool_v[table_l].reshape(B, pcfg.max_ctx, KH, hd)
            seg_all = jnp.concatenate([ctx_seg, seg_ids], axis=1)
            pos_all = jnp.concatenate([ctx_pos, positions], axis=1)
            k_scale = v_scale = None
            if quant_decode:
                # the int8 context rides the block-diagonal dot with the
                # K scale factored OUT of each head's score row and the
                # V scale folded INTO the probabilities (exact algebra —
                # see kv_pool layout note)
                ks_c = pool_ks[table_l].reshape(B, pcfg.max_ctx, KH)
                vs_c = pool_vs[table_l].reshape(B, pcfg.max_ctx, KH)
                k_scale = jnp.concatenate([ks_c, kns], axis=1)
                v_scale = jnp.concatenate([vs_c, vns], axis=1)
                k_tok = knq.reshape(B, T, KH, hd)
                v_tok = vnq.reshape(B, T, KH, hd)
            elif pcfg.quantize_kv:
                # chunked prefill: dequantize the gathered context for
                # the flash kernel (once per prompt, not per decode step)
                ks_c = pool_ks[table_l].reshape(B, pcfg.max_ctx, KH)
                vs_c = pool_vs[table_l].reshape(B, pcfg.max_ctx, KH)
                kc = (kc.astype(cfg.dtype)
                      * ks_c[..., None].astype(cfg.dtype))
                vc = (vc.astype(cfg.dtype)
                      * vs_c[..., None].astype(cfg.dtype))
                k_tok = k_new.astype(kc.dtype)
                v_tok = v_new.astype(vc.dtype)
            else:
                k_tok = k_new.astype(kc.dtype)
                v_tok = v_new.astype(vc.dtype)
            # context + the chunk itself (intra-chunk attention is
            # causal via the positional comparison below)
            k_all = jnp.concatenate([kc, k_tok], axis=1)
            v_all = jnp.concatenate([vc, v_tok], axis=1)
            if T <= _SHORT_BLOCK_T:
                # decode steps AND speculative verify blocks: the
                # block-diagonal short-block attention consumes gathered
                # pages in natural flat-lane layout (the flash path at
                # tiny T pads the query to a 128 tile and relayouts the
                # gathered cache per layer)
                attn = _decode_attention_step(
                    q, k_all, v_all, seg_ids, seg_all, positions, pos_all,
                    k_scale=k_scale, v_scale=v_scale)
            else:
                attn = flash_attention(q, k_all, v_all, seg_ids, seg_all,
                                       causal=True, q_positions=positions,
                                       kv_positions=pos_all,
                                       backend=cfg.attn_backend)
        attn = attn.reshape(B, T, cfg.n_heads * hd).astype(x.dtype)
        x = x + _mm(attn, lp["attn"]["wo"])
        h = rms_norm(x, lp["mlp_norm"], eps=cfg.norm_eps)
        gated = jax.nn.silu(_mm(h, lp["mlp"]["w_gate"])) * \
            _mm(h, lp["mlp"]["w_up"])
        x = x + _mm(gated, lp["mlp"]["w_down"])
        return x, (k_new.reshape(B, T, kd), v_new.reshape(B, T, kd))

    x, (new_k, new_v) = jax.lax.scan(scan_body, x, layer_ctx)
    x = rms_norm(x, params["final_norm"], eps=cfg.norm_eps)
    logits = _mm(x, params["lm_head"]).astype(jnp.float32)

    pool = kv_pool.write_tokens(pool, pcfg, new_k, new_v, slot_ids, start)
    n_new = seg_ids.sum(-1).astype(jnp.int32)
    pool = {**pool, "seq_len": pool["seq_len"].at[slot_ids].add(n_new)}
    return logits, pool
