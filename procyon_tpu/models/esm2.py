"""ESM2 protein language model encoder, TPU-first.

Functional equivalent of the reference's ESM_PLM wrapper over fair-esm
(reference: procyon/model/esm.py:318-557): residue tokens in, per-token
embeddings and MLM logits out.  Sizes mirror fair-esm's released family
(esm.py:378-403): 8M / 35M / 150M / 650M / 3B.

TPU-native design (vs the reference's eager torch):
  * stacked-layer `lax.scan` blocks like llama.py; shared Pallas flash
    attention in bidirectional mode.
  * ESM2 specifics preserved: RoPE, pre-LN transformer with
    LayerNorm (not RMSNorm), GELU MLP with biases, token-dropout embedding
    rescale for <mask> tokens, tied-embedding roberta LM head.

Alphabet: the standard 33-symbol ESM alphabet with prepend <cls> / append
<eos> (data/protein_tokenizer.py).
"""

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from procyon_tpu.models import lora as lora_mod
from procyon_tpu.ops.activations import gelu_erf_fast
from procyon_tpu.ops.flash_attention import flash_attention
from procyon_tpu.ops import quant
from procyon_tpu.ops.norms import layer_norm
from procyon_tpu.ops.rotary import (apply_rotary_flat, flat_rotary_tables,
                                    rope_frequencies)

# alphabet constants (data/protein_tokenizer.py mirrors these)
PAD_IDX = 1
MASK_IDX = 32
CLS_IDX = 0
EOS_IDX = 2
VOCAB = 33


@dataclasses.dataclass(frozen=True)
class ESM2Config:
    vocab_size: int = VOCAB
    dim: int = 1280
    n_layers: int = 33
    n_heads: int = 20
    norm_eps: float = 1e-5
    max_seq_len: int = 1026  # 1024 residues + cls + eos
    token_dropout: bool = True
    # exact erf gelu matches fair-esm/HF; tanh approx is faster on VPU
    gelu_approx: bool = False
    # True: mask ratio over VALID tokens (fair-esm and transformers==4.31.0,
    # the reference's pin). False: over the full padded length (behavior of
    # newer transformers, whose EsmModel stopped passing attention_mask into
    # the embedding layer).
    pad_aware_token_dropout: bool = True
    # prefix tuning (esm.py:42-130 ESMPrefix): P learned post-rotary K/V
    # rows prepended to every layer's attention; 0 = off
    prefix_len: int = 0
    # encoder-side (Mo)LoRA (esm.py:424-492: peft LoraConfig / MoLoRAConfig
    # over the ESM tower; num_experts > 1 = task-banked MoLoRA selected per
    # phase via set_prot_lora_group, esm.py:501). Composes with
    # quantize_params for the QLoRA recipe (NF4-equivalent int8/int4
    # frozen base + bf16 LoRA banks).
    lora: Optional[lora_mod.LoRAConfig] = None
    # which projections carry LoRA (reference protein_lora_parameters,
    # esm.py:424-429): "attn" = query/key/value; "mlp" = the HF "dense"
    # targets (attention output + both MLP denses); "default" = all six
    lora_targets: str = "default"
    # bottleneck adapter rank (reference use_adapter/adapter_rank,
    # esm.py:334-335 — accepted but DISCONNECTED there, the kwargs are
    # commented out at esm.py:372-375; here it is a working Houlsby-style
    # post-MLP adapter: x += up(gelu(down(x))), up zero-init). 0 = off
    adapter_rank: int = 0
    dtype: Any = jnp.bfloat16
    attn_backend: Optional[str] = None
    remat: bool = True
    # int8 matmul mode for quantized params: "dequant" = weight-only bf16
    # dot; "w8a8" = s8 x s8 MXU dot (2x compute; inference/serving paths)
    quant_mode: str = "dequant"
    # opt-in: fused-MLP block_m 256 at dim>=2048 (halves the dominant
    # int8 weight re-streaming; +7% at 3B). Needs a raised Mosaic
    # scoped-vmem limit, so the enclosing jit MUST pass the paired
    # compiler options — set both via big_block_serving(cfg), never by
    # hand. Off by default: unpaired big blocks fail AOT compilation.
    mlp_big_blocks: bool = False

    @property
    def head_dim(self):
        return self.dim // self.n_heads

    @property
    def ffn_dim(self):
        return 4 * self.dim


_SIZES = {
    "8m": dict(dim=320, n_layers=6, n_heads=20),
    "35m": dict(dim=480, n_layers=12, n_heads=20),
    "150m": dict(dim=640, n_layers=30, n_heads=20),
    "650m": dict(dim=1280, n_layers=33, n_heads=20),
    "3b": dict(dim=2560, n_layers=36, n_heads=40),
    "15b": dict(dim=5120, n_layers=48, n_heads=40),
}


def esm2_config(size: str, **kw) -> ESM2Config:
    base = dict(_SIZES[size])
    base.update(kw)
    return ESM2Config(**base)


def big_block_serving(cfg: ESM2Config):
    """Opt a serving config into the fused-MLP big-block kernel, paired
    with the per-compile raised scoped-vmem limit it needs.

    Returns ``(cfg', compiler_options)`` — jit the forward with
    ``jax.jit(f, compiler_options=compiler_options)`` and run ``cfg'``
    through it. On CPU, at dim<2048 (no benefit; ~1% dip measured at
    650M), or with PROCYON_SCOPED_VMEM_KIB=0, returns the config
    unchanged with options None, so callers can apply it
    unconditionally."""
    from procyon_tpu.utils.compile_opts import tpu_compiler_options

    opts = tpu_compiler_options(cfg.dim)
    if opts is None:
        return cfg, None
    return dataclasses.replace(cfg, mlp_big_blocks=True), opts


def tiny_config(**kw) -> ESM2Config:
    base = dict(dim=64, n_layers=2, n_heads=4, dtype=jnp.float32,
                max_seq_len=64)
    base.update(kw)
    return ESM2Config(**base)


_LORA_DIMS = {
    # projection name -> (in_dim, out_dim) as (dim, ffn) multipliers
    "wq": ("dim", "proj"), "wk": ("dim", "proj"), "wv": ("dim", "proj"),
    "wo": ("proj", "dim"), "w1": ("dim", "ffn"), "w2": ("ffn", "dim"),
}

_LORA_TARGET_SETS = {
    # reference target_lora_modules (esm.py:424-429): attn ->
    # ["query","key","value"]; mlp -> ["dense"] (HF module-name match =
    # attention.output.dense + intermediate.dense + output.dense);
    # default -> both
    "attn": ("wq", "wk", "wv"),
    "mlp": ("wo", "w1", "w2"),
    "default": ("wq", "wk", "wv", "wo", "w1", "w2"),
}


def lora_target_names(cfg: ESM2Config):
    return _LORA_TARGET_SETS[cfg.lora_targets]


def _lora_dims(cfg: ESM2Config, name):
    sizes = {"dim": cfg.dim, "proj": cfg.n_heads * cfg.head_dim,
             "ffn": cfg.ffn_dim}
    i, o = _LORA_DIMS[name]
    return sizes[i], sizes[o]


def init_params(key, cfg: ESM2Config):
    L = cfg.n_layers
    hd = cfg.head_dim
    keys = jax.random.split(key, 12)

    def dense(key, shape, scale=None):
        if scale is None:
            scale = 1.0 / (shape[-2] ** 0.5)
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(
            cfg.dtype)

    def zeros(shape):
        return jnp.zeros(shape, cfg.dtype)

    def ones(shape):
        return jnp.ones(shape, cfg.dtype)

    layers = {
        "attn": {
            "wq": dense(keys[0], (L, cfg.dim, cfg.n_heads * hd)),
            "bq": zeros((L, cfg.n_heads * hd)),
            "wk": dense(keys[1], (L, cfg.dim, cfg.n_heads * hd)),
            "bk": zeros((L, cfg.n_heads * hd)),
            "wv": dense(keys[2], (L, cfg.dim, cfg.n_heads * hd)),
            "bv": zeros((L, cfg.n_heads * hd)),
            "wo": dense(keys[3], (L, cfg.n_heads * hd, cfg.dim)),
            "bo": zeros((L, cfg.dim)),
        },
        "mlp": {
            "w1": dense(keys[4], (L, cfg.dim, cfg.ffn_dim)),
            "b1": zeros((L, cfg.ffn_dim)),
            "w2": dense(keys[5], (L, cfg.ffn_dim, cfg.dim)),
            "b2": zeros((L, cfg.dim)),
        },
        "attn_norm": {"w": ones((L, cfg.dim)), "b": zeros((L, cfg.dim))},
        "mlp_norm": {"w": ones((L, cfg.dim)), "b": zeros((L, cfg.dim))},
    }
    if cfg.prefix_len:
        P = cfg.prefix_len
        layers["prefix"] = {
            "k": dense(keys[8], (L, P, cfg.n_heads * hd), scale=0.02),
            "v": dense(keys[9], (L, P, cfg.n_heads * hd), scale=0.02),
        }
    if cfg.lora is not None:
        names = lora_target_names(cfg)
        lkeys = jax.random.split(keys[10], len(names) * L)
        for j, name in enumerate(names):
            di, do = _lora_dims(cfg, name)
            ps = [lora_mod.init_params(k, cfg.lora, di, do)
                  for k in lkeys[j * L:(j + 1) * L]]
            layers[f"lora_{name}"] = {
                "A": jnp.stack([p["A"] for p in ps]),
                "B": jnp.stack([p["B"] for p in ps]),
            }
    if cfg.adapter_rank:
        r = cfg.adapter_rank
        layers["adapter"] = {
            # up zero-init: the adapter starts as identity
            "wd": dense(keys[11], (L, cfg.dim, r), scale=0.02),
            "bd": zeros((L, r)),
            "wu": zeros((L, r, cfg.dim)),
            "bu": zeros((L, cfg.dim)),
        }
    return {
        "embed": dense(keys[6], (cfg.vocab_size, cfg.dim), scale=0.02),
        "layers": layers,
        "final_norm": {"w": ones((cfg.dim,)), "b": zeros((cfg.dim,))},
        # roberta LM head: dense -> gelu -> layer_norm -> tied decoder + bias
        "lm_head": {
            "dense_w": dense(keys[7], (cfg.dim, cfg.dim)),
            "dense_b": zeros((cfg.dim,)),
            "norm": {"w": ones((cfg.dim,)), "b": zeros((cfg.dim,))},
            "bias": jnp.zeros((cfg.vocab_size,), jnp.float32),
        },
    }


def _block(x, lp, seg_ids, positions, rot, cfg: ESM2Config, lora_expert=0):
    B, S, _ = x.shape
    hd = cfg.head_dim
    cos_g, sin_g = rot

    def _lora(name, inp, out):
        key = f"lora_{name}"
        if cfg.lora is not None and key in lp:
            return lora_mod.apply(lp[key], cfg.lora, inp, out,
                                  expert_idx=lora_expert)
        return out

    def _adapter(y):
        # Houlsby-style bottleneck after the MLP residual (up zero-init);
        # the reference's use_adapter kwarg is disconnected (esm.py:372-375)
        if cfg.adapter_rank and "adapter" in lp:
            a = lp["adapter"]
            mid = gelu_erf_fast(y @ a["wd"] + a["bd"])
            return y + (mid @ a["wu"] + a["bu"]).astype(y.dtype)
        return y

    h = layer_norm(x, lp["attn_norm"]["w"], lp["attn_norm"]["b"],
                   eps=cfg.norm_eps)
    # rotate_half convention (fair-esm / modeling_esm.py:44-53). Rotary is
    # delegated to flash_attention(rope=...): fused into the packed kernel
    # as lane rolls on TPU (the XLA x[..., perm] gather costs two HBM
    # relayout copies per projection), applied outside on other backends.
    HD = cfg.n_heads * hd
    if "wqkv" in lp["attn"]:
        # serving layout (fuse_qkv_params): ONE [d, 3*H*D] projection —
        # one MXU dot + (in w8a8 mode) one activation-quant pass instead
        # of three. (A standalone fused LN+activation-quant Pallas kernel
        # was measured SLOWER than XLA's own LN/amax/quant fusions here —
        # the kernel boundary cost more than the fused passes saved.)
        qkv = quant.mm(h, lp["attn"]["wqkv"], cfg.quant_mode) \
            + lp["attn"]["bqkv"]
        if (cfg.attn_backend == "rowblock" and not cfg.prefix_len
                and S % 128 == 0 and HD % 128 == 0 and 128 % hd == 0):
            # zero-copy fusion: the packed kernel reads q/k/v as
            # lane-offset blocks of the [B, S, 3*H*D] projection output
            # (XLA slicing would cost one HBM relayout copy per tensor)
            from procyon_tpu.ops import attention_rowblock as rb

            cos_g, sin_g = rot
            attn = rb.rowblock_packed_qkv_fwd(
                qkv, seg_ids, positions, (False, 1.0 / hd ** 0.5, False,
                                          None),
                n_heads=cfg.n_heads, head_dim=hd,
                rope=(cos_g, sin_g, cos_g, sin_g))
            x = x + quant.mm(attn, lp["attn"]["wo"], cfg.quant_mode) \
                + lp["attn"]["bo"]
            if (cfg.quant_mode == "w8a8"
                    and quant.is_quantized(lp["mlp"]["w1"])
                    and (B * S) % 512 == 0 and cfg.ffn_dim % 512 == 0):
                # fused LN+int8-MLP kernel: the [B*S, 4d] hidden never
                # leaves VMEM (ops/fused_mlp.py; profiled ~1.6 ms/layer of
                # gelu+quant VPU + HBM round-trip eliminated)
                # (fused_mlp_int8_prequant — LN-quant hoisted to XLA —
                # measured NET-slower in-model: 80.1 vs 84.3 proteins/s
                # at 3B. The kernel itself improves 13->11.5 ms/layer,
                # but the hoisted LN-quant + residual + an XLA layout
                # fusion add 2.4 ms/layer around it.)
                from procyon_tpu.ops.fused_mlp import fused_ln_mlp_int8

                out = fused_ln_mlp_int8(
                    x.reshape(B * S, cfg.dim),
                    lp["mlp_norm"]["w"], lp["mlp_norm"]["b"],
                    lp["mlp"]["w1"]["q"], lp["mlp"]["w1"]["s"],
                    lp["mlp"]["b1"],
                    lp["mlp"]["w2"]["q"], lp["mlp"]["w2"]["s"],
                    lp["mlp"]["b2"], eps=cfg.norm_eps, add_residual=True,
                    big_blocks=cfg.mlp_big_blocks)
                return _adapter(out.reshape(B, S, cfg.dim))
            h = layer_norm(x, lp["mlp_norm"]["w"], lp["mlp_norm"]["b"],
                           eps=cfg.norm_eps)
            h1 = quant.mm(h, lp["mlp"]["w1"], cfg.quant_mode) \
                + lp["mlp"]["b1"]
            h = jax.nn.gelu(h1, approximate=True) if cfg.gelu_approx \
                else gelu_erf_fast(h1)
            return _adapter(x + quant.mm(h, lp["mlp"]["w2"], cfg.quant_mode)
                            + lp["mlp"]["b2"])
        q = qkv[..., :HD].reshape(B, S, cfg.n_heads, hd)
        k = qkv[..., HD:2 * HD].reshape(B, S, cfg.n_heads, hd)
        v = qkv[..., 2 * HD:].reshape(B, S, cfg.n_heads, hd)
    else:
        q = _lora("wq", h, quant.mm(h, lp["attn"]["wq"], cfg.quant_mode)
                  + lp["attn"]["bq"]).reshape(B, S, cfg.n_heads, hd)
        k = _lora("wk", h, quant.mm(h, lp["attn"]["wk"], cfg.quant_mode)
                  + lp["attn"]["bk"]).reshape(B, S, cfg.n_heads, hd)
        v = _lora("wv", h, quant.mm(h, lp["attn"]["wv"], cfg.quant_mode)
                  + lp["attn"]["bv"]).reshape(B, S, cfg.n_heads, hd)
    seg_kv = seg_ids
    cos_k, sin_k = cos_g, sin_g
    if cfg.prefix_len:
        # learned POST-rotary prefix K/V (injected as past_key_values in
        # the reference, which stores rotated keys): prepend the rows and
        # give them the identity rotation (cos=1, sin=0) in the k tables
        P = cfg.prefix_len
        pk = jnp.broadcast_to(
            lp["prefix"]["k"].reshape(1, P, cfg.n_heads, hd),
            (B, P, cfg.n_heads, hd)).astype(k.dtype)
        pv = jnp.broadcast_to(
            lp["prefix"]["v"].reshape(1, P, cfg.n_heads, hd),
            (B, P, cfg.n_heads, hd)).astype(v.dtype)
        k = jnp.concatenate([pk, k], axis=1)
        v = jnp.concatenate([pv, v], axis=1)
        seg_kv = jnp.concatenate(
            [jnp.ones((B, P), seg_ids.dtype), seg_ids], axis=1)
        cos_k = jnp.concatenate(
            [jnp.ones((P,) + cos_g.shape[1:], cos_g.dtype), cos_g], axis=0)
        sin_k = jnp.concatenate(
            [jnp.zeros((P,) + sin_g.shape[1:], sin_g.dtype), sin_g], axis=0)
    attn = flash_attention(q, k, v, seg_ids, seg_kv, causal=False,
                           backend=cfg.attn_backend,
                           rope=(cos_g, sin_g, cos_k, sin_k))
    attn = attn.reshape(B, S, cfg.n_heads * hd).astype(x.dtype)
    x = x + _lora("wo", attn, quant.mm(attn, lp["attn"]["wo"],
                                       cfg.quant_mode)) + lp["attn"]["bo"]

    h = layer_norm(x, lp["mlp_norm"]["w"], lp["mlp_norm"]["b"],
                   eps=cfg.norm_eps)
    h1 = _lora("w1", h, quant.mm(h, lp["mlp"]["w1"], cfg.quant_mode)) \
        + lp["mlp"]["b1"]
    h = jax.nn.gelu(h1, approximate=True) if cfg.gelu_approx \
        else gelu_erf_fast(h1)
    x = x + _lora("w2", h, quant.mm(h, lp["mlp"]["w2"], cfg.quant_mode)) \
        + lp["mlp"]["b2"]
    return _adapter(x)


def forward(params, cfg: ESM2Config, tokens, *, seg_ids=None,
            return_logits=False, lora_expert=0):
    """tokens [B,S] int32 (ESM alphabet, cls/eos included).

    Returns {"hidden": [B,S,dim] (post final LN), "logits": [B,S,vocab]?}.
    Padding (PAD_IDX) is masked out of attention via segment ids.
    lora_expert selects the active (Mo)LoRA bank (may be traced) — the
    reference's set_prot_lora_group (esm.py:501).
    """
    B, S = tokens.shape
    if seg_ids is None:
        seg_ids = (tokens != PAD_IDX).astype(jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))

    x = params["embed"][tokens].astype(jnp.float32)
    if cfg.token_dropout:
        # fair-esm token-dropout rescale: mask embeddings are zeroed and the
        # rest scaled by (1 - 0.15*0.8) / (1 - observed_mask_ratio)
        is_mask = (tokens == MASK_IDX)
        x = jnp.where(is_mask[..., None], 0.0, x)
        if cfg.pad_aware_token_dropout:
            valid = (seg_ids > 0)
            n_valid = jnp.maximum(valid.sum(-1), 1)
            mask_ratio_obs = (is_mask & valid).sum(-1) / n_valid
        else:
            mask_ratio_obs = is_mask.sum(-1) / tokens.shape[1]
        scale = (1.0 - 0.15 * 0.8) / jnp.maximum(1.0 - mask_ratio_obs, 1e-3)
        x = x * scale[:, None, None]
    x = x.astype(cfg.dtype)

    cos_f, sin_f, _ = flat_rotary_tables(cfg.head_dim, cfg.n_heads,
                                         cfg.max_seq_len)
    # position-uniform [S, H*D] tables (positions are arange for every row);
    # rotary itself is applied inside flash_attention (see _block)
    rot = (cos_f[:S].astype(cfg.dtype), sin_f[:S].astype(cfg.dtype))

    def scan_body(x, lp):
        return _block(x, lp, seg_ids, positions, rot, cfg,
                      lora_expert=lora_expert), None

    body = jax.checkpoint(scan_body) if cfg.remat else scan_body
    x, _ = jax.lax.scan(body, x, params["layers"])

    x = layer_norm(x, params["final_norm"]["w"], params["final_norm"]["b"],
                   eps=cfg.norm_eps)
    out = {"hidden": x}
    if return_logits:
        h = gelu_erf_fast(x @ params["lm_head"]["dense_w"]
                          + params["lm_head"]["dense_b"])
        h = layer_norm(h, params["lm_head"]["norm"]["w"],
                       params["lm_head"]["norm"]["b"], eps=cfg.norm_eps)
        logits = h @ params["embed"].T.astype(h.dtype)
        out["logits"] = logits.astype(jnp.float32) + params["lm_head"]["bias"]
    return out


def quantize_params(params, cfg: ESM2Config):
    """Weight-only int8 quantization of the encoder projections (the
    reference's EsmForMaskedLMQuant surface, esm.py:262-315, redesigned:
    dequant fuses into the matmul instead of out-of-place residual adds).
    Norms, biases, and the tied embedding/MLM head stay full precision."""
    out = dict(params)
    out["layers"] = quant.quantize_tree(
        params["layers"], keys=("wq", "wk", "wv", "wo", "w1", "w2"))
    return out


def merge_lora_params(params, cfg: ESM2Config):
    """Fold the (expert-averaged) LoRA deltas into the base weights and
    drop the banks — the reference's merge-by-averaging (mlora.py:417-431)
    for serving. Requires an unquantized tree (merge BEFORE
    quantize_params, like peft's merge_and_unload before bnb)."""
    assert cfg.lora is not None
    layers = dict(params["layers"])
    for name in lora_target_names(cfg):
        key = f"lora_{name}"
        if key not in layers:
            continue
        bank = layers.pop(key)
        group = "attn" if name in ("wq", "wk", "wv", "wo") else "mlp"
        w = layers[group][name]
        assert not quant.is_quantized(w), \
            "merge LoRA before quantize_params"
        # [L, E, i, r] x [L, E, r, o] -> mean over E
        delta = jnp.einsum("leir,lero->lio",
                           bank["A"].astype(jnp.float32),
                           bank["B"].astype(jnp.float32))
        delta = cfg.lora.scaling * delta / bank["A"].shape[1]
        layers[group] = {**layers[group],
                         name: (w.astype(jnp.float32) + delta).astype(w.dtype)}
    out = dict(params)
    out["layers"] = layers
    return out


def fuse_qkv_params(params):
    """Serving transform: concatenate the q/k/v projections into one
    [L, d, 3*H*D] weight (wqkv) + [L, 3*H*D] bias so _block issues one MXU
    dot (and one activation-quant pass under w8a8) per layer instead of
    three. Works on bf16 or int8-quantized trees; the training layout is
    untouched (HF-parity converters keep separate q/k/v). LoRA banks must
    be merged first (merge_lora_params) — the fused path does not apply
    them."""
    layers = dict(params["layers"])
    assert not any(k.startswith("lora_") for k in layers), \
        "merge_lora_params before fuse_qkv_params"
    attn = dict(layers["attn"])
    ws = [attn.pop(n) for n in ("wq", "wk", "wv")]
    if quant.is_quantized(ws[0]):
        attn["wqkv"] = {
            "q": jnp.concatenate([w["q"] for w in ws], axis=-1),
            "s": jnp.concatenate([w["s"] for w in ws], axis=-1),
        }
    else:
        attn["wqkv"] = jnp.concatenate(ws, axis=-1)
    attn["bqkv"] = jnp.concatenate(
        [attn.pop(n) for n in ("bq", "bk", "bv")], axis=-1)
    layers["attn"] = attn
    return {**params, "layers": layers}
