"""BERT-family text encoder, TPU-first.

The reference uses HF ``AutoModel`` BERT-family encoders as the text tower
of every third-party baseline: PubMedBERT (procyon/model/pubmedbert.py:20-84,
``AutoModelForMaskedLM``), SimCSE (procyon/model/simcse.py), the
BioTranslator text encoder (procyon/model/biotranslator_tencoder.py:120-221,
``HFTextEncoder``), ProtST's PubMedBERT tower
(procyon/evaluate/framework/baseline_models/protst.py:140-233), and the
bert_score scorer behind the headline caption metric
(procyon/evaluate/framework/caption.py:68-103).  This module is the single
native encoder all of those build on.

TPU-native design (vs the reference's eager torch):
  * stacked-layer ``lax.scan`` blocks like esm2.py/llama.py; the shared
    Pallas flash-attention kernel in bidirectional mode.
  * BERT specifics preserved: learned absolute position embeddings +
    token-type embeddings, POST-LayerNorm residual blocks (LN after the
    residual add - unlike ESM2/Llama's pre-LN), erf GELU, tanh pooler on
    [CLS], LayerNorm eps 1e-12.
  * weights load straight from an HF checkpoint directory (safetensors or
    pytorch_model.bin) - one converter covers BERT / SciBERT / PubMedBERT /
    BiomedBERT / SimCSE-BERT, so every baseline and BERTScore share it.

``forward(..., return_all_hidden=True)`` exposes the per-layer hidden
states BERTScore needs (the reference scorer reads an intermediate layer).
"""

import dataclasses
import os
import re
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from procyon_tpu.ops.activations import gelu_erf_fast
from procyon_tpu.ops.flash_attention import flash_attention
from procyon_tpu.ops.norms import layer_norm


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    dim: int = 768
    n_layers: int = 12
    n_heads: int = 12
    max_position: int = 512
    type_vocab_size: int = 2
    norm_eps: float = 1e-12
    pad_id: int = 0
    dtype: Any = jnp.bfloat16
    attn_backend: Optional[str] = None
    remat: bool = False

    @property
    def head_dim(self):
        return self.dim // self.n_heads

    @property
    def ffn_dim(self):
        return 4 * self.dim


def bert_config(size: str = "base", **kw) -> BertConfig:
    sizes = {
        "base": dict(dim=768, n_layers=12, n_heads=12),
        "large": dict(dim=1024, n_layers=24, n_heads=16),
    }
    base = dict(sizes[size])
    base.update(kw)
    return BertConfig(**base)


def tiny_config(**kw) -> BertConfig:
    base = dict(vocab_size=128, dim=64, n_layers=2, n_heads=4,
                max_position=64, dtype=jnp.float32)
    base.update(kw)
    return BertConfig(**base)


def init_params(key, cfg: BertConfig):
    L = cfg.n_layers
    keys = jax.random.split(key, 10)

    def dense(key, shape, scale=0.02):
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(
            cfg.dtype)

    def zeros(shape):
        return jnp.zeros(shape, cfg.dtype)

    def ones(shape):
        return jnp.ones(shape, cfg.dtype)

    layers = {
        "attn": {
            "wq": dense(keys[0], (L, cfg.dim, cfg.dim)),
            "bq": zeros((L, cfg.dim)),
            "wk": dense(keys[1], (L, cfg.dim, cfg.dim)),
            "bk": zeros((L, cfg.dim)),
            "wv": dense(keys[2], (L, cfg.dim, cfg.dim)),
            "bv": zeros((L, cfg.dim)),
            "wo": dense(keys[3], (L, cfg.dim, cfg.dim)),
            "bo": zeros((L, cfg.dim)),
        },
        # post-LN: applied AFTER each residual add
        "attn_norm": {"w": ones((L, cfg.dim)), "b": zeros((L, cfg.dim))},
        "mlp": {
            "w1": dense(keys[4], (L, cfg.dim, cfg.ffn_dim)),
            "b1": zeros((L, cfg.ffn_dim)),
            "w2": dense(keys[5], (L, cfg.ffn_dim, cfg.dim)),
            "b2": zeros((L, cfg.dim)),
        },
        "mlp_norm": {"w": ones((L, cfg.dim)), "b": zeros((L, cfg.dim))},
    }
    return {
        "embed": {
            "word": dense(keys[6], (cfg.vocab_size, cfg.dim)),
            "position": dense(keys[7], (cfg.max_position, cfg.dim)),
            "token_type": dense(keys[8], (cfg.type_vocab_size, cfg.dim)),
            "norm": {"w": ones((cfg.dim,)), "b": zeros((cfg.dim,))},
        },
        "layers": layers,
        "pooler": {"w": dense(keys[9], (cfg.dim, cfg.dim)),
                   "b": zeros((cfg.dim,))},
    }


def _block(x, lp, seg_ids, cfg: BertConfig):
    B, S, _ = x.shape
    hd = cfg.head_dim
    q = (x @ lp["attn"]["wq"] + lp["attn"]["bq"]).reshape(
        B, S, cfg.n_heads, hd)
    k = (x @ lp["attn"]["wk"] + lp["attn"]["bk"]).reshape(
        B, S, cfg.n_heads, hd)
    v = (x @ lp["attn"]["wv"] + lp["attn"]["bv"]).reshape(
        B, S, cfg.n_heads, hd)
    attn = flash_attention(q, k, v, seg_ids, seg_ids, causal=False,
                           backend=cfg.attn_backend)
    attn = attn.reshape(B, S, cfg.dim).astype(x.dtype)
    x = layer_norm(x + attn @ lp["attn"]["wo"] + lp["attn"]["bo"],
                   lp["attn_norm"]["w"], lp["attn_norm"]["b"],
                   eps=cfg.norm_eps)
    h = gelu_erf_fast(x @ lp["mlp"]["w1"] + lp["mlp"]["b1"])
    x = layer_norm(x + h @ lp["mlp"]["w2"] + lp["mlp"]["b2"],
                   lp["mlp_norm"]["w"], lp["mlp_norm"]["b"],
                   eps=cfg.norm_eps)
    return x


def forward(params, cfg: BertConfig, tokens, *, token_type_ids=None,
            seg_ids=None, return_all_hidden=False):
    """tokens [B,S] int32 (WordPiece ids, [CLS]/[SEP] included).

    Returns {"hidden": [B,S,dim], "pooled": [B,dim],
             "all_hidden": [n_layers+1,B,S,dim]?} - all_hidden[0] is the
    embedding output, all_hidden[i] the output of layer i (the layout
    bert_score indexes with its per-model num_layers setting).
    """
    B, S = tokens.shape
    if seg_ids is None:
        seg_ids = (tokens != cfg.pad_id).astype(jnp.int32)
    if token_type_ids is None:
        token_type_ids = jnp.zeros((B, S), jnp.int32)

    emb = params["embed"]
    x = (emb["word"][tokens].astype(jnp.float32)
         + emb["position"][:S][None].astype(jnp.float32)
         + emb["token_type"][token_type_ids].astype(jnp.float32))
    x = layer_norm(x, emb["norm"]["w"], emb["norm"]["b"], eps=cfg.norm_eps)
    x = x.astype(cfg.dtype)
    emb_out = x

    def scan_body(x, lp):
        y = _block(x, lp, seg_ids, cfg)
        return y, (y if return_all_hidden else None)

    body = jax.checkpoint(scan_body) if cfg.remat else scan_body
    x, ys = jax.lax.scan(body, x, params["layers"])

    out = {"hidden": x}
    out["pooled"] = jnp.tanh(
        x[:, 0].astype(jnp.float32) @ params["pooler"]["w"].astype(
            jnp.float32) + params["pooler"]["b"].astype(jnp.float32))
    if return_all_hidden:
        out["all_hidden"] = jnp.concatenate([emb_out[None], ys], axis=0)
    return out


def pool(hidden, seg_ids, how: str = "mean", pooled=None):
    """SimCSE-style poolers (procyon/model/simcse.py:21-72): cls (uses the
    tanh pooler output when given), cls_before_pooler, mean (avg), max."""
    if how == "cls" and pooled is not None:
        return pooled
    if how in ("cls", "cls_before_pooler"):
        return hidden[:, 0]
    mask = seg_ids.astype(hidden.dtype)[..., None]
    if how in ("mean", "avg"):
        return (hidden * mask).sum(1) / jnp.maximum(mask.sum(1), 1e-6)
    if how == "max":
        neg = jnp.finfo(hidden.dtype).min
        return jnp.where(mask > 0, hidden, neg).max(1)
    raise ValueError(f"unknown pooler {how!r}")


# ---------------------------------------------------------------------------
# HF checkpoint ingestion (safetensors / pytorch_model.bin -> param tree)

_HF_LAYER_RE = re.compile(r"encoder\.layer\.(\d+)\.(.+)")

_HF_LAYER_MAP = {
    # HF name tail -> (group, key, transpose)
    "attention.self.query.weight": ("attn", "wq", True),
    "attention.self.query.bias": ("attn", "bq", False),
    "attention.self.key.weight": ("attn", "wk", True),
    "attention.self.key.bias": ("attn", "bk", False),
    "attention.self.value.weight": ("attn", "wv", True),
    "attention.self.value.bias": ("attn", "bv", False),
    "attention.output.dense.weight": ("attn", "wo", True),
    "attention.output.dense.bias": ("attn", "bo", False),
    "attention.output.LayerNorm.weight": ("attn_norm", "w", False),
    "attention.output.LayerNorm.bias": ("attn_norm", "b", False),
    "intermediate.dense.weight": ("mlp", "w1", True),
    "intermediate.dense.bias": ("mlp", "b1", False),
    "output.dense.weight": ("mlp", "w2", True),
    "output.dense.bias": ("mlp", "b2", False),
    "output.LayerNorm.weight": ("mlp_norm", "w", False),
    "output.LayerNorm.bias": ("mlp_norm", "b", False),
}

# legacy HF BERT checkpoints use gamma/beta for LayerNorm params
_GAMMA_BETA = {"gamma": "weight", "beta": "bias"}


def convert_hf_state(state: Dict[str, np.ndarray],
                     dtype=jnp.bfloat16) -> Dict:
    """Map an HF BERT-family state dict (numpy arrays) to our param tree.

    Accepts names with or without the ``bert.`` prefix; MLM-head weights
    (``cls.*``) are ignored (we tie scoring to the encoder output).
    Returns (params, cfg) with cfg inferred from the weight shapes.
    """
    named: Dict[str, np.ndarray] = {}
    for k, v in state.items():
        k = k[5:] if k.startswith("bert.") else k
        parts = k.split(".")
        if parts[-1] in _GAMMA_BETA:
            k = ".".join(parts[:-1] + [_GAMMA_BETA[parts[-1]]])
        named[k] = np.asarray(v)

    word = named["embeddings.word_embeddings.weight"]
    pos = named["embeddings.position_embeddings.weight"]
    ttype = named["embeddings.token_type_embeddings.weight"]
    n_layers = 1 + max(int(_HF_LAYER_RE.match(k).group(1))
                       for k in named if _HF_LAYER_RE.match(k))
    dim = word.shape[1]
    # head count is not in the weights; every released BERT-family model
    # uses head_dim 64
    cfg = BertConfig(vocab_size=word.shape[0], dim=dim, n_layers=n_layers,
                     n_heads=max(dim // 64, 1), max_position=pos.shape[0],
                     type_vocab_size=ttype.shape[0], dtype=dtype)

    def cast(a):
        return jnp.asarray(a, dtype)

    stacked: Dict[str, Dict[str, list]] = {
        "attn": {}, "attn_norm": {}, "mlp": {}, "mlp_norm": {}}
    for tail, (group, key, transpose) in _HF_LAYER_MAP.items():
        rows = []
        for i in range(n_layers):
            a = named[f"encoder.layer.{i}.{tail}"]
            rows.append(a.T if transpose else a)
        stacked[group][key] = cast(np.stack(rows))

    params = {
        "embed": {
            "word": cast(word),
            "position": cast(pos),
            "token_type": cast(ttype),
            "norm": {"w": cast(named["embeddings.LayerNorm.weight"]),
                     "b": cast(named["embeddings.LayerNorm.bias"])},
        },
        "layers": stacked,
        "pooler": {
            "w": cast(named["pooler.dense.weight"].T)
            if "pooler.dense.weight" in named
            else jnp.eye(dim, dtype=dtype),
            "b": cast(named["pooler.dense.bias"])
            if "pooler.dense.bias" in named
            else jnp.zeros((dim,), dtype),
        },
    }
    return params, cfg


def load_hf_checkpoint(path: str, dtype=jnp.bfloat16):
    """Load a local HF checkpoint dir (model.safetensors or
    pytorch_model.bin) into (params, cfg). No network access."""
    st_path = os.path.join(path, "model.safetensors")
    pt_path = os.path.join(path, "pytorch_model.bin")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        state = load_file(st_path)
    elif os.path.exists(pt_path):
        import torch

        state = {k: v.float().numpy()
                 for k, v in torch.load(pt_path, map_location="cpu",
                                        weights_only=True).items()}
    else:
        raise FileNotFoundError(
            f"no model.safetensors or pytorch_model.bin under {path}")
    return convert_hf_state(state, dtype=dtype)
