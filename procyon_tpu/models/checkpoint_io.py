"""Model checkpoint I/O + reference-checkpoint conversion.

Equivalent of UnifiedProCyon.from_pretrained / save_pretrained
(model_unified.py:1295-1542) with the structural change flagged in SURVEY.md
§7 "Checkpoint ingestion": released ProCyon checkpoints are DeepSpeed ZeRO
shards + torch pickles; conversion is isolated in `convert_*` functions
(torch used only to unpickle), consolidating once into this framework's
orbax + JSON layout. After conversion, loading is torch-free.

Layout of a saved model dir:
  state/            orbax params
  configs.json      model config (UnifiedConfig tree)
  tokenizer.json    tokenizer spec / path
"""

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from procyon_tpu.models import esm2, llama, unified

_DTYPES = {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
           "float16": jnp.float16}


def _dtype_name(d):
    return jnp.dtype(d).name


def config_to_dict(cfg) -> Dict:
    if dataclasses.is_dataclass(cfg) and not isinstance(cfg, type):
        out = {}
        for f in dataclasses.fields(cfg):
            v = getattr(cfg, f.name)
            if f.name == "dtype":
                out[f.name] = _dtype_name(v)
            else:
                out[f.name] = config_to_dict(v)
        return out
    if isinstance(cfg, (list, tuple)):
        return [config_to_dict(x) for x in cfg]
    return cfg


def unified_config_from_dict(d: Dict) -> unified.UnifiedConfig:
    def fix_dtype(sub):
        sub = dict(sub)
        if isinstance(sub.get("dtype"), str):
            sub["dtype"] = _DTYPES[sub["dtype"]]
        return sub

    lcfg = llama.LlamaConfig(**fix_dtype(d["llama"]))
    ecfg = esm2.ESM2Config(**fix_dtype(d["esm"])) if d.get("esm") else None
    ccfg = __import__(
        "procyon_tpu.models.contrastive", fromlist=["InfoNCEConfig"]
    ).InfoNCEConfig(**fix_dtype(d["contrastive"]))
    rest = {k: v for k, v in d.items()
            if k not in ("llama", "esm", "contrastive", "dtype")}
    return unified.UnifiedConfig(llama=lcfg, esm=ecfg, contrastive=ccfg,
                                 dtype=_DTYPES.get(d.get("dtype"),
                                                   jnp.bfloat16), **rest)


def save_model(path: str, params, cfg: unified.UnifiedConfig, *,
               tokenizer_info: Optional[Dict] = None):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    state_path = os.path.join(path, "state")
    if os.path.exists(state_path):
        import shutil

        shutil.rmtree(state_path)
    ckptr.save(state_path, params)
    ckptr.wait_until_finished()
    with open(os.path.join(path, "configs.json"), "w") as f:
        json.dump(config_to_dict(cfg), f, indent=2)
    if tokenizer_info:
        with open(os.path.join(path, "tokenizer.json"), "w") as f:
            json.dump(tokenizer_info, f, indent=2)


def load_model(path: str) -> Tuple[Dict, unified.UnifiedConfig, Any]:
    import jax
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(os.path.join(path, "configs.json")) as f:
        cfg = unified_config_from_dict(json.load(f))
    abstract = jax.eval_shape(
        lambda: unified.init_params(jax.random.PRNGKey(0), cfg))
    ckptr = ocp.StandardCheckpointer()
    params = ckptr.restore(os.path.join(path, "state"), abstract)
    tokenizer = None
    tok_path = os.path.join(path, "tokenizer.json")
    if os.path.exists(tok_path):
        with open(tok_path) as f:
            info = json.load(f)
        from procyon_tpu.data.text_tokenizer import load_tokenizer

        tokenizer = load_tokenizer(info.get("path"),
                                   info.get("vocab_size", 4096))
    return params, cfg, tokenizer


# ---------------------------------------------------------------------------
# HF / torch state-dict conversion (isolated; torch only used here)
# ---------------------------------------------------------------------------


def convert_hf_llama(state_dict: Dict[str, np.ndarray],
                     cfg: llama.LlamaConfig) -> Dict:
    """HF LlamaForCausalLM state dict (numpy arrays) -> stacked pytree.

    HF names: model.embed_tokens.weight, model.layers.{i}.self_attn.{q,k,v,
    o}_proj.weight, model.layers.{i}.mlp.{gate,up,down}_proj.weight,
    model.layers.{i}.{input,post_attention}_layernorm.weight,
    model.norm.weight, lm_head.weight. Torch Linear stores [out, in] — we
    transpose to [in, out].
    """
    L = cfg.n_layers

    def get(name):
        return np.asarray(state_dict[name])

    def stack(fmt, transpose=True):
        mats = [get(fmt.format(i)) for i in range(L)]
        if transpose:
            mats = [m.T for m in mats]
        return jnp.asarray(np.stack(mats), cfg.dtype)

    layers = {
        "attn": {
            "wq": stack("model.layers.{}.self_attn.q_proj.weight"),
            "wk": stack("model.layers.{}.self_attn.k_proj.weight"),
            "wv": stack("model.layers.{}.self_attn.v_proj.weight"),
            "wo": stack("model.layers.{}.self_attn.o_proj.weight"),
        },
        "mlp": {
            "w_gate": stack("model.layers.{}.mlp.gate_proj.weight"),
            "w_up": stack("model.layers.{}.mlp.up_proj.weight"),
            "w_down": stack("model.layers.{}.mlp.down_proj.weight"),
        },
        "attn_norm": stack("model.layers.{}.input_layernorm.weight",
                           transpose=False),
        "mlp_norm": stack(
            "model.layers.{}.post_attention_layernorm.weight",
            transpose=False),
    }
    return {
        "embed": jnp.asarray(get("model.embed_tokens.weight"), cfg.dtype),
        "layers": layers,
        "final_norm": jnp.asarray(get("model.norm.weight"), cfg.dtype),
        "lm_head": jnp.asarray(get("lm_head.weight").T, cfg.dtype),
    }


def convert_hf_esm2(state_dict: Dict[str, np.ndarray],
                    cfg: esm2.ESM2Config) -> Dict:
    """HF EsmForMaskedLM state dict -> stacked pytree.

    HF names: esm.embeddings.word_embeddings.weight,
    esm.encoder.layer.{i}.attention.self.{query,key,value}.{weight,bias},
    .attention.output.dense, .attention.LayerNorm, .intermediate.dense,
    .output.dense, .LayerNorm, esm.encoder.emb_layer_norm_after,
    lm_head.{dense,layer_norm,bias}.
    """
    L = cfg.n_layers

    def get(name):
        return np.asarray(state_dict[name])

    def stack_w(fmt):
        return jnp.asarray(np.stack([get(fmt.format(i)).T
                                     for i in range(L)]), cfg.dtype)

    def stack_b(fmt):
        return jnp.asarray(np.stack([get(fmt.format(i))
                                     for i in range(L)]), cfg.dtype)

    p = "esm.encoder.layer.{}."
    layers = {
        "attn": {
            "wq": stack_w(p + "attention.self.query.weight"),
            "bq": stack_b(p + "attention.self.query.bias"),
            "wk": stack_w(p + "attention.self.key.weight"),
            "bk": stack_b(p + "attention.self.key.bias"),
            "wv": stack_w(p + "attention.self.value.weight"),
            "bv": stack_b(p + "attention.self.value.bias"),
            "wo": stack_w(p + "attention.output.dense.weight"),
            "bo": stack_b(p + "attention.output.dense.bias"),
        },
        "mlp": {
            "w1": stack_w(p + "intermediate.dense.weight"),
            "b1": stack_b(p + "intermediate.dense.bias"),
            "w2": stack_w(p + "output.dense.weight"),
            "b2": stack_b(p + "output.dense.bias"),
        },
        "attn_norm": {"w": stack_b(p + "attention.LayerNorm.weight"),
                      "b": stack_b(p + "attention.LayerNorm.bias")},
        "mlp_norm": {"w": stack_b(p + "LayerNorm.weight"),
                     "b": stack_b(p + "LayerNorm.bias")},
    }
    return {
        "embed": jnp.asarray(get("esm.embeddings.word_embeddings.weight"),
                             cfg.dtype),
        "layers": layers,
        "final_norm": {
            "w": jnp.asarray(
                get("esm.encoder.emb_layer_norm_after.weight"), cfg.dtype),
            "b": jnp.asarray(
                get("esm.encoder.emb_layer_norm_after.bias"), cfg.dtype)},
        "lm_head": {
            "dense_w": jnp.asarray(get("lm_head.dense.weight").T, cfg.dtype),
            "dense_b": jnp.asarray(get("lm_head.dense.bias"), cfg.dtype),
            "norm": {"w": jnp.asarray(get("lm_head.layer_norm.weight"),
                                      cfg.dtype),
                     "b": jnp.asarray(get("lm_head.layer_norm.bias"),
                                      cfg.dtype)},
            "bias": jnp.asarray(get("lm_head.bias"), jnp.float32),
        },
    }


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .pt/.bin (or safetensors) file into numpy arrays."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.float().numpy() if v.dtype == torch.bfloat16
            else v.numpy() for k, v in sd.items()}


def convert_reference_checkpoint(ckpt_dir: str, out_dir: str,
                                 cfg: unified.UnifiedConfig, *,
                                 tokenizer_info=None):
    """Consolidated ProCyon checkpoint (txllm_model_ckpt.pt or zero_to_fp32
    output) -> this framework's layout. Prefix mapping:
      text_encoder.*  -> llama tree    (LlamaPostTokenization wrapper)
      protein_encoder.* -> esm tree
      token_projectors / aaseq_lm_projector / aaseq_shared_projector ->
        projectors tree; contrastive temperature -> contrastive.
    """
    import glob

    candidates = glob.glob(os.path.join(ckpt_dir, "*.pt")) + \
        glob.glob(os.path.join(ckpt_dir, "*.safetensors"))
    weights = {}
    for c in candidates:
        try:
            weights.update(load_torch_state_dict(c))
        except Exception:
            continue

    def subdict(prefix):
        return {k[len(prefix):]: v for k, v in weights.items()
                if k.startswith(prefix)}

    params = unified.init_params(__import__("jax").random.PRNGKey(0), cfg)
    llama_sd = subdict("text_encoder.model.")
    if llama_sd:
        params["llama"] = convert_hf_llama(llama_sd, cfg.llama)
    esm_sd = subdict("protein_encoder.model.")
    if esm_sd and cfg.esm is not None:
        params["esm"] = convert_hf_esm2(esm_sd, cfg.esm)
    save_model(out_dir, params, cfg, tokenizer_info=tokenizer_info)
    return out_dir


def resize_token_embeddings(llama_params, new_vocab_size: int, *,
                            init_scale: float = 0.02, seed: int = 0):
    """Grow (or shrink) the decoder vocab rows.

    The reference adds special tokens after loading HF weights and calls
    resize_token_embeddings with a deliberate off-by-one quirk ([EXT] added
    last and NOT given an embedding row, model_unified.py:1130-1133 +
    :166). When converting released checkpoints, size the embed/lm_head to
    the tokenizer's reported vocab; new rows init at N(0, init_scale).
    """
    import jax

    embed = llama_params["embed"]
    old, dim = embed.shape
    if new_vocab_size == old:
        return llama_params
    out = dict(llama_params)
    if new_vocab_size < old:
        out["embed"] = embed[:new_vocab_size]
        out["lm_head"] = llama_params["lm_head"][:, :new_vocab_size]
        return out
    key = jax.random.PRNGKey(seed)
    extra = (jax.random.normal(key, (new_vocab_size - old, dim),
                               jnp.float32) * init_scale).astype(embed.dtype)
    out["embed"] = jnp.concatenate([embed, extra], 0)
    extra_h = (jax.random.normal(jax.random.fold_in(key, 1),
                                 (dim, new_vocab_size - old), jnp.float32)
               * init_scale).astype(embed.dtype)
    out["lm_head"] = jnp.concatenate([llama_params["lm_head"], extra_h], 1)
    return out
