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


def convert_fairesm_esm2(state_dict: Dict[str, np.ndarray],
                         cfg: esm2.ESM2Config) -> Dict:
    """fair-esm ESM2 state dict -> stacked pytree.

    The reference's live protein encoder (ESM_PLM, procyon/model/esm.py:
    378-403) wraps fair-esm models whose state-dict naming differs from HF:
    layers.{i}.self_attn.{q,k,v,out}_proj, layers.{i}.self_attn_layer_norm,
    layers.{i}.fc1/fc2, layers.{i}.final_layer_norm, embed_tokens,
    emb_layer_norm_after, lm_head.{dense,layer_norm,bias} (output weight tied
    to embed_tokens). Numerics are identical to the HF port.
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

    p = "layers.{}."
    layers = {
        "attn": {
            "wq": stack_w(p + "self_attn.q_proj.weight"),
            "bq": stack_b(p + "self_attn.q_proj.bias"),
            "wk": stack_w(p + "self_attn.k_proj.weight"),
            "bk": stack_b(p + "self_attn.k_proj.bias"),
            "wv": stack_w(p + "self_attn.v_proj.weight"),
            "bv": stack_b(p + "self_attn.v_proj.bias"),
            "wo": stack_w(p + "self_attn.out_proj.weight"),
            "bo": stack_b(p + "self_attn.out_proj.bias"),
        },
        "mlp": {
            "w1": stack_w(p + "fc1.weight"),
            "b1": stack_b(p + "fc1.bias"),
            "w2": stack_w(p + "fc2.weight"),
            "b2": stack_b(p + "fc2.bias"),
        },
        "attn_norm": {"w": stack_b(p + "self_attn_layer_norm.weight"),
                      "b": stack_b(p + "self_attn_layer_norm.bias")},
        "mlp_norm": {"w": stack_b(p + "final_layer_norm.weight"),
                     "b": stack_b(p + "final_layer_norm.bias")},
    }
    embed = jnp.asarray(get("embed_tokens.weight"), cfg.dtype)
    return {
        "embed": embed,
        "layers": layers,
        "final_norm": {
            "w": jnp.asarray(get("emb_layer_norm_after.weight"), cfg.dtype),
            "b": jnp.asarray(get("emb_layer_norm_after.bias"), cfg.dtype)},
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


# ---------------------------------------------------------------------------
# Released-checkpoint ingestion (from_pretrained parity)
# ---------------------------------------------------------------------------
#
# Released ProCyon checkpoints are DeepSpeed ZeRO-2 shard dirs + torch pickles
# (model_unified.py:1295-1408): `checkpoint-N/` holds `model_args.pt`,
# `data_args.pt`, `training_args.pt` (pickled HF dataclasses), either a
# consolidated `txllm_model_ckpt.pt` or `global_stepN/` with
# `mp_rank_00_model_states.pt` + `zero_pp_rank_{r}_mp_rank_00_optim_states.pt`
# shards consolidated by deepspeed's zero_to_fp32 (:1376-1382).


class _StubObject:
    """Placeholder for unimportable pickled classes (procyon dataclasses,
    transformers TrainingArguments, ...). Captures the pickled attribute
    dict so fields remain readable."""

    def __init__(self, *args, **kwargs):
        self.__dict__.update(kwargs)

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        elif isinstance(state, tuple):
            for part in state:
                if isinstance(part, dict):
                    self.__dict__.update(part)

    def __repr__(self):
        return f"_StubObject({self.__dict__!r})"


def _permissive_torch_load(path: str):
    """torch.load that replaces unimportable classes with _StubObject.

    model_args.pt pickles `procyon.training.training_args_IT.ModelArgs`
    (SURVEY.md §7 "Checkpoint ingestion"); the class is irrelevant — only the
    attribute dict matters."""
    import pickle
    import types

    import torch

    stub_cache: Dict[Tuple[str, str], type] = {}

    class _PermissiveUnpickler(pickle.Unpickler):
        def find_class(self, module, name):
            try:
                return super().find_class(module, name)
            except (ImportError, AttributeError):
                key = (module, name)
                if key not in stub_cache:
                    stub_cache[key] = type(name, (_StubObject,),
                                           {"__module__": module})
                return stub_cache[key]

    shim = types.ModuleType("_procyon_permissive_pickle")
    shim.Unpickler = _PermissiveUnpickler
    shim.load = lambda f, **kw: _PermissiveUnpickler(f, **kw).load()
    shim.loads = lambda b, **kw: pickle.loads(b)
    return torch.load(path, map_location="cpu", pickle_module=shim,
                      weights_only=False)


def _to_numpy(t) -> np.ndarray:
    import torch

    if isinstance(t, torch.Tensor):
        t = t.detach().cpu()
        if t.dtype == torch.bfloat16:
            t = t.float()
        return t.numpy()
    return np.asarray(t)


def load_checkpoint_args(ckpt_dir: str):
    """Read model_args.pt / data_args.pt as attribute namespaces
    (model_unified.py:1325-1326). Missing files -> None."""
    out = []
    for fname in ("model_args.pt", "data_args.pt"):
        path = os.path.join(ckpt_dir, fname)
        out.append(_permissive_torch_load(path)
                   if os.path.exists(path) else None)
    return tuple(out)


def consolidate_zero_checkpoint(ckpt_dir: str) -> Dict[str, np.ndarray]:
    """Numpy consolidation of a DeepSpeed ZeRO-2 checkpoint.

    Matches deepspeed.utils.zero_to_fp32 semantics for stage <= 2 (the
    released configs: configs/deepspeed/full_train_ds.json stage 2), where
    module weights are replicated in `mp_rank_00_model_states.pt['module']`
    (bf16) and the fp32 master copies live as flat per-rank partitions in
    `zero_pp_rank_{r}_..._optim_states.pt['optimizer_state_dict']
    ['single_partition_of_fp32_groups']`, concatenated across ranks and
    sliced by `param_shapes`. Frozen params/buffers come from `module`.
    """
    import glob
    import re

    step_dir = None
    latest = os.path.join(ckpt_dir, "latest")
    if os.path.exists(latest):
        with open(latest) as f:
            step_dir = os.path.join(ckpt_dir, f.read().strip())
    else:
        cands = sorted(glob.glob(os.path.join(ckpt_dir, "global_step*")))
        if cands:
            step_dir = cands[-1]
    if step_dir is None or not os.path.isdir(step_dir):
        raise FileNotFoundError(
            f"no DeepSpeed step dir (latest file or global_step*) under "
            f"{ckpt_dir}")

    model_files = sorted(glob.glob(os.path.join(step_dir,
                                                "*_model_states.pt")))
    if not model_files:
        raise FileNotFoundError(f"no *_model_states.pt in {step_dir}")
    ms = _permissive_torch_load(model_files[0])
    sd = {k: _to_numpy(v) for k, v in ms["module"].items()}

    param_shapes = ms.get("param_shapes")
    optim_files = glob.glob(os.path.join(step_dir, "*_optim_states.pt"))

    def rank_of(path):
        m = re.search(r"zero_pp_rank_(\d+)", os.path.basename(path))
        return int(m.group(1)) if m else 0

    optim_files.sort(key=rank_of)
    if param_shapes is not None and optim_files:
        # param_shapes is a list of OrderedDict(name -> shape), one per
        # optimizer param group.
        if isinstance(param_shapes, dict):
            param_shapes = [param_shapes]
        parts = []
        for f in optim_files:
            osd = _permissive_torch_load(f)["optimizer_state_dict"]
            stage = osd.get("zero_stage", 2)
            if stage not in (0, 1, 2):
                raise NotImplementedError(
                    f"ZeRO stage {stage} consolidation not supported "
                    f"(released configs use stage 2)")
            groups = osd["single_partition_of_fp32_groups"]
            parts.append([_to_numpy(g).ravel() for g in groups])
        n_groups = len(param_shapes)
        for g in range(n_groups):
            flat = np.concatenate([p[g] for p in parts])
            offset = 0
            for name, shape in param_shapes[g].items():
                shape = tuple(int(s) for s in shape)
                numel = int(np.prod(shape)) if shape else 1
                if offset + numel > flat.size:
                    raise RuntimeError(
                        f"ZeRO group {g} exhausted at param {name}: need "
                        f"{offset + numel} elements, have {flat.size}")
                sd[name] = flat[offset:offset + numel].reshape(shape)
                offset += numel
    return sd


def load_reference_state_dict(
        ckpt_dir: str,
        state_dict_relative_path: str = "txllm_model_ckpt.pt",
) -> Dict[str, np.ndarray]:
    """Full fp32 state dict from a reference checkpoint dir.

    Prefers a consolidated txllm_model_ckpt.pt (possibly wrapped as
    {'model_state_dict': sd} by save_pretrained, model_unified.py:1420-1427),
    else consolidates the ZeRO shards (:1376-1382)."""
    consolidated = os.path.join(ckpt_dir, state_dict_relative_path)
    if os.path.exists(consolidated):
        obj = _permissive_torch_load(consolidated)
        if isinstance(obj, dict) and "model_state_dict" in obj:
            obj = obj["model_state_dict"]
        if isinstance(obj, dict) and "state_dict" in obj:
            obj = obj["state_dict"]
        return {k: _to_numpy(v) for k, v in obj.items()}
    return consolidate_zero_checkpoint(ckpt_dir)


# Known llama families for model_args.text_encoder_fname -> config
# (head counts are not recoverable from weight shapes alone).
_LLAMA_FAMILIES = {
    "llama-3": dict(n_heads=32, n_kv_heads=8, rope_theta=500000.0,
                    max_seq_len=8192),
    "llama-2": dict(n_heads=32, n_kv_heads=32, rope_theta=10000.0,
                    max_seq_len=4096),
    "llama": dict(n_heads=32, n_kv_heads=32, rope_theta=10000.0,
                  max_seq_len=2048),
}


def unified_config_from_checkpoint(
        margs, weights: Dict[str, np.ndarray], *,
        llama_config: Optional[llama.LlamaConfig] = None,
        esm_config: Optional["esm2.ESM2Config"] = None,
        dtype=jnp.bfloat16) -> unified.UnifiedConfig:
    """model_args.pt fields + weight shapes -> UnifiedConfig
    (the config-extraction half of from_pretrained, model_unified.py:
    1325-1340). Explicit llama_config/esm_config override name-based
    inference (needed for synthetic/tiny checkpoints)."""
    def marg(name, default):
        return getattr(margs, name, default) if margs is not None else default

    if llama_config is None:
        name = str(marg("text_encoder_fname", "llama-3-8b")).lower()
        fam = None
        for key in ("llama-3", "llama-2", "llama"):
            if key in name:
                fam = dict(_LLAMA_FAMILIES[key])
                break
        if fam is None:
            raise ValueError(
                f"cannot infer llama config from text_encoder_fname="
                f"{name!r}; pass llama_config explicitly")
        embed = weights["text_encoder.model.model.embed_tokens.weight"]
        import re as _re

        layer_ids = {int(m.group(1)) for k in weights
                     if (m := _re.match(
                         r"text_encoder\.model\.model\.layers\.(\d+)\.", k))}
        gate = weights["text_encoder.model.model.layers.0.mlp."
                       "gate_proj.weight"]
        kproj = weights["text_encoder.model.model.layers.0.self_attn."
                        "k_proj.weight"]
        dim = embed.shape[1]
        head_dim = dim // fam["n_heads"]
        llama_config = llama.LlamaConfig(
            vocab_size=embed.shape[0], dim=dim,
            n_layers=max(layer_ids) + 1, n_heads=fam["n_heads"],
            n_kv_heads=kproj.shape[0] // head_dim,
            intermediate=gate.shape[0], rope_theta=fam["rope_theta"],
            max_seq_len=fam["max_seq_len"], dtype=dtype)

    live_esm = any(k.startswith("protein_seq_encoder.model.")
                   for k in weights)
    if live_esm and esm_config is None:
        esm_prefix = "protein_seq_encoder.model."
        if esm_prefix + "embed_tokens.weight" in weights:
            edim = weights[esm_prefix + "embed_tokens.weight"].shape[1]
        else:
            edim = weights[
                esm_prefix + "esm.embeddings.word_embeddings.weight"].shape[1]
        by_dim = {v["dim"]: name for name, v in esm2._SIZES.items()}
        if edim not in by_dim:
            raise ValueError(
                f"unknown ESM2 width {edim}; pass esm_config explicitly")
        esm_config = esm2.esm2_config(by_dim[edim], dtype=dtype)

    def proj_dims(prefix):
        first = weights.get(prefix + "0.weight")
        if first is None:
            return None
        idxs = sorted({int(k[len(prefix):].split(".")[0])
                       for k in weights if k.startswith(prefix)
                       and k[len(prefix):].split(".")[0].isdigit()})
        last = weights[f"{prefix}{idxs[-1]}.weight"]
        hidden = first.shape[0] if len(idxs) > 1 else 0
        return dict(n_layers=len(idxs), in_dim=first.shape[1],
                    out_dim=last.shape[0], hidden=hidden)

    tok = proj_dims("token_projectors.aaseq.")
    shared = proj_dims("aaseq_shared_projector.")
    lm = proj_dims("aaseq_lm_projector.")
    struct = proj_dims("token_projectors.prot_structure.")
    drug = proj_dims("token_projectors.drug.")
    if tok is None or shared is None or lm is None:
        missing = [n for n, v in [("token_projectors.aaseq", tok),
                                  ("aaseq_shared_projector", shared),
                                  ("aaseq_lm_projector", lm)] if v is None]
        raise KeyError(
            f"checkpoint is missing projector weights: {missing} — refusing "
            f"to build a config (conversion would produce random projectors)")

    return unified.UnifiedConfig(
        llama=llama_config,
        esm=esm_config if live_esm else None,
        protein_embed_dim=tok["in_dim"],
        token_projector_layers=tok["n_layers"],
        token_projector_hidden=tok["hidden"],
        retrieval_dim=shared["out_dim"],
        retrieval_projector_layers=shared["n_layers"],
        shared_projector_layers=shared["n_layers"],
        shared_projector_hidden=shared["hidden"],
        lm_projector_layers=lm["n_layers"],
        lm_projector_hidden=lm["hidden"],
        use_protein_struct=struct is not None,
        struct_embed_dim=struct["in_dim"] if struct else 512,
        use_drug_embeddings=drug is not None,
        drug_embed_dim=drug["in_dim"] if drug else 512,
        protein_pooling=str(marg("protein_pooling_opt", "mean")),
        dtype=dtype)


def _convert_projector(sub: Dict[str, np.ndarray], dtype, *, name: str):
    """create_mlp Sequential state dict -> our projector param list.

    Sequential indices stride by 3 for intermediate [Linear, Dropout, GELU]
    triples with a bare final Linear; a 1-layer projector is one bias-free
    Linear (model_utils.py:13-43)."""
    idxs = sorted({int(k.split(".")[0]) for k in sub
                   if k.split(".")[0].isdigit()})
    if not idxs:
        raise KeyError(f"projector {name!r}: no Sequential weights found")
    layers = []
    for i in idxs:
        w = sub.get(f"{i}.weight")
        if w is None:
            raise KeyError(f"projector {name!r}: missing {i}.weight")
        layer = {"w": jnp.asarray(np.asarray(w).T, dtype)}
        if f"{i}.bias" in sub:
            layer["b"] = jnp.asarray(sub[f"{i}.bias"], dtype)
        layers.append(layer)
    if len(layers) > 1 and any("b" not in l for l in layers):
        raise ValueError(f"projector {name!r}: multi-layer projector with "
                         f"missing biases — unexpected reference layout")
    return layers


# frozen modality tables exported alongside the converted model
# (nn.Embedding.from_pretrained tables, model_unified.py:189-300)
_FROZEN_TABLES = {
    "protein_seq_embeddings.weight": "protein_seq_embeddings.npy",
    "domain_embeddings.weight": "domain_embeddings.npy",
    "peptide_embeddings.weight": "peptide_embeddings.npy",
    "protein_struct_embeddings.weight": "protein_struct_embeddings.npy",
    "drug_structure_embeddings.weight": "drug_structure_embeddings.npy",
}

# key suffixes that have no target in the functional pytree and are safe to
# drop (rotary caches are recomputed; contact head is unused; inv_freq is
# derived from config)
_IGNORABLE_SUFFIXES = (
    "rotary_emb.inv_freq", "rot_emb.inv_freq", "masked_spec_embed",
    "contact_head.regression.weight", "contact_head.regression.bias",
    "embeddings.position_ids", "position_embeddings.weight",
)


def convert_reference_checkpoint(
        ckpt_dir: str, out_dir: str,
        cfg: Optional[unified.UnifiedConfig] = None, *,
        llama_config: Optional[llama.LlamaConfig] = None,
        esm_config=None, tokenizer_info=None, dtype=jnp.bfloat16,
        state_dict_relative_path: str = "txllm_model_ckpt.pt"):
    """Released ProCyon checkpoint dir -> this framework's layout.

    Full from_pretrained parity (model_unified.py:1295-1408): consolidates
    ZeRO-2 shards if needed, parses model_args.pt into a UnifiedConfig (when
    cfg is None), and maps every trained parameter group:
      text_encoder.model.*           -> llama tree (incl. the resized
                                        vocab rows — the reference resizes to
                                        len(tokenizer)-1, [EXT] has no row,
                                        model_unified.py:166,:1130-1133; we
                                        size cfg.llama.vocab_size from the
                                        checkpoint so rows align exactly)
      protein_seq_encoder.model.*    -> esm tree (fair-esm or HF naming)
      token_projectors.{aaseq,prot_structure,drug}.* -> token/struct/drug
      aaseq_shared_projector.*       -> shared_projector
      aaseq_lm_projector.*           -> lm_projector
      contrastive_head.temperature   -> contrastive.log_temp
    Frozen modality tables (protein_seq/domain/peptide/struct/drug
    embeddings) are exported to {out_dir}/embeddings/*.npy for the data
    store. Raises on any missing required group; returns (out_dir, report).
    """
    weights = load_reference_state_dict(
        ckpt_dir, state_dict_relative_path=state_dict_relative_path)
    margs, _dargs = load_checkpoint_args(ckpt_dir)
    if cfg is None:
        cfg = unified_config_from_checkpoint(
            margs, weights, llama_config=llama_config,
            esm_config=esm_config, dtype=dtype)

    consumed = set()

    def subdict(prefix):
        sub = {}
        for k, v in weights.items():
            if k.startswith(prefix):
                sub[k[len(prefix):]] = v
                consumed.add(k)
        return sub

    report = {"converted": [], "skipped": [], "exported_tables": []}
    params = unified.init_params(__import__("jax").random.PRNGKey(0), cfg)

    # --- decoder ---------------------------------------------------------
    llama_sd = subdict("text_encoder.model.")
    if not llama_sd:
        raise KeyError(
            "checkpoint has no text_encoder.model.* keys — not a ProCyon "
            "checkpoint (or the state dict failed to load)")
    embed_rows = llama_sd["model.embed_tokens.weight"].shape[0]
    if embed_rows != cfg.llama.vocab_size:
        raise ValueError(
            f"decoder vocab mismatch: checkpoint embed has {embed_rows} "
            f"rows, config says {cfg.llama.vocab_size}. The reference "
            f"resizes to len(tokenizer)-1 (model_unified.py:166) — size the "
            f"config from the checkpoint, not the tokenizer.")
    params["llama"] = convert_hf_llama(llama_sd, cfg.llama)
    report["converted"].append("llama")

    # --- protein encoder (live mode; Bind-style ckpts) --------------------
    esm_sd = subdict("protein_seq_encoder.model.")
    if esm_sd:
        if cfg.esm is None:
            raise ValueError(
                "checkpoint has live ESM weights but config is in "
                "frozen-embedding mode (use_aaseq_embeddings)")
        if any(k.startswith("esm.") for k in esm_sd):
            params["esm"] = convert_hf_esm2(esm_sd, cfg.esm)
        else:
            params["esm"] = convert_fairesm_esm2(esm_sd, cfg.esm)
        report["converted"].append("esm")
    elif cfg.esm is not None:
        raise KeyError(
            "config expects a live ESM encoder but the checkpoint has no "
            "protein_seq_encoder.model.* keys")

    # --- projectors -------------------------------------------------------
    proj_map = {
        "token_projector": "token_projectors.aaseq.",
        "shared_projector": "aaseq_shared_projector.",
        "lm_projector": "aaseq_lm_projector.",
    }
    if cfg.use_protein_struct:
        proj_map["struct_projector"] = "token_projectors.prot_structure."
    if cfg.use_drug_embeddings:
        proj_map["drug_projector"] = "token_projectors.drug."
    for ours, prefix in proj_map.items():
        sub = subdict(prefix)
        if not sub:
            raise KeyError(
                f"checkpoint is missing {prefix}* weights for the "
                f"{ours!r} projector — converted model would have random "
                f"projectors (VERDICT round-1 Missing #1); refusing.")
        params["projectors"][ours] = _convert_projector(sub, cfg.dtype,
                                                        name=ours)
        report["converted"].append(ours)

    # --- contrastive temperature ------------------------------------------
    t_key = "contrastive_head.temperature"
    if t_key not in weights:
        raise KeyError(
            f"checkpoint is missing {t_key} — retrieval scores would use a "
            f"random temperature; refusing.")
    t = float(np.asarray(weights[t_key]).reshape(-1)[0])
    consumed.add(t_key)
    ccfg = cfg.contrastive
    params["contrastive"]["log_temp"] = jnp.asarray(
        np.log(np.clip(t, ccfg.min_temperature, ccfg.max_temperature)),
        jnp.float32)
    report["converted"].append("contrastive")

    # optional projection heads (use_projection_cl; off in released configs,
    # configs/llama3-full.yml:101) — flagged, not silently dropped
    for k in weights:
        if k.startswith("contrastive_head.") and k not in consumed:
            report["skipped"].append(k)
            consumed.add(k)

    # --- frozen modality tables -------------------------------------------
    emb_dir = os.path.join(out_dir, "embeddings")
    for key, fname in _FROZEN_TABLES.items():
        if key in weights:
            os.makedirs(emb_dir, exist_ok=True)
            np.save(os.path.join(emb_dir, fname),
                    np.asarray(weights[key], np.float32))
            consumed.add(key)
            report["exported_tables"].append(fname)

    # --- coverage ----------------------------------------------------------
    leftover = [k for k in weights if k not in consumed
                and not k.endswith(_IGNORABLE_SUFFIXES)]
    if leftover:
        raise KeyError(
            f"{len(leftover)} checkpoint keys were not mapped (first 20): "
            f"{sorted(leftover)[:20]} — extend the converter instead of "
            f"dropping weights silently.")

    # structural check: converted tree must match init exactly
    import jax

    ref_shapes = jax.tree_util.tree_map(
        lambda x: (x.shape, x.dtype),
        unified.init_params(jax.random.PRNGKey(0), cfg))
    got_shapes = jax.tree_util.tree_map(lambda x: (x.shape, x.dtype), params)
    if ref_shapes != got_shapes:
        raise ValueError(
            "converted parameter tree does not match the config's init "
            "structure — shapes/dtypes diverged; check the config "
            "extraction.\nexpected != got (run tree_map diff to inspect)")

    save_model(out_dir, params, cfg, tokenizer_info=tokenizer_info)
    with open(os.path.join(out_dir, "conversion_report.json"), "w") as f:
        json.dump(report, f, indent=2)
    return out_dir, report


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
