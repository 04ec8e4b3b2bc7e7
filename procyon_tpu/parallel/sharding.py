"""Parameter/batch sharding rules (GSPMD).

Replaces DeepSpeed ZeRO-2 (configs/deepspeed/full_train_ds.json) with
FSDP-style sharding of params and optimizer state along the `fsdp` axis, and
the reference's vestigial tensor-parallel path (pmc_llama.py:177-193) with
first-class head/hidden sharding along `model`.

Rules are path-pattern based over the param pytree produced by
models/*.init_params. Anything not matched is replicated. Dims that do not
divide the axis size fall back to replication on that axis (correctness
first; pad-to-divisible is a later optimization).
"""

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, spec builder). Specs may name axes a param doesn't divide
# into; _fit_spec drops those axes.
_RULES = [
    # llama / esm embeddings [V, D] — shard vocab over fsdp
    (r".*embed$", P("fsdp", None)),
    # stacked attention projections [L, in, out]
    (r".*attn/w[qkv]$", P(None, "fsdp", "model")),
    (r".*attn/wo$", P(None, "model", "fsdp")),
    (r".*attn/b[qkvo]$", P(None, None)),
    # stacked MLPs [L, in, out]
    (r".*mlp/w_gate$", P(None, "fsdp", "model")),
    (r".*mlp/w_up$", P(None, "fsdp", "model")),
    (r".*mlp/w_down$", P(None, "model", "fsdp")),
    (r".*mlp/w1$", P(None, "fsdp", "model")),
    (r".*mlp/w2$", P(None, "model", "fsdp")),
    (r".*mlp/b[12]$", P(None, None)),
    # lm head [D, V]
    (r".*lm_head$", P("fsdp", "model")),
    (r".*lm_head/dense_w$", P("fsdp", None)),
    # projectors [in, out] — shard the big input dim
    (r".*projectors/.*/w$", P("fsdp", None)),
    # LoRA banks [E, in, r] / [E, r, out]
    (r".*/A$", P(None, "fsdp", None)),
    (r".*/B$", P(None, None, "fsdp")),
]


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _fit_spec(spec: P, shape, mesh: Mesh) -> P:
    """Drop sharded axes that don't divide the param dim (replicate there)."""
    out = []
    for i, axis in enumerate(spec):
        if axis is None or i >= len(shape):
            out.append(None)
            continue
        size = mesh.shape[axis]
        if size > 1 and shape[i] % size == 0 and shape[i] >= size:
            out.append(axis)
        else:
            out.append(None)
    # trim/extend to param rank
    out = out[:len(shape)] + [None] * (len(shape) - len(out))
    return P(*out)


def spec_for(path_str: str, shape, mesh: Mesh) -> P:
    for pattern, spec in _RULES:
        if re.fullmatch(pattern, path_str):
            return _fit_spec(spec, shape, mesh)
    return P()  # replicate


def param_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings matching `params`."""
    def one(path, leaf):
        spec = spec_for(_path_str(path), leaf.shape, mesh)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params(params, mesh: Mesh):
    """Device_put params according to the rules."""
    return jax.device_put(params, param_shardings(params, mesh))


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Batch arrays shard their leading dim over (data, fsdp) combined —
    the standard FSDP recipe (fsdp devices also consume distinct data)."""
    return NamedSharding(mesh, P(("data", "fsdp"), *([None] * (ndim - 1))))


# batch entries that are shared banks/scalars, not per-example rows
_REPLICATED_BATCH_KEYS = {"protein_embeds", "drug_embeds", "struct_embeds",
                          "protein_tokens", "protein_group_ids",
                          "protein_row_valid", "yes_token", "no_token",
                          "loss_weight"}


def shard_batch(batch: Any, mesh: Mesh):
    """Shard per-example arrays over (data, fsdp); replicate shared banks
    (the unique-protein embedding table indexed by soft_map is global to
    the batch, not per-row)."""
    def one(key, x):
        if key in _REPLICATED_BATCH_KEYS or x.ndim == 0:
            return jax.device_put(x, NamedSharding(mesh, P()))
        return jax.device_put(x, batch_sharding(mesh, x.ndim))

    if isinstance(batch, dict):
        return {k: one(k, v) for k, v in batch.items()}
    return jax.tree_util.tree_map(lambda x: one("", x), batch)
