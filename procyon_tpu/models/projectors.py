"""Projector MLP factories.

Equivalent of the reference's create_mlp (procyon/model/model_utils.py:13-43):
a 1-layer projector is a single bias-free Linear; deeper projectors are
[Linear -> Dropout -> GELU]* -> Linear stacks.  Used for token projectors
(protein/struct/drug -> LLM token space), the retrieval lm/shared projectors,
and the contrastive projection heads.
"""

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ProjectorConfig:
    in_dim: int
    out_dim: int
    n_layers: int = 1
    hidden_dim: int = 0  # 0 -> use out_dim
    dropout: float = 0.0
    dtype: Any = jnp.bfloat16


def _dims(cfg: ProjectorConfig) -> Sequence[int]:
    hidden = cfg.hidden_dim or cfg.out_dim
    if cfg.n_layers == 1:
        return [cfg.in_dim, cfg.out_dim]
    return [cfg.in_dim] + [hidden] * (cfg.n_layers - 1) + [cfg.out_dim]


def init_params(key, cfg: ProjectorConfig):
    dims = _dims(cfg)
    params = []
    keys = jax.random.split(key, len(dims) - 1)
    for i, (d_in, d_out) in enumerate(zip(dims[:-1], dims[1:])):
        w = (jax.random.normal(keys[i], (d_in, d_out), jnp.float32)
             / (d_in ** 0.5)).astype(cfg.dtype)
        layer = {"w": w}
        # the reference's 1-layer projector is bias-free (model_utils.py:20-24)
        if cfg.n_layers > 1:
            layer["b"] = jnp.zeros((d_out,), cfg.dtype)
        params.append(layer)
    return params


def apply(params, cfg: ProjectorConfig, x, *, dropout_rng=None,
          deterministic=True):
    n = len(params)
    for i, layer in enumerate(params):
        x = x @ layer["w"]
        if "b" in layer:
            x = x + layer["b"]
        if i < n - 1:
            if not deterministic and cfg.dropout > 0:
                dropout_rng, sub = jax.random.split(dropout_rng)
                keep = jax.random.bernoulli(sub, 1 - cfg.dropout, x.shape)
                x = jnp.where(keep, x / (1 - cfg.dropout), 0)
            x = jax.nn.gelu(x, approximate=False)
    return x
