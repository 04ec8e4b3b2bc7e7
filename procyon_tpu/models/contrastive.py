"""Contrastive heads: in-batch InfoNCE with global (cross-device) batch.

Equivalent of the reference's InfoNCEInBatch (procyon/model/contrastive.py:
95-204): learnable temperature clamped to [0.001, 0.5] (:123-124),
L2-normalized embeddings, cross-device all-gather of both sides with
rank-offset cross-entropy targets (:141-168), an optional negatives mask
multiplied into the score matrix (:179-196), and a symmetric
(seq->text + text->seq)/2 loss (:200-204).

TPU-native: the reference needs torch.distributed.nn.functional.all_gather
for a differentiable gather; under GSPMD `jax.lax.all_gather` inside
shard_map is differentiable by construction, and the rank offset is
`jax.lax.axis_index` (SURVEY.md §2.3 "Contrastive global batch").

The loss function is written to be used either:
  * un-sharded (single device / no mesh): axis_name=None — plain in-batch;
  * inside shard_map over a `data` axis: axis_name="data" — global batch.
"""

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class InfoNCEConfig:
    temperature: float = 0.07
    min_temperature: float = 0.001
    max_temperature: float = 0.5
    symmetric: bool = True
    dtype: Any = jnp.float32


def init_params(cfg: InfoNCEConfig):
    return {"log_temp": jnp.asarray(jnp.log(cfg.temperature), jnp.float32)}


def _normalize(x):
    x = x.astype(jnp.float32)
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)


def info_nce_in_batch(params, cfg: InfoNCEConfig, seq_embeds, text_embeds,
                      *, valid=None, conflict_mask=None, conflict_ids=None,
                      axis_name: Optional[str] = None):
    """Symmetric in-batch InfoNCE.

    seq_embeds, text_embeds: [N, D] aligned positive pairs (row i of each is a
      positive pair).
    valid: [N] bool — padding rows excluded from loss and from serving as
      negatives for others.
    conflict_mask: [N, N] (local x global after gather) multiplicative mask, 1
      = usable negative, 0 = known-positive collision to exclude
      (model_unified.py:615-693's dataset-id conflict mask). HOST-BUILT and
      local-only: it is an error under axis_name (a local [N, N] mask
      cannot cover the gathered columns) - pass conflict_ids instead.
    conflict_ids: [N] int, dataset-tagged text ids. The global conflict
      mask is built IN-GRAPH: ids are all-gathered alongside the embeddings
      and column j is masked for row i when ids collide off-diagonal (the
      reference all-gathers ID vectors exactly for this,
      model_unified.py:615-630 + compute_conflict_matrix,
      model_utils.py:135-150). Works with or without axis_name.
    Returns (loss, metrics dict).
    """
    temp = jnp.clip(jnp.exp(params["log_temp"]), cfg.min_temperature,
                    cfg.max_temperature)
    z_s = _normalize(seq_embeds)
    z_t = _normalize(text_embeds)
    n_local = z_s.shape[0]
    if valid is None:
        valid = jnp.ones((n_local,), bool)

    if axis_name is not None:
        if conflict_mask is not None:
            raise ValueError(
                "conflict_mask is a local [N, N] host-built mask and "
                "cannot be used with axis_name (the gathered batch has "
                "N_global columns); pass conflict_ids instead")
        z_s_all = jax.lax.all_gather(z_s, axis_name, tiled=True)
        z_t_all = jax.lax.all_gather(z_t, axis_name, tiled=True)
        valid_all = jax.lax.all_gather(valid, axis_name, tiled=True)
        offset = jax.lax.axis_index(axis_name) * n_local
    else:
        z_s_all, z_t_all, valid_all = z_s, z_t, valid
        offset = 0

    if conflict_ids is not None:
        ids_all = jax.lax.all_gather(conflict_ids, axis_name, tiled=True) \
            if axis_name is not None else conflict_ids
        id_conflict = conflict_ids[:, None] == ids_all[None, :]  # [N, Ng]
        id_mask = jnp.where(id_conflict, 0.0, 1.0)
        conflict_mask = id_mask if conflict_mask is None \
            else conflict_mask * id_mask

    # scores: local rows vs global columns
    logits_s2t = (z_s @ z_t_all.T) / temp  # [N_local, N_global]
    logits_t2s = (z_t @ z_s_all.T) / temp

    targets = jnp.arange(n_local) + offset
    n_global = z_t_all.shape[0]
    col_valid = valid_all[None, :]
    neg_inf = jnp.asarray(-1e30, jnp.float32)

    def masked_ce(logits, targets):
        mask = col_valid
        if conflict_mask is not None:
            # never mask out the positive itself
            pos = jax.nn.one_hot(targets, n_global, dtype=bool)
            mask = mask & ((conflict_mask > 0) | pos)
        logits = jnp.where(mask, logits, neg_inf)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
        ce = jnp.where(valid, ce, 0.0)
        return ce.sum() / jnp.maximum(valid.sum(), 1)

    loss_s2t = masked_ce(logits_s2t, targets)
    if cfg.symmetric:
        loss_t2s = masked_ce(logits_t2s, targets)
        loss = 0.5 * (loss_s2t + loss_t2s)
    else:
        loss = loss_s2t

    acc = jnp.where(
        valid, jnp.argmax(
            jnp.where(col_valid, logits_s2t, neg_inf), axis=-1) == targets,
        False).sum() / jnp.maximum(valid.sum(), 1)
    metrics = {"contrastive_acc": acc, "temperature": temp,
               "logits_pos": jnp.mean(jnp.where(
                   valid,
                   jnp.take_along_axis(logits_s2t, targets[:, None], 1)[:, 0],
                   0.0))}
    return loss, metrics


def info_nce_explicit(params, cfg: InfoNCEConfig, seq_embeds, text_embeds,
                      neg_seq_embeds, *, valid=None):
    """InfoNCE with explicit negatives (contrastive.py:22-93): positive pair
    (i, i) against K preset negative proteins per row, logsumexp form.

    neg_seq_embeds: [N, K, D]."""
    temp = jnp.clip(jnp.exp(params["log_temp"]), cfg.min_temperature,
                    cfg.max_temperature)
    z_s = _normalize(seq_embeds)          # [N, D]
    z_t = _normalize(text_embeds)         # [N, D]
    z_n = _normalize(neg_seq_embeds)      # [N, K, D]
    if valid is None:
        valid = jnp.ones((z_s.shape[0],), bool)
    pos = jnp.sum(z_s * z_t, -1) / temp                     # [N]
    neg = jnp.einsum("nd,nkd->nk", z_t, z_n) / temp         # [N, K]
    logits = jnp.concatenate([pos[:, None], neg], axis=1)   # [N, 1+K]
    ce = -jax.nn.log_softmax(logits, axis=-1)[:, 0]
    ce = jnp.where(valid, ce, 0.0)
    loss = ce.sum() / jnp.maximum(valid.sum(), 1)
    acc = jnp.where(valid, jnp.argmax(logits, -1) == 0, False).sum() /         jnp.maximum(valid.sum(), 1)
    return loss, {"contrastive_acc": acc, "temperature": temp}


def max_margin_loss(seq_embeds, text_embeds, neg_text_embeds, *, margin=1.0):
    """MaxMarginContrastiveLoss analogue (contrastive.py:229-268): hinge on
    cosine(pos) - cosine(neg) with explicit negatives [N, K, D]."""
    z_s = _normalize(seq_embeds)[:, None, :]
    z_p = _normalize(text_embeds)[:, None, :]
    z_n = _normalize(neg_text_embeds)
    pos = jnp.sum(z_s * z_p, -1)  # [N, 1]
    neg = jnp.sum(z_s * z_n, -1)  # [N, K]
    return jnp.mean(jnp.maximum(0.0, margin - pos + neg))


def projection_head_init(key, dim, proj_dim, dtype=jnp.float32):
    """ProjectionHead analogue (contrastive.py:206-227): linear-GELU-linear
    with residual + layer norm."""
    k1, k2 = jax.random.split(key)
    return {
        "proj_w": (jax.random.normal(k1, (dim, proj_dim)) / dim ** 0.5
                   ).astype(dtype),
        "fc_w": (jax.random.normal(k2, (proj_dim, proj_dim)) / proj_dim ** 0.5
                 ).astype(dtype),
        "fc_b": jnp.zeros((proj_dim,), dtype),
        "norm_w": jnp.ones((proj_dim,), dtype),
        "norm_b": jnp.zeros((proj_dim,), dtype),
    }


def projection_head_apply(params, x):
    from procyon_tpu.ops.norms import layer_norm
    proj = x @ params["proj_w"]
    h = jax.nn.gelu(proj, approximate=False) @ params["fc_w"] + params["fc_b"]
    return layer_norm(h + proj, params["norm_w"], params["norm_b"])
