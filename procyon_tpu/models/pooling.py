"""Protein pooling with chunk-regrouping for long proteins.

Equivalent of the reference's ProteinPooler (procyon/model/esm.py:131-217)
plus the long-protein chunk-split machinery batched_split_long_seq /
reverse_batched_split (procyon/training/train_utils.py:1497-1649): sequences
longer than the encoder window are split into multiple batch rows sharing a
`batch_key`, encoded independently, then pooled back together.

TPU-native: instead of ragged python regrouping, rows carry a static-shape
`group_ids` vector and pooling is a segment-sum (one-hot matmul -> MXU),
fully jit-compatible.
"""

import jax
import jax.numpy as jnp


def pool_tokens(hidden, token_mask, method="mean"):
    """Pool [B, S, D] -> [B, D] over token_mask [B, S] (1 = count it)."""
    mask = token_mask.astype(hidden.dtype)[..., None]
    if method == "mean":
        denom = jnp.maximum(mask.sum(1), 1e-6)
        return (hidden * mask).sum(1) / denom
    if method == "max":
        neg = jnp.asarray(-1e30, hidden.dtype)
        masked = jnp.where(mask > 0, hidden, neg)
        out = masked.max(1)
        return jnp.where(mask.sum(1) > 0, out, 0.0)
    if method == "cls":
        return hidden[:, 0]
    raise ValueError(f"unknown pooling method {method!r}")


def regroup_chunks(row_embeds, group_ids, num_groups, *, row_valid=None,
                   method="mean"):
    """Merge chunk-row embeddings back to per-protein embeddings.

    row_embeds [R, D]: one embedding per (possibly chunked) row.
    group_ids  [R]: which original protein each row belongs to.
    num_groups: static number of output proteins.
    row_valid  [R]: 0 for padding rows.
    """
    if row_valid is None:
        row_valid = jnp.ones(group_ids.shape, row_embeds.dtype)
    row_valid = row_valid.astype(row_embeds.dtype)
    one_hot = jax.nn.one_hot(group_ids, num_groups,
                             dtype=row_embeds.dtype)  # [R, G]
    one_hot = one_hot * row_valid[:, None]
    if method == "mean":
        sums = one_hot.T @ row_embeds  # [G, D]
        counts = jnp.maximum(one_hot.sum(0)[:, None], 1e-6)
        return sums / counts
    if method == "max":
        # [G, R, D] masked max — fine for the modest chunk counts involved
        mask = one_hot.T[..., None] > 0
        expanded = jnp.where(mask, row_embeds[None], -1e30)
        out = expanded.max(1)
        return jnp.where(one_hot.sum(0)[:, None] > 0, out, 0.0)
    raise ValueError(f"unknown regroup method {method!r}")
