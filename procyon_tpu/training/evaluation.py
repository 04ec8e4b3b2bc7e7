"""Mid-train held-out evaluation (the reference's `_run_eval`,
procyon/training/trainIT.py:1556-1654).

What the reference does every eval_steps: builds val-split loaders, embeds
ALL proteins through the current model (all-gathered across ranks,
:1594-1610), computes retrieval AUROC/AUPRC from val-query cosine scores
against the full protein set (:1626-1654), and QA / caption val losses.
Early stopping watches the resulting metric.

TPU-native shape: the all-protein embedding sweep is a batched jit over the
shared projector (frozen-table mode) or the live ESM encoder; no explicit
all_gather is needed — callers can wrap `eval_fn` in a sharded jit if the
protein set is large.
"""

from typing import Callable, Dict, Optional, Sequence

import numpy as np

from procyon_tpu.evaluate.metrics import per_query_auroc_auprc
from procyon_tpu.models import unified
from procyon_tpu.training import train_step as ts


def all_protein_target_embeddings(params, cfg: unified.UnifiedConfig,
                                  store, protein_ids: Sequence[int], *,
                                  batch: int = 512,
                                  max_protein_len: int = 1024) -> np.ndarray:
    """[P, retrieval_dim] shared-projector embeddings for every protein id
    (get_all_protein_embeddings, model_utils.py:44-96 + the trainer's eval
    sweep, trainIT.py:1594-1610)."""
    import jax.numpy as jnp

    out = []
    embed = unified.protein_embed_fn(cfg) if cfg.esm is not None else None
    for i in range(0, len(protein_ids), batch):
        chunk = protein_ids[i:i + batch]
        if cfg.esm is not None:
            from procyon_tpu import native
            from procyon_tpu.data.protein_tokenizer import \
                bucket_protein_batch

            # width pinned + rows bucketed so the jitted sweep compiles
            # once, not per chunk shape (chunk splits vary row counts)
            pb = bucket_protein_batch(
                native.batch_encode(
                    [store.protein_sequence(a) for a in chunk],
                    max_len=max_protein_len),
                width=max_protein_len + 2)
            emb = embed(params, jnp.asarray(pb.tokens),
                        jnp.asarray(pb.group_ids),
                        jnp.asarray(pb.row_valid),
                        pb.tokens.shape[0])[:pb.num_groups]
        else:
            raw = jnp.asarray(np.stack(
                [store.protein_embedding(a) for a in chunk]))
            emb = unified.target_protein_embeddings(params, cfg, raw)
        out.append(np.asarray(emb, np.float32))
    return np.concatenate(out, 0)


def build_midtrain_eval(cfg: unified.UnifiedConfig, *,
                        val_streams: Dict[str, Callable[[], Dict]],
                        store=None,
                        all_protein_ids: Optional[Sequence[int]] = None,
                        n_batches: int = 8,
                        to_device: Optional[Callable] = None,
                        protein_batch: int = 512) -> Callable:
    """eval_fn(params) -> metrics over HELD-OUT streams.

    val_streams must be built from val/test-split datasets (DatasetEntry
    splits=["val"]), not the train streams — that was round-1 Weak #4.

    Per task:
      qa / caption / mlm: mean val loss/ppl/acc over n_batches
      retrieval: for each val batch, [PROT] query embeddings scored against
        the FULL protein target set (cosine); per-query AUROC/AUPRC with the
        batch's positive as the single label (trainIT.py:1626-1654)
    """
    import jax
    import jax.numpy as jnp

    to_device = to_device or (lambda b: b)
    eval_steps = {t: ts.make_eval_step(cfg, t) for t in val_streams
                  if t != "retrieval"}

    def query_embed_fn(params, batch):
        return unified.retrieval_query_embedding(params, cfg, batch)

    query_embed = jax.jit(query_embed_fn)

    def eval_fn(params) -> Dict[str, float]:
        metrics: Dict[str, float] = {}
        for task, stream in val_streams.items():
            if task == "retrieval":
                continue
            sums: Dict[str, float] = {}
            for _ in range(n_batches):
                raw = stream()
                m = eval_steps[task](params, to_device({
                    k: v for k, v in raw.items()
                    if k != "reference_indices"}))
                for k, v in m.items():
                    sums[k] = sums.get(k, 0.0) + float(v)
            for k, v in sums.items():
                metrics[f"{task}/{k}"] = v / n_batches

        if "retrieval" in val_streams and store is not None and \
                all_protein_ids is not None:
            targets = all_protein_target_embeddings(
                params, cfg, store, all_protein_ids, batch=protein_batch)
            tn = targets / np.maximum(
                np.linalg.norm(targets, axis=1, keepdims=True), 1e-8)
            id_to_col = {a: i for i, a in enumerate(all_protein_ids)}
            aurocs, auprcs, losses = [], [], []
            for _ in range(n_batches):
                raw = val_streams["retrieval"]()
                pos_ids = raw["reference_indices"]["aaseq"]
                batch = to_device({k: v for k, v in raw.items()
                                   if k != "reference_indices"})
                q = np.asarray(query_embed(params, batch), np.float32)
                qn = q / np.maximum(
                    np.linalg.norm(q, axis=1, keepdims=True), 1e-8)
                scores = qn @ tn.T                     # [B, P]
                labels = np.zeros_like(scores)
                for r, a in enumerate(pos_ids):
                    col = id_to_col.get(int(a))
                    if col is not None:
                        labels[r, col] = 1.0
                auroc, auprc = per_query_auroc_auprc(labels, scores)
                aurocs.append(auroc)
                auprcs.append(auprc)
            metrics["retrieval/auroc"] = float(np.nanmean(aurocs))
            metrics["retrieval/auprc"] = float(np.nanmean(auprcs))

        # the trainer's early-stopping scalar: val losses summed
        # (retrieval contributes negated AUPRC so "lower is better" holds)
        loss_terms = [v for k, v in metrics.items() if k.endswith("/loss")]
        total = float(np.sum(loss_terms)) if loss_terms else 0.0
        if "retrieval/auprc" in metrics:
            total -= metrics["retrieval/auprc"]
        metrics["loss"] = total
        return metrics

    return eval_fn
