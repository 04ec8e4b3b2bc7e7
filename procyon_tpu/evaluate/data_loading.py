"""Eval dataset assembly.

Equivalent of procyon/evaluate/framework/utils.py:load_datasets_for_eval
(:163-242) + get_train_relations_for_eval_dataset (:299-410): build the
per-dataset dicts `core.run_evaluation` consumes from the DATA_DIR relation
CSVs (or synthetic fixtures), including train-leak masking pairs.
"""

from typing import Dict, Optional, Sequence

import numpy as np

from procyon_tpu.data import datasets as D
from procyon_tpu.evaluate.utils import get_train_relations_for_eval


def build_eval_dataset(*, eval_relations, train_relations,
                       all_protein_ids, task: str,
                       qa_negatives_per_positive: int = 1,
                       references: Optional[Dict] = None,
                       seed: int = 0) -> Dict:
    """One run_evaluation dataset entry from relation lists."""
    query_order = sorted({t for _, t in eval_relations})
    entry = {"task": task}
    if task == "retrieval":
        entry.update({
            "eval_relations": list(eval_relations),
            "query_order": query_order,
            "all_protein_ids": list(all_protein_ids),
            "train_leak_pairs": get_train_relations_for_eval(
                train_relations, query_order, list(all_protein_ids)),
        })
    elif task == "qa":
        rng = np.random.default_rng(seed)
        true_by_text = {}
        for a, t in list(train_relations) + list(eval_relations):
            true_by_text.setdefault(t, set()).add(a)
        samples = []
        ids = list(all_protein_ids)
        for a, t in eval_relations:
            samples.append((a, t, 1))
            for _ in range(qa_negatives_per_positive):
                neg = int(rng.choice(ids))
                while neg in true_by_text.get(t, ()):
                    neg = int(rng.choice(ids))
                samples.append((neg, t, 0))
        entry["qa_samples"] = samples
    elif task == "caption":
        refs = references or {}
        entry.update({
            "caption_targets": sorted({a for a, _ in eval_relations}),
            "references": refs,
        })
    return entry


def load_datasets_for_eval(data_dir: str, entries: Sequence[Dict], *,
                           store=None, split: str = "test",
                           train_split: str = "train",
                           split_method: str = "random_split") -> Dict:
    """entries: [{aaseq_type, text_type, relation, tasks: [...]}].
    Returns {dataset_name: run_evaluation entry}."""
    out = {}
    for e in entries:
        ds_eval = D.AASeqTextRelationDataset.from_csv(
            data_dir, e.get("aaseq_type", "protein"), e["text_type"],
            e.get("relation") and [e["relation"]], split,
            split_method=split_method, store=store)
        ds_train = D.AASeqTextRelationDataset.from_csv(
            data_dir, e.get("aaseq_type", "protein"), e["text_type"],
            e.get("relation") and [e["relation"]], train_split,
            split_method=split_method, store=store)
        eval_rel = [(r.aaseq_idx, r.text_idx) for r in ds_eval.relations]
        train_rel = [(r.aaseq_idx, r.text_idx) for r in ds_train.relations]
        all_ids = sorted({a for a, _ in eval_rel + train_rel})
        for task in e.get("tasks", ["retrieval", "qa"]):
            name = f"{e['text_type']}_{e.get('relation', 'all')}_{task}"
            out[name] = build_eval_dataset(
                eval_relations=eval_rel, train_relations=train_rel,
                all_protein_ids=all_ids, task=task)
    return out
