"""Benchmark evaluation CLI.

Equivalent of the reference's scripts/run_eval_framework.py: args (flags or
--from_yaml) -> run_evaluation over (task x model x dataset), metrics
written to TSV incrementally.

Synthetic smoke run:
  python scripts/run_eval_framework.py --synthetic --output_dir /tmp/eval1
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--from_yaml", type=str, default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--output_dir", type=str, default="eval_out")
    p.add_argument("--cache_dir", type=str, default=None)
    p.add_argument("--tasks", nargs="+",
                   default=["retrieval", "qa"])
    p.add_argument("--models", nargs="+", default=["knn", "random"])
    args = p.parse_args()
    if args.from_yaml:
        import yaml

        with open(args.from_yaml) as f:
            for k, v in (yaml.safe_load(f) or {}).items():
                if hasattr(args, k):
                    setattr(args, k, v)
    return args


def synthetic_datasets():
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((3, 32)) * 5
    embeds, relations = {}, []
    pid = 0
    for c in range(3):
        for _ in range(30):
            embeds[pid] = centers[c] + rng.standard_normal(32) * 0.3
            relations.append((pid, 1000 + c))
            pid += 1
    train = [r for i, r in enumerate(relations) if i % 2 == 0]
    test = [r for i, r in enumerate(relations) if i % 2 == 1]
    qa_samples = [(a, t, 1) for a, t in test] + \
        [(a, 1000 + (t - 999) % 3, 0) for a, t in test]
    from procyon_tpu.evaluate.utils import get_train_relations_for_eval

    queries = [1000, 1001, 1002]
    leaks = get_train_relations_for_eval(train, queries, list(embeds))
    datasets = {
        "synthetic_retrieval": {
            "task": "retrieval", "eval_relations": test,
            "query_order": queries, "all_protein_ids": list(embeds),
            "train_leak_pairs": leaks},
        "synthetic_qa": {"task": "qa", "qa_samples": qa_samples},
    }
    ctx = {"protein_embeddings": embeds, "train_relations": train}
    return datasets, ctx


def main():
    args = parse_args()
    from procyon_tpu.evaluate import core

    if args.synthetic:
        datasets, ctx = synthetic_datasets()
    else:
        raise SystemExit("real-data eval requires DATA_DIR wiring; "
                         "use --synthetic for the integration path")

    eval_args = core.EvalArgs(tasks=tuple(args.tasks),
                              models=tuple(args.models),
                              output_dir=args.output_dir,
                              cache_dir=args.cache_dir)
    results = core.run_evaluation(eval_args, datasets, model_context=ctx)
    for r in results:
        brief = {k: round(v, 4) for k, v in r["metrics"].items()
                 if isinstance(v, float)}
        print(json.dumps({"task": r["task"], "model": r["model"],
                          "dataset": r["dataset"], **brief}))


if __name__ == "__main__":
    main()
