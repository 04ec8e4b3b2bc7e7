"""Embedding-space comparison (native equivalent of
embedding_comparison.ipynb, ED Fig 1): how similar are two protein
embedding tables (e.g. raw ESM2-3B vs ProCyon shared-projector space)?

Reports:
  * kNN overlap@k — fraction of each protein's k nearest neighbours shared
    between the two spaces (mean over proteins)
  * linear CKA — global representational similarity
  * norm/cosine summary statistics

Synthetic smoke: python examples/paper_analyses/embedding_comparison.py \
    --synthetic true
Real: pass two .npy/.pt tables via --table_a/--table_b.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def load_table(path):
    if path.endswith(".pt"):
        import torch

        return torch.load(path, map_location="cpu").float().numpy()
    return np.load(path)


def knn_overlap(a, b, k=10):
    def knn(x):
        xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-8)
        sims = xn @ xn.T
        np.fill_diagonal(sims, -np.inf)
        return np.argsort(-sims, axis=1)[:, :k]

    na, nb = knn(a), knn(b)
    return float(np.mean([len(set(na[i]) & set(nb[i])) / k
                          for i in range(len(a))]))


def linear_cka(a, b):
    a = a - a.mean(0)
    b = b - b.mean(0)
    hsic = np.linalg.norm(b.T @ a, "fro") ** 2
    denom = np.linalg.norm(a.T @ a, "fro") * np.linalg.norm(b.T @ b, "fro")
    return float(hsic / max(denom, 1e-12))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--synthetic", type=lambda s: s.lower() == "true",
                   default=False)
    p.add_argument("--table_a", default=None)
    p.add_argument("--table_b", default=None)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--max_rows", type=int, default=4096)
    args = p.parse_args()

    if args.synthetic:
        rng = np.random.default_rng(0)
        a = rng.standard_normal((256, 64)).astype(np.float32)
        # b = a under a random rotation + noise: related but not identical
        q, _ = np.linalg.qr(rng.standard_normal((64, 64)))
        b = (a @ q + 0.3 * rng.standard_normal((256, 64))).astype(
            np.float32)
    else:
        a = load_table(args.table_a)[:args.max_rows]
        b = load_table(args.table_b)[:args.max_rows]
        n = min(len(a), len(b))
        a, b = a[:n], b[:n]

    print(json.dumps({
        "n": len(a),
        "knn_overlap": knn_overlap(a, b, args.k),
        "linear_cka": linear_cka(a.astype(np.float64),
                                 b.astype(np.float64)),
        "mean_norm_a": float(np.linalg.norm(a, axis=1).mean()),
        "mean_norm_b": float(np.linalg.norm(b, axis=1).mean()),
    }))


if __name__ == "__main__":
    main()
