"""Benchmark evaluation framework.

Equivalent of procyon/evaluate/framework (SURVEY.md §2.1 L6):
  core.py      — run_evaluation orchestration + model zoo
  retrieval.py — target sets, label matrices, retrieval metrics
  qa.py        — yes/no accuracy + macro-F1
  caption.py   — ROUGE-L / BLEU (+ optional BERTScore)
  metrics.py   — Fmax, top-k P/R, per-query AUROC/AUPRC, bootstrap CIs
  utils.py     — metric writing, caching, bootstrap bounds
  baselines/   — kNN, MLP, random, BLAST-matrix comparison models
"""
