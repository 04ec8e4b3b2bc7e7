"""Inference: jit-compiled generation (sampling + diverse beam search with a
KV cache) and retrieval-service helpers.

Replaces the reference's python-loop generate (model_unified.py:701-1027) and
procyon/inference/retrieval_utils.py.
"""
