"""Benchmark ESM2-650M embedding in bf16 vs int8-W8A8 on the real chip,
with an embedding-quality cross-check (cosine vs bf16)."""
import os
import sys
import dataclasses

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from procyon_tpu.models import esm2
from procyon_tpu.models.pooling import pool_tokens
from procyon_tpu.utils.timing import time_fn


def tokens_batch(batch, seq_len, seed=0):
    rng = np.random.default_rng(seed)
    toks = np.full((batch, seq_len), esm2.PAD_IDX, np.int32)
    for i in range(batch):
        n = rng.integers(seq_len // 2, seq_len - 2)
        toks[i, 0] = esm2.CLS_IDX
        toks[i, 1:n + 1] = rng.integers(4, 24, n)
        toks[i, n + 1] = esm2.EOS_IDX
    return jnp.asarray(toks)


def main():
    B, S = 64, 512
    cfg = esm2.esm2_config("650m", max_seq_len=S, dtype=jnp.bfloat16,
                           attn_backend="rowblock")
    params = esm2.init_params(jax.random.PRNGKey(0), cfg)
    toks = tokens_batch(B, S)

    def embed_with(cfg_):
        @jax.jit
        def f(p, t):
            out = esm2.forward(p, cfg_, t)
            mask = (t != esm2.PAD_IDX).astype(jnp.int32)
            return pool_tokens(out["hidden"], mask, "mean")
        return f

    f_bf16 = embed_with(cfg)
    dt = time_fn(f_bf16, params, toks)
    e_bf16 = np.asarray(f_bf16(params, toks), np.float32)
    print(f"bf16: {B/dt:.1f} proteins/sec ({dt*1e3:.1f} ms)", flush=True)

    qp = esm2.quantize_params(params, cfg)
    cfg8 = dataclasses.replace(cfg, quant_mode="w8a8")
    f_w8 = embed_with(cfg8)
    dt8 = time_fn(f_w8, qp, toks)
    e_w8 = np.asarray(f_w8(qp, toks), np.float32)
    cos = (e_bf16 * e_w8).sum(1) / (
        np.linalg.norm(e_bf16, axis=1) * np.linalg.norm(e_w8, axis=1))
    print(f"w8a8: {B/dt8:.1f} proteins/sec ({dt8*1e3:.1f} ms) "
          f"cos_min={cos.min():.5f} cos_mean={cos.mean():.5f}", flush=True)

    qpf = esm2.fuse_qkv_params(qp)
    f_w8f = embed_with(cfg8)
    dt8f = time_fn(f_w8f, qpf, toks)
    e_w8f = np.asarray(f_w8f(qpf, toks), np.float32)
    cosf = (e_bf16 * e_w8f).sum(1) / (
        np.linalg.norm(e_bf16, axis=1) * np.linalg.norm(e_w8f, axis=1))
    print(f"w8a8+fused-qkv: {B/dt8f:.1f} proteins/sec ({dt8f*1e3:.1f} ms) "
          f"cos_min={cosf.min():.5f}", flush=True)

    pf = esm2.fuse_qkv_params(params)
    f_bf = embed_with(cfg)
    dtbf = time_fn(f_bf, pf, toks)
    print(f"bf16+fused-qkv: {B/dtbf:.1f} proteins/sec "
          f"({dtbf*1e3:.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
