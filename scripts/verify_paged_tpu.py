"""Verify the paged decode attention kernel on the real chip and measure
decode step time vs the gather path (0.9B-class model, paged pool)."""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from procyon_tpu.inference import kv_pool as KP
from procyon_tpu.models import llama as L


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", type=int, default=512,
                    help="max context (pages of 64)")
    ap.add_argument("--prefill", type=int, default=256)
    a = ap.parse_args()

    cfg = L.LlamaConfig(vocab_size=32000, dim=2048, n_layers=16,
                        n_heads=16, n_kv_heads=4, intermediate=5504,
                        max_seq_len=max(1024, a.ctx), dtype=jnp.bfloat16)
    # group = 4, head_dim = 128 -> group_lanes 512: kernel engages
    params = L.init_params(jax.random.PRNGKey(0), cfg)
    pages_per_seq = a.ctx // 64
    pcfg = KP.PagedConfig(n_layers=cfg.n_layers, n_kv_heads=cfg.n_kv_heads,
                          head_dim=cfg.head_dim, page_size=64,
                          n_pages=8 * pages_per_seq + 8,
                          max_pages_per_seq=pages_per_seq, slots=8,
                          dtype=cfg.dtype)
    B, T = 8, a.prefill
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(4, 32000, (B, T)), jnp.int32)
    slots = jnp.arange(B, dtype=jnp.int32)

    def fresh_pool():
        pool = KP.init_pool(pcfg)
        alloc = KP.PageAllocator(pcfg)
        pt = np.array(pool["page_table"])
        for s in range(B):
            pages = alloc.allocate(s, pcfg.max_pages_per_seq * 64)
            pt[s, :len(pages)] = pages
        return {**pool, "page_table": jnp.asarray(pt)}

    ref_cfg = dataclasses.replace(cfg, attn_backend="ref_gather")
    # attn_backend sentinel: anything == "ref" skips the kernel; use a
    # monkeypatched gate instead — simplest: compare via env toggle
    import procyon_tpu.models.llama as LM

    @jax.jit
    def prefill(params, pool, toks):
        return LM.paged_forward(params, dataclasses.replace(
            cfg, attn_backend="rowblock"), pool, pcfg, slots, tokens=toks)

    def make_step(use_kernel):
        c = cfg if use_kernel else dataclasses.replace(cfg,
                                                       attn_backend="ref")
        # "ref" forces gather+dense decode; decode never calls
        # flash_attention at T=1 so "ref" only affects the gate

        @jax.jit
        def step(params, pool, tok):
            return LM.paged_forward(params, c, pool, pcfg, slots,
                                    tokens=tok)
        return step

    logits, pool0 = prefill(params, fresh_pool(), tokens)
    print("prefill ok", flush=True)

    results = {}
    for name, use_kernel in (("gather", False), ("paged_kernel", True)):
        step = make_step(use_kernel)
        pool = jax.tree_util.tree_map(lambda x: x, pool0)
        tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
        logit_trace = []
        # warm
        lg, pool_w = step(params, pool, tok)
        float(jnp.sum(lg))

        def run(n, pool):
            t0 = time.perf_counter()
            lg, p = step(params, pool, tok)
            for _ in range(n - 1):
                lg, p = step(params, p, tok)
            float(jnp.sum(lg))
            return time.perf_counter() - t0, lg

        t8, lg8 = run(8, pool)
        t40, lg40 = run(40, pool)
        per_step = (t40 - t8) / 32
        results[name] = (per_step, np.asarray(lg40))
        print(f"{name}: {per_step*1e3:.3f} ms/step", flush=True)

    g, p = results["gather"][1], results["paged_kernel"][1]
    err = np.abs(g - p).max()
    cos = float((g * p).sum() / (np.linalg.norm(g) * np.linalg.norm(p)))
    print(f"logit max diff gather vs kernel: {err:.5f} "
          f"(|ref| max {np.abs(g).max():.2f}, cosine {cos:.6f})", flush=True)


if __name__ == "__main__":
    main()
