"""Profile one dense-cache decode step on the real chip (the tracked
bench_decode configuration) and print the per-op device-time table.

Usage: python scripts/profile_decode.py [--dim 4096 --layers 34 --batch 8
                                         --bits 8]
Decomposes the 6B-class int8 decode step (15.1 ms = 410 GB/s equivalent
round 2) to find where the gap to the ~9.3 ms weight-streaming floor goes
(cache update? attention gather? scaffolding?).
"""
import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import procyon_tpu  # noqa: F401
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=4096)
    ap.add_argument("--layers", type=int, default=34)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--prompt_len", type=int, default=256)
    ap.add_argument("--bits", type=int, default=8)
    ap.add_argument("--paged", action="store_true",
                    help="profile the paged-pool serving step instead of "
                         "the dense-cache step")
    ap.add_argument("--page_size", type=int, default=64)
    ap.add_argument("--trace_dir", default="/tmp/decode_prof")
    a = ap.parse_args()

    from procyon_tpu.models import llama, unified
    from procyon_tpu.models.llama import quantize_params

    cfg = unified.UnifiedConfig(
        llama=llama.LlamaConfig(
            vocab_size=32000, dim=a.dim, n_layers=a.layers,
            n_heads=a.dim // 128, n_kv_heads=max(a.dim // 256, 1),
            intermediate=int(a.dim * 2.6875),
            max_seq_len=a.prompt_len + 104, dtype=jnp.bfloat16),
        esm=None, protein_embed_dim=64, token_projector_layers=1,
        token_projector_hidden=64, retrieval_dim=64, dtype=jnp.bfloat16)

    def build():
        p = dict(unified.init_params(jax.random.PRNGKey(0), cfg))
        p["llama"] = quantize_params(p["llama"], cfg.llama, bits=a.bits)
        return p

    shapes = jax.eval_shape(build)

    @jax.jit
    def materialize():
        return jax.tree_util.tree_map(
            lambda sd: jnp.full(sd.shape, 1, sd.dtype)
            if sd.dtype == jnp.int8 else jnp.full(sd.shape, 0.01, sd.dtype),
            shapes)

    params = materialize()

    rng = np.random.default_rng(0)
    B, L = a.batch, a.prompt_len
    batch = {
        "input_ids": jnp.asarray(
            rng.integers(4, cfg.llama.vocab_size, (B, L)), jnp.int32),
        "seg_ids": jnp.ones((B, L), jnp.int32),
        "positions": jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32),
                                      (B, L)),
        "soft_map": jnp.full((B, L), -1, jnp.int32),
        "protein_embeds": jnp.zeros((1, 64), jnp.float32),
    }
    max_len = L + 104

    if a.paged:
        from procyon_tpu.inference import kv_pool
        from procyon_tpu.models import llama as llama_mod

        n_pages_seq = -(-max_len // a.page_size)
        pcfg = kv_pool.PagedConfig(
            n_layers=cfg.llama.n_layers, n_kv_heads=cfg.llama.n_kv_heads,
            head_dim=cfg.llama.head_dim, page_size=a.page_size,
            n_pages=1 + B * n_pages_seq, max_pages_per_seq=n_pages_seq,
            slots=B, dtype=cfg.llama.dtype)
        pt = np.zeros((B, n_pages_seq), np.int64)
        alloc = kv_pool.PageAllocator(pcfg)
        for s in range(B):
            pt[s] = alloc.allocate(s, max_len)
        slots = jnp.arange(B, dtype=jnp.int32)

        @jax.jit
        def pprefill(params, pool, b):
            emb = unified.assemble_input_embeds(params, cfg, b)
            logits, pool = llama_mod.paged_forward(
                params["llama"], cfg.llama, pool, pcfg, slots,
                input_embeds=emb, seg_ids=b["seg_ids"])
            return jnp.argmax(logits[:, -1], -1), pool

        @functools.partial(jax.jit, donate_argnums=(2,))
        def pstep(params, tok, pool):
            logits, pool = llama_mod.paged_forward(
                params["llama"], cfg.llama, pool, pcfg, slots,
                tokens=tok[:, None])
            return jnp.argmax(logits[:, -1], -1), pool

        pool = kv_pool.init_pool(pcfg)
        pool = {**pool, "page_table": jnp.asarray(pt, jnp.int32)}
        tok, pool = pprefill(params, pool, batch)
        for _ in range(2):
            tok, pool = pstep(params, tok, pool)
        float(jnp.sum(tok))

        os.system(f"rm -rf {a.trace_dir}")
        jax.profiler.start_trace(a.trace_dir)
        for _ in range(3):
            tok, pool = pstep(params, tok, pool)
        float(jnp.sum(tok))
        jax.profiler.stop_trace()
    else:
        @jax.jit
        def prefill(params, b):
            cache = llama.init_kv_cache(cfg.llama, B, max_len=max_len)
            out = unified.forward(params, cfg, b, kv_cache=cache)
            return jnp.argmax(out["logits"][:, -1], -1), out["kv_cache"]

        seg_live = batch["seg_ids"][:, -1:]

        @functools.partial(jax.jit, donate_argnums=(3,))
        def step(params, tok, pos, cache):
            b = {
                "input_ids": tok[:, None],
                "seg_ids": seg_live,
                "positions": pos,
                "soft_map": jnp.full((B, 1), -1, jnp.int32),
                "protein_embeds": batch["protein_embeds"],
            }
            out = unified.forward(params, cfg, b, kv_cache=cache)
            return jnp.argmax(out["logits"][:, -1], -1), out["kv_cache"]

        tok, cache = prefill(params, batch)
        pos = batch["positions"][:, -1:] + 1
        for _ in range(2):  # warm both jits
            tok, cache = step(params, tok, pos, cache)
            pos = pos + 1
        float(jnp.sum(tok))

        os.system(f"rm -rf {a.trace_dir}")
        jax.profiler.start_trace(a.trace_dir)
        for _ in range(3):
            tok, cache = step(params, tok, pos, cache)
            pos = pos + 1
        float(jnp.sum(tok))
        jax.profiler.stop_trace()

    from procyon_tpu.utils.trace import print_op_table
    print_op_table(a.trace_dir, top=24, header="3 steps, nested")


if __name__ == "__main__":
    main()
