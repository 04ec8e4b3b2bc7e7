"""On-chip invariants for the round-4 serving features.

CPU f32 tests (tests/test_serving.py) pin the host logic; this script
asserts the HARDWARE-grade invariants on the real TPU in bf16 — only
same-program comparisons, per the cross-program argmax caveat (CLAUDE.md:
different compiled shapes argmax-diverge on random-weight near-ties):

  1. prefix_cache on == off, token for token: both runs execute the SAME
     chunked-prefill and decode programs; a cache hit reuses the exact KV
     bytes the same chunk program wrote for the earlier identical blocks,
     so the decode inputs are bitwise equal.
  2. async_rounds on == off: identical program set, only the host
     dispatch schedule differs (greedy; the device pending array feeds
     the same token stream).

Batched wave prefill is NOT compared on chip: its [W, C] prefill is a
different compiled program than [1, C], so first-token parity on random
weights is exactly the cross-program noise the caveat describes (the CPU
f32 suite pins its logic instead).

python scripts/verify_serving_tpu.py        # runs on the tunnel chip
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax

    import procyon_tpu  # noqa: F401 (platform/cache hooks)
    from procyon_tpu.inference import kv_pool
    from procyon_tpu.inference.serving import ContinuousBatcher
    from procyon_tpu.models import llama

    import jax.numpy as jnp

    cfg = llama.LlamaConfig(
        vocab_size=4096, dim=1024, n_layers=4, n_heads=8, n_kv_heads=2,
        intermediate=2816, max_seq_len=512, dtype=jnp.bfloat16)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    pcfg = kv_pool.PagedConfig(
        n_layers=cfg.n_layers, n_kv_heads=cfg.n_kv_heads,
        head_dim=cfg.head_dim, page_size=64, n_pages=64,
        max_pages_per_seq=6, slots=4, dtype=cfg.dtype)

    rng = np.random.default_rng(3)
    shared = list(rng.integers(4, cfg.vocab_size, 192))
    prompts = [shared + list(rng.integers(4, cfg.vocab_size, n))
               for n in (40, 70, 25, 55, 33)]

    def run(**kw):
        b = ContinuousBatcher(params, cfg, pcfg, prefill_chunk=64, **kw)
        rids = [b.submit(p, max_new=24) for p in prompts]
        out = b.run()
        return [out[r] for r in rids], b

    base, _ = run()
    cached, bc = run(prefix_cache=True)
    asyn, _ = run(async_rounds=True)

    ok_cache = cached == base
    ok_async = asyn == base
    result = {
        "metric": "verify_serving_invariants",
        "prefix_cache_bit_exact": ok_cache,
        "async_rounds_bit_exact": ok_async,
        "prefix_hit_tokens": bc.pcache.stats["hit_tokens"],
        "backend": jax.default_backend(),
        "ok": ok_cache and ok_async,
    }
    print(json.dumps(result))
    if not result["ok"]:
        for i, (a, b_) in enumerate(zip(base, cached)):
            if a != b_:
                print(f"cache mismatch req {i}: {a[:8]} vs {b_[:8]}")
        for i, (a, b_) in enumerate(zip(base, asyn)):
            if a != b_:
                print(f"async mismatch req {i}: {a[:8]} vs {b_[:8]}")
        sys.exit(1)


if __name__ == "__main__":
    main()
