"""Profile one speculative verify round on the real chip and print the
per-op device-time table.

The round wall time at the bench shape (6.3B int8, 16 slots, k=7) is
63.3 ms of which ~29 ms is tunnel RTT — this decomposes the ~35 ms of
device time against the ~11.5 ms plain decode step to find where the
T=8 margin goes (rotary gather form? write_tokens at T=8? lm_head?).

Usage: python scripts/profile_spec_round.py [--dim 4096 --layers 34
    --slots 16 --spec_k 7] [--kv8]
"""
import argparse
import os
import sys
import types

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import procyon_tpu  # noqa: F401
import jax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dim", type=int, default=4096)
    p.add_argument("--layers", type=int, default=34)
    p.add_argument("--slots", type=int, default=16)
    p.add_argument("--spec_k", type=int, default=7)
    p.add_argument("--max_prompt", type=int, default=256)
    p.add_argument("--max_new", type=int, default=64)
    p.add_argument("--page_size", type=int, default=64)
    p.add_argument("--kv8", action="store_true")
    p.add_argument("--trace_dir", default="/tmp/spec_prof")
    args = p.parse_args()

    from scripts.bench_serving import build_model
    from procyon_tpu.inference import kv_pool, serving

    margs = types.SimpleNamespace(
        synthetic=False, dim=args.dim, layers=args.layers,
        max_prompt=args.max_prompt, max_new=args.max_new)
    cfg, params, n_params = build_model(margs)
    max_pages = -(-(args.max_prompt + args.max_new + args.spec_k + 1)
                  // args.page_size)
    pcfg = kv_pool.PagedConfig(
        n_layers=cfg.n_layers, n_kv_heads=cfg.n_kv_heads,
        head_dim=cfg.head_dim, page_size=args.page_size,
        n_pages=1 + args.slots * max_pages, max_pages_per_seq=max_pages,
        slots=args.slots, dtype=cfg.dtype, quantize_kv=args.kv8)
    b = serving.ContinuousBatcher(params, cfg, pcfg, spec_k=args.spec_k)

    rng = np.random.default_rng(0)
    for _ in range(args.slots):
        b.submit(list(rng.integers(4, cfg.vocab_size, args.max_prompt)),
                 max_new=args.max_new)
    b._admit()
    for _ in range(2):          # warm the verify jit
        b.tick()

    os.system(f"rm -rf {args.trace_dir}")
    jax.profiler.start_trace(args.trace_dir)
    for _ in range(3):
        b.tick()
    jax.profiler.stop_trace()

    from procyon_tpu.utils.trace import print_op_table
    print_op_table(args.trace_dir, top=28,
                   header=f"3 spec rounds (k={args.spec_k}, "
                          f"{n_params/1e9:.1f}B, slots={args.slots})")


if __name__ == "__main__":
    main()
