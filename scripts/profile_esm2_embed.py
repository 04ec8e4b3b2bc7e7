"""Profile the W8A8 ESM2 embed on the real chip and print the top TPU ops.

Usage: python scripts/profile_esm2_embed.py [--model 3b] [--batch 64]
Writes the trace under /tmp/esm2_prof and prints a duration-ranked op
table (name, total ms, calls) parsed from vm.trace.json.gz.
"""
import functools
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import procyon_tpu  # noqa: F401
import jax
import jax.numpy as jnp


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="3b")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--trace_dir", default="/tmp/esm2_prof")
    a = ap.parse_args()

    import dataclasses

    from procyon_tpu.models import esm2
    from procyon_tpu.models.pooling import pool_tokens

    cfg = esm2.esm2_config(a.model, max_seq_len=512, dtype=jnp.bfloat16,
                           attn_backend="rowblock")
    params = esm2.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    tokens = np.full((a.batch, 512), esm2.PAD_IDX, np.int32)
    for i in range(a.batch):
        n = int(rng.integers(256, 510))
        tokens[i, 0] = esm2.CLS_IDX
        tokens[i, 1:n + 1] = rng.integers(4, 24, n)
        tokens[i, n + 1] = esm2.EOS_IDX
    tokens = jnp.asarray(tokens)

    qp = esm2.fuse_qkv_params(esm2.quantize_params(params, cfg))
    cfg8 = dataclasses.replace(cfg, quant_mode="w8a8")

    cfg8, opts = esm2.big_block_serving(cfg8)

    @functools.partial(jax.jit, compiler_options=opts)
    def embed(params, tokens):
        out = esm2.forward(params, cfg8, tokens)
        mask = (tokens != esm2.PAD_IDX).astype(jnp.int32)
        return pool_tokens(out["hidden"], mask, "mean")

    e = embed(qp, tokens)  # compile + warm
    _ = np.asarray(e)      # sync: keep the warm-up out of the trace
    jax.profiler.start_trace(a.trace_dir)
    for _ in range(3):
        e = embed(qp, tokens)
    _ = np.asarray(e)
    jax.profiler.stop_trace()

    paths = glob.glob(os.path.join(
        a.trace_dir, "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        print("no trace found")
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"
                 and "args" in e}
    tpu_pids = {pid for pid, name in pid_names.items() if "TPU" in name}
    durs = {}
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in tpu_pids:
            name = e.get("name", "?")
            d = e.get("dur", 0) / 1e3  # us -> ms
            durs.setdefault(name, [0.0, 0])
            durs[name][0] += d
            durs[name][1] += 1
    total = sum(v[0] for v in durs.values())
    print(f"total TPU op time over 3 steps: {total:.1f} ms "
          f"({total/3:.1f} ms/step)")
    for name, (d, c) in sorted(durs.items(), key=lambda kv: -kv[1][0])[:25]:
        print(f"{d:9.2f} ms  x{c:4d}  {name[:100]}")


if __name__ == "__main__":
    main()
