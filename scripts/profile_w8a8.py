"""Profile the w8a8 ESM2-650M embed step on the real chip and print the
per-op time decomposition (vm.trace.json.gz parsing per CLAUDE.md)."""
import glob
import gzip
import json
import os
import sys
import dataclasses
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from procyon_tpu.models import esm2
from procyon_tpu.models.pooling import pool_tokens


def main():
    B, S = 64, 512
    mode = sys.argv[1] if len(sys.argv) > 1 else "w8a8"
    cfg = esm2.esm2_config("650m", max_seq_len=S, dtype=jnp.bfloat16,
                           attn_backend="rowblock")
    params = esm2.init_params(jax.random.PRNGKey(0), cfg)
    if mode != "bf16":
        params = esm2.quantize_params(params, cfg)
        cfg = dataclasses.replace(cfg, quant_mode="w8a8")
    if mode == "w8a8_fused":
        params = esm2.fuse_qkv_params(params)
    rng = np.random.default_rng(0)
    toks = np.full((B, S), esm2.PAD_IDX, np.int32)
    for i in range(B):
        n = rng.integers(S // 2, S - 2)
        toks[i, 0] = esm2.CLS_IDX
        toks[i, 1:n + 1] = rng.integers(4, 24, n)
        toks[i, n + 1] = esm2.EOS_IDX
    toks = jnp.asarray(toks)

    @jax.jit
    def embed(p, t):
        out = esm2.forward(p, cfg, t)
        mask = (t != esm2.PAD_IDX).astype(jnp.int32)
        return pool_tokens(out["hidden"], mask, "mean")

    # warm/compile
    e = embed(params, toks)
    float(jnp.sum(e))

    trace_dir = "/tmp/w8a8_trace"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    for _ in range(2):
        e = embed(params, toks)
    float(jnp.sum(e))
    jax.profiler.stop_trace()

    files = glob.glob(f"{trace_dir}/**/vm.trace.json.gz", recursive=True)
    if not files:
        print("no trace file found", glob.glob(f"{trace_dir}/**",
                                               recursive=True))
        return
    with gzip.open(files[0]) as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pids = {e["pid"]: e["args"].get("name", "") for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"
            and "args" in e}
    tpu_pids = {p for p, n in pids.items() if "TPU" in n}
    agg = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3  # ms
        agg[name] += dur
        total += dur
    print(f"mode={mode} total device time (2 steps): {total:.2f} ms")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {ms:8.3f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
