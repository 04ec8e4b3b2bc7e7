"""Profile one paged diverse-beam decode step on the real chip and print
the per-op device-time decomposition (vm.trace.json.gz parsing per
CLAUDE.md). Diagnoses the paged-vs-dense caption gap."""
import dataclasses
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from procyon_tpu.inference import generation, paged_beam
from procyon_tpu.models import llama, unified


def main():
    bits = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    B, L = 4, 128
    lcfg = llama.LlamaConfig(
        vocab_size=32000, dim=4096, n_layers=34 if len(sys.argv) < 3 else 32,
        n_heads=32, n_kv_heads=8, intermediate=11008,
        max_seq_len=L + 96, dtype=jnp.bfloat16)
    cfg = unified.UnifiedConfig(
        llama=lcfg, esm=None, protein_embed_dim=64,
        token_projector_layers=1, token_projector_hidden=64,
        retrieval_dim=64, dtype=jnp.bfloat16)

    def build():
        p_ = unified.init_params(jax.random.PRNGKey(0), cfg)
        p_ = dict(p_)
        p_["llama"] = llama.quantize_params(p_["llama"], lcfg, bits=bits)
        return p_

    shapes = jax.eval_shape(build)

    @jax.jit
    def materialize():
        return jax.tree_util.tree_map(
            lambda sd: jnp.full(sd.shape, 1, sd.dtype)
            if sd.dtype == jnp.int8 else jnp.full(sd.shape, 0.01, sd.dtype),
            shapes)

    params = materialize()

    rng = np.random.default_rng(0)
    batch = {
        "input_ids": np.asarray(
            rng.integers(4, lcfg.vocab_size, (B, L)), np.int32),
        "seg_ids": np.ones((B, L), np.int32),
        "positions": np.broadcast_to(np.arange(L, dtype=np.int32), (B, L)),
        "soft_map": np.full((B, L), -1, np.int32),
        "protein_embeds": np.zeros((1, 64), np.float32),
    }
    gen = generation.GenerationConfig(
        max_new_tokens=56, method="beam", beam_size=10, beam_group_size=2,
        diversity_penalty=0.8, eos_token_id=2, pad_token_id=0)

    state, ctx = paged_beam.paged_beam_init(params, cfg, batch, gen)
    pcfg = ctx["pcfg"]
    print("pcfg:", pcfg)

    import functools

    @functools.partial(jax.jit, donate_argnums=(3,))
    def pstep(p, private, g0, state, t):
        return paged_beam.paged_beam_step(
            p, cfg, gen, pcfg, ctx["beam"], private, g0, state, t)

    for t in range(3):
        state = pstep(params, ctx["private"], ctx["g0"], state,
                      jnp.int32(t))
    float(jnp.sum(state[3]))

    trace_dir = "/tmp/paged_beam_trace"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    for t in range(3, 6):
        state = pstep(params, ctx["private"], ctx["g0"], state,
                      jnp.int32(t))
    float(jnp.sum(state[3]))
    jax.profiler.stop_trace()

    files = glob.glob(f"{trace_dir}/**/vm.trace.json.gz", recursive=True)
    if not files:
        print("no trace file found")
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
        dur = e.get("dur", 0) / 1e3
        agg[name] += dur
        total += dur
    print(f"total device time (3 steps): {total:.2f} ms")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {ms:8.3f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
