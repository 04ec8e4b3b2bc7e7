"""Profile paged diverse-beam decode steps on the real chip and print a
per-category device-time attribution against the weight-streaming floor
(VERDICT r4 #2: the flagship caption step's gap needs the same ms-by-ms
accounting the r3 decode bench got).

Usage (flagship config = STATUS's best caption row):
  python scripts/profile_paged_beam.py --llama3 --bits 8 --kv8 \
      --batch 8 --prompt_len 384 --shared_prefix 256

Parses the jax profiler trace (vm.trace.json.gz, CLAUDE.md) and rolls
device ops into attribution buckets:
  * matmul/fusion  — the weight-streaming work (floor = weight bytes /
    819 GB/s v5e HBM bandwidth);
  * kv-gather      — page-table gathers of pooled K/V rows (+int8 scale
    slabs) into the block-diagonal attention layout;
  * pool-write     — decode-row scatters + COW page-move copies;
  * beam-host      — top-k / diversity penalty / logsoftmax over
    [B*beam, vocab];
  * other          — everything else (convert/transpose/reduce glue).
Each bucket also prints its byte-derived bandwidth floor where one is
computable, so the gap decomposes into (bandwidth-bound, latency/compute,
unexplained).
"""
import argparse
import functools
import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

V5E_BW = 819e9          # bytes/sec, v5e HBM


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--prompt_len", type=int, default=128)
    p.add_argument("--beam_size", type=int, default=10)
    p.add_argument("--beam_group_size", type=int, default=2)
    p.add_argument("--bits", type=int, default=8, choices=(4, 8))
    p.add_argument("--llama3", action="store_true")
    p.add_argument("--dim", type=int, default=4096)
    p.add_argument("--layers", type=int, default=34)
    p.add_argument("--page_size", type=int, default=64)
    p.add_argument("--kv8", action="store_true")
    p.add_argument("--shared_prefix", type=int, default=0)
    p.add_argument("--cascade", default="on", choices=("on", "off"),
                   help="profile the production cascade step (on, the "
                        "paged_beam_generate default) or the flat "
                        "per-slot gather program (off)")
    p.add_argument("--steps", type=int, default=4,
                   help="traced steps (after 3 warmup steps)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from procyon_tpu.inference import generation, paged_beam
    from procyon_tpu.models import llama, unified

    backend = None if jax.default_backend() == "tpu" else "ref"
    if args.llama3:
        lcfg = llama.llama3_8b(max_seq_len=args.prompt_len + 96,
                               dtype=jnp.bfloat16, attn_backend=backend)
    else:
        lcfg = llama.LlamaConfig(
            vocab_size=32000, dim=args.dim, n_layers=args.layers,
            n_heads=args.dim // 128, n_kv_heads=max(args.dim // 512, 1),
            intermediate=int(args.dim * 2.6875),
            max_seq_len=args.prompt_len + 96, dtype=jnp.bfloat16,
            attn_backend=backend)
    cfg = unified.UnifiedConfig(
        llama=lcfg, esm=None, protein_embed_dim=64,
        token_projector_layers=1, token_projector_hidden=64,
        retrieval_dim=64, dtype=jnp.bfloat16)

    def build():
        p_ = unified.init_params(jax.random.PRNGKey(0), cfg)
        p_ = dict(p_)
        p_["llama"] = llama.quantize_params(p_["llama"], lcfg,
                                            bits=args.bits)
        return p_

    shapes = jax.eval_shape(build)

    @jax.jit
    def materialize():
        return jax.tree_util.tree_map(
            lambda sd: jnp.full(sd.shape, 1, sd.dtype)
            if sd.dtype == jnp.int8 else jnp.full(sd.shape, 0.01, sd.dtype),
            shapes)

    params = materialize()
    weight_bytes = sum(
        x.size * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves(shapes["llama"]))

    B, L = args.batch, args.prompt_len
    rng = np.random.default_rng(0)
    ids = rng.integers(4, lcfg.vocab_size, (B, L))
    if args.shared_prefix:
        ids[:, :args.shared_prefix] = ids[0, :args.shared_prefix]
    batch = {
        "input_ids": np.asarray(ids, np.int32),
        "seg_ids": np.ones((B, L), np.int32),
        "positions": np.broadcast_to(np.arange(L, dtype=np.int32), (B, L)),
        "soft_map": np.full((B, L), -1, np.int32),
        "protein_embeds": np.zeros((1, 64), np.float32),
    }
    gen = generation.GenerationConfig(
        max_new_tokens=56, method="beam", beam_size=args.beam_size,
        beam_group_size=args.beam_group_size, diversity_penalty=0.8,
        eos_token_id=2, pad_token_id=0)

    state, ctx = paged_beam.paged_beam_init(
        params, cfg, batch, gen, page_size=args.page_size,
        quantize_kv=args.kv8, shared_prefix=bool(args.shared_prefix),
        cascade=args.cascade == "on")
    pcfg = ctx["pcfg"]
    # profile the PRODUCTION step program: paged_beam_generate passes
    # ctx["cascade_pages"] (grouped-prefix cascade decode, default on),
    # so the attribution must too — profiling the flat per-slot gather
    # while production runs the cascade mis-targets every bucket
    cpages = ctx["cascade_pages"]
    print("pcfg:", pcfg, "cascade_pages:", cpages)

    @functools.partial(jax.jit, donate_argnums=(3,))
    def pstep(p, private, g0, state, t):
        return paged_beam.paged_beam_step(
            p, cfg, gen, pcfg, ctx["beam"], private, g0, state, t,
            cascade_pages=cpages)

    for t in range(3):
        state = pstep(params, ctx["private"], ctx["g0"], state,
                      jnp.int32(t))
    float(jnp.sum(state[3]))

    trace_dir = "/tmp/paged_beam_trace"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    for t in range(3, 3 + args.steps):
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
    tpu_pids = {p_ for p_, n in pids.items() if "TPU" in n}

    # envelope events (the jit program, the layer-scan while, named
    # computations) NEST the leaf HLO ops: summing every ph=X event
    # double-counts. Leaves are what we attribute; the top envelope's
    # duration is the true step time.
    ENVELOPE = re.compile(r"^(jit_|while|pstep|body|cond|region)")

    def bucket(name, long_name):
        s = (name + " " + long_name).lower()
        if "page_move" in s or "custom-call" in s:
            return "pallas (COW page moves)"
        if "dynamic-update-slice" in s or "scatter" in s:
            return "pool-write (decode rows)"
        if "gather" in s:
            return "kv-gather"
        if "sort" in s or "top-k" in s or "topk" in s:
            return "beam (top-k/diversity)"
        if " dot(" in s or s.startswith("dot") or "convolution" in s:
            return "matmul"
        if name.startswith("copy") or "transpose" in s:
            return "copy/relayout"
        return "elementwise/other"

    agg = defaultdict(float)
    agg_name = defaultdict(lambda: [0.0, 0.0, ""])
    bytes_by_bucket = defaultdict(float)
    total = env_ms = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        name = e.get("name", "?")
        ea = e.get("args", {}) or {}
        long_name = str(ea.get("long_name", ""))
        dur = e.get("dur", 0) / 1e3
        if ENVELOPE.match(name):
            if name.startswith("jit_"):
                env_ms += dur
            continue
        b = bucket(name, long_name)
        agg[b] += dur
        # generic names ("fusion") hide the op: group by the shape
        # signature of the long_name (digits kept — shapes ARE the
        # signature; the trailing op id is stripped from name only)
        key = (re.sub(r"\s+", " ", long_name)[:120] if long_name
               else re.sub(r"[.\d]+$", "", name))
        rec = agg_name[key]
        rec[0] += dur
        try:
            by = float(ea.get("raw_bytes_accessed", 0))
        except (TypeError, ValueError):
            by = 0.0
        rec[1] += by
        bytes_by_bucket[b] += by
        total += dur

    n = args.steps
    print(f"\njit envelope: {env_ms / n:.3f} ms/step; "
          f"leaf-op device time: {total / n:.3f} ms/step "
          f"(difference = inter-op gaps/sync)")
    print(f"weight-streaming floor: {weight_bytes / V5E_BW * 1e3:.2f} ms "
          f"({weight_bytes / 1e9:.2f} GB @ 819 GB/s)")
    print("\nper-bucket attribution (ms/step, byte-derived floor):")
    for b, ms in sorted(agg.items(), key=lambda kv: -kv[1]):
        by = bytes_by_bucket[b] / n
        floor = by / V5E_BW * 1e3
        print(f"  {ms / n:8.3f} ms  floor {floor:7.3f} ms "
              f"({by / 1e6:9.1f} MB/step)  {b}")
    print("\ntop leaf ops (ms/step, MB/step):")
    for key, (ms, by, _) in sorted(agg_name.items(),
                                   key=lambda kv: -kv[1][0])[:20]:
        print(f"  {ms / n:8.3f} ms {by / n / 1e6:9.1f} MB  {key}")


if __name__ == "__main__":
    main()
