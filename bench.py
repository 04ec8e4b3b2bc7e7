"""Benchmark driver: prints ONE JSON line with the tracked headline metric.

Tracked metrics (BASELINE.md "Rebuild targets"): proteins/sec embedded
(ESM2-650M, BASELINE config 1) as the primary metric; decode tokens/sec
lives in scripts/bench_decode.py / scripts/bench_caption.py.

Serving configuration (the headline): int8 W8A8 — s8 x s8 MXU matmuls
(2x bf16 rate on v5e), fused-QKV packed attention kernel, and the fused
LayerNorm+int8-MLP kernel (ops/fused_mlp.py) whose hidden activations
never leave VMEM. Embedding quality is gated against the bf16 path every
run: min per-protein cosine must exceed 0.999 or the bench reports the
bf16 number instead.

vs_baseline: ratio against an A100 running the reference stack
(fair-esm eager torch, fp16). Estimate: ESM2-650M forward at L=512 is
~0.67 TFLOP/protein; an A100 at the ~30% MFU typical of eager fair-esm
sustains ~94 TFLOP/s -> ~140 proteins/sec. The rebuild target is >=2x.
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

A100_PROTEINS_PER_SEC = 140.0
QUALITY_GATE_COS = 0.999


def bench_esm2_650m(batch=64, seq_len=512, model="650m"):
    from procyon_tpu.models import esm2
    from procyon_tpu.models.pooling import pool_tokens
    from procyon_tpu.utils.timing import time_fn

    cfg = esm2.esm2_config(model, max_seq_len=seq_len, dtype=jnp.bfloat16,
                           attn_backend="rowblock")
    params = esm2.init_params(jax.random.PRNGKey(0), cfg)

    rng = np.random.default_rng(0)
    tokens = np.full((batch, seq_len), esm2.PAD_IDX, np.int32)
    lengths = rng.integers(seq_len // 2, seq_len - 2, batch)
    for i, n in enumerate(lengths):
        tokens[i, 0] = esm2.CLS_IDX
        tokens[i, 1:n + 1] = rng.integers(4, 24, n)
        tokens[i, n + 1] = esm2.EOS_IDX
    tokens = jnp.asarray(tokens)

    def embed_fn(cfg_):
        # fused-MLP big-block config + its paired raised scoped-vmem
        # limit at 3B width (no-op at 650M, where raising it cost ~1%)
        cfg_, opts = esm2.big_block_serving(cfg_)

        def embed(params, tokens):
            out = esm2.forward(params, cfg_, tokens)
            mask = (tokens != esm2.PAD_IDX).astype(jnp.int32)
            return pool_tokens(out["hidden"], mask, "mean")
        return jax.jit(embed, compiler_options=opts)

    f_bf16 = embed_fn(cfg)
    dt_bf16 = time_fn(f_bf16, params, tokens)
    e_bf16 = np.asarray(f_bf16(params, tokens), np.float32)

    # int8 serving path: W8A8 + fused QKV + fused LN/MLP kernel
    qp = esm2.fuse_qkv_params(esm2.quantize_params(params, cfg))
    cfg8 = dataclasses.replace(cfg, quant_mode="w8a8")
    f_int8 = embed_fn(cfg8)
    dt_int8 = time_fn(f_int8, qp, tokens)
    e_int8 = np.asarray(f_int8(qp, tokens), np.float32)
    cos = (e_bf16 * e_int8).sum(1) / np.maximum(
        np.linalg.norm(e_bf16, axis=1) * np.linalg.norm(e_int8, axis=1),
        1e-8)
    return batch / dt_bf16, batch / dt_int8, float(cos.min())


def bench_serving_fixed():
    """Fixed-config serving regression line (VERDICT r4 #6): a canned
    `scripts/bench_serving.py` run (6.3B int8 decoder, 16 slots, 32 mixed
    requests, quantum 8, chunked prefill C=256 = one prefill compile) in
    a subprocess, so serving regressions ride the driver-parsed BENCH
    JSON instead of STATUS prose. Wall-clock serving numbers swing with
    tunnel RTT (CLAUDE.md): the sub-object carries its own canary_ms +
    rtt_ms, and round-over-round comparisons must check rtt_ms first."""
    import subprocess
    root = os.path.dirname(os.path.abspath(__file__))
    cmd = [sys.executable, os.path.join(root, "scripts",
                                        "bench_serving.py"),
           "--requests", "32", "--prefill_chunk", "256"]
    # guard, not a limit: warm-cache runs take minutes (the persistent
    # compile cache holds this fixed config's programs); a COLD cache
    # pays several multi-minute remote compiles, so the ceiling is
    # generous and env-tunable rather than the interactive-shell
    # timeout CLAUDE.md forbids for TPU work
    budget = int(os.environ.get("PROCYON_BENCH_SERVING_TIMEOUT", "5400"))
    try:
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=budget)
        line = out.stdout.strip().splitlines()[-1]
        full = json.loads(line)
    except Exception as e:  # never fail the primary metric on this
        return {"error": f"{type(e).__name__}: {e}"}
    keep = ("value", "output_tok_per_sec", "latency_p50_s",
            "slot_utilization", "n_pages", "vs_baseline",
            "baseline_estimated", "baseline_tok_per_sec",
            "canary_ms", "rtt_ms")
    sub = {k: full[k] for k in keep if k in full}
    sub["config"] = "32 reqs, 6.3B int8, 16 slots, quantum 8, C=256"
    sub["requests_per_sec"] = sub.pop("value", None)
    return sub


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="650m",
                    help="ESM2 size (650m is the tracked headline; 3b is "
                         "the ProCyon-Full protein tower)")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--no-serving", dest="serving", action="store_false",
                    default=True,
                    help="skip the fixed-config serving regression line")
    a = ap.parse_args()
    bf16_rate, int8_rate, cos_min = bench_esm2_650m(batch=a.batch,
                                                    model=a.model)
    gated = cos_min >= QUALITY_GATE_COS
    primary = int8_rate if gated else bf16_rate
    result = {
        "metric": f"proteins_per_sec_esm2_{a.model}",
        "value": round(primary, 2),
        "unit": "proteins/sec (L=512, int8-W8A8 serving, 1 chip)"
                if gated else "proteins/sec (L=512, bf16, 1 chip; "
                              "int8 FAILED quality gate)",
        "vs_baseline": round(primary / A100_PROTEINS_PER_SEC, 3),
        # the A100 denominator is an estimate (no A100 in the container):
        # eager fair-esm fp16 at an assumed 30% MFU -> ~140 proteins/sec
        "baseline_estimated": True,
        "baseline_assumed_mfu": 0.30,
        "baseline_proteins_per_sec": A100_PROTEINS_PER_SEC,
        "bf16_proteins_per_sec": round(bf16_rate, 2),
        "int8_embedding_cos_min": round(cos_min, 5),
    }
    from procyon_tpu.utils.timing import canary_fields

    # fixed-workload chip-state probe (VERDICT r3 weak #4): normalizes
    # cross-session comparisons against the ~20% day-to-day chip variance
    result.update(canary_fields())
    if a.serving:
        # serving regression metric rides the SAME single JSON line as a
        # sub-object (the driver parses one line; VERDICT r4 #6)
        result["serving"] = bench_serving_fixed()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
