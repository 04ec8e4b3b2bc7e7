"""Benchmark driver: prints ONE JSON line with the tracked headline metric.

Tracked metrics (BASELINE.md "Rebuild targets"): proteins/sec embedded
(ESM2-650M, BASELINE config 1) as the primary round-1 metric; decode
tokens/sec/chip joins once the flagship decode path is sized for one chip.

vs_baseline: ratio against an A100 running the reference stack
(fair-esm eager torch, fp16). Estimate: ESM2-650M forward at L=512 is
~0.67 TFLOP/protein; an A100 at the ~30% MFU typical of eager fair-esm
sustains ~94 TFLOP/s -> ~140 proteins/sec. The rebuild target is >=2x that.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

A100_PROTEINS_PER_SEC = 140.0


def bench_esm2_650m(batch=64, seq_len=512, iters=20):
    from procyon_tpu.models import esm2, unified

    cfg = esm2.esm2_config("650m", max_seq_len=seq_len, dtype=jnp.bfloat16,
                       attn_backend="rowblock")  # single-pass pallas kernel
                                            # (3.4x faster than XLA fused attn here)
    params = esm2.init_params(jax.random.PRNGKey(0), cfg)

    rng = np.random.default_rng(0)
    tokens = np.full((batch, seq_len), esm2.PAD_IDX, np.int32)
    lengths = rng.integers(seq_len // 2, seq_len - 2, batch)
    for i, n in enumerate(lengths):
        tokens[i, 0] = esm2.CLS_IDX
        tokens[i, 1:n + 1] = rng.integers(4, 24, n)
        tokens[i, n + 1] = esm2.EOS_IDX
    tokens = jnp.asarray(tokens)

    from procyon_tpu.models.pooling import pool_tokens

    @jax.jit
    def embed(params, tokens):
        out = esm2.forward(params, cfg, tokens)
        mask = (tokens != esm2.PAD_IDX).astype(jnp.int32)
        return pool_tokens(out["hidden"], mask, "mean")

    from procyon_tpu.utils.timing import time_fn

    dt = time_fn(embed, params, tokens)
    return batch / dt


def main():
    proteins_per_sec = bench_esm2_650m()
    result = {
        "metric": "proteins_per_sec_esm2_650m",
        "value": round(proteins_per_sec, 2),
        "unit": "proteins/sec (L=512, bf16, 1 chip)",
        "vs_baseline": round(proteins_per_sec / A100_PROTEINS_PER_SEC, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
