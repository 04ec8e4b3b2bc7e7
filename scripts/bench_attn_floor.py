"""Training-attention floor evidence (VERDICT r2 weak #2 close-out).

Measures, at the benchmark shape (B8 S2048 H32 D128 causal bf16):
  1. the flash fwd kernel (the 7.4 ms / 37 TFLOP/s number),
  2. the softmax-free MXU bound: the SAME two batched matmuls
     (S = Q K^T, O = P V with P a constant) through plain XLA dots —
     everything the hardware must do minus softmax/masking/staging,
  3. the same bound with the causal half skipped (block-level ideal).

If (1) is within ~2x of (2), the kernel's gap to peak is the
softmax/mask VPU work and staging that any implementation at this block
shape must pay — int8 QK^T cannot help because the MXU is not the
limiter. Appends the per-score-element budget to stdout for STATUS.md.
"""
import json
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _canary():
    """Chip-state probe fields for the JSON line (VERDICT r3 weak #4)."""
    from procyon_tpu.utils.timing import canary_fields

    return canary_fields()


def main():
    import jax
    import jax.numpy as jnp

    from procyon_tpu.ops.flash_attention import flash_attention
    from procyon_tpu.utils.timing import time_fn

    B, S, H, D = 8, 2048, 32, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
    seg = jnp.ones((B, S), jnp.int32)

    @jax.jit
    def flash(q, k, v, seg):
        return flash_attention(q, k, v, seg, seg, causal=True)

    @jax.jit
    def mxu_bound(q, k, v):
        # the two matmuls alone, full S x S (no causal skip): S then O
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        p = (s * (1.0 / math.sqrt(D))).astype(jnp.bfloat16)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v)

    @jax.jit
    def mxu_bound_half(q, k, v):
        # causal-ideal: same matmuls on half the kv extent (block-skip
        # upper bound on what causal masking can save)
        half = S // 2
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k[:, :half])
        p = (s * (1.0 / math.sqrt(D))).astype(jnp.bfloat16)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v[:, :half])

    t_flash = time_fn(flash, q, k, v, seg)
    t_full = time_fn(mxu_bound, q, k, v)
    t_half = time_fn(mxu_bound_half, q, k, v)

    causal_flops = 2 * 2 * B * H * S * S * D * 0.5
    print(json.dumps({
        "metric": "train_attn_floor_evidence",
        "flash_fwd_ms": round(t_flash * 1e3, 2),
        "flash_tflops": round(causal_flops / t_flash / 1e12, 1),
        "mxu_only_full_ms": round(t_full * 1e3, 2),
        "mxu_only_causal_ideal_ms": round(t_half * 1e3, 2),
        "kernel_vs_mxu_ideal": round(t_flash / t_half, 2),
        "note": "kernel gap over the matmul-only causal bound = softmax/"
                "mask VPU passes + score staging; int8 QK^T attacks the "
                "matmul share only",
        **_canary(),
    }))


if __name__ == "__main__":
    main()
