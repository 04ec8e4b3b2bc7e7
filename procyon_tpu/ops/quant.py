"""Weight-only int8 quantization.

Replaces the reference's bitsandbytes NF4 QLoRA surface (SURVEY.md §2.3
item 4) with a TPU-native scheme: per-output-channel symmetric int8 weights
dequantized inside the matmul fusion (XLA fuses convert+scale into the dot).
Halves decoder weight memory — a 7B-class model fits a single v5e chip —
and decode throughput, being weight-streaming bound, improves accordingly.

Quantized tensors are {"q": int8 [..., in, out], "s": f32 [..., 1, out]}.
"""

from typing import Dict

import jax.numpy as jnp


def quantize(w, axis=-2):
    """Symmetric per-output-channel int8 quantization of a weight matrix
    [..., in, out] (reduction over the `in` axis)."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "s": scale}


def dequantize(qw, dtype=jnp.bfloat16):
    return (qw["q"].astype(jnp.float32) * qw["s"]).astype(dtype)


def qmatmul(x, qw):
    """x @ dequant(qw); dequant fuses into the dot under XLA."""
    w = qw["q"].astype(x.dtype) * qw["s"].astype(x.dtype)
    return x @ w


def qmatmul_w8a8(x, qw):
    """Full-int8 matmul on the MXU: dynamic symmetric per-row activation
    quantization x per-output-channel weight scales.

    The v5e MXU runs s8 x s8 -> s32 at 2x the bf16 rate (394 vs 197
    TOPS), so compute-bound paths (the all-protein embedding sweep,
    prefill) nearly double; weight-only dequant (qmatmul) keeps the dot in
    bf16 and only saves bandwidth. The rescale is one f32 row-scale times
    one col-scale, fused by XLA into the dot's epilogue.
    """
    import jax

    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sx = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, qw["q"],
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    # sx: [..., 1]; qw["s"]: [1, out] -> broadcast over the batch dims
    scale = sx * qw["s"].reshape((1,) * (x.ndim - 1) + (-1,))
    return (acc.astype(jnp.float32) * scale).astype(x.dtype)


def mm(x, w, mode: str = "dequant"):
    """Matmul dispatching on int8-quantized weight leaves.

    mode: "dequant" = weight-only (bf16 dot, bandwidth savings);
          "w8a8"    = int8 MXU dot (compute doubling; inference paths).
    """
    if is_quantized(w):
        return qmatmul_w8a8(x, w) if mode == "w8a8" else qmatmul(x, w)
    return x @ w


def is_quantized(node) -> bool:
    return isinstance(node, dict) and set(node.keys()) == {"q", "s"}


def quantize_tree(params: Dict, *, keys=("wq", "wk", "wv", "wo", "w_gate",
                                         "w_up", "w_down",
                                         "lm_head")) -> Dict:
    """Quantize the named weight leaves of a llama param tree in place
    (returns a new tree). Norms/biases stay in their original dtype."""
    def walk(node, name=""):
        if isinstance(node, dict):
            return {k: walk(v, k) for k, v in node.items()}
        if name in keys and hasattr(node, "ndim") and node.ndim >= 2:
            return quantize(node)
        return node

    return walk(params)
