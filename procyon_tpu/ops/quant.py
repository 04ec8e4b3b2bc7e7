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


def mm(x, w):
    """Matmul dispatching on int8-quantized weight leaves."""
    if is_quantized(w):
        return qmatmul(x, w)
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
