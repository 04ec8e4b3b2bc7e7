"""Normalization ops.

RMSNorm (Llama) and LayerNorm (ESM2). Plain jnp: XLA fuses these into
neighbouring ops on TPU; a hand-written Pallas kernel buys nothing for a
bandwidth-bound normalization that already fuses (HBM-bandwidth argument,
pallas_guide.md).  Statistics are computed in float32 regardless of input
dtype, matching the numerics of the reference models (torch LayerNorm /
LlamaRMSNorm upcast internally).
"""

import jax.numpy as jnp


def rms_norm(x, weight, *, eps: float = 1e-5):
    """LlamaRMSNorm: x * rsqrt(mean(x^2) + eps) * weight, stats in f32."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jnp.reciprocal(jnp.sqrt(var + eps))
    return (y * weight.astype(jnp.float32)).astype(dtype)


def layer_norm(x, weight, bias, *, eps: float = 1e-5):
    """LayerNorm with affine params, stats in f32 (ESM2 / torch semantics)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    y = y * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(dtype)
