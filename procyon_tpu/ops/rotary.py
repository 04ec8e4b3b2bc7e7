"""Rotary position embeddings.

Two interleaving conventions exist among the models we host:
  * "half"       — Llama/HF convention: rotate_half splits the head dim into
                   two contiguous halves (transformers LlamaRotaryEmbedding).
  * "interleaved"— ESM2 convention: even/odd interleaved pairs
                   (fair-esm RotaryEmbedding; reference esm attention).

Both are expressed as elementwise ops on [B, S, H, D] so XLA fuses them into
the surrounding attention computation.
"""

import jax.numpy as jnp


def rope_frequencies(head_dim: int, max_len: int, theta: float = 10000.0):
    """Return cos/sin tables of shape [max_len, head_dim//2], float32."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    t = jnp.arange(max_len, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)  # [max_len, head_dim//2]
    return jnp.cos(freqs), jnp.sin(freqs)


def apply_rotary(x, cos, sin, positions, *, interleaved: bool = False):
    """Apply RoPE.

    x:         [B, S, H, D]
    cos, sin:  [max_len, D//2] tables from rope_frequencies
    positions: [B, S] int32 absolute positions (supports left-padded batches
               and KV-cache decode where position != sequence index)
    """
    dtype = x.dtype
    d2 = x.shape[-1] // 2
    c = cos[positions][:, :, None, :].astype(jnp.float32)  # [B,S,1,D/2]
    s = sin[positions][:, :, None, :].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    if interleaved:
        x1 = xf[..., 0::2]
        x2 = xf[..., 1::2]
        r1 = x1 * c - x2 * s
        r2 = x1 * s + x2 * c
        out = jnp.stack([r1, r2], axis=-1).reshape(x.shape)
    else:
        x1 = xf[..., :d2]
        x2 = xf[..., d2:]
        r1 = x1 * c - x2 * s
        r2 = x1 * s + x2 * c
        out = jnp.concatenate([r1, r2], axis=-1)
    return out.astype(dtype)
