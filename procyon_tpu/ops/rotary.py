"""Rotary position embeddings.

Two interleaving conventions exist among the models we host:
  * "half"       — Llama/ESM2 convention: rotate_half splits the head dim
                   into two contiguous halves (transformers
                   LlamaRotaryEmbedding / modeling_esm rotate_half).
  * "interleaved"— GPT-J convention: even/odd interleaved pairs (kept for
                   completeness; none of the hosted models use it).

Performance notes (profiled on v5e): computing rotary in f32 with slice+
stack forced ~2 ms/layer of layout copies inside the scanned ESM2 block.
This implementation precomputes FULL-width cos/sin tables once per forward
(outside the layer scan) and applies x*cos + rotate_half(x)*sin in the
input dtype — identical math, and matching HF's behavior of applying rotary
in the activation dtype for bf16 models.
"""

import jax.numpy as jnp


def rope_frequencies(head_dim: int, max_len: int, theta: float = 10000.0,
                     *, interleaved: bool = False):
    """Return full-width cos/sin tables [max_len, head_dim], float32."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    t = jnp.arange(max_len, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)  # [max_len, head_dim//2]
    cos, sin = jnp.cos(freqs), jnp.sin(freqs)
    if interleaved:
        # duplicate each column pairwise: c0 c0 c1 c1 ...
        cos = jnp.repeat(cos, 2, axis=-1)
        sin = jnp.repeat(sin, 2, axis=-1)
    else:
        cos = jnp.concatenate([cos, cos], axis=-1)
        sin = jnp.concatenate([sin, sin], axis=-1)
    return cos, sin


def _rotate_half(x):
    d2 = x.shape[-1] // 2
    return jnp.concatenate([-x[..., d2:], x[..., :d2]], axis=-1)


def _rotate_interleaved(x):
    r = jnp.stack([-x[..., 1::2], x[..., 0::2]], axis=-1)
    return r.reshape(x.shape)


def apply_rotary(x, cos, sin, positions, *, interleaved: bool = False):
    """Apply RoPE in the input dtype.

    x:         [B, S, H, D]
    cos, sin:  [max_len, D] full-width tables from rope_frequencies
    positions: [B, S] int32 absolute positions (supports left-padded batches
               and KV-cache decode where position != sequence index)
    """
    c = cos[positions][:, :, None, :].astype(x.dtype)  # [B,S,1,D]
    s = sin[positions][:, :, None, :].astype(x.dtype)
    rot = _rotate_interleaved(x) if interleaved else _rotate_half(x)
    return x * c + rot * s
