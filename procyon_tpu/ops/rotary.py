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


# ---------------------------------------------------------------------------
# Flat-layout rotary: operate on [B, S, H*D] projection outputs directly.
#
# Motivation (profiled on v5e): rotate_half on per-head [.., H, 64] tensors
# slices 32-lane halves, forcing vector relayouts worth ~2 ms/layer in
# ESM2-650M. On the flat layout the rotation is one static lane permutation
# (sign folded into the sin table) + two multiplies on clean [B,S,H*D]
# tiles.
# ---------------------------------------------------------------------------


def flat_rotary_tables(head_dim: int, n_heads: int, max_len: int,
                       theta: float = 10000.0):
    """Return (cos_flat [L, H*D], sin_signed_flat [L, H*D], perm [H*D])
    implementing the half (rotate_half) convention per head on a flat
    layout: rotated = x*cos + x[..., perm]*sin_signed."""
    cos, sin = rope_frequencies(head_dim, max_len, theta)  # [L, D] full
    d2 = head_dim // 2
    # per-head permutation: first half reads the second half (negated),
    # second half reads the first half
    base = jnp.arange(head_dim)
    perm_head = jnp.concatenate([base[d2:], base[:d2]])
    sign_head = jnp.concatenate([-jnp.ones((d2,), jnp.float32),
                                 jnp.ones((d2,), jnp.float32)])
    perm = jnp.concatenate(
        [perm_head + h * head_dim for h in range(n_heads)])
    cos_flat = jnp.tile(cos, (1, n_heads))
    sin_flat = jnp.tile(sin, (1, n_heads)) * jnp.tile(sign_head,
                                                      (n_heads,))[None, :]
    return cos_flat, sin_flat, perm


def apply_rotary_flat(x_flat, cos_g, sin_signed_g, perm):
    """x_flat [B, S, H*D]; cos_g/sin_signed_g [B, S, H*D] (position-gathered
    tables in x dtype); perm [H*D] static lane permutation."""
    return x_flat * cos_g + x_flat[..., perm] * sin_signed_g


def apply_rotary_flat_decode(x_flat, cos_g, sin_signed_g, head_dim):
    """apply_rotary_flat for single-token decode shapes: the static lane
    PERMUTATION gather on [B, 1, H*D] lowers to a pair of transposed
    copies (profiled ~0.4 ms/step at the 6.6B decode shape: XLA converts
    to column-major, gathers, converts back); per-head half-slices +
    concat keep the row-major layout. Prefill shapes keep the gather
    (on [B, S, H*D] tiles the slice form forced worse relayouts — the
    module docstring's ESM2 measurement)."""
    *lead, HD = x_flat.shape
    x4 = x_flat.reshape(*lead, HD // head_dim, head_dim)
    d2 = head_dim // 2
    rot = jnp.concatenate([x4[..., d2:], x4[..., :d2]], axis=-1)
    return x_flat * cos_g + rot.reshape(x_flat.shape) * sin_signed_g
