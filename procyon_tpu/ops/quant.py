"""Weight-only int8 quantization.

Replaces the reference's bitsandbytes NF4 QLoRA surface (SURVEY.md §2.3
item 4) with a TPU-native scheme: per-output-channel symmetric int8 weights
dequantized inside the matmul fusion (XLA fuses convert+scale into the dot).
Halves decoder weight memory — a 7B-class model fits a single v5e chip —
and decode throughput, being weight-streaming bound, improves accordingly.

Quantized tensors are {"q": int8 [..., in, out], "s": f32 [..., 1, out]}.
"""

from typing import Dict

import jax
import jax.numpy as jnp


def quantize(w, axis=-2):
    """Symmetric per-output-channel int8 quantization of a weight matrix
    [..., in, out] (reduction over the `in` axis).

    Stacked-layer leaves ([L, in, out]) quantize one layer at a time via
    lax.map: the f32 temporary of a 3B-scale stacked leaf alone (~4 GB)
    otherwise OOMs a 16 GB chip next to the bf16 params."""
    if w.ndim == 3 and axis == -2:
        return jax.lax.map(lambda wl: quantize(wl, axis=-2), w)
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
    int4 leaves are always weight-only (their win is bandwidth).
    """
    if is_quantized(w):
        return qmatmul_w8a8(x, w) if mode == "w8a8" else qmatmul(x, w)
    if is_quantized4(w):
        return qmatmul4(x, w)
    return x @ w


def is_quantized(node) -> bool:
    return isinstance(node, dict) and set(node.keys()) == {"q", "s"}


# ---------------------------------------------------------------------------
# int4 weight-only quantization (the NF4/QLoRA replacement, SURVEY.md §2.3
# item 4): group-wise symmetric 4-bit, two nibbles packed per int8 byte
# along the contraction axis. Halves weight HBM traffic vs int8 — the
# decode lever to fit 8B + KV on one 16 GB chip with headroom.
# ---------------------------------------------------------------------------


def quantize4(w, group: int = 128):
    """[..., in, out] -> {"p": int8 [..., in/2, out] packed nibbles,
    "s": f32 [..., in/group, 1, out] group scales}.
    Group-wise scaling recovers most of the accuracy a flat 15-level grid
    loses (bitsandbytes NF4 plays the same role in the reference,
    esm.py:444-449).

    SPLIT-HALF packing: the low nibble of packed row r holds original row
    r, the high nibble holds row r + in/2 — unpacking is then two
    contiguous slabs with NO interleave. (The original adjacent-row
    packing needed a stride-2 shuffle on unpack, which XLA materialized
    as a relayout copy of the full weight every decode step — a ~15x
    slowdown at 6B scale.)

    AFFINE nibble encoding: the low nibble is stored BIASED (q + 8, in
    [1, 15]) and the high nibble stores signed q directly, so the signed
    byte value is exactly q_hi * 16 + (q_lo + 8) with no wraparound.
    Both nibbles then decode as affine functions of {byte, byte & 0xF}:
      q_lo = (p & 0xF) - 8          q_hi = (p - (p & 0xF)) / 16
    which lets the fused matmul kernel (ops/int4_matmul.py) decode via
    dot products of the RAW byte planes instead of per-element shifts
    (Mosaic has no int8 vector shift/sub)."""
    wf = w.astype(jnp.float32)
    *lead, k, n = wf.shape
    assert k % group == 0 and group % 2 == 0, (k, group)
    assert (k // 2) % group == 0, (k, group)  # groups stay nibble-pure
    gshape = (*lead, k // group, group, n)
    wg = wf.reshape(gshape)
    amax = jnp.max(jnp.abs(wg), axis=-2, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(wg / scale), -7, 7).astype(jnp.int8)
    q = q.reshape(*lead, k, n)
    lo = q[..., : k // 2, :] + 8                      # biased, [1, 15]
    hi = q[..., k // 2:, :]                           # signed
    packed = ((lo & 0x0F) | (hi << 4)).astype(jnp.int8)
    # group size is derivable (k / s.shape[-3]) — no non-array leaf in the
    # pytree (ints would become traced scalars under jit)
    return {"p": packed, "s": scale}


def dequantize4(qw, dtype=jnp.bfloat16):
    p = qw["p"]
    *lead, k2, n = p.shape
    k = k2 * 2
    group = k // qw["s"].shape[-3]
    lo = ((p & 0x0F) - 8).astype(jnp.int8)            # un-bias
    hi = jax.lax.shift_right_arithmetic(p, jnp.int8(4))
    q = jnp.concatenate([lo, hi], axis=-2)            # [..., k, n]
    wg = q.reshape(*lead, k // group, group, n).astype(jnp.float32)
    return (wg * qw["s"]).reshape(*lead, k, n).astype(dtype)


def qmatmul4(x, qw):
    """x @ dequant4(qw). Decode-shaped calls (few rows) go through the
    fused Pallas unpack+matmul kernel on TPU — packed int4 streams
    straight from HBM, half the bytes of int8; large-row calls (prefill /
    training) fall back to the XLA dequant path."""
    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    k = x.shape[-1]
    n = qw["p"].shape[-1]
    if (qw["p"].ndim == 2 and rows <= 256 and jax.default_backend() == "tpu"
            and any(n % c == 0 for c in (512, 256, 128))
            and (k // 2) % (k // qw["s"].shape[-3]) == 0):
        from procyon_tpu.ops.int4_matmul import qmatvec4
        return qmatvec4(x, qw)
    return x @ dequantize4(qw, x.dtype)


def is_quantized4(node) -> bool:
    return isinstance(node, dict) and set(node.keys()) == {"p", "s"}


def quantize_tree4(params: Dict, *, keys=("wq", "wk", "wv", "wo", "w_gate",
                                          "w_up", "w_down", "lm_head"),
                   group: int = 128) -> Dict:
    """int4 variant of quantize_tree (leaves whose contraction dim is not
    group-divisible fall back to int8)."""
    def walk(node, name=""):
        if isinstance(node, dict):
            return {k: walk(v, k) for k, v in node.items()}
        if name in keys and hasattr(node, "ndim") and node.ndim >= 2:
            if node.shape[-2] % (2 * group) == 0:
                return quantize4(node, group=group)
            return quantize(node)
        return node

    return walk(params)


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
