"""Fused LayerNorm -> int8 W1 -> GELU -> int8 W2 MLP kernel (TPU Pallas).

Why: profiling the W8A8 ESM2-650M embed showed the MLP's elementwise
traffic dominating — the [B*S, 4d] hidden round-trips HBM between the up-
and down-projections (~840 MB/layer at B64 S512), and the gelu+quantize
pass alone cost ~1.6 ms/layer of VPU time. This kernel tiles the hidden
dimension so the intermediate NEVER leaves VMEM: per (m, n) grid step it
computes gelu(LN(x)@W1[:, n-tile]) quantized per row, multiplies by
W2[n-tile, :], and accumulates into an f32 VMEM scratch; the result is
written once.

Numerics: both matmuls run s8 x s8 -> s32 on the MXU (2x bf16 rate on
v5e); activations are dynamically quantized per row (x once per m-block
after the in-kernel LayerNorm, the gelu output per (row, n-tile) — exact
algebra, the only error is int8 rounding). GELU defaults to the sigmoid
form (error below the int8 grid step, ~2.5x fewer VPU ops); fast_act=False
restores the polynomial erf of ops/activations.gelu_erf_fast.

Replaces, for quantized serving, the reference MLP (HF EsmLayer
intermediate/output dense pair; procyon/model/esm.py:262-315 quant path).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from procyon_tpu.ops.activations import erf_approx

_INV_SQRT2 = 0.7071067811865476


def _kernel(x_ref, lnw_ref, lnb_ref, w1_ref, s1_ref, b1_ref, w2_ref,
            s2_ref, b2_ref, o_ref, acc_ref, xq_ref, sx_ref, *, eps,
            n_steps, sub_tiles, add_residual, fast_act):
    n = pl.program_id(1)

    @pl.when(n == 0)
    def _prep():
        xf = x_ref[...].astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        cx = xf - mean
        var = jnp.mean(cx * cx, axis=-1, keepdims=True)
        h = cx * jax.lax.rsqrt(var + eps) * lnw_ref[...] + lnb_ref[...]
        amax = jnp.max(jnp.abs(h), axis=-1, keepdims=True)
        sx = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
        xq_ref[...] = jnp.clip(jnp.round(h / sx), -127, 127).astype(
            jnp.int8)
        sx_ref[...] = jnp.broadcast_to(sx, sx_ref.shape)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # the hidden tile is processed as `sub_tiles` independent
    # dot1 -> gelu/quant -> dot2 chains: with no data dependency between
    # sub-tiles, Mosaic's scheduler overlaps one sub-tile's VPU
    # (gelu + requantize) with the next one's MXU dots — the VPU pass is
    # otherwise serial with the matmuls and dominates
    xq = xq_ref[...]
    sx = sx_ref[...][:, :1]                            # [bm, 1]
    bn = w1_ref.shape[1]
    sub = bn // sub_tiles
    acc1s = []
    for t in range(sub_tiles):
        sl = slice(t * sub, (t + 1) * sub)
        acc1s.append(jax.lax.dot_general(
            xq, w1_ref[:, sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32))         # [bm, sub]
    gqs, sgs = [], []
    for t in range(sub_tiles):
        sl = slice(t * sub, (t + 1) * sub)
        h1 = acc1s[t].astype(jnp.float32) * (sx * s1_ref[:, sl]) \
            + b1_ref[:, sl]
        if fast_act:
            # sigmoid-form GELU x*sigmoid(1.702x) = 0.5x(1+tanh(0.851x)):
            # max abs error vs exact ~0.02, BELOW the int8 grid step of
            # this path's own output quantization (amax/127); ~5 VPU ops
            # vs ~13 for the polynomial erf — the gelu chain dominated
            # this kernel's VPU time (profiled)
            g = 0.5 * h1 * (1.0 + jnp.tanh(0.851 * h1))
        else:
            g = 0.5 * h1 * (1.0 + erf_approx(h1 * _INV_SQRT2))
        gmax = jnp.max(jnp.abs(g), axis=-1, keepdims=True)
        sg = jnp.maximum(gmax, 1e-8) * (1.0 / 127.0)
        gqs.append(jnp.clip(jnp.round(g / sg), -127, 127).astype(jnp.int8))
        sgs.append(sg)
    total = None
    for t in range(sub_tiles):
        sl = slice(t * sub, (t + 1) * sub)
        acc2 = jax.lax.dot_general(
            gqs[t], w2_ref[sl, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)          # [bm, d]
        part = acc2.astype(jnp.float32) * (sgs[t] * s2_ref[...])
        total = part if total is None else total + part
    acc_ref[...] += total

    @pl.when(n == n_steps - 1)
    def _emit():
        out = acc_ref[...] + b2_ref[...]
        if add_residual:
            # the residual input block is already resident in VMEM —
            # folding the add here removes a full [M, d] HBM read+write
            # pass (profiled at ~0.25 ms/layer as a standalone add)
            out = out + x_ref[...].astype(jnp.float32)
        o_ref[...] = out.astype(o_ref.dtype)


def _kernel_pq(xq_ref, sx_ref, w1_ref, s1_ref, b1_ref, w2_ref,
               s2_ref, b2_ref, o_ref, acc_ref, *, eps, n_steps, sub_tiles,
               fast_act):
    """Pre-quantized variant: LN+row-quant already done outside (XLA
    elementwise pass), so the kernel carries NO [block_m, d] f32
    temporaries on the scoped stack — that is what lets block_m 256 fit
    the 16 MB limit at d=2560 (halving the dominant weight re-streaming
    vs block_m 128; see probe_fused_mlp_blocks.py measurements). The
    residual is also added outside: its [block_m, d] input block alone
    pushed the stack 636K over the limit at (256, 512)."""
    n = pl.program_id(1)

    @pl.when(n == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xq = xq_ref[...]
    sx = sx_ref[...][:, :1]                            # [bm, 1]
    bn = w1_ref.shape[1]
    sub = bn // sub_tiles
    acc1s = []
    for t in range(sub_tiles):
        sl = slice(t * sub, (t + 1) * sub)
        acc1s.append(jax.lax.dot_general(
            xq, w1_ref[:, sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32))
    gqs, sgs = [], []
    for t in range(sub_tiles):
        sl = slice(t * sub, (t + 1) * sub)
        h1 = acc1s[t].astype(jnp.float32) * (sx * s1_ref[:, sl]) \
            + b1_ref[:, sl]
        if fast_act:
            g = 0.5 * h1 * (1.0 + jnp.tanh(0.851 * h1))
        else:
            g = 0.5 * h1 * (1.0 + erf_approx(h1 * _INV_SQRT2))
        gmax = jnp.max(jnp.abs(g), axis=-1, keepdims=True)
        sg = jnp.maximum(gmax, 1e-8) * (1.0 / 127.0)
        gqs.append(jnp.clip(jnp.round(g / sg), -127, 127).astype(jnp.int8))
        sgs.append(sg)
    total = None
    for t in range(sub_tiles):
        sl = slice(t * sub, (t + 1) * sub)
        acc2 = jax.lax.dot_general(
            gqs[t], w2_ref[sl, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        part = acc2.astype(jnp.float32) * (sgs[t] * s2_ref[...])
        total = part if total is None else total + part
    acc_ref[...] += total

    @pl.when(n == n_steps - 1)
    def _emit():
        o_ref[...] = (acc_ref[...] + b2_ref[...]).astype(o_ref.dtype)


def ln_quant_rows(x, ln_w, ln_b, eps=1e-5):
    """LayerNorm then per-row symmetric int8 quantization (the exact
    math of the in-kernel _prep): returns (xq int8 [M,d], sx f32 [M,1])."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    cx = xf - mean
    var = jnp.mean(cx * cx, axis=-1, keepdims=True)
    h = cx * jax.lax.rsqrt(var + eps) * ln_w.reshape(1, -1) \
        + ln_b.reshape(1, -1)
    amax = jnp.max(jnp.abs(h), axis=-1, keepdims=True)
    sx = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
    xq = jnp.clip(jnp.round(h / sx), -127, 127).astype(jnp.int8)
    return xq, sx


def _ln_quant_kernel(x_ref, lnw_ref, lnb_ref, xq_ref, sx_ref, *, eps):
    xf = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    cx = xf - mean
    var = jnp.mean(cx * cx, axis=-1, keepdims=True)
    h = cx * jax.lax.rsqrt(var + eps) * lnw_ref[...] + lnb_ref[...]
    amax = jnp.max(jnp.abs(h), axis=-1, keepdims=True)
    sx = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
    xq_ref[...] = jnp.clip(jnp.round(h / sx), -127, 127).astype(jnp.int8)
    sx_ref[...] = jnp.broadcast_to(sx, sx_ref.shape)


def ln_quant_rows_pallas(x, ln_w, ln_b, eps=1e-5, block_m=256,
                         interpret=False):
    """Pallas form of ln_quant_rows: one HBM read of x, one int8 write —
    the XLA fusion runs ~4x the bandwidth floor (1.23 ms/layer at 3B
    shape, profiled) because the row reductions split it into multiple
    full-array passes. Returns (xq [M, d] int8, sx [M, 128] f32
    lane-broadcast, ready for the matmul kernel's sx operand)."""
    M, d = x.shape
    while M % block_m:
        block_m //= 2
    xq, sx = pl.pallas_call(
        functools.partial(_ln_quant_kernel, eps=eps),
        grid=(M // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda m: (m, 0)),
            pl.BlockSpec((1, d), lambda m: (0, 0)),
            pl.BlockSpec((1, d), lambda m: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_m, d), lambda m: (m, 0)),
            pl.BlockSpec((block_m, 128), lambda m: (m, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, d), jnp.int8),
            jax.ShapeDtypeStruct((M, 128), jnp.float32),
        ],
        interpret=interpret,
    )(x, ln_w.reshape(1, -1).astype(jnp.float32),
      ln_b.reshape(1, -1).astype(jnp.float32))
    return xq, sx


def fused_mlp_int8_prequant(x, ln_w, ln_b, w1q, s1, b1, w2q, s2, b2, *,
                            eps=1e-5, block_m=256, block_n=512,
                            sub_tiles=2, add_residual=False,
                            fast_act=True, interpret=False):
    """Two-pass form of fused_ln_mlp_int8 for large-d towers: LN +
    row-quant as one XLA elementwise pass (HBM-bandwidth, ~0.4 ms/layer
    at 3B shape), then the int8 matmul kernel at block_m 256 — the
    config the one-pass kernel cannot compile at d>=2048 because its
    in-kernel LN temporaries blow the scoped-vmem stack. Same quant
    math as fused_ln_mlp_int8; the residual is added AFTER the output
    cast here (one extra rounding per element in low-precision
    dtypes — the one-pass kernel adds it in f32 before the cast)."""
    M, d = x.shape
    H = w1q.shape[1]
    xq, sx128 = ln_quant_rows_pallas(x, ln_w, ln_b, eps,
                                     interpret=interpret)
    while M % block_m:
        block_m //= 2
    while H % block_n:
        block_n //= 2
    while block_n % (sub_tiles * 128):
        sub_tiles //= 2
    n_steps = H // block_n
    kernel = functools.partial(_kernel_pq, eps=eps, n_steps=n_steps,
                               sub_tiles=max(sub_tiles, 1),
                               fast_act=fast_act)

    def row2d(a):
        return a.reshape(1, -1)

    out = pl.pallas_call(
        kernel,
        grid=(M // block_m, n_steps),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda m, n: (m, 0)),
            pl.BlockSpec((block_m, 128), lambda m, n: (m, 0)),
            pl.BlockSpec((d, block_n), lambda m, n: (0, n)),
            pl.BlockSpec((1, block_n), lambda m, n: (0, n)),
            pl.BlockSpec((1, block_n), lambda m, n: (0, n)),
            pl.BlockSpec((block_n, d), lambda m, n: (n, 0)),
            pl.BlockSpec((1, d), lambda m, n: (0, 0)),
            pl.BlockSpec((1, d), lambda m, n: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, d), lambda m, n: (m, 0)),
        out_shape=jax.ShapeDtypeStruct((M, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_m, d), jnp.float32),
        ],
        interpret=interpret,
    )(xq, sx128, w1q, s1.reshape(1, H), row2d(b1), w2q,
      s2.reshape(1, d), row2d(b2))
    if add_residual:
        # one XLA elementwise pass (~0.6 ms/layer at 3B shape) — cheaper
        # than the 636K of scoped vmem the in-kernel residual block cost
        out = out + x
    return out


def fused_ln_mlp_int8(x, ln_w, ln_b, w1q, s1, b1, w2q, s2, b2, *,
                      eps=1e-5, block_m=512, block_n=1024, sub_tiles=2,
                      add_residual=False, fast_act=True, interpret=False,
                      auto_blocks=True, big_blocks=False):
    """x [M, d] -> LayerNorm -> gelu-MLP with int8 weights -> [M, d].

    w1q int8 [d, H], s1 f32 [1, H]; w2q int8 [H, d], s2 f32 [1, d];
    b1 [H], b2 [d], ln_w/ln_b [d]. add_residual=True returns x + MLP(x)
    (the residual folds into the kernel's emit); otherwise the caller adds.
    fast_act=True uses the sigmoid-form GELU (error below this path's own
    int8 output-quantization step; bench.py's embedding-cosine gate guards
    the end-to-end quality). Requires M % block_m == 0 and H % block_n == 0.
    """
    M, d = x.shape
    H = w1q.shape[1]
    if not auto_blocks:
        # caller-pinned blocks (tuning probes); only divisibility fixes
        while M % block_m:
            block_m //= 2
        while H % block_n:
            block_n //= 2
        while block_n % (sub_tiles * 128):
            sub_tiles //= 2
        return _call(x, ln_w, ln_b, w1q, s1, b1, w2q, s2, b2, eps=eps,
                     block_m=block_m, block_n=block_n,
                     sub_tiles=max(sub_tiles, 1),
                     add_residual=add_residual, fast_act=fast_act,
                     interpret=interpret)
    if H % block_n:
        # halve from min(block_n, H): the quotient heuristic can land on
        # an odd non-divisor (H=2560 -> 853) and spiral block_n to 1
        block_n = min(block_n, H)
        while H % block_n:
            block_n //= 2
    # big_blocks (opt-in via esm2.big_block_serving): the enclosing jit
    # raised the Mosaic scoped-vmem limit via paired compiler options,
    # so the big-row config compiles at large d — measured 17.5M stack,
    # 9.94 ms vs 13 ms for the 16M-forced (128, 1024) at 3B shape:
    # doubling the rows halves the per-layer [d,H]+[H,d] weight
    # re-streaming, the dominant HBM cost (probe_fused_mlp_blocks.py).
    if big_blocks and not interpret and d >= 2048:
        block_m = min(block_m, 256)
    else:
        # scoped-VMEM budget: the block set is ~9 bytes/elem of
        # [block_m, d] (f32 acc + bf16 x/out + s8 xq) plus two
        # [d|block_n] int8 weight tiles; at 3B scale (d=2560) block_m
        # 512 blows the 16MB stack. block_m must shrink FIRST: the
        # in-kernel LN materializes f32 [block_m, d] temporaries on the
        # scoped stack, so block_m is the scoped driver (measured:
        # one-pass (256,512) at d=2560 needs 17.8M vs (128,1024)
        # fitting; shrinking block_n saved only ~0.5M).
        while block_m > 128 and (block_m * d * 9
                                 + 2 * d * block_n) > 9 * 1024 * 1024:
            block_m //= 2
        # Measured on v5e (d=1280): block_m 512 fits the 16M scoped
        # limit at M<=32768 but trips it once the row grid passes 64
        # steps (17.74M at M=49152/65536) — shrink rows for tall
        # inputs only, so the proven short-grid config keeps its
        # weight-streaming economy.
        if M > 32768:
            block_m = min(block_m, 256)
    while M % block_m:
        block_m //= 2
    assert M % block_m == 0 and H % block_n == 0, (M, H, block_n)
    while block_n % (sub_tiles * 128):
        sub_tiles //= 2
    return _call(x, ln_w, ln_b, w1q, s1, b1, w2q, s2, b2, eps=eps,
                 block_m=block_m, block_n=block_n,
                 sub_tiles=max(sub_tiles, 1), add_residual=add_residual,
                 fast_act=fast_act, interpret=interpret)


def _call(x, ln_w, ln_b, w1q, s1, b1, w2q, s2, b2, *, eps, block_m,
          block_n, sub_tiles, add_residual, fast_act, interpret):
    M, d = x.shape
    H = w1q.shape[1]
    n_steps = H // block_n
    kernel = functools.partial(_kernel, eps=eps, n_steps=n_steps,
                               sub_tiles=sub_tiles,
                               add_residual=add_residual,
                               fast_act=fast_act)

    def row2d(a):
        return a.reshape(1, -1)

    out = pl.pallas_call(
        kernel,
        grid=(M // block_m, n_steps),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda m, n: (m, 0)),
            pl.BlockSpec((1, d), lambda m, n: (0, 0)),
            pl.BlockSpec((1, d), lambda m, n: (0, 0)),
            pl.BlockSpec((d, block_n), lambda m, n: (0, n)),
            pl.BlockSpec((1, block_n), lambda m, n: (0, n)),
            pl.BlockSpec((1, block_n), lambda m, n: (0, n)),
            pl.BlockSpec((block_n, d), lambda m, n: (n, 0)),
            pl.BlockSpec((1, d), lambda m, n: (0, 0)),
            pl.BlockSpec((1, d), lambda m, n: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, d), lambda m, n: (m, 0)),
        out_shape=jax.ShapeDtypeStruct((M, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_m, d), jnp.float32),
            pltpu.VMEM((block_m, d), jnp.int8),
            pltpu.VMEM((block_m, 128), jnp.float32),
        ],
        interpret=interpret,
    )(x, row2d(ln_w), row2d(ln_b), w1q, s1.reshape(1, H),
      row2d(b1), w2q, s2.reshape(1, d), row2d(b2))
    return out


def _kernel_swiglu(x_ref, nw_ref, wg_ref, sg_ref, wu_ref, su_ref, wd_ref,
                   sd_ref, o_ref, acc_ref, xq_ref, sx_ref, *, eps,
                   n_steps, sub_tiles):
    """SwiGLU variant of _kernel for the Llama W8A8 prefill path:
    rms_norm (no mean/bias) -> int8 gate & up dots -> silu(g)*u ->
    per-(row, n-tile) requant -> int8 down dot, residual folded into the
    emit. Same sub-tile VPU/MXU overlap trick as the GELU kernel."""
    n = pl.program_id(1)

    @pl.when(n == 0)
    def _prep():
        # NOTE: row-chunking these f32 temporaries to shrink the scoped
        # stack was tried and made it WORSE (19.14M vs 16.24M at
        # block_m 256 / d 4096 — Mosaic does not reuse the chunk
        # buffers), so the kernel keeps whole-block prep and rides the
        # raised scoped-vmem limit (w8a8_serving pairing contract).
        xf = x_ref[...].astype(jnp.float32)
        ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
        h = xf * jax.lax.rsqrt(ms + eps) * nw_ref[...]
        amax = jnp.max(jnp.abs(h), axis=-1, keepdims=True)
        sx = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
        xq_ref[...] = jnp.clip(jnp.round(h / sx), -127, 127).astype(
            jnp.int8)
        sx_ref[...] = jnp.broadcast_to(sx, sx_ref.shape)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xq = xq_ref[...]
    sx = sx_ref[...][:, :1]                            # [bm, 1]
    bn = wg_ref.shape[1]
    sub = bn // sub_tiles
    gs, us = [], []
    for t in range(sub_tiles):
        sl = slice(t * sub, (t + 1) * sub)
        gs.append(jax.lax.dot_general(
            xq, wg_ref[:, sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32))
        us.append(jax.lax.dot_general(
            xq, wu_ref[:, sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32))
    aqs, sas = [], []
    for t in range(sub_tiles):
        sl = slice(t * sub, (t + 1) * sub)
        g = gs[t].astype(jnp.float32) * (sx * sg_ref[:, sl])
        u = us[t].astype(jnp.float32) * (sx * su_ref[:, sl])
        a = g * jax.nn.sigmoid(g) * u                  # silu(g) * u
        amax = jnp.max(jnp.abs(a), axis=-1, keepdims=True)
        sa = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
        aqs.append(jnp.clip(jnp.round(a / sa), -127, 127).astype(jnp.int8))
        sas.append(sa)
    total = None
    for t in range(sub_tiles):
        sl = slice(t * sub, (t + 1) * sub)
        acc2 = jax.lax.dot_general(
            aqs[t], wd_ref[sl, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)          # [bm, d]
        part = acc2.astype(jnp.float32) * (sas[t] * sd_ref[...])
        total = part if total is None else total + part
    acc_ref[...] += total

    @pl.when(n == n_steps - 1)
    def _emit():
        # residual folded in f32 before the cast (x block resident)
        o_ref[...] = (acc_ref[...]
                      + x_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def fused_rms_swiglu_int8(x, nw, wgq, sg, wuq, su, wdq, sd, *, eps=1e-5,
                          block_m=256, block_n=512, sub_tiles=2,
                          interpret=False):
    """x [M, d] -> x + W8A8 SwiGLU-MLP(rms_norm(x)) for the Llama prefill
    path. wgq/wuq int8 [d, H] with scales sg/su f32 [1, H]; wdq int8
    [H, d] with sd f32 [1, d]; nw [d].

    STATUS: NOT WIRED into the production W8A8 path — measured net
    negative. The motivation was the XLA prefill's norm+act-quant
    elementwise fusion (~7x its bandwidth floor, 0.56 ms/layer at B16
    S256 d4096) plus the [M, H] hidden HBM round-trip, both absorbed
    here. Measured end-to-end on the chip (5.6B w8a8, B16 S256, raised
    scoped-vmem limit per the block_m-256 stack): retrieval workload
    +3% (77.7 -> 80.2 q/s) but the bind workload -18% (96.9 -> 79.1
    pairs/s; an XLA-path run under the SAME raised limit stayed at
    95.3, so the regression is the kernel's interaction with that
    program, likely the custom-call layout constraints), and at M=8
    decode shapes Pallas matmuls lose outright
    (scripts/probe_fused_decode.py: 358 vs 201 us/layer). Kept with its
    parity test as the documented exploration; production stays on the
    XLA W8A8 route."""
    M, d = x.shape
    H = wgq.shape[1]
    assert H % 128 == 0 and d % 128 == 0, (
        f"fused_rms_swiglu_int8 needs lane-multiple dims, got d={d} H={H}")
    while M % block_m:
        block_m //= 2
    if d >= 4096:
        # three weight tiles live per grid cell; at d=4096 block_n 512
        # measured a 16.24M scoped-vmem stack against the stock 16M
        # limit (244K over) — 256 fits with margin. block_m stays >=256:
        # weight tiles re-stream once per row-block, and at block_m 256
        # the int8 MXU rate (394 TOPS) balances HBM (~0.8 TB/s); halving
        # rows would leave the MXU waiting on weight DMAs
        block_n = min(block_n, 256)
    block_n = min(block_n, H)
    while H % block_n:
        block_n //= 2
    while sub_tiles > 1 and block_n % (sub_tiles * 128):
        sub_tiles //= 2
    n_steps = H // block_n
    kernel = functools.partial(_kernel_swiglu, eps=eps, n_steps=n_steps,
                               sub_tiles=sub_tiles)
    out = pl.pallas_call(
        kernel,
        grid=(M // block_m, n_steps),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda m, n: (m, 0)),
            pl.BlockSpec((1, d), lambda m, n: (0, 0)),
            pl.BlockSpec((d, block_n), lambda m, n: (0, n)),
            pl.BlockSpec((1, block_n), lambda m, n: (0, n)),
            pl.BlockSpec((d, block_n), lambda m, n: (0, n)),
            pl.BlockSpec((1, block_n), lambda m, n: (0, n)),
            pl.BlockSpec((block_n, d), lambda m, n: (n, 0)),
            pl.BlockSpec((1, d), lambda m, n: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, d), lambda m, n: (m, 0)),
        out_shape=jax.ShapeDtypeStruct((M, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_m, d), jnp.float32),
            pltpu.VMEM((block_m, d), jnp.int8),
            pltpu.VMEM((block_m, 128), jnp.float32),
        ],
        interpret=interpret,
    )(x, nw.reshape(1, d), wgq, sg.reshape(1, H), wuq, su.reshape(1, H),
      wdq, sd.reshape(1, d))
    return out
