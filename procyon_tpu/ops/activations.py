"""Activation functions tuned for the TPU VPU.

gelu_erf_fast: exact-form GELU 0.5*x*(1+erf(x/sqrt(2))) with erf computed by
the Abramowitz-Stegun 7.1.26 polynomial (max abs error 1.5e-7 in erf,
~7e-8 in the GELU output — far below bf16 resolution and inside the f32
parity tolerance). Motivation: XLA's erf lowering for bf16 operands on this
TPU runtime routes through a u32-producing path that pollutes the
surrounding matmul fusions (profiled: the ESM2 MLP down-projection ran at
~94 TFLOP/s instead of ~190 with jax.nn.gelu(approximate=False)).
"""

import jax.numpy as jnp


def erf_approx(x):
    """erf(x) = tanh(q(x)) with q an odd degree-13 minimax polynomial
    (derivative-weighted fit; max abs error 1.7e-7 in f32 — the same as
    A&S 7.1.26 but with no divide and no exp: tanh absorbs the saturation
    a plain polynomial cannot represent). Odd by construction."""
    c0, c1, c2 = 1.1283793939e+00, 1.0276775286e-01, -1.8844757103e-04
    c3, c4 = -6.2315751026e-04, 8.9099016893e-05
    c5, c6 = -5.9358860429e-06, 1.5851481176e-07
    xc = jnp.clip(x, -4.2, 4.2)
    t = xc * xc
    acc = ((((((c6 * t + c5) * t + c4) * t + c3) * t + c2) * t + c1)
           * t + c0)
    return jnp.tanh(xc * acc)


_INV_SQRT2 = 0.7071067811865476


def gelu_erf_fast(x):
    """Exact-form GELU with polynomial erf; computed in f32, returned in the
    input dtype."""
    xf = x.astype(jnp.float32)
    out = 0.5 * xf * (1.0 + erf_approx(xf * _INV_SQRT2))
    return out.astype(x.dtype)
