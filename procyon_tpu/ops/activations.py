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
    """A&S 7.1.26 rational approximation, odd-extended. f32 math."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


_INV_SQRT2 = 0.7071067811865476


def gelu_erf_fast(x):
    """Exact-form GELU with polynomial erf; computed in f32, returned in the
    input dtype."""
    xf = x.astype(jnp.float32)
    out = 0.5 * xf * (1.0 + erf_approx(xf * _INV_SQRT2))
    return out.astype(x.dtype)
