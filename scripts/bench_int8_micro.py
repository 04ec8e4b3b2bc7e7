"""Microbench: raw s8xs8->s32 dot vs bf16 dot on the MXU, and the cost of
dynamic activation quantization, at ESM2-650M layer shapes."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from procyon_tpu.utils.timing import time_fn

M, K, N = 64 * 512, 1280, 5120


def main():
    rng = np.random.default_rng(0)
    x16 = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    w16 = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)
    x8 = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
    w8 = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)

    @jax.jit
    def dot16(x, w):
        return jax.lax.dot(x, w, preferred_element_type=jnp.float32)

    @jax.jit
    def dot8(x, w):
        return jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    @jax.jit
    def quant_only(x):
        xf = x.astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        sx = jnp.maximum(amax, 1e-8) * (1 / 127.0)
        return jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)

    @jax.jit
    def rescale_only(acc, sx, ws):
        return (acc.astype(jnp.float32) * sx * ws).astype(jnp.bfloat16)

    @jax.jit
    def dot8_full(x, w, ws):
        xf = x.astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        sx = jnp.maximum(amax, 1e-8) * (1 / 127.0)
        xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(xq, w, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * sx * ws).astype(jnp.bfloat16)

    flops = 2 * M * K * N
    dt = time_fn(dot16, x16, w16)
    print(f"bf16 dot: {dt*1e3:.3f} ms = {flops/dt/1e12:.1f} TFLOP/s",
          flush=True)
    dt8 = time_fn(dot8, x8, w8)
    print(f"int8 dot: {dt8*1e3:.3f} ms = {flops/dt8/1e12:.1f} TOP/s",
          flush=True)
    dtq = time_fn(quant_only, x16)
    print(f"quantize x only: {dtq*1e3:.3f} ms", flush=True)
    ws = jnp.ones((1, N), jnp.float32)
    acc = jnp.zeros((M, N), jnp.int32)
    sx = jnp.ones((M, 1), jnp.float32)
    dtr = time_fn(rescale_only, acc, sx, ws)
    print(f"rescale only: {dtr*1e3:.3f} ms", flush=True)
    dtf = time_fn(dot8_full, x16, w8, ws)
    print(f"quant+int8 dot+rescale: {dtf*1e3:.3f} ms = "
          f"{flops/dtf/1e12:.1f} eff TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
