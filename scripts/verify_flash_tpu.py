"""Drive the compiled Pallas flash-attention kernel on the real TPU and
compare against a host-side numpy reference. Used for on-hardware
verification (tests/ run the same comparisons on CPU in interpret mode)."""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def np_reference(q, k, v, sq, skv, causal):
    B, Sq, Hq, D = q.shape
    _, Skv, Hkv, _ = k.shape
    g = Hq // Hkv
    kf = np.repeat(k, g, axis=2) if g > 1 else k
    vf = np.repeat(v, g, axis=2) if g > 1 else v
    s = np.einsum("bqhd,bkhd->bhqk", q.astype(np.float64),
                  kf.astype(np.float64)) / np.sqrt(D)
    allowed = (sq[:, None, :, None] == skv[:, None, None, :]) & (
        sq[:, None, :, None] > 0)
    if causal:
        allowed = allowed & (np.arange(Sq)[:, None] >= np.arange(Skv)[None, :])[
            None, None]
    s = np.where(allowed, s, -1e30)
    m = s.max(-1, keepdims=True)
    p = np.where(allowed, np.exp(s - m), 0.0)
    l = p.sum(-1, keepdims=True)
    l = np.where(l == 0, 1.0, l)
    out = np.einsum("bhqk,bkhd->bqhd", p / l, vf.astype(np.float64))
    return out


def main():
    from procyon_tpu.ops import flash_attention
    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.default_rng(42)

    def check(name, B, Sq, Skv, Hq, Hkv, D, causal, dtype, tol):
        q = rng.standard_normal((B, Sq, Hq, D)).astype(np.float32)
        k = rng.standard_normal((B, Skv, Hkv, D)).astype(np.float32)
        v = rng.standard_normal((B, Skv, Hkv, D)).astype(np.float32)
        sq = np.ones((B, Sq), np.int32)
        skv = np.ones((B, Skv), np.int32)
        sq[:, int(Sq * 0.8):] = 0
        skv[:, int(Skv * 0.9):] = 0
        f = jax.jit(functools.partial(flash_attention, causal=causal,
                                      backend="pallas"))
        out = np.asarray(f(jnp.asarray(q, dtype), jnp.asarray(k, dtype),
                           jnp.asarray(v, dtype), jnp.asarray(sq),
                           jnp.asarray(skv))).astype(np.float64)
        ref = np_reference(q, k, v, sq, skv, causal)
        ref = np.where((sq > 0)[:, :, None, None], ref, 0.0)
        err = np.abs(out - ref).max()
        status = "OK " if err < tol else "FAIL"
        print(f"{status} {name}: max_abs_err={err:.5f} (tol {tol})")
        return err < tol

    ok = True
    ok &= check("llama2-causal-bf16", 2, 512, 512, 32, 32, 128, True,
                jnp.bfloat16, 0.03)
    ok &= check("llama3-gqa-causal-bf16", 2, 512, 512, 32, 8, 128, True,
                jnp.bfloat16, 0.03)
    ok &= check("esm2-bidir-bf16", 4, 256, 256, 20, 20, 64, False,
                jnp.bfloat16, 0.03)
    ok &= check("f32-causal", 1, 256, 256, 4, 4, 64, True, jnp.float32, 0.02)  # TPU f32 matmul uses bf16 passes
    ok &= check("odd-len-200-f32", 1, 200, 200, 4, 4, 64, False, jnp.float32,
                0.02)

    # gradient path, compiled
    B, S, H, D = 1, 256, 4, 64
    q = rng.standard_normal((B, S, H, D)).astype(np.float32)
    k = rng.standard_normal((B, S, H, D)).astype(np.float32)
    v = rng.standard_normal((B, S, H, D)).astype(np.float32)
    seg = np.concatenate([np.ones((B, 200), np.int32),
                          np.zeros((B, 56), np.int32)], 1)

    def loss(q, k, v):
        o = flash_attention(q, k, v, jnp.asarray(seg), jnp.asarray(seg),
                            causal=True, backend="pallas")
        return jnp.sum(o * o)

    gp = jax.jit(jax.grad(loss, (0, 1, 2)))(jnp.asarray(q), jnp.asarray(k),
                                            jnp.asarray(v))
    # numerical check on a few coordinates vs finite differences of np ref
    def np_loss(q, k, v):
        o = np_reference(q, k, v, seg, seg, True)
        o = np.where((seg > 0)[:, :, None, None], o, 0.0)
        return (o * o).sum()

    eps = 1e-3
    idx = [(0, 3, 1, 5), (0, 100, 2, 33), (0, 199, 0, 0)]
    for nm, arr, g in zip("qkv", (q, k, v), gp):
        for i in idx:
            pert = arr.copy()
            pert[i] += eps
            fd = (np_loss(*(pert if nm == "q" else q,
                            pert if nm == "k" else k,
                            pert if nm == "v" else v)) - np_loss(q, k, v)) / eps
            got = float(np.asarray(g)[i])
            rel = abs(got - fd) / max(abs(fd), 1e-3)
            status = "OK " if rel < 0.05 else "FAIL"
            if rel >= 0.05:
                ok = False
            print(f"{status} grad d{nm}{i}: pallas={got:.4f} fd={fd:.4f}")

    # throughput smoke
    f = jax.jit(functools.partial(flash_attention, causal=True,
                                  backend="pallas"))
    q = jnp.asarray(rng.standard_normal((8, 2048, 32, 128)), jnp.bfloat16)
    seg1 = jnp.ones((8, 2048), jnp.int32)
    f(q, q, q, seg1, seg1).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(10):
        o = f(q, q, q, seg1, seg1)
    o.block_until_ready()
    dt = (time.perf_counter() - t0) / 10
    flops = 4 * 8 * 32 * 2048 * 2048 * 128 * 0.5
    print(f"fwd B8 S2048 H32 D128 causal: {dt*1e3:.2f} ms, "
          f"{flops/dt/1e12:.1f} TFLOP/s")
    print("ALL OK" if ok else "FAILURES PRESENT")


if __name__ == "__main__":
    main()
