"""Probe whether JAX's persistent compilation cache works over the axon
tunnel runtime. If it does, every 10-20 min remote compile becomes a disk
hit across processes — set JAX_COMPILATION_CACHE_DIR in benches/CI.

Measured (TPU v5e over axon, 2026-08-17): cold compile+run 1.12 s,
fresh-process warm rerun 0.39 s from 2 cache files — the cache DOES serve
tunnel compiles across processes. procyon_tpu/__init__.py now enables it
by default (~/.cache/procyon_jax_cache; PROCYON_COMPILE_CACHE=0 opts out).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

cache_dir = os.environ.get("PROBE_CACHE_DIR", "/tmp/jax_cc_cache")

import jax

jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
import numpy as np

x = jnp.asarray(np.random.default_rng(0).standard_normal(
    (512, 512)), jnp.bfloat16)


@jax.jit
def f(x):
    for _ in range(4):
        x = jnp.tanh(x @ x) + x
    return x.sum()


t0 = time.perf_counter()
v = float(f(x))
t1 = time.perf_counter()
n_files = sum(len(fs) for _, _, fs in os.walk(cache_dir)) \
    if os.path.isdir(cache_dir) else 0
print(f"compile+run: {t1 - t0:.2f}s value={v:.3f} "
      f"cache_files={n_files} backend={jax.default_backend()}")
