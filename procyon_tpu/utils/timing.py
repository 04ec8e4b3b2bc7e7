"""Honest device timing over the axon-tunnel TPU runtime.

Two environment facts make naive timing wrong here (discovered empirically,
recorded in .claude/skills/verify/SKILL.md):
  * `block_until_ready()` returns before remote execution finishes — a
    "39,000 TFLOP/s matmul" if you trust it;
  * scalar host readback RTT is ~1.2 s with high variance, so single-shot
    sync-timed loops are RTT-dominated.

Protocol: two-point measurement — run N1 and N2 (>N1) dispatches ending in a
tiny scalar readback (which genuinely waits for the dependency chain), and
report (T2 - T1) / (N2 - N1). The constant RTT/dispatch overhead cancels.
"""

import time

import jax.numpy as jnp


def sync_scalar(x):
    """Force completion of everything x depends on (tiny host transfer)."""
    return float(jnp.sum(x.astype(jnp.float32)) * 0 + jnp.max(
        x.astype(jnp.float32).reshape(-1)[:1]))


def time_fn(fn, *args, n_small=5, n_big=25, repeats=3, warmup=2):
    """Median-of-repeats two-point timing of fn(*args) in seconds/call."""
    for _ in range(warmup):
        out = fn(*args)
    sync_scalar(out)

    def run(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = fn(*args)
        sync_scalar(o)
        return time.perf_counter() - t0

    t_small = min(run(n_small) for _ in range(repeats))
    t_big = min(run(n_big) for _ in range(repeats))
    return max((t_big - t_small) / (n_big - n_small), 1e-9)
