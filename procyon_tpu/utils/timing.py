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


def chip_canary_ms(dim: int = 4096, *, seed: int = 0) -> float:
    """Fixed-workload chip-state probe: one pinned dim^3 bf16 matmul in
    milliseconds, two-point timed.

    VERDICT r3 weak #4: the beam-caption metric swings ~20% day to day on
    identical code (chip state / tunnel load). Every bench JSON carries
    this number so cross-session comparisons can be canary-normalized
    (quote metric * canary_today / canary_then) and a slow-chip day is
    visible in the record instead of masquerading as a regression.

    v5e reference point: a 4096^3 bf16 matmul is 2*4096^3 = 137 GFLOP
    (~0.7 ms at the ~197 TFLOP/s bf16 peak); measured 0.84 ms on this
    chip (2026-08-18) — treat ~0.8-0.9 as healthy and ratios against it
    as the normalizer. The weights are fixed by seed and the shape never
    changes, so the compile caches across sessions."""
    import jax

    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    a = jax.random.normal(k1, (dim, dim), jnp.bfloat16)
    b = jax.random.normal(k2, (dim, dim), jnp.bfloat16)

    @jax.jit
    def mm(a, b):
        return a @ b

    return float(time_fn(mm, a, b) * 1e3)


def canary_fields() -> dict:
    """{"canary_ms": ...} for bench JSON lines, or {} on CPU (synthetic
    smokes would pay ~90 host matmuls for a number that means nothing
    off-chip)."""
    import jax

    if jax.devices()[0].platform == "cpu":
        return {}
    return {"canary_ms": round(chip_canary_ms(), 3)}
