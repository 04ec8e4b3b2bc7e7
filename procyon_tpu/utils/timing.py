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


def chip_canary_ms(dim: int = 4096, *, seed: int = 0,
                   n_small: int = 8, n_big: int = 136,
                   repeats: int = 3) -> float:
    """Fixed-workload chip-state probe: milliseconds per pinned dim^3 bf16
    matmul, measured as a DATA-DEPENDENT lax.scan chain and two-pointed
    over chain LENGTH: (T(n_big) - T(n_small)) / (n_big - n_small).

    VERDICT r3 weak #4: the beam-caption metric swings ~20% day to day on
    identical code (chip state / tunnel load). Every bench JSON carries
    this number so cross-session comparisons can be canary-normalized
    (quote metric * canary_today / canary_then) and a slow-chip day is
    visible in the record instead of masquerading as a regression.

    Why not time_fn on a single matmul: repeated IDENTICAL sub-ms
    dispatches are unmeasurable over this runtime — a first cut measured
    0.014 ms, then 2.0 / 0.98 / 1e-6 ms on three successive calls (the
    tunnel overlaps or dedupes identical requests; same micro-lesson as
    the int4 kernel probe, STATUS r3). Here every matmul is serialized by
    DATA dependence inside one scan, the two chain lengths are two fixed
    jit programs (compile-cached across sessions), and the per-call
    RTT/dispatch constant cancels in the length difference.

    v5e reference point: 2*4096^3 = 137 GFLOP is ~0.7 ms at the ~197
    TFLOP/s bf16 peak; the chain step adds a 1/64 rescale folded into the
    matmul epilogue (keeps bf16 bounded). Measured 0.86 ms on this chip
    (2026-08-18) — treat ~0.8-0.9 as healthy."""
    import jax

    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    x0 = jax.random.normal(k1, (dim, dim), jnp.bfloat16)
    b = jax.random.normal(k2, (dim, dim), jnp.bfloat16)

    def chain(n):
        @jax.jit
        def f(x, b):
            def body(x, _):
                return (x @ b) * jnp.bfloat16(0.015625), None
            x, _ = jax.lax.scan(body, x, None, length=n)
            return x
        return f

    f_small, f_big = chain(n_small), chain(n_big)

    def run(f):
        sync_scalar(f(x0, b))           # warm (compile on first call)
        t0 = time.perf_counter()
        sync_scalar(f(x0, b))
        return time.perf_counter() - t0

    t_small = min(run(f_small) for _ in range(repeats))
    t_big = min(run(f_big) for _ in range(repeats))
    return max((t_big - t_small) / (n_big - n_small), 1e-9) * 1e3


def dispatch_rtt_ms(n: int = 12) -> float:
    """Median host->device->host round-trip of a trivial dispatch+readback,
    in milliseconds. The chain canary two-points this constant AWAY — by
    design — so a congested tunnel shows a healthy canary while any
    wall-clock-measured serving loop (one readback per round) slows by
    rounds x RTT. Recording both separates chip state from tunnel state:
    observed same-day serving runs at 2.28 vs 8.51 req/s on identical
    code with canary_ms 0.728 vs 0.721."""
    import jax

    x = jnp.zeros((8,), jnp.float32)
    f = jax.jit(lambda x: x + 1)
    sync_scalar(f(x))                      # warm/compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        sync_scalar(f(x))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] * 1e3


def canary_fields() -> dict:
    """{"canary_ms": ..., "rtt_ms": ...} for bench JSON lines, or {} on
    CPU (synthetic smokes would pay ~90 host matmuls for numbers that
    mean nothing off-chip). canary_ms = chip compute state (RTT-free);
    rtt_ms = tunnel dispatch state (dominates wall-clock serving loops).
    Cross-session comparisons need BOTH pinned."""
    import jax

    if jax.devices()[0].platform == "cpu":
        return {}
    return {"canary_ms": round(chip_canary_ms(), 3),
            "rtt_ms": round(dispatch_rtt_ms(), 1)}
