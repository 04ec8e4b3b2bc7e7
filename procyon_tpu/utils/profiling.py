"""Profiling / observability utilities.

The reference has no tracing hooks (SURVEY.md §5: per-step wall time prints
+ pynvml GPU memory only, trainIT.py:556,691-702). Here:
  * trace(): context manager around jax.profiler for TensorBoard traces
  * StepTimer: rolling per-step wall time + steps/sec
  * device_memory_stats(): TPU HBM usage (pynvml equivalent)
"""

import contextlib
import time
from collections import deque
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, window: int = 50):
        self.times = deque(maxlen=window)
        self._last: Optional[float] = None

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
        self._last = now

    @property
    def steps_per_sec(self) -> float:
        if not self.times:
            return 0.0
        return len(self.times) / sum(self.times)

    @property
    def mean_step_ms(self) -> float:
        if not self.times:
            return 0.0
        return 1000.0 * sum(self.times) / len(self.times)


def device_memory_stats() -> Dict[str, float]:
    """Per-device memory usage in GiB (pynvml logging equivalent,
    trainIT.py:171-172)."""
    out = {}
    for d in jax.local_devices():
        try:
            stats = d.memory_stats()
        except Exception:
            continue
        if not stats:
            continue
        out[f"{d.platform}:{d.id}/bytes_in_use_gib"] = \
            stats.get("bytes_in_use", 0) / 2 ** 30
        limit = stats.get("bytes_limit") or stats.get(
            "bytes_reservable_limit")
        if limit:
            out[f"{d.platform}:{d.id}/bytes_limit_gib"] = limit / 2 ** 30
    return out


def log_compile_time(fn, *args, name: str = "fn", logger=None):
    """Time the first (compiling) call of a jitted function."""
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    msg = f"{name}: first call (compile) {dt:.1f}s"
    (logger.info if logger else print)(msg)
    return out
