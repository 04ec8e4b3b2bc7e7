"""training/prefetch.py: background H2D pipeline semantics.

The load-bearing contract is exact resume: the trainer-visible state must
describe the position after the last CONSUMED batch, never the last
prefetched one (otherwise a checkpoint taken mid-run silently skips the
in-flight batches on resume).
"""
import time

import numpy as np
import pytest

from procyon_tpu.training.prefetch import StreamPrefetcher, wrap_streams


def make_counter_stream(src_states, task="qa", fail_at=None):
    counter = {"i": 0}

    def stream():
        i = counter["i"]
        if fail_at is not None and i == fail_at:
            raise RuntimeError(f"boom at {i}")
        counter["i"] = i + 1
        src_states[task] = {"next": i + 1}
        return {"step": np.array([i])}

    return stream


class TestStreamPrefetcher:
    def test_order_preserved(self):
        src = {}
        p = StreamPrefetcher(make_counter_stream(src), to_device=lambda b: b,
                             task="qa", source_states=src,
                             public_states={}, depth=3)
        try:
            got = [int(p()["step"][0]) for _ in range(20)]
            assert got == list(range(20))
        finally:
            p.close()

    def test_public_state_lags_consumption(self):
        src, pub = {}, {}
        p = StreamPrefetcher(make_counter_stream(src), to_device=lambda b: b,
                             task="qa", source_states=src,
                             public_states=pub, depth=4)
        try:
            for _ in range(3):
                p()
            # let the worker run ahead
            deadline = time.time() + 2.0
            while src.get("qa", {}).get("next", 0) < 5 and \
                    time.time() < deadline:
                time.sleep(0.01)
            assert src["qa"]["next"] > 3, "worker should prefetch ahead"
            # trainer-visible state reflects only the 3 consumed batches
            assert pub["qa"] == {"next": 3}
        finally:
            p.close()

    def test_worker_error_surfaces(self):
        src = {}
        p = StreamPrefetcher(make_counter_stream(src, fail_at=2),
                             to_device=lambda b: b, task="qa",
                             source_states=src, public_states={}, depth=2)
        try:
            assert int(p()["step"][0]) == 0
            assert int(p()["step"][0]) == 1
            with pytest.raises(RuntimeError, match="boom at 2"):
                p()
        finally:
            p.close()

    def test_to_device_applied_in_worker(self):
        src = {}
        calls = []

        def to_device(b):
            calls.append(True)
            return {k: v + 100 for k, v in b.items()}

        p = StreamPrefetcher(make_counter_stream(src), to_device=to_device,
                             task="qa", source_states=src,
                             public_states={}, depth=2)
        try:
            assert int(p()["step"][0]) == 100
            assert calls
        finally:
            p.close()


class TestWrapStreams:
    def test_multi_task_isolation(self):
        src = {}
        streams = {"qa": make_counter_stream(src, task="qa"),
                   "retrieval": make_counter_stream(src, task="retrieval")}
        wrapped, pub, close = wrap_streams(
            streams, to_device=lambda b: b, source_states=src, depth=2)
        try:
            for _ in range(4):
                wrapped["qa"]()
            wrapped["retrieval"]()
            assert pub["qa"] == {"next": 4}
            assert pub["retrieval"] == {"next": 1}
        finally:
            close()
