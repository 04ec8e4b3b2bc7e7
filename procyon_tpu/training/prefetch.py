"""Background host->device batch pipeline.

The reference hides collation + H2D latency behind torch DataLoader worker
processes and pinned-memory copies (procyon/training/trainIT.py's
DataLoader(num_workers, pin_memory=True) engine loop). The JAX-native
equivalent: a per-stream worker thread that pulls host batches (numpy
collation happens inside `stream()`), moves them to device (optionally
sharded via `to_device`), and keeps up to `depth` device-resident batches
queued — the next step's transfer and collation overlap the current step's
compute.

Exact-resume contract (DistributedSamplerResume semantics,
data/data_config.build_task_streams): the trainer checkpoints a state dict
whose entry for each task must describe the position AFTER the last batch
it actually consumed — not after the last batch the worker prefetched.
The worker therefore snapshots the stream's private state holder after
each pull and enqueues it WITH the batch; the consumer republishes the
snapshot into the trainer-visible holder on pop. The trainer-visible
holder has a single writer (the consuming thread), so checkpoint reads
are race-free.
"""

import queue
import threading
from typing import Callable, Dict, Optional


class StreamPrefetcher:
    """Wraps one task stream callable with a depth-bounded device queue."""

    def __init__(self, stream: Callable[[], Dict], *, to_device,
                 task: Optional[str] = None,
                 source_states: Optional[Dict[str, dict]] = None,
                 public_states: Optional[Dict[str, dict]] = None,
                 depth: int = 2):
        self._stream = stream
        self._to_device = to_device
        self._task = task
        self._src = source_states
        self._pub = public_states
        self._q = queue.Queue(maxsize=max(depth, 1))
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        while not self._stop.is_set():
            try:
                batch = self._stream()
                state = None
                if self._src is not None and self._task is not None:
                    state = self._src.get(self._task)
                item = (self._to_device(batch), state, None)
            except StopIteration:
                item = (None, None, StopIteration())
            except Exception as e:  # surface worker errors on the consumer
                item = (None, None, e)
            while not self._stop.is_set():
                try:
                    self._q.put(item, timeout=0.2)
                    break
                except queue.Full:
                    continue
            if item[2] is not None:
                return

    def __call__(self):
        batch, state, err = self._q.get()
        if err is not None:
            raise err
        if self._pub is not None and self._task is not None \
                and state is not None:
            self._pub[self._task] = state
        return batch

    def close(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=2.0)


def wrap_streams(streams: Dict[str, Callable], *, to_device,
                 source_states: Dict[str, dict], depth: int = 2):
    """Wrap every task stream with a StreamPrefetcher.

    Returns (wrapped_streams, public_states, close_fn). Pass
    `public_states` to the Trainer as `stream_states` (it reflects only
    consumed batches) and give the Trainer an identity `to_device` —
    batches arrive already on device.
    """
    public_states: Dict[str, dict] = dict(source_states)
    wrapped = {
        task: StreamPrefetcher(
            s, to_device=to_device, task=task,
            source_states=source_states, public_states=public_states,
            depth=depth)
        for task, s in streams.items()
    }

    def close():
        for p in wrapped.values():
            p.close()

    return wrapped, public_states, close
