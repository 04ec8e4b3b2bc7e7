"""Optional multi-process (multi-host / multi-slice) initialization.

SURVEY.md §2.3 comm-backend row: the reference scales out with torchrun
c10d rendezvous + NCCL process groups (scripts/run_pretrain.py:117,
examples/training/procyon_pretrain_full.sh:55-62). The TPU-native
equivalent is `jax.distributed.initialize` — after it, `jax.devices()`
is the GLOBAL device list, one `Mesh` spans all hosts, and GSPMD routes
collectives over ICI within a slice and DCN across slices with no
process-group code.

Single-process runs (the default, and the whole v5e-8 single-host north
star) skip initialization entirely: `initialize_multihost` is a no-op
unless num_processes > 1.

Division of labor under multi-process:
  * data: each process feeds its LOCAL batch shard —
    `data_config.build_task_streams(rank=process_index,
    world_size=process_count)` rank-interleaves every dataset
    (mixing.TaskMixer), the same contract as DistributedSamplerResume
    (reference samplers.py:107-136);
  * step fn: unchanged — jit over the global mesh; XLA inserts DCN
    collectives where shardings demand them;
  * logging/checkpoint writes: gate host-side side effects on
    `jax.process_index() == 0` (orbax is multihost-aware for the array
    shards themselves).

Verified by tests/test_multihost.py with two CPU processes (gloo
collectives), the analogue of the reference's operational SLURM
validation the repo-local suite can actually run.
"""

import os
from typing import Optional, Tuple


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None
                         ) -> Tuple[int, int]:
    """Initialize jax.distributed when a multi-process run is requested;
    no-op otherwise. MUST run before the first device query
    (jax.devices() fixes the backend).

    Falls back to standard env vars when args are omitted:
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID (also
    honored by jax.distributed itself on TPU pods, where all three are
    auto-detected from the TPU metadata and can be left unset).

    Returns (process_index, process_count).
    """
    import jax

    num_processes = num_processes if num_processes is not None else int(
        os.environ.get("JAX_NUM_PROCESSES", "1") or 1)
    if num_processes and num_processes > 1:
        kw = {}
        if coordinator_address is None:
            coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
        if process_id is None:
            env_pid = os.environ.get("JAX_PROCESS_ID")
            process_id = int(env_pid) if env_pid is not None else None
        if coordinator_address is not None:
            kw["coordinator_address"] = coordinator_address
        if process_id is not None:
            kw["process_id"] = process_id
        jax.distributed.initialize(num_processes=num_processes, **kw)
    return jax.process_index(), jax.process_count()
