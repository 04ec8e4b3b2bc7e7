"""Multi-host hooks (VERDICT r3 missing #4 / SURVEY §2.3 DCN row):
jax.distributed init + process-sharded streams, verified with two real
CPU processes (gloo collectives) — the repo-local analogue of the
reference's operational SLURM validation.
"""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["PROCYON_PLATFORM"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    sys.path.insert(0, "@REPO@")
    import jax
    jax.config.update("jax_platforms", "cpu")

    from procyon_tpu.parallel.multihost import initialize_multihost

    pid = int(sys.argv[1])
    port = sys.argv[2]
    idx, count = initialize_multihost(
        coordinator_address="127.0.0.1:" + port,
        num_processes=2, process_id=pid)
    assert (idx, count) == (pid, 2), (idx, count)

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    assert len(devs) == 4, devs          # 2 procs x 2 local cpu devices
    mesh = Mesh(devs, ("data",))
    x = jax.device_put(
        jnp.arange(8.0).reshape(8, 1),
        NamedSharding(mesh, P("data")))
    total = jax.jit(lambda x: x.sum(),
                    out_shardings=NamedSharding(mesh, P()))(x)
    assert float(total) == 28.0, float(total)

    # process-sharded data: rank-interleaved mixer batches are disjoint
    # across processes (DistributedSamplerResume semantics)
    from procyon_tpu.data import mixing

    class _DS:
        def __len__(self):
            return 32

    mixer = mixing.TaskMixer({"d": _DS()}, {"d": 4}, seed=0,
                             rank=idx, world_size=count)
    it = mixer.iterate(mixing.MixerState())
    seen = []
    for _ in range(4):
        key, idxs, st = next(it)
        seen.extend(int(i) for i in idxs)
    print("INDICES", pid, sorted(seen))
    print("OK", pid)
""")


@pytest.mark.skipif(os.environ.get("PROCYON_TEST_TPU") == "1",
                    reason="multihost CPU test irrelevant on the chip")
def test_two_process_cpu_multihost(tmp_path):
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])

    script = tmp_path / "worker.py"
    script.write_text(_WORKER.replace("@REPO@", REPO))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=REPO) for pid in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0 and f"OK {pid}" in out, out[-2000:]

    # rank shards are disjoint and cover distinct indices
    def indices(out, pid):
        for line in out.splitlines():
            if line.startswith(f"INDICES {pid} "):
                return eval(line.split(" ", 2)[2])
        raise AssertionError(out[-2000:])

    i0 = set(indices(outs[0], 0))
    i1 = set(indices(outs[1], 1))
    assert i0 and i1 and not (i0 & i1), (sorted(i0), sorted(i1))


def test_initialize_noop_single_process():
    """num_processes <= 1 must not touch jax.distributed (the default
    single-host path)."""
    from procyon_tpu.parallel.multihost import initialize_multihost

    idx, count = initialize_multihost(num_processes=1)
    assert idx == 0 and count == 1
