"""Parse a jax.profiler trace (vm.trace.json.gz over the axon tunnel)
into a per-op device-time table. Shared by the profiling scripts —
the gzip+json+pid-filter recipe is CLAUDE.md's documented way to read
traces on this runtime (no tensorboard in the container)."""
import glob
import gzip
import json
import os


def device_op_table(trace_dir):
    """Return (total_ms, rows) where rows = [(ms, count, name, long_name)]
    sorted by descending device time, aggregated over every event on a
    TPU device track. Durations of nested events double-count (the
    while-loop umbrella contains its body ops) — compare ops, not the
    total, against wall time."""
    paths = glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        return 0.0, []
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"
                 and "args" in e}
    tpu_pids = {pid for pid, name in pid_names.items() if "TPU" in name}
    seen = {}
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in tpu_pids:
            nm = e.get("name", "?")
            if nm not in seen:
                seen[nm] = [0.0, 0, e.get("args", {}).get(
                    "long_name", "")]
            seen[nm][0] += e.get("dur", 0) / 1e3
            seen[nm][1] += 1
    total = sum(v[0] for v in seen.values())
    rows = sorted(((d, c, nm, ln) for nm, (d, c, ln) in seen.items()),
                  key=lambda r: -r[0])
    return total, rows


def print_op_table(trace_dir, top=24, long_name_chars=180, header=""):
    total, rows = device_op_table(trace_dir)
    if not rows:
        print("no trace found")
        return
    print(f"total ({header or 'nested'}): {total:.1f} ms")
    for d, c, nm, ln in rows[:top]:
        print(f"{d:9.2f} ms x{c:4d} {nm}")
        if ln:
            print(f"      {ln[:long_name_chars]}")
