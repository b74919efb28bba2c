"""Profile a jitted function on TPU and print the top device ops.

Usage (as a library):
    from scripts.trace_summary import profile_top_ops
    profile_top_ops(lambda: fn(*args), n=3)
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import tempfile


def _load_events(trace_dir: str):
    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    events = []
    for p in paths:
        with gzip.open(p, "rt") as f:
            data = json.load(f)
        events.extend(data.get("traceEvents", []))
    return events


def profile_top_ops(run, n: int = 3, top: int = 25):
    """Trace `run()` n times and print device-op durations aggregated by
    op name (TPU lanes only)."""
    import jax

    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for _ in range(n):
                out = run()
            jax.block_until_ready(out)
        events = _load_events(td)

    # device ops live on TPU device tracks; python/host tracks carry
    # file:line names — keep complete events with durations
    agg: dict[str, float] = {}
    pids_device = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if "TPU" in name or "/device:" in name.lower():
                pids_device.add(e.get("pid"))
    for e in events:
        if e.get("ph") != "X":
            continue
        if pids_device and e.get("pid") not in pids_device:
            continue
        name = e.get("name", "?")
        agg[name] = agg.get(name, 0.0) + e.get("dur", 0) / 1000.0
    total = sum(agg.values())
    print(f"total device time: {total / n:.2f} ms/run over {n} runs")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {ms / n:9.3f} ms  {name[:90]}")


if __name__ == "__main__":
    print("import and call profile_top_ops(run)")
