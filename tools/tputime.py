"""Trace-based device timing (wall-clock is unreliable through the axon
remote-dispatch tunnel: per-call host overhead swamps sub-10ms ops).

``device_ms(fn, *args)`` runs the jitted fn under ``jax.profiler.trace``
and returns the device duration of the program's top-level span.
"""

import glob
import gzip
import json
import os
import pathlib
import tempfile

import jax


def device_ms(fn, *args, reps: int = 5, name_hint: str = "jit") -> float:
    out = fn(*args)
    jax.block_until_ready(out)
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for _ in range(reps):
                out = fn(*args)
            jax.block_until_ready(out)
        paths = sorted(glob.glob(os.path.join(td, "**", "*.trace.json.gz"),
                                 recursive=True), key=os.path.getmtime)
        with gzip.open(paths[-1], "rt") as f:
            tr = json.load(f)
    pid_names = {e["pid"]: e.get("args", {}).get("name", "")
                 for e in tr["traceEvents"]
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    device_pids = {p for p, n in pid_names.items() if "TPU" in n}
    total = 0.0
    for e in tr["traceEvents"]:
        if (e.get("ph") == "X" and e.get("pid") in device_pids
                and e.get("name", "").startswith(name_hint)
                and "hlo_category" not in e.get("args", {})):
            total += float(e.get("dur", 0.0))
    return total / 1e3 / reps
