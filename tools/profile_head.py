"""Trace the seg-head conv path (BN affine + conv_small) op-by-op."""

import glob
import gzip
import json
import os
import pathlib
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  str(pathlib.Path(__file__).resolve().parents[1]
                      / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from medical_image_segmentation_with_visual_prompts_tpu.ops.conv_small import (
    conv3d_small_cout)


def main():
    rng = np.random.default_rng(0)
    shape, cin, cout = (16, 128, 128, 8), 48, 2
    x = jnp.asarray(rng.normal(size=(*shape, cin)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)
                               ).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(cin,)).astype(np.float32))
    shift = jnp.asarray(rng.normal(size=(cin,)).astype(np.float32))

    def current(x_):
        y = x_ * scale + shift
        return conv3d_small_cout(y, k, b)

    fc = jax.jit(current)
    out = fc(x)
    jax.block_until_ready(out)
    reps = 5
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for _ in range(reps):
                out = fc(x)
            jax.block_until_ready(out)
        paths = sorted(glob.glob(os.path.join(td, "**", "*.trace.json.gz"),
                                 recursive=True), key=os.path.getmtime)
        with gzip.open(paths[-1], "rt") as f:
            tr = json.load(f)
    pid_names = {e["pid"]: e.get("args", {}).get("name", "")
                 for e in tr["traceEvents"]
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    device_pids = {p for p, n in pid_names.items() if "TPU" in n}
    agg = defaultdict(lambda: [0.0, 0])
    for e in tr["traceEvents"]:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            if "hlo_category" in e.get("args", {}):
                agg[e["name"]][0] += float(e.get("dur", 0.0))
                agg[e["name"]][1] += 1
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:20]
    for name, (dur, cnt) in rows:
        print(f"{dur / 1e3 / reps:8.3f} ms x{cnt:3d}  {name[:100]}")


if __name__ == "__main__":
    main()
