"""Profile the headline sliding-window forward on the TPU chip.

Captures a ``jax.profiler`` trace of the bench chunk forward and
aggregates device op times from the Chrome-trace JSON (no TensorBoard in
this image — docs/PERF.md workflow).

Usage:
    python tools/profile_bench.py [--what chunk|volume] [--top 30]
"""

import argparse
import glob
import gzip
import json
import os
import pathlib
import sys
import time
from collections import defaultdict

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  str(pathlib.Path(__file__).resolve().parents[1]
                      / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def aggregate_trace(trace_dir, min_us=5.0):
    """Aggregate device-lane op durations from the newest trace.json.gz."""
    paths = sorted(glob.glob(os.path.join(
        str(trace_dir), "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not paths:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # Identify device PIDs (process names containing TPU/device core).
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e.get("args", {}).get("name", "")
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "/device" in n.lower()}
    agg = defaultdict(lambda: [0.0, 0])
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "")
        dur = float(e.get("dur", 0.0))
        agg[name][0] += dur
        agg[name][1] += 1
        total += dur
    return agg, total, paths[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="chunk", choices=["chunk", "volume"])
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--attn-impl", default="auto")
    ap.add_argument("--chunk", type=int, default=16)
    args = ap.parse_args()

    from __graft_entry__ import _flagship_conf
    from medical_image_segmentation_with_visual_prompts_tpu.models import (
        SwinUnetR, prefill_bias_cache)
    from medical_image_segmentation_with_visual_prompts_tpu.parallel import (
        gaussian_weight_acc, make_sliding_window_fn, pad_starts,
        window_starts)

    conf = _flagship_conf(attn_impl=args.attn_impl,
                          compute_dtype="bfloat16")
    model = SwinUnetR(conf)
    roi = (128, 128, 8)
    x0 = jnp.zeros((args.chunk, *roi, 1), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x0[:1], deterministic=True)
    variables = prefill_bias_cache(model, variables, roi, 1)  # as bench.py

    trace_dir = pathlib.Path("/tmp/mivp_trace") / args.what
    trace_dir.mkdir(parents=True, exist_ok=True)

    if args.what == "chunk":
        fwd = jax.jit(lambda v, x: model.apply(
            v, x, deterministic=True)["downstream"])
        x = jnp.asarray(np.random.default_rng(0).normal(
            0.3, 0.2, size=(args.chunk, *roi, 1)).astype(np.float32))
        out = fwd(variables, x)
        out.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(10):
            out = fwd(variables, x)
        out.block_until_ready()
        base_ms = (time.perf_counter() - t0) / 10 * 1e3
        print(f"chunk fwd: {base_ms:.2f} ms")
        with jax.profiler.trace(str(trace_dir)):
            for _ in range(args.repeats):
                out = fwd(variables, x)
            out.block_until_ready()
    else:
        import os
        VOLUME = tuple(int(v) for v in os.environ.get(
            "BENCH_VOLUME", "320,320,24").split(","))
        stride = float(os.environ.get("BENCH_STRIDE", "0.5"))
        rng = np.random.default_rng(0)
        vol_np = rng.normal(0.3, 0.2, size=(*VOLUME, 1)).astype(np.float32)
        slices, starts, grid_shape = window_starts(VOLUME, roi, stride)

        def apply_fn(batch):
            return model.apply(variables, batch,
                               deterministic=True)["downstream"]

        run = make_sliding_window_fn(
            apply_fn, roi, args.chunk, conf.output_channels_downstream,
            mode="gaussian", grid_shape=grid_shape, stride=stride)
        vol_np = vol_np[slices[0], slices[1], slices[2]]
        starts, n_valid = pad_starts(starts, args.chunk)
        volume = jax.device_put(jnp.asarray(vol_np))
        starts_d = jax.device_put(jnp.asarray(starts))
        wacc = jax.device_put(jnp.asarray(gaussian_weight_acc(
            starts, n_valid, roi, vol_np.shape[:3])))
        out = run(volume, starts_d, n_valid, wacc)
        out.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(5):
            out = run(volume, starts_d, n_valid, wacc)
        out.block_until_ready()
        base_ms = (time.perf_counter() - t0) / 5 * 1e3
        print(f"volume: {base_ms:.2f} ms -> {1e3 / base_ms:.3f} vol/s")
        with jax.profiler.trace(str(trace_dir)):
            for _ in range(args.repeats):
                out = run(volume, starts_d, n_valid, wacc)
            out.block_until_ready()

    agg, total, path = aggregate_trace(trace_dir)
    print(f"trace: {path}")
    print(f"device total: {total / 1e3 / args.repeats:.2f} ms/repeat")
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:args.top]
    for name, (dur, cnt) in rows:
        print(f"{dur / 1e3 / args.repeats:9.3f} ms  x{cnt:4d}  {name[:110]}")


if __name__ == "__main__":
    main()
