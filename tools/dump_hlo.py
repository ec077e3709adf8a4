"""Dump the TPU-optimized HLO of the bench chunk forward and print the
instructions whose names are given on the command line (with operands),
to map profiler op names back to model code.

Usage:
    python tools/dump_hlo.py copy.881 reshape.2497 fusion.419
    python tools/dump_hlo.py --save /tmp/chunk.hlo.txt
"""

import argparse
import pathlib
import re
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  str(pathlib.Path(__file__).resolve().parents[1]
                      / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="HLO instruction names")
    ap.add_argument("--save", default=None)
    ap.add_argument("--what", default="chunk", choices=["chunk", "volume"])
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--context", type=int, default=0,
                    help="lines of fusion body context to print")
    args = ap.parse_args()

    from __graft_entry__ import _flagship_conf
    from medical_image_segmentation_with_visual_prompts_tpu.models import (
        SwinUnetR, prefill_bias_cache)

    conf = _flagship_conf(attn_impl="auto", compute_dtype="bfloat16")
    model = SwinUnetR(conf)
    roi = (128, 128, 8)
    x0 = jnp.zeros((args.chunk, *roi, 1), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x0[:1], deterministic=True)
    variables = prefill_bias_cache(model, variables, roi, 1)  # as bench.py

    if args.what == "chunk":
        fn = jax.jit(lambda v, x: model.apply(
            v, x, deterministic=True)["downstream"])
        lowered = fn.lower(variables, x0)
    else:
        from medical_image_segmentation_with_visual_prompts_tpu.parallel \
            import make_sliding_window_fn, pad_starts, window_starts
        VOLUME = (320, 320, 24)
        slices, starts, grid_shape = window_starts(VOLUME, roi)
        run = make_sliding_window_fn(
            lambda b: model.apply(variables, b,
                                  deterministic=True)["downstream"],
            roi, args.chunk, conf.output_channels_downstream,
            mode="gaussian", grid_shape=grid_shape)
        vol = jnp.zeros(tuple(s.stop - s.start for s in slices) + (1,),
                        jnp.float32)
        starts, n_valid = pad_starts(starts, args.chunk)
        # ``run`` is already jitted by make_sliding_window_fn — lowering
        # it directly reuses bench.py's persistent-cache entry.
        lowered = run.lower(vol, jnp.asarray(starts), n_valid)

    compiled = lowered.compile()
    text = compiled.as_text()
    print(f"optimized HLO: {len(text.splitlines())} lines", file=sys.stderr)
    if args.save:
        pathlib.Path(args.save).write_text(text)
        print(f"saved to {args.save}", file=sys.stderr)
    lines = text.splitlines()
    for name in args.names:
        pat = re.compile(r"%?" + re.escape(name) + r"\b")
        for i, ln in enumerate(lines):
            if pat.search(ln) and ("=" in ln):
                print(ln.strip()[:400])
                if args.context and "fusion" in name:
                    # print the fusion computation body if present
                    m = re.search(r"calls=([%\w.\-]+)", ln)
                    if m:
                        body = m.group(1).lstrip("%")
                        inb = False
                        cnt = 0
                        for bl in lines:
                            if re.match(rf"\s*%?{re.escape(body)}\b", bl) \
                                    and "{" in bl:
                                inb = True
                            if inb:
                                print("   |", bl.strip()[:240])
                                cnt += 1
                                if "}" in bl.strip() or cnt > args.context:
                                    break
                print()


if __name__ == "__main__":
    main()
