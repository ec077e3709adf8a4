"""Device probe: window partition/reverse lowering variants.

Round-3 traced ~7.5 ms/volume of window-partition/reverse + layout
copies running at 130-680 GB/s (docs/PERF.md roofline) — far off HBM
SOL.  The partition is an 8-D reshape/transpose with inner contiguous
unit = C (48 elements, 96 B in bf16).  At every HOT stage the depth
axis is fully windowed (wd == D, p3 == 1), so (wd, p3, C) is one
contiguous 192-element unit and the same relayout can be expressed as
a 6-D transpose with a 4x larger inner unit — XLA's transpose emitter
tiles that far better.

This probe measures, at the flagship serving stage-0 geometry
(chunk=16 ROIs, token map 64x64x4, C=48, window (8,8,4), bf16):

  part8 / rev8   — the current 8-D factoring (ops/windows.py)
  part6 / rev6   — the depth-merged 6-D factoring (same semantics)
  roundtrip      — partition followed by reverse, both variants

Times are trace-aggregated device µs (wall timing through the async
axon dispatch is unreliable — PERF.md round-2 note).

Usage: python tools/probe_partition.py [--reps 50]
"""

import argparse
import pathlib
import shutil
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from medical_image_segmentation_with_visual_prompts_tpu.utils.backend \
    import configure_backend

configure_backend()

import jax
import jax.numpy as jnp
import numpy as np

from profile_bench import aggregate_trace

B, H, W, D, C = 16, 64, 64, 4, 48
WIN = (8, 8, 4)


def part8(x):
    # The pre-round-4 8-D factoring, inlined: ops/windows.py now picks
    # the 6-D form itself whenever p3 == 1, so the old lowering must be
    # reproduced here to keep the A/B honest.
    b, h, w, d, c = x.shape
    wh, ww, wd = WIN
    p1, p2, p3 = h // wh, w // ww, d // wd
    x = x.reshape(b, wh, p1, ww, p2, wd, p3, c)
    x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)
    return x.reshape(b, p1 * p2 * p3, wh * ww * wd, c)


def rev8(xw):
    b = xw.shape[0]
    wh, ww, wd = WIN
    p1, p2, p3 = H // wh, W // ww, D // wd
    x = xw.reshape(b, p1, p2, p3, wh, ww, wd, C)
    x = x.transpose(0, 4, 1, 5, 2, 6, 3, 7)
    return x.reshape(b, H, W, D, C)


def part6(x):
    b, h, w, d, c = x.shape
    wh, ww, wd = WIN
    p1, p2 = h // wh, w // ww
    assert wd == d
    x = x.reshape(b, wh, p1, ww, p2, wd * c)
    x = x.transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(b, p1 * p2, wh * ww * wd, c)


def rev6(xw):
    b = xw.shape[0]
    wh, ww, wd = WIN
    p1, p2 = H // wh, W // ww
    x = xw.reshape(b, p1, p2, wh, ww, wd * C)
    x = x.transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(b, H, W, D, C)


def _pl():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    return pl, pltpu


def part_pl(x):
    """Pallas relayout, rank-7: lanes stay C end to end (a wd*c -> c
    lane split is an unsupported Mosaic shape cast — probed 2026-08-21);
    the kernel is one leading-dim transpose, the m-merge happens as a
    free trace-level reshape outside."""
    pl, pltpu = _pl()
    b, hh, ww_, d, c = x.shape
    wh, ww, wd = WIN
    p1, p2 = hh // wh, ww_ // ww
    x7 = x.reshape(b, wh, p1, ww, p2, wd, c)

    def kern(x_ref, o_ref):
        t = x_ref[0, :, 0]                       # [wh, ww, p2, wd, c]
        o_ref[0] = t.transpose(2, 0, 1, 3, 4)    # [p2, wh, ww, wd, c]

    out = pl.pallas_call(
        kern, grid=(b, p1),
        in_specs=[pl.BlockSpec((1, wh, 1, ww, p2, wd, c),
                               lambda ib, ip: (ib, 0, ip, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, p2, wh, ww, wd, c),
                               lambda ib, ip: (ib, ip, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, p1 * p2, wh, ww, wd, c),
                                       x.dtype),
        interpret=jax.default_backend() == "cpu",
    )(x7)
    return out.reshape(b, p1 * p2, wh * ww * wd, c)


def part_dma(x):
    """Pure-DMA variant: the permutation is entirely BlockSpec index
    arithmetic (identity kernel body), one window per grid step."""
    pl, pltpu = _pl()
    b, hh, ww_, d, c = x.shape
    wh, ww, wd = WIN
    p1, p2 = hh // wh, ww_ // ww
    x7 = x.reshape(b, wh, p1, ww, p2, wd, c)

    def kern(x_ref, o_ref):
        o_ref[0, 0] = x_ref[0, :, 0, :, 0]

    out = pl.pallas_call(
        kern, grid=(b, p1 * p2),
        in_specs=[pl.BlockSpec(
            (1, wh, 1, ww, 1, wd, c),
            lambda ib, ip: (ib, 0, ip // p2, 0, ip % p2, 0, 0),
            memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, wh, ww, wd, c),
                               lambda ib, ip: (ib, ip, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, p1 * p2, wh, ww, wd, c),
                                       x.dtype),
        interpret=jax.default_backend() == "cpu",
    )(x7)
    return out.reshape(b, p1 * p2, wh * ww * wd, c)


def rev_pl(xw):
    """Inverse rank-7 Pallas relayout: window-major read -> natural."""
    pl, pltpu = _pl()
    b = xw.shape[0]
    wh, ww, wd = WIN
    p1, p2 = H // wh, W // ww
    x7 = xw.reshape(b, p1 * p2, wh, ww, wd, C)

    def kern(x_ref, o_ref):
        t = x_ref[0]                             # [p2, wh, ww, wd, c]
        o_ref[0, :, 0] = t.transpose(1, 2, 0, 3, 4)

    out = pl.pallas_call(
        kern, grid=(b, p1),
        in_specs=[pl.BlockSpec((1, p2, wh, ww, wd, C),
                               lambda ib, ip: (ib, ip, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, wh, 1, ww, p2, wd, C),
                               lambda ib, ip: (ib, 0, ip, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, wh, p1, ww, p2, wd, C),
                                       xw.dtype),
        interpret=jax.default_backend() == "cpu",
    )(x7)
    return out.reshape(b, H, W, D, C)


def rev_dma(xw):
    """Pure-DMA inverse (identity body, index-map permutation)."""
    pl, pltpu = _pl()
    b = xw.shape[0]
    wh, ww, wd = WIN
    p1, p2 = H // wh, W // ww
    x7 = xw.reshape(b, p1 * p2, wh, ww, wd, C)

    def kern(x_ref, o_ref):
        o_ref[0, :, 0, :, 0] = x_ref[0, 0]

    out = pl.pallas_call(
        kern, grid=(b, p1 * p2),
        in_specs=[pl.BlockSpec((1, 1, wh, ww, wd, C),
                               lambda ib, ip: (ib, ip, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (1, wh, 1, ww, 1, wd, C),
            lambda ib, ip: (ib, 0, ip // p2, 0, ip % p2, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, wh, p1, ww, p2, wd, C),
                                       xw.dtype),
        interpret=jax.default_backend() == "cpu",
    )(x7)
    return out.reshape(b, H, W, D, C)


def timed(name, fn, *args, reps):
    jfn = jax.jit(fn)
    out = jfn(*args)
    out.block_until_ready()
    td = pathlib.Path(f"/tmp/mivp_part/{name}")
    shutil.rmtree(td, ignore_errors=True)
    td.mkdir(parents=True)
    with jax.profiler.trace(str(td)):
        for _ in range(reps):
            out = jfn(*args)
        out.block_until_ready()
    agg, _, _ = aggregate_trace(td)
    us = sum(dur for nm, (dur, cnt) in agg.items())
    return us / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=50)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, D, C)), jnp.bfloat16)
    xw = jnp.asarray(
        rng.normal(size=(B, (H // 8) * (W // 8), 256, C)), jnp.bfloat16)

    # Parity first (exactness of the 6-D factoring).
    np.testing.assert_array_equal(np.asarray(part6(x)), np.asarray(part8(x)))
    np.testing.assert_array_equal(np.asarray(rev6(xw)), np.asarray(rev8(xw)))
    for fn in (part_pl, part_dma):
        np.testing.assert_array_equal(np.asarray(fn(x)),
                                      np.asarray(part8(x)))
    for fn in (rev_pl, rev_dma):
        np.testing.assert_array_equal(np.asarray(fn(xw)),
                                      np.asarray(rev8(xw)))
    print("parity OK (6-D factoring + Pallas relayouts exact)")

    nbytes = x.size * x.dtype.itemsize
    for name, fn, a in [("part8", part8, x), ("part6", part6, x),
                        ("partpl", part_pl, x), ("partdma", part_dma, x),
                        ("rev8", rev8, xw), ("rev6", rev6, xw),
                        ("revpl", rev_pl, xw), ("revdma", rev_dma, xw),
                        ("round8", lambda t: rev8(part8(t)), x),
                        ("roundpl", lambda t: rev_pl(part_pl(t)), x)]:
        us = timed(name, fn, a, reps=args.reps)
        mult = 2 if name.startswith(("part", "rev")) else 4
        gbs = nbytes * mult / (us * 1e3) if us else float("nan")
        print(f"{name:7s} {us:8.1f} us  ({gbs:6.1f} GB/s eff)", flush=True)


if __name__ == "__main__":
    main()
