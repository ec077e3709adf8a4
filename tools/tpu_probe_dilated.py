"""On-device probe: can the fused-block x operand be DMA'd directly from
the natural feature-map layout via a dilated-window BlockSpec — and does
it beat the window_partition/window_reverse copies?

Variants at the stage-0-class geometry ([16, 64, 64, 4, 48], window
8x8x4, so the dilated view is [16, 8, 8, 8, 8, 4, 1, 48]):

  base   trace-level window_partition -> window-major kernel (g=8) ->
         window_reverse (today's structure, minus weights/bias)
  rank8  one BlockSpec block [1, wh, 1, ww, 1, wd, 1, c] per window,
         grid = flat window count, kernel collapses the dense tile
  rank7  same but with the size-1 p3 axis dropped from the view

Each kernel runs the same stand-in body (LN + [m, c] @ [c, c] matmul)
so interface costs dominate the comparison.  Timing via trace
aggregation (wall timing through the axon async dispatch is unreliable
-- docs/PERF.md round-2 note).  Also prints the optimized-HLO lines
around each custom-call so layout copies inserted by XLA are visible.
"""

import pathlib
import re
import shutil
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  str(pathlib.Path(__file__).resolve().parents[1]
                      / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

B, WH, P1, WW, P2, WD, P3, C = 16, 8, 8, 8, 8, 4, 1, 48
M = WH * WW * WD
P = P1 * P2 * P3


def _body(x, w):
    """Stand-in block body on an fp32 [rows, C] tile."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu
    y = (x - mu) * jax.lax.rsqrt(var + 1e-5)
    z = jax.lax.dot_general(y.astype(jnp.bfloat16), w,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return x + z


def _win_kernel(x_ref, w_ref, o_ref):
    g = x_ref.shape[0]
    x = x_ref[:].astype(jnp.float32).reshape(g * M, C)
    o_ref[:] = _body(x, w_ref[:]).reshape(g, M, C).astype(o_ref.dtype)


def base(x, w):
    from medical_image_segmentation_with_visual_prompts_tpu.ops.windows \
        import window_partition, window_reverse
    xw = window_partition(x, (WH, WW, WD)).reshape(B * P, M, C)
    g = 8
    out = pl.pallas_call(
        _win_kernel,
        grid=(B * P // g,),
        in_specs=[pl.BlockSpec((g, M, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((C, C), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((g, M, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * P, M, C), x.dtype),
    )(xw, w)
    return window_reverse(out.reshape(B, P, M, C), (WH, WW, WD),
                          (WH * P1, WW * P2, WD * P3))


def _r8_kernel(x_ref, w_ref, o_ref):
    x = x_ref[0, :, 0, :, 0, :, 0, :].reshape(M, C).astype(jnp.float32)
    o_ref[0, :, 0, :, 0, :, 0, :] = _body(x, w_ref[:]) \
        .reshape(WH, WW, WD, C).astype(o_ref.dtype)


def rank8(x, w):
    x8 = x.reshape(B, WH, P1, WW, P2, WD, P3, C)

    def idx(i):
        img, p = i // P, i % P
        w1, w2, w3 = p // (P2 * P3), (p // P3) % P2, p % P3
        return (img, 0, w1, 0, w2, 0, w3, 0)

    spec = pl.BlockSpec((1, WH, 1, WW, 1, WD, 1, C), idx,
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _r8_kernel,
        grid=(B * P,),
        in_specs=[spec, pl.BlockSpec((C, C), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(x8.shape, x.dtype),
    )(x8, w)
    return out.reshape(x.shape)


def _r7_kernel(x_ref, w_ref, o_ref):
    x = x_ref[0, :, 0, :, 0, :, :].reshape(M, C).astype(jnp.float32)
    o_ref[0, :, 0, :, 0, :, :] = _body(x, w_ref[:]) \
        .reshape(WH, WW, WD, C).astype(o_ref.dtype)


def rank7(x, w):
    assert P3 == 1
    x7 = x.reshape(B, WH, P1, WW, P2, WD, C)

    def idx(i):
        img, p = i // P, i % P
        w1, w2 = p // P2, p % P2
        return (img, 0, w1, 0, w2, 0, 0)

    spec = pl.BlockSpec((1, WH, 1, WW, 1, WD, C), idx,
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _r7_kernel,
        grid=(B * P,),
        in_specs=[spec, pl.BlockSpec((C, C), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(x7.shape, x.dtype),
    )(x7, w)
    return out.reshape(x.shape)


def main():
    from profile_bench import aggregate_trace
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, WH * P1, WW * P2, WD * P3, C)),
                    jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(C, C)) * 0.05, jnp.bfloat16)

    ref = None
    for name, fn in (("base", base), ("rank8", rank8), ("rank7", rank7)):
        try:
            jfn = jax.jit(fn)
            out = jfn(x, w)
            jax.block_until_ready(out)
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")
            continue
        if ref is None:
            ref = np.asarray(out, np.float32)
            err = 0.0
        else:
            err = float(np.max(np.abs(np.asarray(out, np.float32) - ref)))
        td = pathlib.Path(f"/tmp/mivp_probe/{name}")
        shutil.rmtree(td, ignore_errors=True)
        td.mkdir(parents=True)
        with jax.profiler.trace(str(td)):
            for _ in range(10):
                out = jfn(x, w)
            jax.block_until_ready(out)
        agg, total, _ = aggregate_trace(td)
        rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:6]
        print(f"{name}: device {total / 1e4:.3f} ms/iter  max_err={err:.2e}")
        for nm, (dur, cnt) in rows:
            print(f"    {dur / 1e4:8.4f} ms  x{cnt:4d}  {nm[:70]}")
        # HLO around the custom-call: show copies feeding/consuming it.
        txt = jax.jit(fn).lower(x, w).compile().as_text()
        lines = [ln.strip() for ln in txt.splitlines()]
        interesting = [ln for ln in lines
                       if re.search(r"custom-call|%copy|transpose", ln)
                       and "metadata" not in ln[:20]]
        for ln in interesting[:8]:
            print("    HLO:", ln[:180])
    print("done")


if __name__ == "__main__":
    main()
