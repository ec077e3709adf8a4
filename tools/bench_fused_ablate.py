"""Ablate the fused Swin block kernel at the stage-0 bench geometry to
attribute its device time: full kernel vs no-softmax vs no-bias vs
matmuls-only.  Direct pallas_call variants of ops/fused_block.py's
kernel (measurement-only; the production kernel is unchanged).

Run on TPU:  python tools/bench_fused_ablate.py [--reps 50]
"""

import argparse
import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

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


def make_kernel(mode, scale, num_heads, group, n_tokens, head_block):
    def kernel(x_ref, tok_ref, ln1s_ref, ln1b_ref, wq_ref, wk_ref, wv_ref,
               wp_ref, bp_ref, ln2s_ref, ln2b_ref, wm_ref, bm_ref,
               bias_ref, colmask_ref, o_ref):
        g, h, i = group, num_heads, n_tokens
        m, c = x_ref.shape[1], x_ref.shape[2]
        x = x_ref[:].astype(jnp.float32)
        tok = tok_ref[:].astype(jnp.float32)
        tok_g = jnp.concatenate([tok[None]] * g, axis=0)
        kv = jnp.concatenate([x, tok_g], axis=1)
        if mode == "noln":
            y = kv
        else:
            mu = jnp.mean(kv, axis=-1, keepdims=True)
            var = jnp.mean(kv * kv, axis=-1, keepdims=True) - mu * mu
            y = (kv - mu) * jax.lax.rsqrt(var + 1e-6)
            y = y * ln1s_ref[0].astype(jnp.float32)[None, None, :] \
                + ln1b_ref[0].astype(jnp.float32)[None, None, :]
        y16 = y.astype(jnp.bfloat16)
        dot = lambda a, b: jax.lax.dot_general(
            a, b, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        q = (dot(y16[:, :m], wq_ref[:].astype(jnp.bfloat16))
             * jnp.float32(scale)).astype(jnp.bfloat16)
        k = dot(y16, wk_ref[:].astype(jnp.bfloat16)).astype(jnp.bfloat16)
        v = dot(y16, wv_ref[:].astype(jnp.bfloat16)).astype(jnp.bfloat16)
        colmask = colmask_ref[:].astype(jnp.bfloat16)
        colmask32 = colmask_ref[:].astype(jnp.float32)
        attn = None
        for h0 in range(0, num_heads, head_block):
            hb = min(head_block, num_heads - h0)
            qp = jnp.concatenate([q * colmask[hh][None, None, :]
                                  for hh in range(h0, h0 + hb)], axis=1)
            s = jax.lax.dot_general(
                qp, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            if mode not in ("nobias", "matmuls"):
                s = s + bias_ref[h0 * m:(h0 + hb) * m, :].astype(
                    jnp.float32)[None]
            if mode in ("nosoftmax", "matmuls"):
                probs = s
            elif mode == "fastsoftmax":
                # No max-subtraction: logits are bounded at inference
                # (see ops/fused_block.py::_softmax), saving the
                # reduce_max + broadcast-subtract VPU passes.
                e = jnp.exp(s)
                probs = e / jnp.sum(e, axis=-1, keepdims=True)
            else:
                probs = jax.nn.softmax(s, axis=-1)
            o_full = jax.lax.dot_general(
                probs.astype(jnp.bfloat16), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            for j in range(hb):
                part = o_full[:, j * m:(j + 1) * m, :] \
                    * colmask32[h0 + j][None, None, :]
                attn = part if attn is None else attn + part
        proj = dot(attn.astype(jnp.bfloat16), wp_ref[:].astype(jnp.bfloat16)) \
            + bp_ref[0].astype(jnp.float32)[None, None, :]
        x1 = x + proj
        if mode == "noln":
            l2 = x1
        else:
            mu = jnp.mean(x1, axis=-1, keepdims=True)
            var = jnp.mean(x1 * x1, axis=-1, keepdims=True) - mu * mu
            l2 = (x1 - mu) * jax.lax.rsqrt(var + 1e-6)
            l2 = l2 * ln2s_ref[0].astype(jnp.float32)[None, None, :] \
                + ln2b_ref[0].astype(jnp.float32)[None, None, :]
        mlp = dot(l2.astype(jnp.bfloat16), wm_ref[:].astype(jnp.bfloat16)) \
            + bm_ref[0].astype(jnp.float32)[None, None, :]
        o_ref[:] = (x1 + mlp).astype(o_ref.dtype)
    return kernel


def run_variant(mode, bp=1024, m=256, c=48, heads=4, tokens=64, g=2,
                reps=50, hb=None):
    n = m + tokens
    dh = c // heads
    rng = np.random.default_rng(0)
    f = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    x = f(bp, m, c).astype(jnp.bfloat16)
    args = [x, f(tokens, c).astype(jnp.bfloat16),
            f(1, c), f(1, c), f(c, c), f(c, c), f(c, c), f(c, c), f(1, c),
            f(1, c), f(1, c), f(c, c), f(1, c),
            f(heads * m, n)]
    colmask = np.zeros((heads, c), np.float32)
    for hh in range(heads):
        colmask[hh, hh * dh:(hh + 1) * dh] = 1.0
    args.append(jnp.asarray(colmask))
    kern = make_kernel(mode, dh ** -0.5, heads, g, tokens, hb or heads)
    x_spec = pl.BlockSpec((g, m, c), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    vec = lambda ln: pl.BlockSpec((1, ln), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        kern, grid=(bp // g,),
        in_specs=[x_spec,
                  pl.BlockSpec((tokens, c), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  vec(c), vec(c), mat, mat, mat, mat, vec(c), vec(c),
                  vec(c), mat, vec(c),
                  pl.BlockSpec((heads * m, n), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((heads, c), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((bp, m, c), jnp.bfloat16),
    )
    jfn = jax.jit(lambda *a: fn(*a))
    out = jfn(*args)
    out.block_until_ready()
    # Wall timing through the axon async dispatch is UNRELIABLE even
    # with block_until_ready (docs/PERF.md round-2 note; reproduced:
    # bit-identical kernels 0.087 vs 2.25 ms) — aggregate a trace.
    import pathlib as _pl
    import shutil as _sh
    sys.path.insert(0, str(_pl.Path(__file__).resolve().parent))
    from profile_bench import aggregate_trace
    td = _pl.Path(f"/tmp/mivp_ablate/{mode}")
    _sh.rmtree(td, ignore_errors=True)
    td.mkdir(parents=True)
    with jax.profiler.trace(str(td)):
        for _ in range(reps):
            out = jfn(*args)
        out.block_until_ready()
    agg, _, _ = aggregate_trace(td)
    kern_us = sum(dur for name, (dur, cnt) in agg.items()
                  if "custom-call" in name or "lambda" in name
                  or "pallas" in name)
    if kern_us == 0:  # fall back: largest op is the kernel
        kern_us = max(dur for name, (dur, cnt) in agg.items())
    return kern_us / reps / 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--group", type=int, default=2)
    ap.add_argument("--hb", type=int, default=0,
                    help="head_block (0 = all heads)")
    args = ap.parse_args()
    for mode in ("full", "nobias", "fastsoftmax", "nosoftmax", "matmuls",
                 "noln"):
        ms = run_variant(mode, g=args.group, reps=args.reps,
                         hb=args.hb or None)
        print(f"{mode:10s} {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()


def run_production(bp=1024, m=256, c=48, heads=4, tokens=64, reps=50):
    from medical_image_segmentation_with_visual_prompts_tpu.ops. \
        fused_block import fused_swin_block
    n = m + tokens
    rng = np.random.default_rng(0)
    f = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    params = {k: f(c, c) for k in ("wq", "wk", "wv", "wproj", "wmlp")}
    params.update({k: f(c) for k in ("ln1_scale", "ln1_bias", "bproj",
                                     "ln2_scale", "ln2_bias", "bmlp")})
    x = f(1, bp, m, c).astype(jnp.bfloat16)
    tok = f(tokens, c).astype(jnp.bfloat16)
    bias = f(1, 1, heads, m, n)
    dh = c // heads
    fn = jax.jit(lambda xx, tt, bb: fused_swin_block(
        xx, tt, params, bb, None, dh ** -0.5, heads))
    out = fn(x, tok, bias)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(x, tok, bias)
    out.block_until_ready()
    return (time.perf_counter() - t0) / reps * 1e3
