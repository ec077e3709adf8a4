"""Backward-kernel ablation at the canonical training geometries.

VERDICT r4 item 3: the forward kernel got a fast-softmax/matmuls-only
floor study (PERF.md round 3); the backward never did.  This times the
PRODUCTION fused-block gradient (fused_swin_block's custom_vjp → ONE
backward kernel, ops/fused_block_bwd.py) under the measurement-only
``MIVP_BWD_ABLATE`` arms:

* ``full``       — production backward;
* ``nofwd``      — skip the forward attention-output recompute (the
  first of the two per-head-block score passes);
* ``nosoftmax``  — skip the softmax recompute in every score pass;
* ``nosoftmax,nofwd`` — both;
* ``matmul``     — nobias,nomask,nosoftmax,nofwd: the matmuls-only
  floor (gradient chain's dot_generals + LN backward only).

Every arm computes wrong gradients by construction — the numbers are
time attribution, nothing else.  The forward kernel is identical in
all arms; per-arm deltas are pure backward-kernel deltas.

Run on TPU:  python tools/bench_bwd_ablate.py [--drop 0.1]
"""

import argparse
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from medical_image_segmentation_with_visual_prompts_tpu.utils.backend \
    import configure_backend

configure_backend()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

ARMS = [
    # (name, MIVP_BWD_ABLATE, MIVP_BWD_CACHE_P)
    ("full", "", "0"),
    ("cache-p", "", "1"),       # CORRECT gradients — the candidate opt-in
    ("nofwd", "nofwd", "0"),
    ("nosoftmax", "nosoftmax", "0"),
    ("nosoftmax+nofwd", "nosoftmax,nofwd", "0"),
    ("matmul-floor", "nobias,nomask,nosoftmax,nofwd", "0"),
]

# Canonical training geometries of the flagship config (batch 2):
# stage 0: 64x64x4 tokens / window 8x8x4 -> 128 windows of m=256, C=48;
# stage 1: 32x32x4 / same window with adaptive depth shift -> m=256
# at C=96 (unfused formulation).
GEOMS = [
    ("stage0 c=48", dict(bp=128, m=256, c=48, heads=4, i=64)),
    ("stage1 c=96", dict(bp=32, m=256, c=96, heads=8, i=64)),
]


def _build(bp, m, c, heads, i, drop):
    from medical_image_segmentation_with_visual_prompts_tpu.ops. \
        fused_block import _PARAM_KEYS, FOLD_NONE, fused_swin_block
    keys = jax.random.split(jax.random.PRNGKey(0), 16)
    r = lambda k, s: jax.random.normal(k, s, jnp.float32)
    x = r(keys[0], (2, bp // 2, m, c)).astype(jnp.bfloat16)
    tokens = r(keys[1], (i, c)).astype(jnp.bfloat16)
    params = {k: (0.2 * r(kk, (c, c))).astype(jnp.bfloat16)
              if k.startswith("w") else (0.1 * r(kk, (c,))).astype(
                  jnp.bfloat16)
              for k, kk in zip(_PARAM_KEYS, keys[2:13])}
    bias = r(keys[14], (1, 1, heads, m, m + i))
    seeds = jnp.asarray([3, 5], jnp.uint32)

    def loss(x_, params_, tokens_):
        out = fused_swin_block(
            x_, tokens_, params_, bias, None, c ** -0.5, heads,
            fold_mode=FOLD_NONE, dropout_seeds=seeds,
            attn_drop=drop, proj_drop=drop)
        return jnp.sum(out.astype(jnp.float32))

    fwd = jax.jit(loss)
    grad = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    return fwd, grad, (x, params, tokens)


def main():
    import os
    from tools.tputime import device_ms

    ap = argparse.ArgumentParser()
    ap.add_argument("--drop", type=float, default=0.1)
    args = ap.parse_args()

    for gname, geom in GEOMS:
        fwd, _, fargs = _build(drop=args.drop, **geom)
        fwd_ms = device_ms(fwd, *fargs)
        print(f"[{gname}] forward-only: {fwd_ms:.3f} ms")
        full_ms = None
        for aname, env, cache in ARMS:
            os.environ["MIVP_BWD_ABLATE"] = env
            os.environ["MIVP_BWD_CACHE_P"] = cache
            try:
                # Fresh build per arm: the env is read at trace time.
                _, grad, fargs = _build(drop=args.drop, **geom)
                ms = device_ms(grad, *fargs)
            finally:
                os.environ.pop("MIVP_BWD_ABLATE", None)
                os.environ.pop("MIVP_BWD_CACHE_P", None)
            bwd = ms - fwd_ms
            if full_ms is None:
                full_ms = bwd
            print(f"[{gname}] {aname:18s} fwd+bwd {ms:7.3f} ms  "
                  f"bwd {bwd:7.3f} ms  ({bwd / full_ms * 100:5.1f}% of "
                  f"full bwd)")


if __name__ == "__main__":
    main()
