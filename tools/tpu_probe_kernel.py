"""Fast on-device probe of the newest kernel paths (minutes, not the
full-model tunnel compile).

Runs ONE ConsecutiveSwinBlocks pair at the flagship stage-0 geometry —
64x64x4 feature map, C=48, window 8x8x4 (shift (4,4,0) with a DYNAMIC
borrow in the fused in-kernel window shift), 64 prompt tokens, bf16 —
once with the full kernel tier (`attn_impl auto`: pair kernel +
in-kernel shift + in-kernel label masks) and once with plain XLA, and
compares on the real TPU.  This is the exact path that produced the
round-2 `tpu.dynamic_rotate` Mosaic backend failure
(vector<4x256x48xbf16>), which client-side lowering cannot see.

Optionally (--fold) adds a second probe at a pad-folded geometry
(16x16x1 map, C=192, depth < window ⇒ FOLD columns).

Exit 0 on PASS.  Usage: python tools/tpu_probe_kernel.py [--fold]
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from medical_image_segmentation_with_visual_prompts_tpu.utils.backend \
    import configure_backend

configure_backend()

import jax
import jax.numpy as jnp
import numpy as np


def _probe(name, c, heads, shape_x, tol):
    from medical_image_segmentation_with_visual_prompts_tpu.models import (
        ConsecutiveSwinBlocks)

    kw = dict(hidden_channels=c, num_heads=heads, pos_bias_embed_dim=256,
              max_prompts=1, tokens_per_prompt=64, use_token_params=True,
              window_size=(8, 8, 4), down=False, use_checkpoint=False,
              attn_drop=0.0, proj_drop=0.0, pad_mode="aligned")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 0.5, (2, *shape_x, c)), jnp.bfloat16)
    ps = tuple(jnp.asarray(rng.normal(0, 0.02, (1, 64, c)), jnp.bfloat16)
               for _ in range(2))
    blk = ConsecutiveSwinBlocks(attn_impl="auto", **kw)
    params = blk.init(jax.random.PRNGKey(0), x, ps)

    def run(impl):
        b = ConsecutiveSwinBlocks(attn_impl=impl, **kw)
        t0 = time.time()
        out = jax.jit(lambda v, xx: b.apply(v, xx, ps))(params, x)
        out = np.asarray(out.astype(jnp.float32))
        print(f"  {name}/{impl}: compiled+ran in {time.time() - t0:.1f}s")
        return out

    got = run("auto")
    want = run("xla")
    err = float(np.max(np.abs(got - want)))
    denom = float(np.max(np.abs(want))) or 1.0
    ok = err / denom < tol
    print(f"  {name}: max_abs_err={err:.4f} rel={err / denom:.4f} "
          f"({'PASS' if ok else 'FAIL'})")
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fold", action="store_true",
                    help="also probe a pad-folded (depth<window) stage")
    ap.add_argument("--tol", type=float, default=0.05)
    args = ap.parse_args()
    print(f"backend: {jax.devices()[0].platform}")
    ok = _probe("stage0-shift-pair", 48, 3, (64, 64, 4), args.tol)
    if args.fold:
        ok &= _probe("folded-stage2", 192, 12, (16, 16, 1), args.tol)
    print(f"tpu_probe_kernel: {'PASS' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
