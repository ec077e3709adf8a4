"""Variants of the seg-head conv (48->2 @ [16,128,128,8]) vs the copy.

The traced current path (tools/profile_head.py): einsum fusion 0.94 ms,
a 0.70 ms layout copy, ~0.65 ms tap reduce.  Try formulations that keep
XLA from inserting the copy.
"""

import pathlib
import sys

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
from tools.tputime import device_ms

B, H, W, D, CIN, COUT = 16, 128, 128, 8, 48, 2


def v_current(x, k, b, scale, shift):
    y = x * scale + shift
    return conv3d_small_cout(y, k, b)


def v_padslice(x, k, b, scale, shift):
    """One zero-pad of z, 27 static slices (no per-tap pads)."""
    y = (x * scale + shift).astype(jnp.bfloat16)
    wall = k.transpose(3, 0, 1, 2, 4).reshape(CIN, 27 * COUT)
    z = jnp.einsum("bhwdc,co->bhwdo", y, wall.astype(jnp.bfloat16))
    zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    out = jnp.zeros((B, H, W, D, COUT), jnp.float32)
    idx = 0
    for ih in range(3):
        for iw in range(3):
            for idd in range(3):
                tap = zp[:, ih:ih + H, iw:iw + W, idd:idd + D,
                         idx * COUT:(idx + 1) * COUT]
                out = out + tap.astype(jnp.float32)
                idx += 1
    return out + b


def v_flat2d(x, k, b, scale, shift):
    """Flat-2D matmul, reshape back, pad+slice reduce."""
    y = (x * scale + shift).astype(jnp.bfloat16)
    wall = k.transpose(3, 0, 1, 2, 4).reshape(CIN, 27 * COUT)
    z = (y.reshape(-1, CIN) @ wall.astype(jnp.bfloat16)).reshape(
        B, H, W, D, 27 * COUT)
    zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    out = jnp.zeros((B, H, W, D, COUT), jnp.float32)
    idx = 0
    for ih in range(3):
        for iw in range(3):
            for idd in range(3):
                tap = zp[:, ih:ih + H, iw:iw + W, idd:idd + D,
                         idx * COUT:(idx + 1) * COUT]
                out = out + tap.astype(jnp.float32)
                idx += 1
    return out + b


def v_depthlanes(x, k, b, scale, shift):
    """9 (H,W)-tap einsums with depth folded into lanes (K=384, N=16),
    reduce over 9 row/col-shifted slices only."""
    y = (x * scale + shift).astype(jnp.bfloat16)
    x2 = y.reshape(B, H, W, D * CIN)
    from medical_image_segmentation_with_visual_prompts_tpu.ops.conv_fold \
        import depth_fold_weights
    w2 = depth_fold_weights(k.astype(jnp.bfloat16), D)  # [3,3,384,16]
    wall = w2.transpose(2, 0, 1, 3).reshape(D * CIN, 9 * D * COUT)
    z = jnp.einsum("bhwc,co->bhwo", x2, wall)
    zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jnp.zeros((B, H, W, D * COUT), jnp.float32)
    idx = 0
    for ih in range(3):
        for iw in range(3):
            tap = zp[:, ih:ih + H, iw:iw + W,
                     idx * D * COUT:(idx + 1) * D * COUT]
            out = out + tap.astype(jnp.float32)
            idx += 1
    return out.reshape(B, H, W, D, COUT) + b


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, D, CIN)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 3, CIN, COUT)
                               ).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.normal(size=(COUT,)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(CIN,)).astype(np.float32))
    shift = jnp.asarray(rng.normal(size=(CIN,)).astype(np.float32))
    fns = [("current", v_current), ("padslice", v_padslice),
           ("flat2d", v_flat2d), ("depthlanes", v_depthlanes)]
    want = None
    for name, fn in fns:
        f = jax.jit(lambda x_, fn=fn: fn(x_, k, b, scale, shift))
        y = np.asarray(f(x))
        if want is None:
            want = y
        err = np.abs(y - want).max()
        ms = device_ms(f, x)
        print(f"{name}: {ms:.3f} ms  maxerr {err:.3f}")


if __name__ == "__main__":
    main()
