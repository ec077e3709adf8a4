"""depthlanes formulation vs Pallas halo kernel at decoder geometries."""

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

from medical_image_segmentation_with_visual_prompts_tpu.ops.conv_fold import (
    depth_fold_weights)
from medical_image_segmentation_with_visual_prompts_tpu.ops.conv_pallas import (
    conv3x3_fused)
from tools.tputime import device_ms


def dlanes(x, k, b, scale, shift, leaky):
    bsz, h, w, d, cin = x.shape
    cout = k.shape[-1]
    y = x * scale + shift
    if leaky:
        y = jnp.maximum(y, 0.01 * y)
    x2 = y.astype(jnp.bfloat16).reshape(bsz, h, w, d * cin)
    w2 = depth_fold_weights(k.astype(jnp.bfloat16), d)
    wall = w2.transpose(2, 0, 1, 3).reshape(d * cin, 9 * d * cout)
    z = jnp.einsum("bhwc,co->bhwo", x2, wall)
    zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jnp.zeros((bsz, h, w, d * cout), jnp.float32)
    idx = 0
    for ih in range(3):
        for iw in range(3):
            tap = zp[:, ih:ih + h, iw:iw + w,
                     idx * d * cout:(idx + 1) * d * cout]
            out = out + tap.astype(jnp.float32)
            idx += 1
    return out.reshape(bsz, h, w, d, cout) + b


def main():
    rng = np.random.default_rng(0)
    cases = [
        ("dec 144->48 @64x64x4", (16, 64, 64, 4), 144, 48, True),
        ("dec 288->96 @32x32x2", (16, 32, 32, 2), 288, 96, True),
        ("dec 576->192 @16x16x1", (16, 16, 16, 1), 576, 192, True),
        ("head 48->2 @128x128x4", (16, 128, 128, 4), 48, 2, False),
    ]
    for label, shape, cin, cout, leaky in cases:
        x = jnp.asarray(rng.normal(size=(*shape, cin)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)
                                   ).astype(np.float32) * 0.05)
        b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
        scale = jnp.asarray(rng.normal(size=(cin,)).astype(np.float32))
        shift = jnp.asarray(rng.normal(size=(cin,)).astype(np.float32))
        fd = jax.jit(lambda x_: dlanes(x_, k, b, scale, shift, leaky))
        fp = jax.jit(lambda x_: conv3x3_fused(x_, k, b, scale, shift,
                                              leaky=leaky))
        yd, yp = fd(x), fp(x)
        err = float(jnp.max(jnp.abs(yd - yp.astype(jnp.float32))))
        td = device_ms(fd, x)
        tp = device_ms(fp, x)
        print(f"{label}: dlanes {td:.3f} ms  pallas {tp:.3f} ms  "
              f"maxerr {err:.3f}")


if __name__ == "__main__":
    main()
