"""Micro-benchmark: Pallas halo-tiled fused conv vs current in-model paths.

Geometries from docs/PERF.md round-2 trace:
* seg head 48->2 at [16,128,128,8] (BN affine + conv_small currently);
* decoder conv_concat 144->48 at [16,64,64,4] (BN + lrelu + tap-matmul);
* conv_concat 288->96 at [16,32,32,2] and 576->192 at [16,16,16,1].
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

from medical_image_segmentation_with_visual_prompts_tpu.ops.conv_fold import (
    conv3d_depth_folded, conv3d_tap_matmul)
from medical_image_segmentation_with_visual_prompts_tpu.ops.conv_pallas import (
    conv3x3_fused)
from medical_image_segmentation_with_visual_prompts_tpu.ops.conv_small import (
    conv3d_small_cout)
from tools.tputime import device_ms


def main():
    rng = np.random.default_rng(0)
    cases = [
        ("head 48->2 @128x128x8", (16, 128, 128, 8), 48, 2, False,
         "small"),
        ("dec 144->48 @64x64x4", (16, 64, 64, 4), 144, 48, True, "tapmm"),
        ("dec 288->96 @32x32x2", (16, 32, 32, 2), 288, 96, True, "tapmm"),
        ("dec 576->192 @16x16x1", (16, 16, 16, 1), 576, 192, True,
         "fold2d"),
    ]
    for label, shape, cin, cout, leaky, cur in cases:
        x = jnp.asarray(rng.normal(size=(*shape, cin)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)
                                   ).astype(np.float32) * 0.05)
        b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
        scale = jnp.asarray(rng.normal(size=(cin,)).astype(np.float32))
        shift = jnp.asarray(rng.normal(size=(cin,)).astype(np.float32))

        def current(x_):
            y = x_ * scale + shift            # folded-BN elementwise
            if leaky:
                y = jnp.where(y >= 0, y, 0.01 * y)
            if cur == "small":
                return conv3d_small_cout(y, k, b)
            fn = conv3d_tap_matmul if cur == "tapmm" else conv3d_depth_folded
            return fn(y.astype(jnp.bfloat16), k, b,
                      dtype=jnp.bfloat16).astype(jnp.float32)

        def pallas(x_):
            return conv3x3_fused(x_, k, b, scale, shift, leaky=leaky)

        fc, fp = jax.jit(current), jax.jit(pallas)
        yc, yp = fc(x), fp(x)
        err = float(jnp.max(jnp.abs(yc.astype(jnp.float32)
                                    - yp.astype(jnp.float32))))
        ref = float(jnp.max(jnp.abs(yc)))
        tc = device_ms(fc, x)
        tp = device_ms(fp, x)
        gflop = 2 * np.prod(shape) * 27 * cin * cout / 1e9
        print(f"{label}: current {tc:.3f} ms ({gflop/tc:.1f} TF/s)  "
              f"pallas {tp:.3f} ms ({gflop/tp:.1f} TF/s)  "
              f"maxerr {err:.3f} (scale {ref:.1f})")


if __name__ == "__main__":
    main()
