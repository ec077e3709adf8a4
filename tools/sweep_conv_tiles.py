"""Sweep (tile height, tap group) for the Pallas halo conv kernel."""

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

from medical_image_segmentation_with_visual_prompts_tpu.ops import conv_pallas
from tools.tputime import device_ms


def main():
    rng = np.random.default_rng(0)
    cases = [
        ("head 48->2 @128x128x8", (16, 128, 128, 8), 48, 2, False,
         [(8, 9), (16, 9), (16, 3), (32, 9), (32, 3), (64, 3)]),
        ("dec 144->48 @64x64x4", (16, 64, 64, 4), 144, 48, True,
         [(8, 3), (16, 3), (16, 9), (32, 3), (32, 1)]),
    ]
    orig = conv_pallas._pick_tile
    for label, shape, cin, cout, leaky, combos in cases:
        x = jnp.asarray(rng.normal(size=(*shape, cin)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)
                                   ).astype(np.float32) * 0.05)
        b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
        scale = jnp.asarray(rng.normal(size=(cin,)).astype(np.float32))
        shift = jnp.asarray(rng.normal(size=(cin,)).astype(np.float32))
        for th, gt in combos:
            conv_pallas._pick_tile = lambda *a, **kw: (th, gt)
            fp = jax.jit(lambda x_: conv_pallas.conv3x3_fused(
                x_, k, b, scale, shift, leaky=leaky))
            try:
                y = fp(x)
                jax.block_until_ready(y)
                tp = device_ms(fp, x)
                print(f"{label} th={th} gt={gt}: {tp:.3f} ms")
            except Exception as e:
                print(f"{label} th={th} gt={gt}: FAIL "
                      f"{str(e).splitlines()[0][:90]}")
    conv_pallas._pick_tile = orig


if __name__ == "__main__":
    main()
