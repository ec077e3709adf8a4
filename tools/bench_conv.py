"""Micro-benchmark: 3D conv vs depth-folded 2D conv on the TPU.

The decoder conv_concat (144->48 at [16,64,64,4]) runs at ~16% MXU as a
direct 3D conv (2 output-channel tiles wasted).  Folding the small depth
axis into channels turns it into a 3x3 2D conv with D*Cin -> D*Cout
channels and band-structured weights.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  str(pathlib.Path(__file__).resolve().parents[1]
                      / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def direct3d(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"))


def depth_folded(x, k):
    b, h, w, d, cin = x.shape
    cout = k.shape[-1]
    blocks = []
    for od in range(d):
        col = []
        for idd in range(d):
            t = idd - od + 1
            if 0 <= t < 3:
                col.append(k[:, :, t])
            else:
                col.append(jnp.zeros((3, 3, cin, cout), k.dtype))
        blocks.append(jnp.concatenate(col, axis=2))   # [3,3,D*Cin,Cout]
    w2 = jnp.concatenate(blocks, axis=3)              # [3,3,D*Cin,D*Cout]
    x2 = x.reshape(b, h, w, d * cin)
    y2 = jax.lax.conv_general_dilated(
        x2, w2, (1, 1), [(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y2.reshape(b, h, w, d, cout)


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    rng = np.random.default_rng(0)
    for (shape, cin, cout) in [((16, 64, 64, 4), 144, 48),
                               ((16, 32, 32, 2), 288, 96),
                               ((16, 16, 16, 1), 576, 192)]:
        x = jnp.asarray(rng.normal(size=(*shape, cin)).astype(np.float32),
                        jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)
                                   ).astype(np.float32) * 0.05, jnp.bfloat16)
        f3 = jax.jit(direct3d)
        ff = jax.jit(depth_folded)
        y3 = f3(x, k)
        yf = ff(x, k)
        err = float(jnp.max(jnp.abs(y3.astype(jnp.float32)
                                    - yf.astype(jnp.float32))))
        t3 = timeit(f3, x, k)
        tf_ = timeit(ff, x, k)
        gflop = 2 * np.prod(shape) * 27 * cin * cout / 1e9
        print(f"{shape} {cin}->{cout}: direct {t3:.3f} ms "
              f"({gflop / t3:.0f} GF/s) folded {tf_:.3f} ms "
              f"({gflop / tf_:.0f} GF/s)  maxerr {err:.4f}")



def main_all():
    from tools.tputime import device_ms
    rng = np.random.default_rng(0)
    for (shape, cin, cout) in [((16, 64, 64, 4), 144, 48),
                               ((16, 32, 32, 2), 288, 96),
                               ((16, 16, 16, 1), 576, 192)]:
        x = jnp.asarray(rng.normal(size=(*shape, cin)).astype(np.float32),
                        jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)
                                   ).astype(np.float32) * 0.05, jnp.bfloat16)
        gflop = 2 * np.prod(shape) * 27 * cin * cout / 1e9
        for label, fn in (("direct", direct3d), ("folded", depth_folded)):
            ms = device_ms(jax.jit(fn), x, k)
            print(f"{shape} {cin}->{cout} {label}: {ms:.3f} ms "
                  f"({gflop / ms:.1f} TF/s)")


if __name__ == "__main__":
    main_all()
