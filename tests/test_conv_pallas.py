"""Pallas halo-tiled tap-matmul conv: parity vs the direct 3D conv."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_segmentation_with_visual_prompts_tpu.ops.conv_pallas import (
    conv3x3_fused)


def _direct(x, k, b, scale=None, shift=None, leaky=False):
    xf = x.astype(jnp.float32)
    if scale is not None:
        xf = xf * scale + shift
    if leaky:
        xf = jnp.where(xf >= 0, xf, 0.01 * xf)
    y = jax.lax.conv_general_dilated(
        xf, k.astype(jnp.float32), (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"))
    return y + b


@pytest.mark.parametrize("shape,cin,cout", [
    ((2, 16, 16, 4, 6), 6, 5),       # decoder-like
    ((1, 16, 8, 8, 4), 4, 2),        # head-like (D=8)
    ((1, 8, 8, 1, 12), 12, 7),       # D=1
])
def test_conv3x3_fused_matches_direct(shape, cin, cout):
    rng = np.random.default_rng(hash(shape) % 1000)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)
                               ).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
    want = np.asarray(_direct(x, k, b))
    got = np.asarray(conv3x3_fused(x, k, b, interpret=True))
    tol = 3e-2 * max(1.0, np.abs(want).max())
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=tol)


def test_conv3x3_fused_affine_leaky():
    rng = np.random.default_rng(5)
    shape, cin, cout = (1, 8, 8, 2, 6), 6, 4
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)
                               ).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(cin,)).astype(np.float32))
    shift = jnp.asarray(rng.normal(size=(cin,)).astype(np.float32))
    want = np.asarray(_direct(x, k, b, scale, shift, leaky=True))
    got = np.asarray(conv3x3_fused(x, k, b, scale, shift, leaky=True,
                                   interpret=True))
    tol = 3e-2 * max(1.0, np.abs(want).max())
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=tol)


def test_conv3x3_fused_gradients():
    rng = np.random.default_rng(7)
    shape, cin, cout = (1, 8, 8, 2, 4), 4, 3
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)
                               ).astype(np.float32) * 0.2)
    b = jnp.zeros((cout,))

    def loss(x_, k_):
        return jnp.sum(conv3x3_fused(x_, k_, b, interpret=True) ** 2)

    def loss_ref(x_, k_):
        return jnp.sum(_direct(x_, k_, b) ** 2)

    gx, gk = jax.grad(loss, argnums=(0, 1))(x, k)
    rx, rk = jax.grad(loss_ref, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=5e-2, atol=5e-2 * np.abs(rx).max())
    np.testing.assert_allclose(np.asarray(gk), np.asarray(rk),
                               rtol=5e-2, atol=5e-2 * np.abs(rk).max())


def test_seghead_fused_path_matches_module(monkeypatch):
    """_SegHead's TPU inference path (BN folded into the depth-lanes
    tap einsum) matches the flax BatchNorm + conv module path."""
    from medical_image_segmentation_with_visual_prompts_tpu.models.swin_unetr \
        import _SegHead
    from medical_image_segmentation_with_visual_prompts_tpu.ops import \
        window_attention_pallas as wap
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 6)).astype(np.float32))
    m = _SegHead(2)  # D=8: the depth-lanes fused head path
    v = m.init(jax.random.PRNGKey(0), x)
    # Non-trivial BN statistics and affine so the fold is exercised.
    v = jax.tree_util.tree_map(lambda t: t, v)
    v["batch_stats"]["norm"]["mean"] = jnp.asarray(
        rng.normal(size=(6,)).astype(np.float32))
    v["batch_stats"]["norm"]["var"] = jnp.asarray(
        rng.uniform(0.5, 2.0, size=(6,)).astype(np.float32))
    v["params"]["norm"]["scale"] = jnp.asarray(
        rng.normal(1.0, 0.2, size=(6,)).astype(np.float32))
    v["params"]["norm"]["bias"] = jnp.asarray(
        rng.normal(size=(6,)).astype(np.float32))
    want = np.asarray(m.apply(v, x, deterministic=True))
    monkeypatch.setattr(wap, "_FORCE_INTERPRET", True)
    got = np.asarray(m.apply(v, x, deterministic=True))
    tol = 3e-2 * max(1.0, np.abs(want).max())
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=tol)


def test_swin_up_block_fused_path_matches_module(monkeypatch):
    """SwinUpBlock's TPU inference path (BN+LeakyReLU folded into the
    Pallas conv prologue) matches the unfused norm/act/conv path."""
    from medical_image_segmentation_with_visual_prompts_tpu.models.unet_blocks \
        import SwinUpBlock
    from medical_image_segmentation_with_visual_prompts_tpu.ops import \
        window_attention_pallas as wap
    rng = np.random.default_rng(13)
    m = SwinUpBlock(in_channels=12, out_channels=6, strides=(2, 2, 2),
                    kernel_size=(3, 3, 3), pos_bias_embed_dim=8,
                    num_heads=2, window_size=(4, 4, 2), max_prompts=0,
                    tokens_per_prompt=0, use_token_params=False)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 2, 12)).astype(np.float32))
    c = jnp.asarray(rng.normal(size=(1, 8, 8, 4, 6)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, c)
    v["batch_stats"]["norm_concat"]["mean"] = jnp.asarray(
        rng.normal(size=(18,)).astype(np.float32) * 0.3)
    v["batch_stats"]["norm_concat"]["var"] = jnp.asarray(
        rng.uniform(0.5, 2.0, size=(18,)).astype(np.float32))
    want = np.asarray(m.apply(v, x, c, deterministic=True))
    monkeypatch.setattr(wap, "_FORCE_INTERPRET", True)
    got = np.asarray(m.apply(v, x, c, deterministic=True))
    tol = 4e-2 * max(1.0, np.abs(want).max())
    np.testing.assert_allclose(got, want, rtol=4e-2, atol=tol)


def test_pair_matches_concat(monkeypatch):
    """conv3x3_fused_pair == conv3x3_fused(concat) (interpret mode)."""
    import jax
    import jax.numpy as jnp
    from medical_image_segmentation_with_visual_prompts_tpu.ops. \
        conv_pallas import conv3x3_fused, conv3x3_fused_pair
    from medical_image_segmentation_with_visual_prompts_tpu.ops import \
        window_attention_pallas as wap
    monkeypatch.setattr(wap, "_FORCE_INTERPRET", True)
    rng = jax.random.PRNGKey(0)
    ka, kb, kk, kc, ks = jax.random.split(rng, 5)
    b, h, w, d, ca, cb, co = 2, 8, 8, 4, 6, 4, 5
    xa = jax.random.normal(ka, (b, h, w, d, ca))
    xb = jax.random.normal(kb, (b, h, w, d, cb))
    kern = jax.random.normal(kk, (3, 3, 3, ca + cb, co)) * 0.1
    bias = jax.random.normal(kc, (co,)) * 0.1
    scale = jax.random.normal(ks, (ca + cb,)) * 0.3 + 1.0
    shift = jnp.linspace(-0.2, 0.2, ca + cb)
    want = conv3x3_fused(jnp.concatenate([xa, xb], -1), kern, bias,
                         scale, shift, leaky=True)
    got = conv3x3_fused_pair(xa, xb, kern, bias, scale, shift, leaky=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)
    # no-affine path
    want = conv3x3_fused(jnp.concatenate([xa, xb], -1), kern, bias)
    got = conv3x3_fused_pair(xa, xb, kern, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_pair_gradients(monkeypatch):
    import jax
    import jax.numpy as jnp
    from medical_image_segmentation_with_visual_prompts_tpu.ops. \
        conv_pallas import conv3x3_fused_pair, _reference_pair
    from medical_image_segmentation_with_visual_prompts_tpu.ops import \
        window_attention_pallas as wap
    monkeypatch.setattr(wap, "_FORCE_INTERPRET", True)
    rng = jax.random.PRNGKey(1)
    ka, kb, kk = jax.random.split(rng, 3)
    xa = jax.random.normal(ka, (1, 4, 4, 2, 4))
    xb = jax.random.normal(kb, (1, 4, 4, 2, 4))
    kern = jax.random.normal(kk, (3, 3, 3, 8, 3)) * 0.1
    bias = jnp.zeros((3,))

    def loss(f):
        return lambda a, b_, k_: jnp.sum(
            f(a, b_, k_, bias).astype(jnp.float32) ** 2)

    g1 = jax.grad(loss(lambda *a: conv3x3_fused_pair(*a, leaky=True)),
                  argnums=(0, 1, 2))(xa, xb, kern)
    g2 = jax.grad(loss(lambda *a: _reference_pair(
        *a, None, None, True).astype(jnp.float32)),
        argnums=(0, 1, 2))(xa, xb, kern)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-2, atol=5e-2)
