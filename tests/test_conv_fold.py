"""Depth-folded conv parity: both fast paths equal the direct 3D conv."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_segmentation_with_visual_prompts_tpu.ops.conv_fold import (
    conv3d_depth_folded, conv3d_tap_matmul, fold_plan)


def _direct(x, k, b):
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"))
    return y + b


@pytest.mark.parametrize("d", [1, 2, 3, 4])
def test_folded_matches_direct(d):
    rng = np.random.default_rng(d)
    cin, cout = 6, 5
    x = jnp.asarray(rng.normal(size=(2, 8, 8, d, cin)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)
                               ).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
    want = np.asarray(_direct(x, k, b))
    for fn in (conv3d_depth_folded, conv3d_tap_matmul):
        got = np.asarray(fn(x, k, b))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_folded_gradients_match(pytestconfig):
    rng = np.random.default_rng(9)
    cin, cout, d = 4, 3, 2
    x = jnp.asarray(rng.normal(size=(1, 6, 6, d, cin)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)
                               ).astype(np.float32) * 0.2)
    b = jnp.zeros((cout,))
    gd = jax.grad(lambda kk: jnp.sum(_direct(x, kk, b) ** 2))(k)
    gf = jax.grad(lambda kk: jnp.sum(
        jnp.asarray(conv3d_depth_folded(x, kk, b)) ** 2))(k)
    gt = jax.grad(lambda kk: jnp.sum(
        jnp.asarray(conv3d_tap_matmul(x, kk, b)) ** 2))(k)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gd),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(gd),
                               rtol=1e-4, atol=1e-4)


def test_fold_plan_gating():
    # canonical decoder convs
    assert fold_plan((16, 16, 16, 1, 576), (3, 3, 3), (1, 1, 1), (1, 1, 1),
                     192) == "fold2d"
    assert fold_plan((16, 64, 64, 4, 144), (3, 3, 3), (1, 1, 1), (1, 1, 1),
                     48) == "tapmm"
    # D=2 C=96 stays on the (already fast) direct conv
    assert fold_plan((16, 32, 32, 2, 288), (3, 3, 3), (1, 1, 1), (1, 1, 1),
                     96) is None
    # strided patch embed excluded
    assert fold_plan((16, 128, 128, 8, 1), (2, 2, 2), (2, 2, 2), (0, 0, 0),
                     48) is None
    # deep volumes excluded
    assert fold_plan((16, 128, 128, 8, 48), (3, 3, 3), (1, 1, 1), (1, 1, 1),
                     2) is None


def test_conv3d_module_fast_path(monkeypatch):
    """The Conv3d module takes the folded path under the TPU/test hook
    and matches the direct path bit-for-bit up to fp reassociation."""
    from medical_image_segmentation_with_visual_prompts_tpu.models.unet_blocks \
        import Conv3d
    from medical_image_segmentation_with_visual_prompts_tpu.ops import \
        window_attention_pallas as wap
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 1, 24)).astype(np.float32))
    m = Conv3d(12, (3, 3, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    want = np.asarray(m.apply(v, x))  # direct (CPU)
    monkeypatch.setattr(wap, "_FORCE_INTERPRET", True)
    got = np.asarray(m.apply(v, x))   # folded fast path
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("d_lo", [2, 4])
def test_depth_lanes_upsampled_matches_upsample_then_conv(d_lo):
    # conv3d_depth_lanes_upsampled == direct conv on the depth-upsampled
    # tensor (the depth interp folds exactly into the lane matrix,
    # clamped border rows included).
    from medical_image_segmentation_with_visual_prompts_tpu.ops.conv_fold \
        import conv3d_depth_lanes_upsampled
    from medical_image_segmentation_with_visual_prompts_tpu.ops.resize \
        import interp_matrix, resize_trilinear
    rng = np.random.default_rng(d_lo)
    cin, cout, d_hi = 5, 3, 2 * d_lo
    x = jnp.asarray(rng.normal(size=(2, 8, 8, d_lo, cin)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)
                               ).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(cin,)).astype(np.float32) * 0.5 + 1)
    shift = jnp.asarray(rng.normal(size=(cin,)).astype(np.float32) * 0.1)
    x_hi = resize_trilinear(x, (8, 8, d_hi), align_corners=False)
    want = np.asarray(_direct(x_hi * scale + shift, k, b))
    up = jnp.asarray(interp_matrix(d_lo, d_hi, False))
    got = np.asarray(conv3d_depth_lanes_upsampled(
        x, k, b, scale, shift, d_hi=d_hi, up_matrix=up,
        dtype=jnp.float32))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("hw,d_lo", [((8, 8), 2), ((6, 10), 4), ((2, 3), 2)])
def test_parity_upsampled_matches_upsample_then_conv(hw, d_lo):
    # conv3d_parity_upsampled == direct conv on the fully (2,2,2)-
    # upsampled tensor: the x2 H/W upsample folds as parity stencils
    # (clamped borders via edge padding, conv zero-pad restored by the
    # edge/corner correction terms), the depth axis densely.
    from medical_image_segmentation_with_visual_prompts_tpu.ops.conv_fold \
        import conv3d_parity_upsampled
    from medical_image_segmentation_with_visual_prompts_tpu.ops.resize \
        import interp_matrix, resize_trilinear
    rng = np.random.default_rng(d_lo + hw[0])
    h, w = hw
    cin, cout, d_hi = 5, 3, 2 * d_lo
    x = jnp.asarray(rng.normal(size=(2, h, w, d_lo, cin)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)
                               ).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(cin,)).astype(np.float32) * 0.5 + 1)
    shift = jnp.asarray(rng.normal(size=(cin,)).astype(np.float32) * 0.1)
    x_hi = resize_trilinear(x, (2 * h, 2 * w, d_hi), align_corners=False)
    want = np.asarray(_direct(x_hi * scale + shift, k, b))
    up = jnp.asarray(interp_matrix(d_lo, d_hi, False))
    got = np.asarray(conv3d_parity_upsampled(
        x, k, b, scale, shift, d_hi=d_hi, up_matrix=up,
        dtype=jnp.float32))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("fold_hw", [False, True])
def test_downstream_depth_folded_head_matches_reference_path(
        monkeypatch, fold_hw):
    # Full model: the TPU inference paths (depth-composed head, and the
    # fully folded parity head consuming the raw decoder output) must
    # match the plain path (full upsample + head at high resolution) on
    # the same params.
    from medical_image_segmentation_with_visual_prompts_tpu.models import (
        ModelConfig, SwinUnetR)
    from medical_image_segmentation_with_visual_prompts_tpu.ops import (
        window_attention_pallas as wap)
    from test_swin_unetr import TINY
    conf = ModelConfig(training_mode="downstream",
                       use_encoder_prompting=True,
                       use_decoder_prompting=True,
                       fold_head_hw=fold_hw, **TINY)
    assert conf.unetr_res_block == "none"
    x = jnp.asarray(np.random.default_rng(0).normal(
        0.3, 0.2, size=(2, 32, 32, 8, 1)).astype(np.float32))
    model = SwinUnetR(conf)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, deterministic=True)
    # Same (interpret-mode TPU) backend both times: only the output
    # chain differs between the two applies.
    monkeypatch.setattr(wap, "_FORCE_INTERPRET", True)
    plain = dataclasses.replace(conf, fold_head_depth=False)
    want = SwinUnetR(plain).apply(variables, x,
                                  deterministic=True)["downstream"]
    got = model.apply(variables, x, deterministic=True)["downstream"]
    # bf16 tolerance: the two chains round at different points (plain
    # interpolates in fp32 then casts the head input to bf16; the folded
    # path composes the interp into the bf16 lane matmul).  Exact fp32
    # parity of the op itself is covered by
    # test_depth_lanes_upsampled_matches_upsample_then_conv; this guards
    # the model wiring, where a bug would be O(1), not O(bf16 eps).
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-2, atol=5e-2)
