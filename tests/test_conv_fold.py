"""Depth-folded conv parity: both fast paths equal the direct 3D conv."""

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
