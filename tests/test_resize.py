"""Trilinear resize vs torch F.interpolate (ops/resize.py).

Checks the per-axis interpolation-matrix einsums against torch's
reference semantics (reference unet_blocks.py:31-35,
swin_unetr.py:350-355 use nn.Upsample(trilinear)).  A 2-tap stencil
formulation (shifted adds + interleave) was tried and REVERTED: it is
~1 ulp-equivalent but lowers to large layout copies on TPU
(89.5 -> 115.6 ms/volume traced) — the dense einsum rides the MXU with
good layouts.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from medical_image_segmentation_with_visual_prompts_tpu.ops.resize import (
    resize_trilinear, upsample_trilinear)

torch = pytest.importorskip("torch")


def _rand(shape):
    return jnp.asarray(np.random.default_rng(0).normal(
        size=shape).astype(np.float32))


@pytest.mark.parametrize("align_corners", [False, True])
def test_resize_matches_torch_trilinear(align_corners):
    x = _rand((2, 7, 8, 3, 5))
    xt = torch.tensor(np.asarray(x)).permute(0, 4, 1, 2, 3)
    want = torch.nn.functional.interpolate(
        xt, scale_factor=2, mode="trilinear", align_corners=align_corners)
    got = upsample_trilinear(x, (2, 2, 2), align_corners=align_corners)
    np.testing.assert_allclose(
        np.asarray(got), want.permute(0, 2, 3, 4, 1).numpy(),
        rtol=1e-5, atol=1e-6)


def test_resize_non_double_uses_dense_path():
    x = _rand((1, 6, 6, 4, 3))
    xt = torch.tensor(np.asarray(x)).permute(0, 4, 1, 2, 3)
    want = torch.nn.functional.interpolate(
        xt, size=(9, 13, 4), mode="trilinear", align_corners=False)
    got = resize_trilinear(x, (9, 13, 4), align_corners=False)
    np.testing.assert_allclose(
        np.asarray(got), want.permute(0, 2, 3, 4, 1).numpy(),
        rtol=1e-5, atol=1e-6)
