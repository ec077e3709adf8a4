"""Configurable-stride sliding-window serving (VERDICT r4 item 1).

The reference evaluates at stride roi/2 only (segmentation.py:243-252);
the framework's Gaussian serving generalizes the stride to cut the
number of model forwards per volume — the dominant serving cost.  These
tests pin:

* ``resolve_stride`` spec handling;
* the generalized coset stitch against a naive scatter accumulation at
  strides where the coset pitch pads (w/2, 3w/4, w, ragged per-axis);
* end-to-end Gaussian stitching at non-default strides against a
  brute-force numpy blend;
* bucketed == unbucketed exactness at non-default strides.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_segmentation_with_visual_prompts_tpu.parallel import (
    BucketedInference, bucketed_starts, gaussian_weight_acc,
    make_sliding_window_fn, pad_starts, resolve_stride, window_starts)
from medical_image_segmentation_with_visual_prompts_tpu.parallel.sliding_window import (
    _coset_stitch, _gaussian_importance)


def test_resolve_stride_specs():
    w = (8, 8, 4)
    assert resolve_stride(w) == (4, 4, 2)
    assert resolve_stride(w, None) == (4, 4, 2)
    assert resolve_stride(w, 0.75) == (6, 6, 3)
    assert resolve_stride(w, 1.0) == (8, 8, 4)
    assert resolve_stride(w, (5, 6, 3)) == (5, 6, 3)
    with pytest.raises(ValueError):
        resolve_stride(w, (9, 8, 4))          # > window: coverage gaps
    with pytest.raises(ValueError):
        resolve_stride(w, (4, 4))             # rank mismatch
    with pytest.raises(ValueError):
        resolve_stride(w, 0.0)                # stride 0


def test_window_starts_canonical_pass_counts():
    """The canonical bench volume: 80 windows at roi/2, 27 at 3*roi/4."""
    vol, roi = (320, 320, 24), (128, 128, 8)
    _, starts, grid = window_starts(vol, roi)
    assert grid == (4, 4, 5) and starts.shape[0] == 80
    slc, starts, grid = window_starts(vol, roi, 0.75)
    assert grid == (3, 3, 3) and starts.shape[0] == 27
    # stride (96, 96, 6): adjusted dims 320, 320, 20 (center-cropped)
    assert slc == (slice(0, 320), slice(0, 320), slice(2, 22))


def _naive_stitch(values, starts, window, out_spatial):
    acc = np.zeros((*out_spatial, values.shape[-1]), np.float32)
    wh, ww, wd = window
    for v, s in zip(values, starts):
        acc[s[0]:s[0] + wh, s[1]:s[1] + ww, s[2]:s[2] + wd] += v
    return acc


@pytest.mark.parametrize("stride", [None, 0.75, 1.0, (5, 6, 3)])
def test_coset_stitch_matches_naive_scatter(stride):
    rng = np.random.default_rng(0)
    window = (8, 8, 4)
    vol = (24, 20, 12)
    slc, starts, grid = window_starts(vol, window, stride)
    out_spatial = tuple(s.stop - s.start for s in slc)
    vals = rng.normal(size=(starts.shape[0], *window, 3)).astype(np.float32)
    got = np.asarray(_coset_stitch(
        jnp.asarray(vals), grid, window, resolve_stride(window, stride),
        out_spatial))
    want = _naive_stitch(vals, starts, window, out_spatial)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_coset_stitch_small_grid_fewer_than_period():
    """Grid axes smaller than the coset period (n_i < k_i)."""
    rng = np.random.default_rng(1)
    window = (8, 8, 4)
    stride = (6, 8, 3)               # k = (2, 1, 2)
    vol = (8, 8, 4)                  # single window per axis
    slc, starts, grid = window_starts(vol, window, stride)
    assert grid == (1, 1, 1)
    vals = rng.normal(size=(1, *window, 2)).astype(np.float32)
    got = np.asarray(_coset_stitch(jnp.asarray(vals), grid, window,
                                   stride, vol))
    np.testing.assert_allclose(got, vals[0], rtol=1e-6)


@pytest.mark.parametrize("stride", [0.75, 1.0])
def test_gaussian_sliding_window_stride_matches_bruteforce(stride):
    num_classes = 2
    roi = (8, 8, 4)

    def apply_fn(batch):
        return jnp.concatenate([batch, -batch], axis=-1) * 3.0

    vol_shape = (22, 22, 10)
    slc, starts, grid_shape = window_starts(vol_shape, roi, stride)
    out_spatial = tuple(s.stop - s.start for s in slc)
    run = make_sliding_window_fn(apply_fn, roi, chunk=4,
                                 num_classes=num_classes, mode="gaussian",
                                 grid_shape=grid_shape, stride=stride)
    rng = np.random.default_rng(0)
    vol = rng.normal(size=(*out_spatial, 1)).astype(np.float32)
    starts_p, n_valid = pad_starts(starts, 4)
    got = np.asarray(run(jnp.asarray(vol), jnp.asarray(starts_p), n_valid))

    gauss = _gaussian_importance(roi)[..., None]
    acc = np.zeros((*out_spatial, num_classes), np.float32)
    wacc = np.zeros((*out_spatial, 1), np.float32)
    wh, ww, wd = roi
    for s in starts:
        win = vol[s[0]:s[0] + wh, s[1]:s[1] + ww, s[2]:s[2] + wd]
        logits = np.concatenate([win, -win], axis=-1) * 3.0
        e = np.exp(logits - logits.max(-1, keepdims=True))
        probs = e / e.sum(-1, keepdims=True)
        acc[s[0]:s[0] + wh, s[1]:s[1] + ww, s[2]:s[2] + wd] += probs * gauss
        wacc[s[0]:s[0] + wh, s[1]:s[1] + ww, s[2]:s[2] + wd] += gauss
    want = acc / np.maximum(wacc, 1e-8)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("stride", [0.75, 1.0])
def test_gaussian_stride_precomputed_weight_acc(stride):
    """Host-precomputed weight accumulator path == in-program weights."""
    num_classes = 2
    roi = (8, 8, 4)

    def apply_fn(batch):
        return jnp.concatenate([batch, -batch], axis=-1)

    vol_shape = (22, 22, 10)
    slc, starts, grid_shape = window_starts(vol_shape, roi, stride)
    out_spatial = tuple(s.stop - s.start for s in slc)
    run = make_sliding_window_fn(apply_fn, roi, chunk=4,
                                 num_classes=num_classes, mode="gaussian",
                                 grid_shape=grid_shape, stride=stride)
    rng = np.random.default_rng(2)
    vol = jnp.asarray(rng.normal(size=(*out_spatial, 1)), jnp.float32)
    starts_p, n_valid = pad_starts(starts, 4)
    base = run(vol, jnp.asarray(starts_p), n_valid)
    wacc = jnp.asarray(gaussian_weight_acc(starts_p, n_valid, roi,
                                           out_spatial))
    fast = run(vol, jnp.asarray(starts_p), n_valid, wacc)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(base),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("stride", [0.75, 1.0])
def test_bucketed_inference_stride_exactness(stride):
    """Bucketed stitching at non-default stride == unbucketed run."""

    def apply_fn(batch):
        return jnp.concatenate([batch * 2.0, -batch], axis=-1)

    roi = (8, 8, 4)
    runner = BucketedInference(apply_fn, roi, chunk=4, num_classes=2,
                               stride=stride)
    rng = np.random.default_rng(3)
    # Crop with the runner's stride, as serving callers do.
    raw = rng.normal(size=(21, 19, 11, 1)).astype(np.float32)
    slc, _, _ = window_starts(raw.shape[:3], roi, runner.stride)
    vol = np.ascontiguousarray(raw[slc[0], slc[1], slc[2]])
    got = np.asarray(runner(vol))

    dims = vol.shape[:3]
    _, starts, grid_shape = window_starts(dims, roi, runner.stride)
    run = make_sliding_window_fn(apply_fn, roi, 4, 2, mode="gaussian",
                                 grid_shape=grid_shape, stride=runner.stride)
    starts_p, n_valid = pad_starts(starts, 4)
    want = np.asarray(run(jnp.asarray(vol), jnp.asarray(starts_p), n_valid))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_bucketed_starts_stride_validity():
    """Bucket-grid windows outside the real cropped grid are invalid."""
    roi = (8, 8, 4)
    starts, valid, grid = bucketed_starts((20, 20, 9), roi, 0.75)
    # bucket (24, 24, 12); stride (6, 6, 3)
    _, bstarts, bgrid = window_starts((24, 24, 12), roi, 0.75)
    assert grid == bgrid and starts.shape == bstarts.shape
    fits = np.all(starts + np.asarray(roi) <= np.asarray((20, 20, 9)),
                  axis=1)
    np.testing.assert_array_equal(valid, fits)
    assert valid.sum() < starts.shape[0]


def test_cover_shape_math():
    from medical_image_segmentation_with_visual_prompts_tpu.parallel. \
        sliding_window import cover_shape
    w = (16, 16, 8)
    # aligned: unchanged; misaligned: next (n-1)s+w cover above dims
    assert cover_shape((16, 16, 8), w, None) == (16, 16, 8)
    assert cover_shape((24, 24, 12), w, None) == (24, 24, 12)
    assert cover_shape((20, 18, 9), w, None) == (24, 24, 12)
    assert cover_shape((20, 18, 9), w, 0.75) == (28, 28, 14)
    assert cover_shape((4, 4, 2), w, None) == (16, 16, 8)  # < window


@pytest.mark.parametrize("stride", [None, 0.75])
def test_pad_coverage_segments_every_voxel(stride):
    """Pad coverage: a constant-class model labels EVERY voxel of a
    misaligned volume (crop coverage would leave border voxels for the
    caller to background-fill)."""

    def apply_fn(batch):
        base = jnp.zeros(batch.shape[:-1] + (2,))
        return base.at[..., 1].set(5.0)

    roi = (8, 8, 4)
    runner = BucketedInference(apply_fn, roi, chunk=4, num_classes=2,
                               stride=stride, coverage="pad")
    vol = np.random.default_rng(0).normal(
        size=(21, 19, 11, 1)).astype(np.float32)
    probs = np.asarray(runner(vol))
    assert probs.shape == (21, 19, 11, 2)
    assert (np.argmax(probs, -1) == 1).all()


def test_pad_coverage_equals_crop_on_aligned_volume():
    """On a grid-aligned volume pad coverage degenerates to the crop
    grid: same windows, same weights, same stitched numbers."""

    def apply_fn(batch):
        return jnp.concatenate([batch, -batch], axis=-1) * 2.0

    roi = (8, 8, 4)
    vol = np.random.default_rng(1).normal(
        size=(16, 16, 8, 1)).astype(np.float32)
    out = {}
    for cov in ("pad", "crop"):
        runner = BucketedInference(apply_fn, roi, chunk=4, num_classes=2,
                                   coverage=cov)
        out[cov] = np.asarray(runner(vol))
    np.testing.assert_allclose(out["pad"], out["crop"], rtol=1e-6)


def test_auto_chunk_resolution_and_equivalence():
    """chunk=None: whole grid in one scan step when <=32 windows (mesh-
    rounded for DP), and numerically identical to an explicit chunk."""
    from medical_image_segmentation_with_visual_prompts_tpu.parallel. \
        mesh import make_mesh

    def apply_fn(batch):
        return jnp.concatenate([batch, -batch], axis=-1)

    roi = (8, 8, 4)
    vol = np.random.default_rng(5).normal(
        size=(16, 16, 8, 1)).astype(np.float32)      # 27-window grid
    auto = BucketedInference(apply_fn, roi, None, 2)
    assert auto._resolve_chunk(9) == 9
    assert auto._resolve_chunk(80) == 16
    out_auto = np.asarray(auto(vol))
    assert list(auto._runs.keys())[0][2] == 27       # one scan step
    fixed = BucketedInference(apply_fn, roi, 4, 2)
    np.testing.assert_allclose(out_auto, np.asarray(fixed(vol)),
                               rtol=2e-5, atol=1e-6)

    meshed = BucketedInference(apply_fn, roi, None, 2, mesh=make_mesh(8))
    assert meshed._resolve_chunk(9) == 16            # mesh multiple
    assert meshed._resolve_chunk(27) == 32


def test_coset_stitch_fuzz_random_geometries():
    """Randomized window/stride/volume combos against the naive
    scatter — catches coset-pitch edge cases the parametrized cases
    miss (ragged per-axis strides, tails, tiny grids)."""
    rng = np.random.default_rng(42)
    for _ in range(12):
        window = tuple(int(rng.integers(2, 9)) for _ in range(3))
        stride = tuple(int(rng.integers(1, w + 1)) for w in window)
        vol = tuple(int(w + rng.integers(0, 3 * s))
                    for w, s in zip(window, stride))
        slc, starts, grid = window_starts(vol, window, stride)
        out_spatial = tuple(s.stop - s.start for s in slc)
        vals = rng.normal(size=(starts.shape[0], *window, 2)) \
            .astype(np.float32)
        got = np.asarray(_coset_stitch(jnp.asarray(vals), grid, window,
                                       stride, out_spatial))
        want = _naive_stitch(vals, starts, window, out_spatial)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5,
                                   err_msg=f"{window} {stride} {vol}")
