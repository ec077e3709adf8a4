"""Native (C++) data-path runtime: parity with the numpy fallbacks."""

import subprocess
from pathlib import Path

import numpy as np
import pytest

from medical_image_segmentation_with_visual_prompts_tpu.data import nifti
import medical_image_segmentation_with_visual_prompts_tpu.data.native as native
import medical_image_segmentation_with_visual_prompts_tpu.data.transforms as T

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"


@pytest.fixture(scope="module", autouse=True)
def build_native():
    if not (_NATIVE_DIR / "libmiseg_native.so").exists():
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            pytest.skip("native library unavailable and could not be built")
    native._lib = None
    if not native.available():
        pytest.skip("native library could not be loaded")


def test_native_nifti_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    vol = rng.normal(0, 400, (33, 17, 9)).astype(np.float32)
    p = nifti.save_nifti(tmp_path / "v.nii.gz", vol)
    data, _ = nifti.load_nifti(p)
    np.testing.assert_array_equal(data, vol)


def test_native_matches_numpy_path(tmp_path):
    rng = np.random.default_rng(1)
    vol = rng.normal(0, 400, (40, 40, 12)).astype(np.float32)
    p = nifti.save_nifti(tmp_path / "w.nii.gz", vol)
    d_native, _ = nifti.load_nifti(p)
    real_load = native._load
    try:
        native._load = lambda: None
        d_numpy, _ = nifti.load_nifti(p)
    finally:
        native._load = real_load
        native._lib = None
    np.testing.assert_array_equal(d_native, d_numpy)


def test_native_scale_intensity_parity():
    rng = np.random.default_rng(2)
    x = rng.normal(0, 800, (16, 16, 8, 1)).astype(np.float32)
    a = T.scale_intensity_range(x)
    real_load = native._load
    try:
        native._load = lambda: None
        b = T.scale_intensity_range(x)
    finally:
        native._load = real_load
        native._lib = None
    np.testing.assert_allclose(a, b, atol=1e-6)
    # Purity: the input array is never mutated.
    assert float(np.abs(x).max()) > 1.0


def test_native_extract_windows_parity():
    rng = np.random.default_rng(3)
    vol = rng.normal(size=(32, 32, 16, 2)).astype(np.float32)
    starts = np.array([[0, 0, 0], [8, 8, 4], [16, 16, 8]], np.int64)
    got = native.extract_windows(vol, starts, (16, 16, 8))
    want = np.stack([vol[s[0]:s[0] + 16, s[1]:s[1] + 16, s[2]:s[2] + 8]
                     for s in starts])
    np.testing.assert_array_equal(got, want)
