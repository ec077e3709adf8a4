"""Raw-int16 H2D serving with on-device intensity windowing.

VERDICT r4 item 2: the from-disk serving path is link-bound and the
upload shipped windowed float32; the default path now ships the native
NIfTI dtype (int16 HU for CT — half the bytes) and windows on device.
These tests pin:

* ``load_image_raw`` preserves integer payload dtypes;
* device windowing == the host path bit-for-bit in fp32;
* both serving arms write identical segmentations.
"""

import pathlib
from argparse import Namespace

import numpy as np
import yaml

ROOT = pathlib.Path(__file__).resolve().parents[1]


def test_load_image_raw_preserves_int16(tmp_path):
    from medical_image_segmentation_with_visual_prompts_tpu.data import \
        save_nifti
    from medical_image_segmentation_with_visual_prompts_tpu.data. \
        transforms import load_image, load_image_raw
    rng = np.random.default_rng(0)
    hu = np.clip(rng.normal(0, 400, (12, 10, 8)), -1200, 1200
                 ).astype(np.int16)
    p = tmp_path / "ct.nii.gz"
    save_nifti(str(p), hu, np.eye(4))
    raw = load_image_raw(str(p))
    assert raw.dtype == np.int16 and raw.shape == (12, 10, 8, 1)
    f32 = load_image(str(p))
    assert f32.dtype == np.float32
    np.testing.assert_array_equal(raw.astype(np.float32), f32)


def test_device_windowing_matches_host_bitwise():
    """Device-side scale_intensity of the int16 payload reproduces the
    host fp32 pipeline (native single-pass formula) bit-for-bit."""
    import jax.numpy as jnp
    from medical_image_segmentation_with_visual_prompts_tpu.data. \
        transforms import scale_intensity_range
    from medical_image_segmentation_with_visual_prompts_tpu.infer import \
        device_scale_intensity
    rng = np.random.default_rng(1)
    hu = np.clip(rng.normal(0, 500, (16, 16, 8, 1)), -2000, 2000
                 ).astype(np.int16)
    host = scale_intensity_range(hu.astype(np.float32))
    dev = np.asarray(device_scale_intensity()(jnp.asarray(hu)))
    assert dev.dtype == np.float32
    np.testing.assert_array_equal(dev, host)


def _tiny_model_and_conf():
    import jax
    import jax.numpy as jnp
    from medical_image_segmentation_with_visual_prompts_tpu.models import (
        ModelConfig, SwinUnetR)
    with open(ROOT / "configurations" / "tiny_cpu.yml") as f:
        conf_d = yaml.safe_load(f)
    conf_d.pop("training_mode", None)
    conf = Namespace(training_mode="downstream", use_encoder_prompting=True,
                     use_decoder_prompting=True, **conf_d)
    model = SwinUnetR(ModelConfig.from_namespace(conf))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 16, 16, 8, 1)), deterministic=True)
    return conf, variables


def test_serving_arms_write_identical_segmentations(tmp_path):
    """Raw-int16-upload + device windowing == fp32-upload + host
    windowing, end to end through serve_volumes."""
    from medical_image_segmentation_with_visual_prompts_tpu.data import \
        save_nifti
    from medical_image_segmentation_with_visual_prompts_tpu.data. \
        transforms import load_image
    from medical_image_segmentation_with_visual_prompts_tpu.infer import \
        serve_volumes
    conf, variables = _tiny_model_and_conf()
    rng = np.random.default_rng(2)
    src = tmp_path / "ct.nii.gz"
    save_nifti(str(src), np.clip(rng.normal(0, 400, (24, 24, 10)),
                                 -1000, 1000).astype(np.int16), np.eye(4))
    preds = {}
    for tag, dev_win in (("device", True), ("host", False)):
        out = tmp_path / f"out_{tag}"
        out.mkdir()
        n_done, n_failed = serve_volumes(
            conf, variables, [(src, out / "ct_seg.nii.gz")],
            device_windowing=dev_win)
        assert (n_done, n_failed) == (1, 0)
        preds[tag] = load_image(str(out / "ct_seg.nii.gz"))
    np.testing.assert_array_equal(preds["device"], preds["host"])
