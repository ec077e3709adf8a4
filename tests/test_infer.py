"""End-to-end batch serving CLI (infer.py): directory in → directory
out, pipelined loader/writer threads, shared bucketed program cache."""

import pathlib
import sys

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]


def test_infer_cli_batch(tmp_path, monkeypatch):
    import jax
    import jax.numpy as jnp
    import yaml
    from medical_image_segmentation_with_visual_prompts_tpu import infer
    from medical_image_segmentation_with_visual_prompts_tpu.data import \
        save_nifti
    from medical_image_segmentation_with_visual_prompts_tpu.models import (
        ModelConfig, SwinUnetR)
    from medical_image_segmentation_with_visual_prompts_tpu.utils. \
        checkpoint import save_checkpoint

    with open(ROOT / "configurations" / "tiny_cpu.yml") as f:
        conf = yaml.safe_load(f)
    from argparse import Namespace
    model_conf = ModelConfig.from_namespace(
        Namespace(training_mode="downstream", use_encoder_prompting=True,
                  use_decoder_prompting=True, **{
                      k: v for k, v in conf.items()
                      if k not in ("training_mode",)}))
    model = SwinUnetR(model_conf)
    x0 = jnp.zeros((1, 16, 16, 8, 1))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x0, deterministic=True)
    ckpt = tmp_path / "model.ckpt"
    save_checkpoint(ckpt, 0,
                    {"params": variables["params"],
                     "batch_stats": variables.get("batch_stats", {})},
                    None, {"epoch": 0})

    rng = np.random.default_rng(0)
    src = tmp_path / "in"
    src.mkdir()
    # Two distinct shapes -> exercises the bucket cache across volumes.
    for i, shape in enumerate([(24, 24, 10), (24, 24, 10), (20, 20, 12)]):
        save_nifti(str(src / f"case_{i}.nii.gz"),
                   rng.normal(0.3, 0.2, size=shape).astype(np.float32),
                   np.eye(4))
    out = tmp_path / "out"

    monkeypatch.setattr(sys, "argv", [
        "infer", "--configs", str(ROOT / "configurations" / "tiny_cpu.yml"),
        "--ckpt", str(ckpt), "--input", str(src), "--output", str(out),
        "--use-encoder-prompting", "--use-decoder-prompting"])
    infer.main()

    outs = sorted(out.iterdir())
    assert [p.name for p in outs] == [
        "case_0_seg.nii.gz", "case_1_seg.nii.gz", "case_2_seg.nii.gz"]
    from medical_image_segmentation_with_visual_prompts_tpu.data. \
        transforms import load_image
    pred = load_image(str(outs[0]))
    assert pred.shape[:3] == (24, 24, 10)
    assert set(np.unique(pred)).issubset({0, 1})


def test_resolve_io_rejects_multi_input_file_output(tmp_path):
    from medical_image_segmentation_with_visual_prompts_tpu.infer import \
        resolve_io
    a, b = tmp_path / "a.nii.gz", tmp_path / "b.nii.gz"
    a.write_bytes(b"x")
    b.write_bytes(b"x")
    import pytest
    with pytest.raises(ValueError, match="directory"):
        resolve_io([str(a), str(b)], str(tmp_path / "seg.nii.gz"))


def test_serve_volumes_reports_failures(tmp_path):
    """A corrupt volume is counted as failed (and the batch finishes)."""
    import jax
    import jax.numpy as jnp
    import yaml
    from argparse import Namespace
    from medical_image_segmentation_with_visual_prompts_tpu.data import \
        save_nifti
    from medical_image_segmentation_with_visual_prompts_tpu.infer import \
        serve_volumes
    from medical_image_segmentation_with_visual_prompts_tpu.models import (
        ModelConfig, SwinUnetR)

    with open(ROOT / "configurations" / "tiny_cpu.yml") as f:
        conf_d = yaml.safe_load(f)
    conf = Namespace(training_mode="downstream", use_encoder_prompting=True,
                     use_decoder_prompting=True,
                     **{k: v for k, v in conf_d.items()
                        if k != "training_mode"})
    model = SwinUnetR(ModelConfig.from_namespace(conf))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 16, 16, 8, 1)), deterministic=True)

    good = tmp_path / "good.nii.gz"
    bad = tmp_path / "bad.nii.gz"
    tiny = tmp_path / "tiny.nii.gz"
    save_nifti(str(good), np.zeros((20, 20, 10), np.float32), np.eye(4))
    bad.write_bytes(b"this is not a nifti")
    # Smaller than the roi: pad coverage (the serving default) pads it
    # up to one window and serves it; crop coverage (reference grid
    # semantics) fails at inference — counted per-volume either way,
    # never aborting the batch.
    save_nifti(str(tiny), np.zeros((4, 4, 2), np.float32), np.eye(4))
    out = tmp_path / "out"
    out.mkdir()
    n_done, n_failed = serve_volumes(
        conf, variables,
        [(bad, out / "bad_seg.nii.gz"), (tiny, out / "tiny_seg.nii.gz"),
         (good, out / "good_seg.nii.gz")])
    assert n_done == 2 and n_failed == 1
    assert (out / "good_seg.nii.gz").exists()
    assert (out / "tiny_seg.nii.gz").exists()
    assert not (out / "bad_seg.nii.gz").exists()

    out2 = tmp_path / "out_crop"
    out2.mkdir()
    n_done, n_failed = serve_volumes(
        conf, variables,
        [(bad, out2 / "bad_seg.nii.gz"), (tiny, out2 / "tiny_seg.nii.gz"),
         (good, out2 / "good_seg.nii.gz")], coverage="crop")
    assert n_done == 1 and n_failed == 2
    assert not (out2 / "tiny_seg.nii.gz").exists()


def test_serve_volumes_data_parallel_matches_single_device(tmp_path):
    """`mesh_data: 8` shards the window chunks across the virtual mesh;
    the written segmentation is identical to the single-device run."""
    import jax
    import jax.numpy as jnp
    import yaml
    from argparse import Namespace
    from medical_image_segmentation_with_visual_prompts_tpu.data import \
        save_nifti
    from medical_image_segmentation_with_visual_prompts_tpu.data. \
        transforms import load_image
    from medical_image_segmentation_with_visual_prompts_tpu.infer import \
        serve_volumes
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

    rng = np.random.default_rng(3)
    src = tmp_path / "case.nii.gz"
    save_nifti(str(src), rng.normal(0.3, 0.2, (24, 24, 10)).astype(
        np.float32), np.eye(4))

    preds = {}
    for tag, mesh_n in (("single", 0), ("dp", 8)):
        conf.mesh_data = mesh_n
        out = tmp_path / f"out_{tag}"
        out.mkdir()
        n_done, n_failed = serve_volumes(
            conf, variables, [(src, out / "case_seg.nii.gz")])
        assert (n_done, n_failed) == (1, 0)
        preds[tag] = load_image(str(out / "case_seg.nii.gz"))
    np.testing.assert_array_equal(preds["single"], preds["dp"])


def test_watch_directory_serves_new_files(tmp_path, monkeypatch):
    """Watch mode: backlog + files appearing between polls are served
    with ONE warm runner; existing outputs are skipped (idempotent
    restart); a corrupt volume is counted once and never retried."""
    import jax
    import jax.numpy as jnp
    import yaml
    from argparse import Namespace
    from medical_image_segmentation_with_visual_prompts_tpu import infer
    from medical_image_segmentation_with_visual_prompts_tpu.data import \
        save_nifti
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

    rng = np.random.default_rng(0)
    src = tmp_path / "in"
    src.mkdir()
    out = tmp_path / "out"
    out.mkdir()

    def vol():
        return rng.normal(0.3, 0.2, (20, 20, 10)).astype(np.float32)

    save_nifti(str(src / "a.nii.gz"), vol(), np.eye(4))      # backlog
    (src / "bad.nii.gz").write_bytes(b"nope")                # fails once
    save_nifti(str(src / "c.nii.gz"), vol(), np.eye(4))      # pre-served
    (out / "c_seg.nii.gz").write_bytes(b"existing")

    runners = []
    real_make = infer.make_runner

    def counting_make(*a, **k):
        runners.append(real_make(*a, **k))
        return runners[-1]

    monkeypatch.setattr(infer, "make_runner", counting_make)

    def sleep_and_drop(_):
        if not (src / "b.nii.gz").exists():   # arrives between polls
            save_nifti(str(src / "b.nii.gz"), vol(), np.eye(4))

    monkeypatch.setattr(infer.time, "sleep", sleep_and_drop)

    n_done, n_failed = infer.watch_directory(
        conf, variables, src, out, interval=0.0, min_age=0.0, max_polls=4)
    assert (n_done, n_failed) == (2, 1)
    assert (out / "a_seg.nii.gz").exists()
    assert (out / "b_seg.nii.gz").exists()
    assert (out / "c_seg.nii.gz").read_bytes() == b"existing"
    assert not (out / "bad_seg.nii.gz").exists()
    assert len(runners) == 1                  # one warm runner, all polls
    assert runners[0].compiled_programs == 1  # same bucket reused
