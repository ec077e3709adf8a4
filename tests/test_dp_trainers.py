"""mesh_data-driven data-parallel training through the real trainers/CLI.

VERDICT item 2: a ``mesh_data: 8`` fit run through ``main`` must train
data-parallel (batch axis sharded over the 8-CPU virtual mesh,
parameters replicated, gradient all-reduce inserted by XLA) and produce
the same loss trajectory as the single-device run.
"""

import json
from argparse import Namespace
from pathlib import Path

import jax
import numpy as np
import pytest

import medical_image_segmentation_with_visual_prompts_tpu.utils.configs as cfg_mod
from medical_image_segmentation_with_visual_prompts_tpu import main as cli
from medical_image_segmentation_with_visual_prompts_tpu.data import save_nifti
from medical_image_segmentation_with_visual_prompts_tpu.train.common import \
    DeviceCtx
from medical_image_segmentation_with_visual_prompts_tpu.utils import \
    get_full_configs

TINY_YML = Path(__file__).resolve().parent.parent / "configurations" / \
    "tiny_cpu.yml"


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("dp_synthetic")
    rng = np.random.default_rng(3)
    img_dir, msk_dir = root / "img", root / "msk"
    img_dir.mkdir(), msk_dir.mkdir()
    for i in range(3):
        vol = rng.normal(0.0, 400.0, size=(24, 24, 12)).astype(np.float32)
        msk = (rng.random((24, 24, 12)) > 0.6).astype(np.float32) * 2.0
        save_nifti(img_dir / f"case{i}.nii.gz", vol)
        save_nifti(msk_dir / f"case{i}.nii.gz", msk)
    return root


def _conf(dataset, tmp_path, monkeypatch, training_mode, run_name, **flags):
    monkeypatch.setattr(cfg_mod, "DEFAULT_ROOT_LOG_DIR", tmp_path / "logs")
    monkeypatch.setattr(cfg_mod, "DEFAULT_CKPT_DIR", tmp_path / "ckpts")
    defaults = dict(
        mode="fit", training_mode=training_mode, configs=str(TINY_YML),
        load_ckpt_backbone=False, load_ckpt_backbone_path="",
        save_ckpt_backbone=False, save_ckpt_backbone_path="",
        load_ckpt_prompt_tokens=False, load_ckpt_prompt_tokens_path="",
        save_ckpt_prompt_tokens=False, save_ckpt_prompt_tokens_path="",
        use_encoder_prompting=True, use_decoder_prompting=True,
        backbone="swin_unetr", run_name=run_name)
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
    for k, v in flags.items():
        setattr(conf, k, v)
    return conf


def _losses(conf, tag="train_loss/seg"):
    lines = (Path(conf.summary_dir) / "scalars.jsonl").read_text()
    return [json.loads(line)["value"] for line in lines.splitlines()
            if json.loads(line)["tag"] == tag]


def test_mesh_data_fit_matches_single_device(dataset, tmp_path, monkeypatch):
    assert len(jax.devices()) >= 8
    # Batch 8 so the mesh divides evenly and single-device sees the
    # identical global batch (seeded loaders -> same data order).
    common = dict(batch_size_downstream=8, num_samples_downstream=4,
                  max_epochs_downstream=2, seed=11)
    conf_sd = _conf(dataset, tmp_path, monkeypatch, "downstream", "sd",
                    mesh_data=0, **common)
    cli.setup_fitting(conf_sd).train()
    conf_dp = _conf(dataset, tmp_path, monkeypatch, "downstream", "dp",
                    mesh_data=8, **common)
    trainer = cli.setup_fitting(conf_dp)
    assert trainer.dctx.mesh is not None
    assert trainer.dctx.n_devices == 8
    trainer.train()
    # Trainable params ended replicated over the mesh (frozen ones are
    # closed over by the step and never travel through it).
    leaves = jax.tree_util.tree_leaves(trainer.final_state["params"])
    assert any(len(leaf.sharding.device_set) == 8 for leaf in leaves)
    ls, ld = _losses(conf_sd), _losses(conf_dp)
    assert len(ls) == len(ld) and len(ls) >= 2
    np.testing.assert_allclose(ls, ld, rtol=2e-4, atol=1e-5)


def test_mesh_data_partial_batch_is_padded(dataset, tmp_path, monkeypatch):
    # 2 train volumes x 3 samples = 6 -> one batch of 6 under bs 8; the
    # DP stage pads it to 8 by wrap-around instead of crashing.
    conf = _conf(dataset, tmp_path, monkeypatch, "downstream", "pad",
                 mesh_data=8, batch_size_downstream=8,
                 num_samples_downstream=3, max_epochs_downstream=0, seed=5)
    trainer = cli.setup_fitting(conf)
    trainer.train()
    assert _losses(conf), "padded partial batch trained"


def test_mesh_data_students_teacher_fit(dataset, tmp_path, monkeypatch):
    conf = _conf(dataset, tmp_path, monkeypatch,
                 "self_supervised_learning_decoder", "dp_p2",
                 mesh_data=8, batch_size_students_teacher=8,
                 num_samples_students_teacher=4,
                 max_epochs_students_teacher=0, seed=11)
    trainer = cli.setup_fitting(conf)
    assert trainer.dctx.mesh is not None
    trainer.train()
    assert _losses(conf, "train_loss/prt")


def test_mesh_data_multi_view_fit(dataset, tmp_path, monkeypatch):
    conf = _conf(dataset, tmp_path, monkeypatch,
                 "self_supervised_learning_encoder", "dp_p1",
                 mesh_data=8, batch_size_multi_view=8,
                 num_samples_multi_view=4, max_epochs_multi_view=0, seed=11)
    trainer = cli.setup_fitting(conf)
    assert trainer.dctx.mesh is not None
    trainer.train()
    assert _losses(conf, "train_loss/rec")


def test_mesh_data_sliding_window_test(dataset, tmp_path, monkeypatch):
    # Serving path: both per-window and gaussian test modes run with the
    # window chunks sharded across the mesh.
    conf = _conf(dataset, tmp_path, monkeypatch, "downstream", "dp_tst",
                 mesh_data=8)
    conf.mode = "test"
    tester = cli.setup_testing(conf)
    vals = tester.test()
    assert len(vals["iou"]) == 3

    conf_g = _conf(dataset, tmp_path, monkeypatch, "downstream", "dp_tstg",
                   mesh_data=8)
    conf_g.mode = "test"
    conf_g.test_blending = "gaussian"
    tester_g = cli.setup_testing(conf_g)
    vals_g = tester_g.test()
    assert len(vals_g["iou"]) == 3


def test_device_ctx_round_and_stage():
    ctx = DeviceCtx(Namespace(mesh_data=8))
    assert ctx.round_batch(10) == 16
    assert ctx.round_batch(8) == 8
    batch = {"image": np.ones((6, 4, 4, 2, 1), np.float32), "name": ["a"]}
    staged = ctx.stage(batch)
    assert staged["image"].shape[0] == 8  # wrap-around pad
    np.testing.assert_array_equal(np.asarray(staged["image"][6]),
                                  np.asarray(staged["image"][0]))
    assert len(staged["image"].sharding.device_set) == 8
    ctx1 = DeviceCtx(Namespace(mesh_data=0))
    assert ctx1.mesh is None and ctx1.round_batch(10) == 10


def test_mesh_data_partial_batch_matches_single_device(dataset, tmp_path,
                                                       monkeypatch):
    """Wrap-padded partial batches are masked ('_valid'): losses and
    gradients no longer double-count the duplicate samples.  The
    training trajectory agrees to ~1% (exact equality is impossible:
    BatchNorm BATCH statistics see the duplicates — train-mode BN is
    batch-coupled for the reference too), and the eval step on a padded
    batch is EXACTLY the unpadded loss (running-stats BN)."""
    common = dict(batch_size_downstream=8, num_samples_downstream=3,
                  max_epochs_downstream=1, seed=5)
    conf_sd = _conf(dataset, tmp_path, monkeypatch, "downstream", "psd",
                    mesh_data=0, **common)
    cli.setup_fitting(conf_sd).train()
    conf_dp = _conf(dataset, tmp_path, monkeypatch, "downstream", "pdp",
                    mesh_data=8, **common)
    trainer = cli.setup_fitting(conf_dp)
    trainer.train()
    for tag in ("train_loss/seg", "val_loss/seg"):
        ls, ld = _losses(conf_sd, tag), _losses(conf_dp, tag)
        assert len(ls) == len(ld) and ls, tag
        np.testing.assert_allclose(ls, ld, rtol=2e-2, err_msg=tag)


def test_eval_step_masks_padded_samples_exactly(dataset, tmp_path,
                                                monkeypatch):
    """eval_step(padded batch, _valid) == eval_step(true batch): the
    wrap-around samples contribute nothing to loss or stats."""
    import jax.numpy as jnp
    from medical_image_segmentation_with_visual_prompts_tpu.models import \
        partition
    conf = _conf(dataset, tmp_path, monkeypatch, "downstream", "mask0",
                 mesh_data=0, batch_size_downstream=8,
                 num_samples_downstream=3, max_epochs_downstream=0, seed=5)
    trainer = cli.setup_fitting(conf)
    variables = trainer._init_variables(conf.seg_input_size)
    labels = partition.trainable_labels(trainer.model_conf)
    trainable, frozen = partition.split_params(variables["params"], labels)
    bs = variables.get("batch_stats", {})
    tx = __import__("optax").inject_hyperparams(
        __import__(
            "medical_image_segmentation_with_visual_prompts_tpu.train.common",
            fromlist=["adamw"]).adamw)(lr=1e-3, weight_decay=0.0)
    _, eval_step = trainer._build_steps(frozen, tx)
    rng = np.random.default_rng(0)
    img6 = rng.normal(0.3, 0.2, (6, 16, 16, 8, 1)).astype(np.float32)
    msk6 = (rng.random((6, 16, 16, 8, 1)) > 0.5).astype(np.float32)
    img8 = np.concatenate([img6, img6[:2]])
    msk8 = np.concatenate([msk6, msk6[:2]])
    valid8 = jnp.asarray([1.0] * 6 + [0.0] * 2)
    loss6, stats6 = eval_step(trainable, bs, jnp.asarray(img6),
                              jnp.asarray(msk6), jnp.ones((6,)))
    loss8, stats8 = eval_step(trainable, bs, jnp.asarray(img8),
                              jnp.asarray(msk8), valid8)
    np.testing.assert_allclose(float(loss8), float(loss6), rtol=1e-5)
    for a, b in zip(stats6, stats8):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5)
