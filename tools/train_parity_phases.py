"""Training-DYNAMICS parity for phase-1 and phase-2 vs the live reference.

tools/train_parity_vs_reference.py pins the downstream trainer's
optimizer/scheduler/freezing combination; this harness pins the two
pretraining phases (VERDICT r3 item 6):

* **phase-1** (MultiView): the AdamW param-group split — encoder body +
  SSL heads at ``lr_multi_view``/``weight_decay_multi_view``, encoder
  prompt tokens at ``lr_prompt_tokens``/``weight_decay_prompt_tokens``
  (/root/reference/src/modules/multi_view.py:57-88) — and the
  ``WarmupCosineSchedule`` stepped per STEP (:190).
* **phase-2** (StudentsTeacher): decoder-mode param groups (decoder body
  at ``lr_students_teacher``, decoder prompt tokens at their own lr/wd,
  /root/reference/src/modules/students_teacher.py:24-79) and the
  EMA-teacher-FIRST update ordering (:158-159, momentum_model.py:27-35)
  — the final TEACHER state pins τ and the ordering.

Determinism: both frameworks must see identical stochastic choices, so

* phase-1 view generation (reference: host numpy RNG; ours: jax PRNG
  inside the jitted step) is replaced on BOTH sides by fixed views —
  rot90 k=1 for view i / k=2 for view j (H-W plane, exactly the
  reference's per-sample ``rot90(k, (2, 3))`` semantics,
  modules/utils.py:335-348) and two fixed keep-masks (multiplicative,
  like random_mask's returned ``~mask``, :267-295);
* phase-2's only stochasticity is the prototype loss's student jitter
  (``randint(0, ceil(reduction_factor))``, clustered_prototype_loss.py
  :180-183) — the harness sets ``reduction_factor=1`` so the jitter is
  exactly 0 on both sides, with no patching.

The reference side drives the LIVE reference model / MomentumModel /
losses with a transcription of each trainer's step loop; our side runs
the REAL trainers end-to-end (checkpoint load path, jitted steps).

Usage:
    python tools/train_parity_phases.py [--phase 1|2|both] [--epochs 6]

Exits nonzero on FAIL.  Regression-tested by
tests/test_reference_parity.py::test_training_dynamics_parity_phase{1,2}.
"""

from __future__ import annotations

import argparse
import importlib
import math
import pathlib
import sys
import tempfile

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from parity_vs_reference import build_hparams, install_monai_stub  # noqa: E402
from train_parity_vs_reference import (  # noqa: E402
    _CaptureWriter, _ListLoader)

SIZE = (16, 16, 8)
BATCH = 2
ROT_I, ROT_J = 1, 2  # fixed 90-degree multiples for the two views


def _null_logger():
    import logging
    logger = logging.getLogger("train_parity_phases")
    logger.addHandler(logging.NullHandler())
    logger.propagate = False
    return logger


def _ref_modules():
    """Import reference model/loss classes without the trainer package
    __init__ (which needs monai.losses/cv2)."""
    install_monai_stub()
    import types
    REFERENCE_SRC = "/root/reference/src"
    if "refmodules" not in sys.modules:
        pkg = types.ModuleType("refmodules")
        pkg.__path__ = [REFERENCE_SRC + "/modules"]
        sys.modules["refmodules"] = pkg
    swin = importlib.import_module("refmodules.swin_unetr").SwinUnetR
    momentum = importlib.import_module(
        "refmodules.momentum_model").MomentumModel
    losses = importlib.import_module("refmodules.losses")
    return swin, momentum, losses


def _warmup_cosine_lambda(warmup_steps, t_total, cycles=0.5):
    """Transcription of the reference WarmupCosineSchedule.lr_lambda
    (modules/utils.py:82-89; cv2 import makes the original unimportable
    here)."""
    def lr_lambda(step):
        if step < warmup_steps:
            return float(step) / float(max(1.0, warmup_steps))
        progress = float(step - warmup_steps) / float(
            max(1, t_total - warmup_steps))
        return max(0.0, 0.5 * (1.0 + math.cos(
            math.pi * float(cycles) * 2.0 * progress)))
    return lr_lambda


def make_masks(ratio):
    """Two fixed keep-masks (H, W, D) float32, ~ratio of voxels zeroed."""
    rng = np.random.default_rng(11)
    return [(rng.random(SIZE) > ratio).astype(np.float32) for _ in range(2)]


# ===================================================================
# Phase 1 (MultiView)
# ===================================================================

def make_phase1_batches(n_batches=1):
    rng = np.random.default_rng(17)
    return [{"image": rng.normal(0.3, 0.2, (BATCH, *SIZE, 1)).astype(
        np.float32)} for _ in range(n_batches)]


def reference_phase1(hparams, batches, epochs, masks):
    import torch
    RefSwinUnetR, _, ref_losses = _ref_modules()
    torch.manual_seed(0)
    model = RefSwinUnetR(hparams)
    sd0 = {k: v.detach().clone().numpy()
           for k, v in model.state_dict().items()}

    param_groups = [{
        "params": [p for _, p in model.named_parameters_encoder()],
        "lr": float(hparams.lr_multi_view),
        "weight_decay": float(hparams.weight_decay_multi_view),
    }]
    if hparams.use_encoder_prompting:
        param_groups.append({
            "params": [p for _, p in
                       model.named_parameters_prompt_tokens_encoder()],
            "lr": float(hparams.lr_prompt_tokens),
            "weight_decay": float(hparams.weight_decay_prompt_tokens),
        })
    optimizer = torch.optim.AdamW(
        params=param_groups, lr=float(hparams.lr_multi_view),
        weight_decay=float(hparams.weight_decay_multi_view))
    scheduler = torch.optim.lr_scheduler.LambdaLR(
        optimizer, _warmup_cosine_lambda(hparams.warmup_steps_multi_view,
                                         hparams.t_total_multi_view))
    con_loss_fn = ref_losses.ContrastivePairLoss(bs=BATCH)
    ratio = hparams.masking_ratio
    mask_t = [torch.from_numpy(m)[None, None] for m in masks]  # [1,1,H,W,D]

    losses = {"rec": [], "rot": [], "con": [], "tot": []}
    for _ in range(0, epochs + 1):                 # ref: range(start, max+1)
        model.train()
        for batch in batches:
            x = torch.from_numpy(
                np.transpose(batch["image"], (0, 4, 1, 2, 3))).contiguous()
            x_i = torch.rot90(x, ROT_I, dims=(2, 3)) * mask_t[0]
            x_j = torch.rot90(x, ROT_J, dims=(2, 3)) * mask_t[1]
            y_i = torch.full((BATCH,), ROT_I, dtype=torch.int64)
            y_j = torch.full((BATCH,), ROT_J, dtype=torch.int64)
            out_i, out_j = model(x_i), model(x_j)
            total = torch.tensor(0.0)
            img = torch.cat([x_i * mask_t[0], x_j * mask_t[1]], dim=0)
            rec = torch.cat([out_i["reconstruction"] * mask_t[0],
                             out_j["reconstruction"] * mask_t[1]], dim=0)
            rec_loss = torch.nn.functional.mse_loss(rec, img) / (1 - ratio)
            total = total + hparams.weight_rec * rec_loss
            rot_pred = torch.cat([out_i["rotation_prediction"],
                                  out_j["rotation_prediction"]], dim=0)
            rot_loss = torch.nn.functional.cross_entropy(
                rot_pred, torch.cat([y_i, y_j]))
            total = total + hparams.weight_rot * rot_loss
            con_loss = con_loss_fn(out_i["contrastive_coding"],
                                   out_j["contrastive_coding"])
            total = total + hparams.weight_con * con_loss
            optimizer.zero_grad()
            total.backward()
            optimizer.step()
            scheduler.step()                       # per STEP (ref :190)
            for name, v in (("rec", rec_loss), ("rot", rot_loss),
                            ("con", con_loss), ("tot", total)):
                losses[name].append(float(v.detach()))
    sd1 = {k: v.detach().clone().numpy()
           for k, v in model.state_dict().items()}
    return sd0, losses, sd1


def ours_phase1(hparams, sd0, batches, epochs, masks, workdir):
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "float32")
    import jax.numpy as jnp

    import medical_image_segmentation_with_visual_prompts_tpu.train. \
        multi_view as mv
    from medical_image_segmentation_with_visual_prompts_tpu.models import (
        ModelConfig, SwinUnetR, partition)
    from medical_image_segmentation_with_visual_prompts_tpu.utils. \
        checkpoint import save_checkpoint
    from medical_image_segmentation_with_visual_prompts_tpu.utils. \
        torch_import import import_state_dict

    # Fixed views in place of the jitted step's PRNG-driven ones (the
    # names are module globals, so patching rebinds the traced calls).
    masks_j = [jnp.asarray(m) for m in masks]
    calls = {"rot": 0, "mask": 0}

    def fixed_rotate(image, key):
        k = ROT_I if calls["rot"] % 2 == 0 else ROT_J
        calls["rot"] += 1
        labels = jnp.full((image.shape[0],), k, jnp.int32)
        return jnp.rot90(image, k, axes=(1, 2)), labels

    def fixed_mask(x, key, roi, mshape, ratio):
        m = masks_j[calls["mask"] % 2]
        calls["mask"] += 1
        return x * m[None, ..., None], m

    orig_rotate, orig_mask = mv.random_rotate, mv.random_mask
    mv.random_rotate, mv.random_mask = fixed_rotate, fixed_mask
    try:
        conf = ModelConfig.from_namespace(hparams)
        model = SwinUnetR(conf)
        x = jnp.zeros((1, *SIZE, 1), jnp.float32)
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)}, x, deterministic=True)
        variables, report = import_state_dict(sd0, variables, conf)
        assert not report["unmatched_torch_keys"], \
            report["unmatched_torch_keys"]

        trainer = mv.MultiViewTrainer(
            hparams, SwinUnetR, _ListLoader(batches), _ListLoader([]),
            _null_logger(), _CaptureWriter())
        labels = partition.trainable_labels(trainer.model_conf)
        trainable, _ = partition.split_params(variables["params"], labels)
        tx, _ = trainer.configure_optimizers(trainable)
        ckpt_path = pathlib.Path(workdir) / "phase1.ckpt"
        save_checkpoint(ckpt_path, 0, variables, tx.init(trainable),
                        {"step": 0})
        hparams.load_ckpt_backbone = True
        hparams.load_ckpt_backbone_path = str(ckpt_path)
        hparams.max_epochs_multi_view = epochs
        hparams.save_ckpt_backbone = False
        hparams.view = False
        hparams.mesh_data = 0
        hparams.summary_dir = str(workdir)
        writer = _CaptureWriter()
        trainer = mv.MultiViewTrainer(
            hparams, SwinUnetR, _ListLoader(batches), _ListLoader([]),
            _null_logger(), writer)
        trainer.train()
    finally:
        mv.random_rotate, mv.random_mask = orig_rotate, orig_mask
    losses = {n: writer.scalars[f"train_loss/{n}"]
              for n in ("rec", "rot", "con", "tot")}
    return losses, trainer.final_state, variables


# ===================================================================
# Phase 2 (StudentsTeacher)
# ===================================================================

def _coord_grid(shape):
    """Volume-centered voxel coordinate grid, [H, W, D, 3] (reference
    transforms.py:337-344 semantics)."""
    axes = [np.arange(s, dtype=np.float32) - (s - 1) / 2.0 for s in shape]
    return np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1)


def make_phase2_batches(crop_sizes, n_batches=1):
    """Teacher volume + centered coord grid; students are center crops of
    the SAME volume with the matching coord slices (shared frame, like
    the reference's CopyItemsd + RandSpatialCropd pipeline)."""
    rng = np.random.default_rng(23)
    grid = _coord_grid(SIZE)
    batches = []
    for _ in range(n_batches):
        img = rng.normal(0.3, 0.2, (BATCH, *SIZE, 1)).astype(np.float32)
        batch = {
            "image": img,
            "coord": np.broadcast_to(grid, (BATCH, *SIZE, 3)).copy(),
        }
        for i, cs in enumerate(crop_sizes):
            starts = [(full - c) // 2 for full, c in zip(SIZE, cs)]
            sl = tuple(slice(s, s + c) for s, c in zip(starts, cs))
            batch[f"image_st_{i}"] = img[(slice(None), *sl)].copy()
            batch[f"coord_st_{i}"] = np.broadcast_to(
                grid[sl], (BATCH, *cs, 3)).copy()
        batches.append(batch)
    return batches


def reference_phase2(hparams, batches, epochs):
    import torch
    RefSwinUnetR, RefMomentum, ref_losses = _ref_modules()
    torch.manual_seed(0)
    model = RefMomentum(hparams, RefSwinUnetR)
    sd0_s = {k: v.detach().clone().numpy()
             for k, v in model.net_student.state_dict().items()}
    sd0_t = {k: v.detach().clone().numpy()
             for k, v in model.net_teacher.state_dict().items()}

    # Decoder-mode param groups (students_teacher.py:43-61).
    param_groups = [{
        "params": [p for _, p in
                   model.net_student.named_parameters_decoder()],
        "lr": float(hparams.lr_students_teacher),
        "weight_decay": float(hparams.weight_decay_students_teacher),
    }]
    if hparams.use_decoder_prompting:
        param_groups.append({
            "params": [p for _, p in model.net_student.
                       named_parameters_prompt_tokens_decoder()],
            "lr": float(hparams.lr_prompt_tokens),
            "weight_decay": float(hparams.weight_decay_prompt_tokens),
        })
    optimizer = torch.optim.AdamW(
        params=param_groups, lr=float(hparams.lr_students_teacher),
        weight_decay=float(hparams.weight_decay_students_teacher))
    scheduler = torch.optim.lr_scheduler.LambdaLR(
        optimizer, _warmup_cosine_lambda(
            hparams.warmup_steps_students_teacher,
            hparams.t_total_students_teacher))
    prt_loss_fn = ref_losses.ClusteredPrototypeLoss(
        reduction_factor=hparams.reduction_factor,
        fwhm=hparams.fwhm, k_means_iterations=hparams.k_means_iterations)
    n_students = len(hparams.crop_size_students)

    def to_t(a):  # channels-last numpy -> channel-first torch
        return torch.from_numpy(
            np.transpose(a, (0, 4, 1, 2, 3))).contiguous()

    losses = []
    for _ in range(0, epochs + 1):
        model.train()
        for batch in batches:
            x_tch, coord_tch = to_t(batch["image"]), to_t(batch["coord"])
            x_sts = [to_t(batch[f"image_st_{i}"]) for i in range(n_students)]
            coord_sts = [to_t(batch[f"coord_st_{i}"])
                         for i in range(n_students)]
            model.update_teacher()                 # EMA FIRST (ref :158-159)
            out_sts, out_tch = model(x_sts, x_tch)
            total = prt_loss_fn(
                emb_s=[o["latent_outputs"] for o in out_sts],
                emb_t=out_tch["latent_outputs"],
                coord_s=coord_sts, coord_t=coord_tch)
            optimizer.zero_grad()
            total.backward()
            optimizer.step()
            scheduler.step()
            losses.append(float(total.detach()))
    sd1_s = {k: v.detach().clone().numpy()
             for k, v in model.net_student.state_dict().items()}
    sd1_t = {k: v.detach().clone().numpy()
             for k, v in model.net_teacher.state_dict().items()}
    return (sd0_s, sd0_t), losses, (sd1_s, sd1_t)


def ours_phase2(hparams, sd0_s, sd0_t, batches, epochs, workdir):
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "float32")
    import jax.numpy as jnp

    from medical_image_segmentation_with_visual_prompts_tpu.models import (
        ModelConfig, SwinUnetR, partition)
    from medical_image_segmentation_with_visual_prompts_tpu.train. \
        students_teacher import StudentsTeacherTrainer
    from medical_image_segmentation_with_visual_prompts_tpu.utils. \
        checkpoint import save_checkpoint
    from medical_image_segmentation_with_visual_prompts_tpu.utils. \
        torch_import import import_state_dict

    conf = ModelConfig.from_namespace(hparams)
    model = SwinUnetR(conf)
    x = jnp.zeros((1, *SIZE, 1), jnp.float32)
    var_s = model.init({"params": jax.random.PRNGKey(0),
                        "dropout": jax.random.PRNGKey(1)}, x,
                       deterministic=True)
    var_s, report = import_state_dict(sd0_s, var_s, conf)
    assert not report["unmatched_torch_keys"], report["unmatched_torch_keys"]
    var_t = model.init({"params": jax.random.PRNGKey(2),
                        "dropout": jax.random.PRNGKey(3)}, x,
                       deterministic=True)
    var_t, report = import_state_dict(sd0_t, var_t, conf)
    assert not report["unmatched_torch_keys"], report["unmatched_torch_keys"]

    trainer = StudentsTeacherTrainer(
        hparams, SwinUnetR, _ListLoader(batches), _ListLoader([]),
        _null_logger(), _CaptureWriter())
    labels = partition.trainable_labels(trainer.model_conf)
    trainable, _ = partition.split_params(var_s["params"], labels)
    tx, _ = trainer.configure_optimizers(trainable)
    ckpt_path = pathlib.Path(workdir) / "phase2.ckpt"
    save_checkpoint(ckpt_path, 0, var_s, tx.init(trainable), {"step": 0},
                    teacher_state=var_t)
    hparams.load_ckpt_backbone = True
    hparams.load_ckpt_backbone_path = str(ckpt_path)
    hparams.max_epochs_students_teacher = epochs
    hparams.save_ckpt_backbone = False
    hparams.view = False
    hparams.mesh_data = 0
    hparams.summary_dir = str(workdir)
    writer = _CaptureWriter()
    trainer = StudentsTeacherTrainer(
        hparams, SwinUnetR, _ListLoader(batches), _ListLoader([]),
        _null_logger(), writer)
    trainer.train()
    return (writer.scalars["train_loss/tot"], trainer.final_state,
            trainer.final_teacher, var_s)


# ===================================================================
# Comparison
# ===================================================================

def _bn_bookkeeping(k):
    return "running_" in k or "batches_tracked" in k


def compare(tag, ref_losses, our_losses, sd0, sd1, our_final, hparams,
            tol_loss, tol_param, check_frozen=True):
    """Loss-trajectory + final-state comparison (same contract as
    tools/train_parity_vs_reference.py)."""
    from medical_image_segmentation_with_visual_prompts_tpu.models import \
        ModelConfig
    from medical_image_segmentation_with_visual_prompts_tpu.utils. \
        torch_export import export_state_dict
    ok = True
    if len(our_losses) != len(ref_losses):
        print(f"[{tag}] step-count mismatch: ours {len(our_losses)} vs "
              f"reference {len(ref_losses)}")
        ok = False
    drift = 0.0
    for i, (r, o) in enumerate(zip(ref_losses, our_losses)):
        rel = abs(r - o) / max(abs(r), 1e-8)
        drift = max(drift, rel)
        status = "" if rel < tol_loss else "  <-- FAIL"
        print(f"[{tag}] step {i:3d}: ref {r:.6f}  ours {o:.6f}  "
              f"rel {rel:.2e}{status}")
        ok = ok and rel < tol_loss

    conf = ModelConfig.from_namespace(hparams)
    our_sd1 = export_state_dict(
        {"params": our_final["params"],
         "batch_stats": our_final.get("batch_stats", {})}, conf)
    trained_keys = [k for k in sd1
                    if not _bn_bookkeeping(k)
                    and not np.allclose(sd1[k], sd0[k], atol=0.0)]
    print(f"[{tag}] reference trained {len(trained_keys)} tensors "
          f"(of {len(sd1)})")
    worst = 0.0
    for k in sorted(sd1):
        if k not in our_sd1 or _bn_bookkeeping(k):
            continue
        err = float(np.max(np.abs(np.asarray(our_sd1[k], np.float64)
                                  - np.asarray(sd1[k], np.float64))))
        if k in trained_keys:
            worst = max(worst, err)
            if err >= tol_param:
                print(f"[{tag}]   trained param {k}: max|dlt| {err:.3e}"
                      "  <-- FAIL")
                ok = False
        elif check_frozen and err != 0.0:
            print(f"[{tag}]   frozen param {k} drifted: max|dlt| {err:.3e}"
                  "  <-- FAIL")
            ok = False
    print(f"[{tag}] max loss drift {drift:.2e}; worst trained-param "
          f"|dlt| {worst:.3e}")
    return ok


def run_phase1(args):
    cfg = pathlib.Path(__file__).resolve().parents[1] / args.configs
    hparams = build_hparams(cfg, "self_supervised_learning_encoder", SIZE)
    hparams.roi_size = list(SIZE)
    # ContrastivePairLoss bs must equal the actual batch (ref
    # multi_view.py:39-41 computes it from these two).
    hparams.batch_size_multi_view = BATCH
    hparams.num_samples_multi_view = 1
    masks = make_masks(hparams.masking_ratio)
    batches = make_phase1_batches()
    sd0, ref_losses, sd1 = reference_phase1(hparams, batches, args.epochs,
                                            masks)
    with tempfile.TemporaryDirectory() as workdir:
        our_losses, final_state, _ = ours_phase1(
            hparams, sd0, batches, args.epochs, masks, workdir)
    ok = True
    for name in ("rec", "rot", "con"):
        ok &= _compare_losses_only(f"phase1/{name}", ref_losses[name],
                                   our_losses[name], args.tol_loss)
    ok &= compare("phase1", ref_losses["tot"], our_losses["tot"], sd0, sd1,
                  final_state, hparams, args.tol_loss, args.tol_param)
    return ok


def _compare_losses_only(tag, ref_losses, our_losses, tol_loss):
    ok = len(ref_losses) == len(our_losses)
    for i, (r, o) in enumerate(zip(ref_losses, our_losses)):
        rel = abs(r - o) / max(abs(r), 1e-8)
        status = "" if rel < tol_loss else "  <-- FAIL"
        print(f"[{tag}] step {i:3d}: ref {r:.6f}  ours {o:.6f}  "
              f"rel {rel:.2e}{status}")
        ok = ok and rel < tol_loss
    return ok


def run_phase2(args):
    cfg = pathlib.Path(__file__).resolve().parents[1] / args.configs
    hparams = build_hparams(cfg, "self_supervised_learning_decoder", SIZE)
    hparams.roi_size = list(SIZE)
    # reduction_factor=1 => student jitter randint(0, 1) == 0 on both
    # sides: the only phase-2 stochasticity, neutralized by config.
    hparams.reduction_factor = 1.0
    batches = make_phase2_batches(hparams.crop_size_students)
    (sd0_s, sd0_t), ref_losses, (sd1_s, sd1_t) = reference_phase2(
        hparams, batches, args.epochs)
    with tempfile.TemporaryDirectory() as workdir:
        our_losses, final_state, final_teacher, _ = ours_phase2(
            hparams, sd0_s, sd0_t, batches, args.epochs, workdir)
    ok = compare("phase2/student", ref_losses, our_losses, sd0_s, sd1_s,
                 final_state, hparams, args.tol_loss, args.tol_param)
    # Teacher: every param is an EMA blend (tau + EMA-first ordering);
    # compare all non-BN tensors with the trained-param tolerance.
    ok &= compare("phase2/teacher", [], [], sd0_t, sd1_t, final_teacher,
                  hparams, args.tol_loss, args.tol_param,
                  check_frozen=False)
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="configurations/tiny_cpu.yml")
    ap.add_argument("--phase", default="both", choices=["1", "2", "both"])
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--tol-loss", type=float, default=5e-3)
    ap.add_argument("--tol-param", type=float, default=5e-3)
    args = ap.parse_args()
    ok = True
    if args.phase in ("1", "both"):
        ok &= run_phase1(args)
    if args.phase in ("2", "both"):
        ok &= run_phase2(args)
    print("TRAIN PARITY (phases): " + ("PASS" if ok else "FAIL"))
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
