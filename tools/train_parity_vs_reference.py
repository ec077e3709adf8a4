"""Training-DYNAMICS parity vs the live reference implementation.

Forward/eval parity (tools/parity_vs_reference.py) pins the model; this
harness pins the one class of behavior forward parity cannot: the
optimizer/scheduler/freezing semantics in COMBINATION — reference
segmentation.py:25-39 (AdamW over ``named_parameters_downstream()``
only), :155 (StepLR(100, 0.8) stepped per EPOCH), :91-135 (step loop
with ``map_label_indices`` remapping).

Protocol: build the live reference model (MONAI stub), import its
initial weights into our framework (utils/torch_import.py), then run N
epochs x 1 step of the downstream few-shot fit in BOTH frameworks on
IDENTICAL synthetic batches — the reference via a transcription of its
training loop driving the live reference model; ours via the REAL
``SegmentationTrainer.train()`` (real CLI trainer, backbone-checkpoint
load path, jitted train step) — and compare the per-epoch loss
trajectory, the final trainable parameters, and frozen-backbone
invariance.

monai is not installed here, so the reference loss is a torch
transcription of the SAME monai ``DiceFocalLoss(include_background,
to_onehot_y=True, softmax=True, gamma=4.0)`` semantics our JAX loss
implements (losses/dice.py, golden-tested): per-(batch,class) dice with
smooth 1e-5 + mean, focal ``-(1-p)^g log p`` mean over elements.

Usage:
    python tools/train_parity_vs_reference.py [--epochs 8] [--tol 5e-3]

Exits nonzero on FAIL.  Regression-tested by
tests/test_reference_parity.py::test_training_dynamics_parity.
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import tempfile

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from parity_vs_reference import (  # noqa: E402
    _build_reference, build_hparams)

SIZE = (16, 16, 8)
BATCH = 2


def make_batches(n_batches=1):
    """Fixed synthetic (image, mask) batches shared by both frameworks.

    Masks use labels {0, 2} (tiny_cpu.yml active_labels_downstream) so
    the reference's in-place ``map_label_indices`` remap (2 -> 1) is
    exercised."""
    rng = np.random.default_rng(7)
    batches = []
    for _ in range(n_batches):
        img = rng.normal(0.3, 0.2, (BATCH, *SIZE, 1)).astype(np.float32)
        msk = (rng.random((BATCH, *SIZE, 1)) > 0.65).astype(np.float32) * 2.0
        batches.append({"image": img, "mask": msk})
    return batches


def _torch_dice_focal(logits, target, gamma, include_background):
    """torch transcription of monai DiceFocalLoss(to_onehot_y, softmax)
    exactly as losses/dice.py implements it (smooth_nr=smooth_dr=1e-5,
    focal mean over all elements, lambdas 1)."""
    import torch
    import torch.nn.functional as F

    nc = logits.shape[1]
    p = torch.softmax(logits, dim=1)
    t = F.one_hot(target[:, 0].long(), nc).permute(0, 4, 1, 2, 3).float()
    if not include_background:
        p, t = p[:, 1:], t[:, 1:]
    dims = tuple(range(2, p.ndim))
    inter = (p * t).sum(dims)
    denom = p.sum(dims) + t.sum(dims)
    dice = 1.0 - (2.0 * inter + 1e-5) / (denom + 1e-5)
    pc = p.clamp(1e-8, 1.0)
    focal = -(t * (1.0 - pc) ** gamma * torch.log(pc)).mean()
    return dice.mean() + focal


def _torch_map_labels(masks, active):
    """Reference modules/utils.py:372-388 semantics (keep active labels,
    zero others, remap ascending to 0..K-1)."""
    import torch
    active = sorted(active)
    keep = torch.zeros_like(masks, dtype=torch.bool)
    for lbl in active:
        keep |= masks == float(lbl)
    masks = torch.where(keep, masks, torch.zeros_like(masks))
    out = torch.zeros_like(masks)
    for new, lbl in enumerate(active):
        out = torch.where(masks == float(lbl), float(new), out)
    return out


def reference_train(hparams, batches, epochs):
    """Transcription of the reference SegmentationTrainer's train loop
    (segmentation.py:25-39, 91-135, 155) driving the LIVE reference
    model.  Returns (initial state_dict, per-step losses, final
    state_dict)."""
    import torch

    model = _build_reference(hparams)
    sd0 = {k: v.detach().clone().numpy()
           for k, v in model.state_dict().items()}
    params = [p for _, p in model.named_parameters_downstream()]
    optimizer = torch.optim.AdamW(
        params=params, lr=float(hparams.lr_downstream),
        weight_decay=float(hparams.weight_decay_downstream))
    scheduler = torch.optim.lr_scheduler.StepLR(
        optimizer, step_size=100, gamma=0.8)
    losses = []
    for _ in range(0, epochs + 1):          # ref: range(start, max+1)
        model.train()
        for batch in batches:
            x = torch.from_numpy(
                np.transpose(batch["image"], (0, 4, 1, 2, 3))).contiguous()
            m = torch.from_numpy(
                np.transpose(batch["mask"], (0, 4, 1, 2, 3))).contiguous()
            seg_true = _torch_map_labels(
                m, list(hparams.active_labels_downstream))
            out = model(x)
            loss = _torch_dice_focal(out["downstream"], seg_true, 4.0,
                                     hparams.include_background)
            optimizer.zero_grad()
            loss.backward()
            optimizer.step()
            losses.append(float(loss.detach()))
        scheduler.step()                     # per-EPOCH (ref :155)
    sd1 = {k: v.detach().clone().numpy()
           for k, v in model.state_dict().items()}
    return sd0, losses, sd1


class _ListLoader:
    """Minimal loader protocol for the trainer: iteration + .dataset."""

    def __init__(self, batches):
        self.batches = batches
        self.dataset = batches

    def __iter__(self):
        return iter([dict(b) for b in self.batches])


class _CaptureWriter:
    def __init__(self):
        self.scalars = {}

    def add_scalar(self, tag, value, step):
        self.scalars.setdefault(tag, []).append(float(value))

    def close(self):
        pass


def ours_train(hparams, sd0, batches, epochs, workdir):
    """Run the REAL SegmentationTrainer.train() from the imported
    reference weights on the same batches.  Returns (per-epoch seg
    losses, final variables, imported initial variables)."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "float32")
    import jax.numpy as jnp
    import logging

    from medical_image_segmentation_with_visual_prompts_tpu.models import (
        ModelConfig, SwinUnetR)
    from medical_image_segmentation_with_visual_prompts_tpu.train. \
        segmentation import SegmentationTrainer
    from medical_image_segmentation_with_visual_prompts_tpu.utils. \
        checkpoint import save_checkpoint
    from medical_image_segmentation_with_visual_prompts_tpu.utils. \
        torch_import import import_state_dict

    conf = ModelConfig.from_namespace(hparams)
    model = SwinUnetR(conf)
    x = jnp.zeros((1, *SIZE, 1), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, deterministic=True)
    variables, report = import_state_dict(sd0, variables, conf)
    assert not report["unmatched_torch_keys"], report["unmatched_torch_keys"]

    ckpt_path = pathlib.Path(workdir) / "backbone.ckpt"
    save_checkpoint(ckpt_path, 0, variables)
    hparams.load_ckpt_backbone = True
    hparams.load_ckpt_backbone_path = str(ckpt_path)
    hparams.max_epochs_downstream = epochs
    hparams.save_ckpt_prompt_tokens = False
    hparams.load_ckpt_prompt_tokens = False
    hparams.view = False
    hparams.mesh_data = 0
    hparams.summary_dir = str(workdir)

    logger = logging.getLogger("train_parity")
    logger.addHandler(logging.NullHandler())
    logger.propagate = False
    writer = _CaptureWriter()
    trainer = SegmentationTrainer(hparams, SwinUnetR,
                                  _ListLoader(batches), None, logger, writer)
    trainer.train()
    return writer.scalars["train_loss/seg"], trainer.final_state, variables


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="configurations/tiny_cpu.yml")
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--tol-loss", type=float, default=5e-3,
                    help="max relative per-step loss deviation")
    ap.add_argument("--tol-param", type=float, default=5e-3,
                    help="max abs final trainable-param deviation "
                         "(update magnitude is ~lr per step)")
    args = ap.parse_args()

    cfg_dir = pathlib.Path(__file__).resolve().parents[1]
    cfg = cfg_dir / args.configs if not pathlib.Path(
        args.configs).is_absolute() else pathlib.Path(args.configs)
    hparams = build_hparams(cfg, "downstream", SIZE)
    batches = make_batches()

    sd0, ref_losses, sd1 = reference_train(hparams, batches, args.epochs)

    with tempfile.TemporaryDirectory() as workdir:
        our_losses, final_state, init_vars = ours_train(
            hparams, sd0, batches, args.epochs, workdir)

    ok = True
    # 1. Loss trajectory (1 step/epoch: per-epoch mean == per-step loss).
    if len(our_losses) != len(ref_losses):
        print(f"step-count mismatch: ours {len(our_losses)} vs "
              f"reference {len(ref_losses)}")
        ok = False
    drift = 0.0
    for i, (r, o) in enumerate(zip(ref_losses, our_losses)):
        rel = abs(r - o) / max(abs(r), 1e-8)
        drift = max(drift, rel)
        status = "" if rel < args.tol_loss else "  <-- FAIL"
        print(f"step {i:3d}: ref {r:.6f}  ours {o:.6f}  rel {rel:.2e}"
              f"{status}")
        ok = ok and rel < args.tol_loss

    # 2. Final trainable parameters: export-compare the prompt tokens +
    #    downstream head against the reference's trained state_dict.
    from medical_image_segmentation_with_visual_prompts_tpu.models import \
        ModelConfig
    from medical_image_segmentation_with_visual_prompts_tpu.utils. \
        torch_export import export_state_dict
    conf = ModelConfig.from_namespace(hparams)
    our_sd1 = export_state_dict(
        {"params": final_state["params"],
         "batch_stats": final_state["batch_stats"]}, conf)
    def _bn_bookkeeping(k):
        # BN running stats / step counters update on BOTH sides during
        # training (model.train() everywhere in the reference even with
        # frozen bodies); the running stats are covered implicitly by
        # the loss trajectory, the counters aren't exported at all.
        return "running_" in k or "batches_tracked" in k

    trained_keys = [k for k in sd1
                    if not _bn_bookkeeping(k)
                    and not np.allclose(sd1[k], sd0[k], atol=0.0)]
    print(f"reference trained {len(trained_keys)} tensors "
          f"(of {len(sd1)})")
    worst = 0.0
    for k in sorted(sd1):
        if k not in our_sd1 or _bn_bookkeeping(k):
            continue
        err = float(np.max(np.abs(np.asarray(our_sd1[k], np.float64)
                                  - np.asarray(sd1[k], np.float64))))
        if k in trained_keys:
            worst = max(worst, err)
            if err >= args.tol_param:
                print(f"  trained param {k}: max|Δ| {err:.3e}  <-- FAIL")
                ok = False
        else:
            # Frozen params must be BIT-identical to the import in both
            # frameworks (BN bookkeeping already excluded above).
            if err != 0.0:
                print(f"  frozen param {k} drifted: max|Δ| {err:.3e}"
                      "  <-- FAIL")
                ok = False
    print(f"max loss drift {drift:.2e}; worst trained-param |Δ| "
          f"{worst:.3e} over {args.epochs + 1} AdamW steps")
    print("TRAIN PARITY: " + ("PASS" if ok else "FAIL"))
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
