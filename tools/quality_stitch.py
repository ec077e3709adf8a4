"""Stitched-mode quality guard: Dice per serving protocol and stride.

VERDICT r4 items 1 + 6: the Gaussian-stitched serving mode (the mode the
headline bench measures) and its configurable-stride variants need
RECORDED quality numbers against the reference's per-window protocol
(/root/reference/src/modules/segmentation.py:243-280), not assertions.

Protocol: train a tiny downstream model (decoder prompting, frozen
backbone — the reference's few-shot setting) on a strongly separable
synthetic blob task, then evaluate held-out volumes under

* ``per_window``      — the reference protocol: stride roi/2 windows,
  per-window metric accumulation, no stitching;
* ``gaussian@0.5``    — Gaussian-stitched full-volume prediction at the
  same stride-roi/2 grid (the framework serving default);
* ``gaussian@0.75``   — ~2.5-3x fewer windows per volume;
* ``gaussian@1.0``    — non-overlapping grid (fewest windows, heaviest
  center-crop loss).

Dice/IoU are the trainer's own metric accumulators in each mode, so the
numbers are exactly what ``--mode test`` reports.  Output: one JSON
document with per-protocol mean Dice/IoU and deltas vs both guards.

Usage:  python tools/quality_stitch.py [--epochs 8] [--out file.json]
"""

import argparse
import json
import sys
import tempfile
from argparse import Namespace
from pathlib import Path

import jax
import numpy as np

# CPU-only harness: the axon plugin overrides JAX_PLATFORMS env, so the
# config update (before any backend init) is the only reliable force —
# and keeps this off the single TPU chip while device jobs run.
jax.config.update("jax_platforms", "cpu")

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TINY_YML = REPO / "configurations" / "tiny_cpu.yml"


def make_dataset(root: Path, n_train: int = 4, n_test: int = 4,
                 shape=(42, 38, 21), seed: int = 7):
    # Deliberately grid-MISALIGNED dims: the crop-coverage protocols
    # discard border voxels (2-6 per axis at stride 0.5, up to 11 at
    # 0.75), which is exactly what the pad-coverage rows quantify.
    """Separable blob task: bright ellipsoid foreground (label 2) on
    noise, blob centers jittered so borders matter."""
    rng = np.random.default_rng(seed)
    from medical_image_segmentation_with_visual_prompts_tpu.data import \
        save_nifti
    dirs = {}
    for split, n in (("train", n_train), ("test", n_test)):
        img_dir, msk_dir = root / f"{split}_img", root / f"{split}_msk"
        img_dir.mkdir(parents=True), msk_dir.mkdir(parents=True)
        for i in range(n):
            x = rng.normal(0.0, 50.0, shape).astype(np.float32)
            m = np.zeros(shape, np.float32)
            # 2 blobs per volume with DISTINCT labels (so no metric class
            # is ever empty), one biased toward the volume border so
            # stride-induced crop loss is visible in the metric.
            for label, intensity, (clo, chi) in ((2.0, 800.0, (12, 28)),
                                                 (1.0, -700.0, (2, 10))):
                cx, cy = rng.integers(clo, chi, 2)
                cz = rng.integers(6, 14)
                X, Y, Z = np.meshgrid(np.arange(shape[0]),
                                      np.arange(shape[1]),
                                      np.arange(shape[2]), indexing="ij")
                blob = ((X - cx) ** 2 + (Y - cy) ** 2
                        + 4 * (Z - cz) ** 2) < 49
                x[blob] += intensity
                m[blob] = label
            save_nifti(img_dir / f"c{i}.nii.gz", x)
            save_nifti(msk_dir / f"c{i}.nii.gz", m)
        dirs[split] = (img_dir, msk_dir)
    return dirs


def build_conf(mode, training_mode, tmp, dirs, **flags):
    import medical_image_segmentation_with_visual_prompts_tpu.utils.configs \
        as cfg_mod
    from medical_image_segmentation_with_visual_prompts_tpu.utils import \
        get_full_configs
    cfg_mod.DEFAULT_ROOT_LOG_DIR = tmp / "logs"
    cfg_mod.DEFAULT_CKPT_DIR = tmp / "ckpts"
    defaults = dict(
        mode=mode, training_mode=training_mode, configs=str(TINY_YML),
        load_ckpt_backbone=False, load_ckpt_backbone_path="",
        save_ckpt_backbone=False, save_ckpt_backbone_path="",
        load_ckpt_prompt_tokens=False, load_ckpt_prompt_tokens_path="",
        save_ckpt_prompt_tokens=False, save_ckpt_prompt_tokens_path="",
        use_encoder_prompting=False, use_decoder_prompting=True,
        backbone="swin_unetr", run_name="quality")
    defaults.update(flags)
    conf = get_full_configs(Namespace(**defaults))
    conf.training_mode = training_mode
    (timg, tmsk), (eimg, emsk) = dirs["train"], dirs["test"]
    conf.image_dir_downstream = str(timg)
    conf.mask_dir_downstream = str(tmsk)
    conf.image_dir_test = str(eimg)
    conf.mask_dir_test = str(emsk)
    conf.image_dir_pretrain = str(timg)
    conf.image_dir_supervised = str(timg)
    conf.mask_dir_supervised = str(tmsk)
    return conf


def run(epochs: int = 8, seed: int = 7):
    from medical_image_segmentation_with_visual_prompts_tpu import main as cli
    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)
        dirs = make_dataset(tmp / "data", seed=seed)
        conf = build_conf("fit", "downstream", tmp, dirs,
                          save_ckpt_prompt_tokens=True)
        conf.save_ckpt_prompt_tokens_path = tmp / "ckpts" / "pt"
        conf.max_epochs_downstream = epochs
        conf.num_samples_downstream = 8
        cli.setup_fitting(conf).train()
        ckpt = sorted(Path(conf.save_ckpt_prompt_tokens_path)
                      .glob("*.ckpt"))[-1]

        protocols = [("per_window", "none", None, "crop"),
                     ("gaussian@0.5", "gaussian", 0.5, "crop"),
                     ("gaussian@0.75", "gaussian", 0.75, "crop"),
                     ("gaussian@1.0", "gaussian", 1.0, "crop"),
                     ("gaussian@0.5+pad", "gaussian", 0.5, "pad"),
                     ("gaussian@0.75+pad", "gaussian", 0.75, "pad")]
        results = {}
        for name, blending, stride, coverage in protocols:
            conf_t = build_conf("test", "downstream", tmp, dirs,
                                load_ckpt_prompt_tokens=True,
                                load_ckpt_prompt_tokens_path=str(ckpt))
            conf_t.test_blending = blending
            if stride is not None:
                conf_t.test_stride_factor = stride
            conf_t.test_coverage = coverage
            vals = cli.setup_testing(conf_t).test()
            results[name] = {
                "dice_mean": float(np.mean(vals["dcc"])),
                "dice_std": float(np.std(vals["dcc"])),
                "iou_mean": float(np.mean(vals["iou"])),
                "n_volumes": len(vals["dcc"]),
            }
        ref = results["per_window"]["dice_mean"]
        g05 = results["gaussian@0.5"]["dice_mean"]
        for name, r in results.items():
            r["dice_delta_vs_per_window"] = round(r["dice_mean"] - ref, 4)
            r["dice_delta_vs_gaussian05"] = round(r["dice_mean"] - g05, 4)
        return {"config": "tiny_cpu (roi 16x16x8), 42x38x21 volumes, "
                          f"{epochs} epochs, seed {seed}",
                "protocols": results}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    report = run(args.epochs, args.seed)
    text = json.dumps(report, indent=2)
    print(text)
    if args.out:
        Path(args.out).write_text(text)


if __name__ == "__main__":
    main()
