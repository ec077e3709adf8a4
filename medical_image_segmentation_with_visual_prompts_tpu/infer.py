"""Volume inference CLI: segment NIfTI volumes with a trained checkpoint.

A serving entry the reference lacks (its ``test`` mode only reports
window metrics): loads a prompt-token checkpoint, runs device-side
Gaussian-stitched sliding-window inference and writes the label volume
back as NIfTI.

Usage:
  python -m medical_image_segmentation_with_visual_prompts_tpu.infer \
    --configs example_configs.yml \
    --ckpt checkpoints/prompt_tokens/<run>/0300.ckpt \
    --use-encoder-prompting --use-decoder-prompting \
    --input case.nii.gz --output case_seg.nii.gz
"""

from __future__ import annotations

from argparse import ArgumentParser
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .data import save_nifti
from .data.transforms import load_image, scale_intensity_range
from .models import ModelConfig, SwinUnetR
from .parallel import BucketedInference, window_starts
from .utils import get_full_configs, load_checkpoint, restore_like


def segment_volume(conf, variables, volume: np.ndarray,
                   chunk: int = 16) -> np.ndarray:
    """[H, W, D, 1] preprocessed volume -> [H, W, D] int labels."""
    model_conf = ModelConfig.from_namespace(conf)
    model = SwinUnetR(model_conf)

    def apply_fn(batch):
        return model.apply(variables, batch, deterministic=True)["downstream"]

    roi = tuple(conf.roi_size)
    slices, _, _ = window_starts(volume.shape[:3], roi)
    cropped = np.ascontiguousarray(
        volume[slices[0], slices[1], slices[2]])
    # Bucketed: heterogeneous volume shapes share O(#buckets) programs.
    runner = BucketedInference(apply_fn, roi, chunk,
                               conf.output_channels_downstream)
    probs = runner(cropped)
    pred_crop = np.asarray(jnp.argmax(probs, axis=-1)).astype(np.int16)
    # Uncovered border voxels (center-crop margins) stay background 0.
    pred = np.zeros(volume.shape[:3], np.int16)
    pred[slices[0], slices[1], slices[2]] = pred_crop
    return pred


def main():
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parent.parent /
                          ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    parser = ArgumentParser()
    parser.add_argument("--configs", default="example_configs.yml")
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--use-encoder-prompting", action="store_true")
    parser.add_argument("--use-decoder-prompting", action="store_true")
    parser.add_argument("--chunk", type=int, default=16)
    parser.add_argument("--mode", default="fit")
    parser.add_argument("--training-mode", default="downstream")
    parser.add_argument("--backbone", default="swin_unetr")
    parser.add_argument("--run-name", default="infer")
    args = parser.parse_args()
    for flag in ("load_ckpt_backbone", "save_ckpt_backbone",
                 "load_ckpt_prompt_tokens", "save_ckpt_prompt_tokens"):
        setattr(args, flag, False)
        setattr(args, flag + "_path", "")
    conf = get_full_configs(args)
    conf.training_mode = "downstream"

    model_conf = ModelConfig.from_namespace(conf)
    model = SwinUnetR(model_conf)
    x0 = jnp.zeros((1, *conf.roi_size, conf.input_channels))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x0, deterministic=True)
    ckpt = load_checkpoint(Path(args.ckpt))
    variables = restore_like(variables, ckpt["model_state_dict"])
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    volume = scale_intensity_range(load_image(args.input))
    pred = segment_volume(conf, variables, volume, chunk=args.chunk)
    save_nifti(args.output, pred)
    print(f"Wrote {args.output} "
          f"(labels: {sorted(int(v) for v in np.unique(pred))})")


if __name__ == "__main__":
    main()
