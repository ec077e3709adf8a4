"""Library-level quickstart: train a step and segment a volume in Python.

The CLI (``mivp-train`` / ``mivp-serve``) wraps exactly these calls —
use this path when embedding the framework in a larger pipeline.
Runs on CPU out of the box:

    JAX_PLATFORMS=cpu python example_scripts/python_api_example.py
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Honor JAX_PLATFORMS + enable the persistent compile cache BEFORE any
# backend init (platform plugins override the env var otherwise).
from medical_image_segmentation_with_visual_prompts_tpu.utils.backend import (
    configure_backend)
configure_backend()

import jax
import numpy as np

from medical_image_segmentation_with_visual_prompts_tpu.data import save_nifti
from medical_image_segmentation_with_visual_prompts_tpu.data.transforms import (
    load_image, scale_intensity_range)
from medical_image_segmentation_with_visual_prompts_tpu.infer import (
    segment_volume)
from medical_image_segmentation_with_visual_prompts_tpu.utils import (
    get_full_configs)
from medical_image_segmentation_with_visual_prompts_tpu.utils.checkpoint import (
    load_checkpoint, restore_like)
from medical_image_segmentation_with_visual_prompts_tpu.models import (
    ModelConfig, SwinUnetR)


def make_conf(tmp: Path):
    """Configs the same way the CLI does: argparse-style namespace merged
    under the YAML file (YAML wins on duplicate keys, as the reference)."""
    from argparse import Namespace
    args = Namespace(
        mode="fit", training_mode="downstream",
        configs="configurations/tiny_cpu.yml",
        backbone="swin_unetr", run_name="api_example",
        use_encoder_prompting=True, use_decoder_prompting=True,
        load_ckpt_backbone=False, load_ckpt_backbone_path="",
        save_ckpt_backbone=False, save_ckpt_backbone_path="",
        load_ckpt_prompt_tokens=False, load_ckpt_prompt_tokens_path="",
        save_ckpt_prompt_tokens=False, save_ckpt_prompt_tokens_path="",
    )
    conf = get_full_configs(args)
    # Point the data dirs at synthetic volumes for the example.
    img, msk = tmp / "img", tmp / "msk"
    img.mkdir(), msk.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        save_nifti(img / f"case{i}.nii.gz",
                   rng.normal(0, 400, size=(96, 96, 8)).astype("float32"))
        save_nifti(msk / f"case{i}.nii.gz",
                   (rng.random((96, 96, 8)) > 0.5).astype("int16"))
    for key in ("image_dir_downstream", "image_dir_test"):
        setattr(conf, key, str(img))
    for key in ("mask_dir_downstream", "mask_dir_test"):
        setattr(conf, key, str(msk))
    return conf


def main():
    tmp = Path(tempfile.mkdtemp())
    conf = make_conf(tmp)

    # --- train: the trainer owns the jitted step, checkpointing, logging
    from medical_image_segmentation_with_visual_prompts_tpu.utils.initialization import (
        setup_fitting)
    conf.save_ckpt_prompt_tokens = True
    conf.save_ckpt_prompt_tokens_path = str(tmp / "prompt.msgpack")
    trainer = setup_fitting(conf)
    trainer.train()

    # --- serve: load the checkpoint into a fresh model and segment
    model = SwinUnetR(ModelConfig.from_namespace(conf))
    import jax.numpy as jnp
    x0 = jnp.zeros((1, *conf.roi_size, conf.input_channels))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x0, deterministic=True)
    ckpt = load_checkpoint(tmp / "prompt.msgpack")
    variables = restore_like(variables, ckpt["model_state_dict"])
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    vol = scale_intensity_range(load_image(str(tmp / "img" / "case0.nii.gz")))
    labels = segment_volume(conf, variables, vol, chunk=4)
    print("label volume:", labels.shape,
          "classes:", sorted(int(v) for v in np.unique(labels)))


if __name__ == "__main__":
    main()
