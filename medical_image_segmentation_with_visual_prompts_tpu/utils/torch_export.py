"""Reverse checkpoint converter: flax variables -> reference torch naming.

Completes two-way checkpoint interop (``torch_import.py`` is the forward
direction): a model trained in this framework can be handed back to the
PyTorch reference (key naming per
/root/reference/src/modules/swin_unetr/swin_unetr.py:146-431) for
side-by-side evaluation, by inverting the importer's own rules table —
every layout transform there is a lossless transpose/flip.

Not emitted: the reference's ``pe.relative_dist_*`` buffers — derived
constants its ``RelativePE.__init__`` rebuilds from the geometry
(relative_positional_encoding.py:40-62), so the correct values already
sit in any constructed reference model; load the exported dict with
``strict=False`` (the report prints the exact call).  BatchNorm
``num_batches_tracked`` is emitted as 0.

CLI:
    python -m medical_image_segmentation_with_visual_prompts_tpu.utils.\
torch_export <ours.ckpt> <out.pt> --configs <yml>
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from .torch_import import build_key_rules


def _inv_conv_w(a):    # HWDIO [kh, kw, kd, Cin, Cout] -> [Cout, Cin, k...]
    return np.transpose(a, (4, 3, 0, 1, 2))


def _inv_convT_w(a):   # invert torch_import._convT_w (flip, then untranspose)
    return np.transpose(a[::-1, ::-1, ::-1], (3, 4, 0, 1, 2))


_INVERSE = {
    "_ident": lambda a: a,
    "_lin_w": lambda a: np.transpose(a, (1, 0)),
    "_conv_w": _inv_conv_w,
    "_convT_w": _inv_convT_w,
}


def export_state_dict(variables, conf) -> Dict[str, np.ndarray]:
    """Map our variables tree to a reference-named torch state_dict.

    Args:
      variables: the model's variables (``params`` + ``batch_stats``).
      conf: ModelConfig (or namespace with the model fields).

    Returns: {torch key: numpy array}, float32, reference layouts.
    """
    from flax import traverse_util

    rules = build_key_rules(conf)
    flat = {c: dict(traverse_util.flatten_dict(variables.get(c, {})))
            for c in ("params", "batch_stats")}
    out: Dict[str, np.ndarray] = {}
    for key, rule in rules.items():
        if rule is None:
            if key.endswith("num_batches_tracked"):
                out[key] = np.zeros((), np.int64)
            # pe.relative_dist_*: derived buffers, rebuilt by the
            # reference at construction — deliberately not exported.
            continue
        coll, path, tf = rule
        tup = tuple(path.split("/"))
        if tup not in flat[coll]:
            raise KeyError(
                f"exporter maps {key} <- {coll}/{path}, which does not "
                "exist in the variables tree (wrong training_mode/conf?)")
        val = np.asarray(flat[coll][tup], np.float32)
        if isinstance(tf, tuple) and tf[0] == "stack":
            out[key] = np.ascontiguousarray(val[tf[1]])
        else:
            out[key] = np.ascontiguousarray(_INVERSE[tf.__name__](val))
    return out


def main():
    import argparse
    from argparse import Namespace

    from .backend import configure_backend
    configure_backend()

    import jax
    import jax.numpy as jnp
    import yaml

    from ..models import ModelConfig, SwinUnetR
    from .checkpoint import load_checkpoint, restore_like

    ap = argparse.ArgumentParser(
        description="Convert one of this framework's checkpoints to a "
                    "reference-named torch state_dict (.pt).")
    ap.add_argument("src", help="framework .ckpt (msgpack)")
    ap.add_argument("dst", help="output .pt path")
    ap.add_argument("--configs", required=True, help="model config YAML")
    ap.add_argument("--training-mode", default=None)
    args = ap.parse_args()

    with open(args.configs) as f:
        conf_dict = yaml.safe_load(f)
    if args.training_mode:
        conf_dict["training_mode"] = args.training_mode
    conf = ModelConfig.from_namespace(Namespace(**conf_dict))
    model = SwinUnetR(conf)
    size = tuple(conf_dict.get("roi_size", (64, 64, 8)))
    x = jnp.zeros((1, *size, conf.input_channels))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, deterministic=True)
    ckpt = load_checkpoint(args.src)
    variables = restore_like(variables, ckpt["model_state_dict"])

    sd = export_state_dict(variables, conf)
    import torch
    torch.save({"model_state_dict":
                {k: torch.from_numpy(np.array(v))
                 for k, v in sd.items()}}, args.dst)
    print(f"wrote {args.dst}: {len(sd)} tensors; load into the reference "
          "model with model.load_state_dict(sd, strict=False) — the "
          "pe.relative_dist_* buffers are rebuilt by its constructor.")


if __name__ == "__main__":
    main()
