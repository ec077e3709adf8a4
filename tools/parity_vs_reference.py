"""Full-model forward parity vs the LIVE reference implementation.

Imports the actual reference PyTorch model from /root/reference/src
(read-only; executed for verification, never copied), runs it on a
fixed input, converts its ``state_dict()`` with this framework's
importer (utils/torch_import.py), runs our TPU-native model on the
same input, and compares the outputs — the operational demonstration
behind BASELINE.md's "Dice parity ±0.5" target (the evaluation protocol
of reference segmentation.py:204-300 reduces to this per-window
forward agreement).

The reference imports 4 MONAI symbols (swin_unetr.py:1,
unet_blocks.py:2-3); MONAI is not installed here, so a minimal stub is
registered that implements exactly the code paths the canonical config
exercises (``unetr_res_block: none`` + ``unetr_up_block: swin``):

* ``Convolution(conv_only=True)``  -> nn.Conv3d with same-padding and a
  child named ``conv`` (the state_dict naming the importer maps).
* ``get_act_layer('leakyrelu')``   -> nn.LeakyReLU(0.01) (MONAI/torch
  default slope, mirrored at models/unet_blocks.py).
* ``get_norm_layer('batch', 3, C)``-> nn.BatchNorm3d(C) (eps 1e-5).
* ``UnetrBasicBlock/UnetrUpBlock`` -> raise if instantiated (the
  canonical config never does; ``--strict-stub`` asserts that).

Usage:
    python tools/parity_vs_reference.py \
        [--configs configurations/tiny_cpu.yml] [--size 16 16 8] \
        [--batch 2] [--modes downstream self_supervised_learning_encoder \
        self_supervised_learning_decoder]

Prints one comparison row per output tensor and exits nonzero if any
max|Δ| exceeds --tol (fp32 end-to-end on CPU).
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import types

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

REFERENCE_SRC = "/root/reference/src"


def install_monai_stub():
    """Register a minimal in-process ``monai`` for the reference model."""
    if "monai" in sys.modules:
        return
    import torch.nn as nn

    class Convolution(nn.Sequential):
        def __init__(self, spatial_dims, in_channels, out_channels,
                     strides=1, kernel_size=3, act=None, norm=None,
                     conv_only=False, is_transposed=False, **kw):
            super().__init__()
            assert spatial_dims == 3 and conv_only and not is_transposed, (
                "monai stub only supports the conv_only 3D path the "
                "canonical config uses (reference unet_blocks.py:46-56)")
            ks = tuple(kernel_size) if hasattr(kernel_size, "__len__") \
                else (kernel_size,) * 3
            st = tuple(strides) if hasattr(strides, "__len__") \
                else (strides,) * 3
            pad = tuple((k - 1) // 2 for k in ks)
            self.add_module("conv", nn.Conv3d(
                in_channels, out_channels, ks, stride=st, padding=pad,
                bias=True))

    class _Unused(nn.Module):
        def __init__(self, *a, **k):
            raise NotImplementedError(
                "reference config unexpectedly instantiated a MONAI block "
                "the stub does not implement")

    def get_act_layer(name=None, **kw):
        assert str(name).lower() == "leakyrelu", name
        return nn.LeakyReLU(negative_slope=0.01)

    def get_norm_layer(name=None, spatial_dims=3, channels=None, **kw):
        assert str(name).lower() == "batch" and spatial_dims == 3, name
        return nn.BatchNorm3d(channels)

    monai = types.ModuleType("monai")
    networks = types.ModuleType("monai.networks")
    blocks = types.ModuleType("monai.networks.blocks")
    layers = types.ModuleType("monai.networks.layers")
    layers_utils = types.ModuleType("monai.networks.layers.utils")
    blocks.Convolution = Convolution
    blocks.UnetrBasicBlock = _Unused
    blocks.UnetrUpBlock = _Unused
    layers_utils.get_act_layer = get_act_layer
    layers_utils.get_norm_layer = get_norm_layer
    monai.networks = networks
    networks.blocks = blocks
    networks.layers = layers
    layers.utils = layers_utils
    for name, mod in (("monai", monai), ("monai.networks", networks),
                      ("monai.networks.blocks", blocks),
                      ("monai.networks.layers", layers),
                      ("monai.networks.layers.utils", layers_utils)):
        sys.modules[name] = mod


def build_hparams(configs_path, mode, size):
    import yaml
    with open(configs_path) as f:
        conf = yaml.safe_load(f)
    conf.update(
        training_mode=mode,
        use_encoder_prompting=True,
        use_decoder_prompting=True,
        use_checkpoint=False,       # torch checkpoint is a no-op in eval
        attn_drop=0.0, proj_drop=0.0,
        output_channels_downstream=conf.get("output_channels_downstream", 2),
        output_channels_pretrain=conf.get("output_channels_pretrain", 3),
        seg_input_size=list(size),
    )
    from argparse import Namespace
    return Namespace(**conf)


def _build_reference(hparams):
    """Construct the live reference model (seeded)."""
    install_monai_stub()
    import importlib

    import torch

    # Import the model subpackages WITHOUT executing modules/__init__.py
    # (it pulls in the trainers, which need monai.losses/cv2): register a
    # synthetic parent package whose __path__ points at the reference.
    if "refmodules" not in sys.modules:
        pkg = types.ModuleType("refmodules")
        pkg.__path__ = [REFERENCE_SRC + "/modules"]
        sys.modules["refmodules"] = pkg
    RefSwinUnetR = importlib.import_module(
        "refmodules.swin_unetr").SwinUnetR
    torch.manual_seed(0)
    return RefSwinUnetR(hparams)


def _to_np_tree(v):
    import torch
    if isinstance(v, torch.Tensor):
        return v.detach().numpy()
    if isinstance(v, list):
        return [_to_np_tree(e) for e in v]
    return v


def reference_forward(hparams, x_np, bn_warm_steps=2):
    """Build the reference model, warm its BN running stats, run eval.

    Returns (state_dict as {key: numpy}, {name: numpy output}).
    """
    import torch

    model = _build_reference(hparams)
    x = torch.from_numpy(np.transpose(x_np, (0, 4, 1, 2, 3))).contiguous()
    with torch.no_grad():
        model.train()
        for _ in range(bn_warm_steps):   # populate BN running stats
            model(x)
        model.eval()
        out = model(x)

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return sd, {k: _to_np_tree(v) for k, v in out.items()}


def reference_forward_from_sd(hparams, sd, x_np):
    """EXPORT direction: load a framework-exported state_dict into the
    live reference model (strict=False — its derived ``relative_dist_*``
    buffers are rebuilt at construction) and run the eval forward."""
    import torch

    model = _build_reference(hparams)
    tensors = {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}
    missing, unexpected = model.load_state_dict(tensors, strict=False)
    assert not unexpected, f"reference rejected exported keys: {unexpected}"
    underived = [k for k in missing if "relative_dist" not in k]
    assert not underived, f"export left non-derived keys unset: {underived}"
    x = torch.from_numpy(np.transpose(x_np, (0, 4, 1, 2, 3))).contiguous()
    with torch.no_grad():
        model.eval()
        out = model(x)
    return {k: _to_np_tree(v) for k, v in out.items()}


def ours_forward(hparams, state_dict, x_np):
    """Init our model, import the torch weights (when given), run the
    forward.  ``state_dict=None`` keeps the random flax init — the
    export-direction flow — and returns the variables as the report."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "float32")
    import jax.numpy as jnp
    from medical_image_segmentation_with_visual_prompts_tpu.models import (
        ModelConfig, SwinUnetR)
    from medical_image_segmentation_with_visual_prompts_tpu.utils. \
        torch_import import import_state_dict

    conf = ModelConfig.from_namespace(hparams)
    model = SwinUnetR(conf)
    x = jnp.asarray(x_np)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x[:1], deterministic=True)
    if state_dict is None:
        report = variables
    else:
        variables, report = import_state_dict(state_dict, variables, conf)
    out = model.apply(variables, x, deterministic=True)
    return jax.tree_util.tree_map(np.asarray, out), report


def _to_ours_layout(a):
    """torch [B, C, ...spatial] -> ours [B, ...spatial, C]."""
    if a.ndim == 5:
        return np.transpose(a, (0, 2, 3, 4, 1))
    return a


def compare(ref_out, our_out, mode):
    """Yield (name, ref_arr_in_our_layout, our_arr) comparison pairs."""
    if mode == "downstream":
        yield "downstream", _to_ours_layout(ref_out["downstream"]), \
            our_out["downstream"]
    elif mode == "self_supervised_learning_encoder":
        for k in ("reconstruction", "rotation_prediction",
                  "contrastive_coding"):
            if k in ref_out:
                yield k, _to_ours_layout(np.asarray(ref_out[k])), \
                    np.asarray(our_out[k])
        for i, (r, o) in enumerate(zip(ref_out["out_vit"],
                                       our_out["out_vit"])):
            yield f"out_vit[{i}]", _to_ours_layout(np.asarray(r)), \
                np.asarray(o)
    else:
        yield "latent_outputs", \
            _to_ours_layout(ref_out["latent_outputs"]), \
            our_out["latent_outputs"]


def dice_of_argmax(ref, ours):
    a, b = np.argmax(ref, -1), np.argmax(ours, -1)
    inter = float(((a == 1) & (b == 1)).sum())
    tot = float((a == 1).sum() + (b == 1).sum())
    return 1.0 if tot == 0 else 2.0 * inter / tot


def run_mode_export(args, mode):
    """EXPORT direction: random-init our model, export its variables to
    the reference naming, load them into the live reference model, and
    compare forwards."""
    from medical_image_segmentation_with_visual_prompts_tpu.models import \
        ModelConfig
    from medical_image_segmentation_with_visual_prompts_tpu.utils. \
        torch_export import export_state_dict

    size = tuple(args.size)
    rng = np.random.default_rng(0)
    x_np = rng.normal(0.3, 0.2,
                      size=(args.batch, *size, 1)).astype(np.float32)
    hparams = build_hparams(args.configs, mode, size)
    our_out, variables = ours_forward(hparams, None, x_np)
    sd = export_state_dict(variables, ModelConfig.from_namespace(hparams))
    ref_out = reference_forward_from_sd(hparams, sd, x_np)
    ok = True
    for name, r, o in compare(ref_out, our_out, mode):
        r, o = np.asarray(r, np.float64), np.asarray(o, np.float64)
        if r.shape != o.shape:
            print(f"[export {mode}] {name}: SHAPE {r.shape} vs {o.shape}")
            ok = False
            continue
        err = np.abs(r - o).max()
        scale = max(np.abs(r).max(), 1e-6)
        good = err / scale < args.tol
        print(f"[export {mode}] {name:<20} max|Δ| {err:.3e}  "
              f"rel {err / scale:.3e}" + ("" if good else "  <-- FAIL"))
        ok = ok and good
    print(f"[export {mode}] exported {len(sd)} tensors into the live "
          "reference (strict=False: only derived relative_dist_* missing)")
    return ok


def run_mode(args, mode):
    size = tuple(args.size)
    rng = np.random.default_rng(0)
    x_np = rng.normal(0.3, 0.2,
                      size=(args.batch, *size, 1)).astype(np.float32)
    hparams = build_hparams(args.configs, mode, size)
    sd, ref_out = reference_forward(hparams, x_np)
    our_out, report = ours_forward(hparams, sd, x_np)
    if report["unmatched_torch_keys"]:
        print(f"[{mode}] UNMATCHED torch keys: "
              f"{report['unmatched_torch_keys']}")
        return False
    ok = True
    for name, r, o in compare(ref_out, our_out, mode):
        r, o = np.asarray(r, np.float64), np.asarray(o, np.float64)
        if r.shape != o.shape:
            print(f"[{mode}] {name}: SHAPE {r.shape} vs {o.shape}")
            ok = False
            continue
        err = np.abs(r - o).max()
        scale = max(np.abs(r).max(), 1e-6)
        line = (f"[{mode}] {name:<20} max|Δ| {err:.3e}  "
                f"rel {err / scale:.3e}")
        if name == "downstream":
            line += f"  argmax-Dice {dice_of_argmax(r, o):.4f}"
        good = err / scale < args.tol
        print(line + ("" if good else "  <-- FAIL"))
        ok = ok and good
    print(f"[{mode}] imported {len(report['imported'])} tensors, "
          f"{len(report['unfilled_ours'])} left at init "
          f"(constant buffers/heads of other modes)")
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="configurations/tiny_cpu.yml")
    ap.add_argument("--size", type=int, nargs=3, default=[16, 16, 8])
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--tol", type=float, default=2e-3,
                    help="max relative |Δ| per output tensor (fp32)")
    ap.add_argument("--modes", nargs="+", default=[
        "downstream", "self_supervised_learning_encoder",
        "self_supervised_learning_decoder"])
    ap.add_argument("--direction", choices=["import", "export", "both"],
                    default="both",
                    help="import: reference weights into our model; "
                         "export: our weights into the live reference")
    args = ap.parse_args()
    results = []
    for m in args.modes:
        if args.direction in ("import", "both"):
            results.append(run_mode(args, m))
        if args.direction in ("export", "both"):
            results.append(run_mode_export(args, m))
    ok = all(results)
    print("PARITY: " + ("PASS" if ok else "FAIL"))
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
