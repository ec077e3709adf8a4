"""Reference (PyTorch) checkpoint importer.

Maps a reference ``SwinUnetR.state_dict()`` (torch naming fully specified
at /root/reference/src/modules/swin_unetr/swin_unetr.py:146-431 and
relative_positional_encoding.py:21-97) onto this framework's flax
variables tree, converting layouts:

* Conv3d weight ``[Cout, Cin, kh, kw, kd]`` -> HWDIO ``[kh,kw,kd,Cin,Cout]``
* ConvTranspose3d ``[Cin, Cout, k...]`` -> flax transposed-conv HWDIO
* Linear ``[out, in]`` -> ``[in, out]``
* BatchNorm weight/bias/running_mean/running_var ->
  params.scale/params.bias + batch_stats.mean/batch_stats.var
* per-prompt ``pe.enc_token.{k}`` ParameterList entries -> stacked
  ``pe/enc_token [max_prompts, T, E]``

CLI (one command per VERDICT item 5):
    python -m medical_image_segmentation_with_visual_prompts_tpu.utils.\
torch_import <reference.pt> <out.ckpt> --configs <yml>
produces a loadable backbone/prompt checkpoint in this framework's
msgpack schema (utils/checkpoint.py).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _conv_w(a):        # [Cout, Cin, kh, kw, kd] -> [kh, kw, kd, Cin, Cout]
    return np.transpose(a, (2, 3, 4, 1, 0))


def _convT_w(a):
    """[Cin, Cout, kh, kw, kd] -> flax ConvTranspose HWDIO.  flax applies
    the kernel spatially MIRRORED relative to torch's conv_transpose3d
    (verified numerically) — flip the spatial axes."""
    return np.transpose(a, (2, 3, 4, 0, 1))[::-1, ::-1, ::-1].copy()


def _lin_w(a):         # [out, in] -> [in, out]
    return np.transpose(a, (1, 0))


def _ident(a):
    return a


def _swin_block_rules(prefix: str, ours: str, max_prompts: int):
    """Key rules for one SwinTransformerBlock (reference swin_block.py
    :98-143; attention window_attention.py:27-37; PE
    relative_positional_encoding.py:21-97)."""
    rules = {
        f"{prefix}.attn_norm.weight": ("params", f"{ours}/attn_norm/scale",
                                       _ident),
        f"{prefix}.attn_norm.bias": ("params", f"{ours}/attn_norm/bias",
                                     _ident),
        f"{prefix}.attn.to_q.weight": ("params", f"{ours}/attn/to_q_kernel",
                                       _lin_w),
        f"{prefix}.attn.to_k.weight": ("params", f"{ours}/attn/to_k_kernel",
                                       _lin_w),
        f"{prefix}.attn.to_v.weight": ("params", f"{ours}/attn/to_v_kernel",
                                       _lin_w),
        f"{prefix}.attn.proj.weight": ("params", f"{ours}/attn/proj/kernel",
                                       _lin_w),
        f"{prefix}.attn.proj.bias": ("params", f"{ours}/attn/proj/bias",
                                     _ident),
        f"{prefix}.mlp_norm.weight": ("params", f"{ours}/mlp_norm/scale",
                                      _ident),
        f"{prefix}.mlp_norm.bias": ("params", f"{ours}/mlp_norm/bias",
                                    _ident),
        f"{prefix}.mlp.weight": ("params", f"{ours}/mlp/kernel", _lin_w),
        f"{prefix}.mlp.bias": ("params", f"{ours}/mlp/bias", _ident),
    }
    for axis in "hwd":
        rules[f"{prefix}.pe.enc_content_{axis}"] = (
            "params", f"{ours}/pe/enc_content_{axis}", _ident)
        rules[f"{prefix}.pe.weights_content_{axis}"] = (
            "params", f"{ours}/pe/weights_content_{axis}", _ident)
        # relative_dist_* are constant buffers — recomputed, not imported.
        rules[f"{prefix}.pe.relative_dist_{axis}"] = None
    rules[f"{prefix}.pe.weights_token"] = (
        "params", f"{ours}/pe/weights_token", _ident)
    for k in range(max_prompts):
        rules[f"{prefix}.pe.enc_token.{k}"] = (
            "params", f"{ours}/pe/enc_token", ("stack", k))
    return rules


def _batchnorm_rules(prefix: str, ours: str):
    return {
        f"{prefix}.weight": ("params", f"{ours}/scale", _ident),
        f"{prefix}.bias": ("params", f"{ours}/bias", _ident),
        f"{prefix}.running_mean": ("batch_stats", f"{ours}/mean", _ident),
        f"{prefix}.running_var": ("batch_stats", f"{ours}/var", _ident),
        f"{prefix}.num_batches_tracked": None,
    }


def _conv_rules(prefix: str, ours: str):
    return {
        f"{prefix}.weight": ("params", f"{ours}/Conv_0/kernel", _conv_w),
        f"{prefix}.bias": ("params", f"{ours}/Conv_0/bias", _ident),
    }


def _basic_block_rules(prefix: str, ours: str, res_block: bool):
    """MONAI UnetrBasicBlock -> our UnetrBasicBlock (unet_blocks.py).
    MONAI instance norms are affine=False (no params)."""
    convs = ("conv1", "conv2", "conv3") if res_block else ("conv1", "conv2")
    rules = {}
    for c in convs:
        rules.update({
            f"{prefix}.layer.{c}.conv.weight": (
                "params", f"{ours}/layer/{c}/Conv_0/kernel", _conv_w),
            f"{prefix}.layer.{c}.conv.bias": (
                "params", f"{ours}/layer/{c}/Conv_0/bias", _ident),
        })
    return rules


def build_key_rules(conf) -> Dict[str, Tuple]:
    """torch state_dict key -> (collection, 'a/b/c' path, transform) or
    None (deliberately skipped buffer)."""
    depth = conf.depth_unet
    mode = conf.training_mode
    needs_decoder = mode != "self_supervised_learning_encoder"
    mp = conf.max_prompts
    rules: Dict[str, Tuple] = {}

    # Patch embed (ref :148-158): Sequential(Conv3d, BatchNorm3d).
    rules.update(_conv_rules("input_layer.0", "input_layer_conv"))
    rules.update(_batchnorm_rules("input_layer.1", "input_layer_norm"))

    # Encoder stages (+ PatchMerging).
    for i in range(depth):
        for j in range(2):
            rules.update(_swin_block_rules(
                f"encoder_blocks.{i}.swin_blocks.{j}",
                f"encoder_blocks_{i}/swin_blocks_{j}", mp))
        rules.update({
            f"encoder_blocks.{i}.merge.norm.weight": (
                "params", f"encoder_blocks_{i}/merge/norm/scale", _ident),
            f"encoder_blocks.{i}.merge.norm.bias": (
                "params", f"encoder_blocks_{i}/merge/norm/bias", _ident),
            f"encoder_blocks.{i}.merge.reduction.weight": (
                "params", f"encoder_blocks_{i}/merge/reduction/kernel",
                _lin_w),
        })

    # Prompt tokens (ref :400-431).
    if conf.use_encoder_prompting:
        for i in range(2 * depth):
            rules[f"prompt_tokens.enc.{i}"] = (
                "params", f"prompt_tokens_enc_{i}", _ident)
    if needs_decoder and conf.use_decoder_prompting:
        for i in range(2 * depth):
            rules[f"prompt_tokens.dec.{i}"] = (
                "params", f"prompt_tokens_dec_{i}", _ident)
        if conf.unetr_res_block != "none" and conf.unetr_up_block == "swin":
            for i in range(2):
                rules[f"prompt_tokens.out.{i}"] = (
                    "params", f"prompt_tokens_out_{i}", _ident)

    # Proxy-task heads (encoder-pretrain mode, ref :184-224).
    if mode == "self_supervised_learning_encoder":
        if conf.use_reconstruction or conf.use_mutual_learning:
            # Sequential: [Conv3d, InstanceNorm3d(no params), LeakyReLU,
            # Upsample] x (depth+1), then a final 1x1 Conv3d.
            for i in range(depth + 1):
                rules.update(_conv_rules(
                    f"extra_heads.reconstruction.{4 * i}",
                    f"head_reconstruction/conv_{i}"))
            rules.update(_conv_rules(
                f"extra_heads.reconstruction.{4 * (depth + 1)}",
                "head_reconstruction/conv_out"))
        if conf.use_rotation_prediction:
            rules["extra_heads.rotation_prediction.weight"] = (
                "params", "head_rotation/kernel", _lin_w)
            rules["extra_heads.rotation_prediction.bias"] = (
                "params", "head_rotation/bias", _ident)
        if conf.use_contrastive_learning:
            rules["extra_heads.contrastive_coding.weight"] = (
                "params", "head_contrastive/kernel", _lin_w)
            rules["extra_heads.contrastive_coding.bias"] = (
                "params", "head_contrastive/bias", _ident)

    # Decoder (ref :239-398).
    if needs_decoder:
        if conf.unetr_res_block == "full":
            rules.update(_basic_block_rules("bottleneck", "bottleneck",
                                            conf.basic_block_res))
        else:
            rules.update(_conv_rules("bottleneck", "bottleneck"))
        for i in range(depth + 1):
            if conf.unetr_res_block == "full":
                rules.update(_basic_block_rules(
                    f"residual_blocks.{i}", f"residual_blocks_{i}",
                    conf.basic_block_res))
            elif conf.unetr_res_block == "simple":
                rules.update(_conv_rules(f"residual_blocks.{i}",
                                         f"residual_blocks_{i}"))
        swin_up_prefixes = []
        for i in range(depth):
            swin_up_prefixes.append((f"decoder_blocks.{i}",
                                     f"decoder_blocks_{i}"))
        if conf.unetr_res_block != "none":
            swin_up_prefixes.append(("output_layer", "output_layer"))
        for tprefix, oprefix in swin_up_prefixes:
            if conf.unetr_up_block == "swin":
                rules.update(_batchnorm_rules(f"{tprefix}.norm_concat",
                                              f"{oprefix}/norm_concat"))
                # MONAI Convolution(conv_only) registers the conv as
                # a child named 'conv'.
                rules.update({
                    f"{tprefix}.conv_concat.conv.weight": (
                        "params", f"{oprefix}/conv_concat/Conv_0/kernel",
                        _conv_w),
                    f"{tprefix}.conv_concat.conv.bias": (
                        "params", f"{oprefix}/conv_concat/Conv_0/bias",
                        _ident),
                })
                for j in range(2):
                    rules.update(_swin_block_rules(
                        f"{tprefix}.swin_layer.swin_blocks.{j}",
                        f"{oprefix}/swin_layer/swin_blocks_{j}", mp))
            else:
                rules.update({
                    f"{tprefix}.transp_conv.conv.weight": (
                        "params",
                        f"{oprefix}/transp_conv/ConvTranspose_0/kernel",
                        _convT_w),
                    f"{tprefix}.transp_conv.conv.bias": (
                        "params",
                        f"{oprefix}/transp_conv/ConvTranspose_0/bias",
                        _ident),
                })
                rules.update(_basic_block_rules(
                    f"{tprefix}.conv_block", f"{oprefix}/conv_block",
                    conf.res_block))
        # Segmentation heads: Sequential(BatchNorm3d, Conv3d).
        heads = []
        if mode in ("supervised_learning_decoder", "supervised_learning_all"):
            heads.append(("extra_heads.segmentation", "head_segmentation"))
        if mode == "downstream":
            heads.append(("extra_heads.downstream", "head_downstream"))
        for tprefix, oprefix in heads:
            rules.update(_batchnorm_rules(f"{tprefix}.0", f"{oprefix}/norm"))
            rules.update({
                f"{tprefix}.1.weight": (
                    "params", f"{oprefix}/conv_kernel", _conv_w),
                f"{tprefix}.1.bias": (
                    "params", f"{oprefix}/conv_bias", _ident),
            })
    return rules


def import_state_dict(state_dict: Dict[str, np.ndarray], variables, conf):
    """Map a reference torch state_dict onto a variables tree.

    Args:
      state_dict: {torch key: numpy array} (load .pt via ``load_torch``).
      variables: our model's init variables (shapes/tree to fill).
      conf: ModelConfig (or namespace with the model fields).

    Returns: (new_variables, report) where report lists imported /
      skipped-buffer / unmatched-torch / unfilled-ours keys.
    """
    import jax.numpy as jnp
    from flax import traverse_util

    rules = build_key_rules(conf)
    flat = {c: dict(traverse_util.flatten_dict(variables.get(c, {})))
            for c in ("params", "batch_stats")}
    imported, skipped, unmatched = [], [], []
    filled = set()
    for key, value in state_dict.items():
        rule = rules.get(key, "missing")
        if rule is None:
            skipped.append(key)
            continue
        if rule == "missing":
            unmatched.append(key)
            continue
        coll, path, tf = rule
        tup = tuple(path.split("/"))
        if tup not in flat[coll]:
            raise KeyError(f"importer maps {key} -> {coll}/{path}, which "
                           "does not exist in the model tree")
        value = np.asarray(value)
        if isinstance(tf, tuple) and tf[0] == "stack":
            cur = np.asarray(flat[coll][tup])
            cur = cur.copy()
            cur[tf[1]] = value
            new = cur
        else:
            new = tf(value)
        want = flat[coll][tup]
        if tuple(new.shape) != tuple(want.shape):
            raise ValueError(
                f"{key} -> {coll}/{path}: shape {new.shape} != "
                f"{tuple(want.shape)}")
        flat[coll][tup] = jnp.asarray(new, want.dtype)
        imported.append(key)
        filled.add((coll,) + tup)
    all_ours = {(c,) + k for c in flat for k in flat[c]}
    unfilled = sorted("/".join(k) for k in all_ours - filled)
    out = dict(variables)
    for c in ("params", "batch_stats"):
        if flat[c]:
            out[c] = traverse_util.unflatten_dict(flat[c])
    report = {"imported": imported, "skipped_buffers": skipped,
              "unmatched_torch_keys": unmatched, "unfilled_ours": unfilled}
    return out, report


def load_torch(path) -> Dict[str, np.ndarray]:
    """Load a torch .pt/.pth checkpoint into {key: numpy} (CPU)."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model_state_dict" in obj:
        obj = obj["model_state_dict"]
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in obj.items()}


def main():
    import argparse

    from .backend import configure_backend
    configure_backend()

    import jax

    import yaml

    from ..models import ModelConfig, SwinUnetR
    from .checkpoint import save_checkpoint

    ap = argparse.ArgumentParser(
        description="Convert a reference PyTorch checkpoint to this "
                    "framework's msgpack checkpoint format.")
    ap.add_argument("src", help="reference .pt/.pth checkpoint")
    ap.add_argument("dst", help="output checkpoint directory/file")
    ap.add_argument("--configs", required=True, help="model config YAML")
    ap.add_argument("--training-mode", default=None)
    ap.add_argument("--strict", action="store_true",
                    help="fail when torch keys are unmatched")
    args = ap.parse_args()

    with open(args.configs) as f:
        conf_dict = yaml.safe_load(f)
    if args.training_mode:
        conf_dict["training_mode"] = args.training_mode
    from argparse import Namespace
    conf = ModelConfig.from_namespace(Namespace(**conf_dict))
    model = SwinUnetR(conf)
    import jax.numpy as jnp
    size = tuple(conf_dict.get("roi_size", (64, 64, 8)))
    x = jnp.zeros((1, *size, conf.input_channels))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, deterministic=True)
    sd = load_torch(args.src)
    new_vars, report = import_state_dict(sd, variables, conf)
    print(f"imported {len(report['imported'])} tensors; "
          f"skipped {len(report['skipped_buffers'])} buffers; "
          f"{len(report['unmatched_torch_keys'])} unmatched torch keys; "
          f"{len(report['unfilled_ours'])} params left at init")
    for k in report["unmatched_torch_keys"]:
        print("  unmatched:", k)
    if args.strict and report["unmatched_torch_keys"]:
        raise SystemExit(1)
    save_checkpoint(args.dst, 0,
                    {"params": new_vars["params"],
                     "batch_stats": new_vars.get("batch_stats", {})},
                    None, {"epoch": 0})
    print(f"wrote {args.dst}")


if __name__ == "__main__":
    main()
