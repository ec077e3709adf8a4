"""End-to-end composition of the bench tier-0 pipeline (interpret mode).

Component suites pin each kernel feature in isolation; this test runs
the EXACT serving composition bench.py's full tier uses — gaussian
sliding-window scan + host-precomputed blend weights + bias cache +
fused pair kernels (in-kernel shift + label masks) + parity seg head —
on a miniature flagship geometry and checks the stitched logits against
the pure-XLA tier (bench tier 8).  A bug that only appears when the
pieces compose (wrong wacc threading, cache/gate interaction, pair
eligibility inside the scan) fails here and nowhere else.

Mirrors bench.py::_build_run; serving protocol of reference
segmentation.py:229-266 (device-side, stitched).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_segmentation_with_visual_prompts_tpu.models import (
    ModelConfig, SwinUnetR, prefill_bias_cache)
from medical_image_segmentation_with_visual_prompts_tpu.ops import (
    window_attention_pallas as wap)
from medical_image_segmentation_with_visual_prompts_tpu.parallel import (
    gaussian_weight_acc, make_sliding_window_fn, pad_starts, window_starts)

ROI = (32, 32, 8)
VOLUME = (48, 48, 12)   # 2*2*2 = 8 windows at stride roi/2
CHUNK = 4


def _conf(attn_impl, fold_head_hw):
    return ModelConfig(
        training_mode="downstream", input_channels=1, depth_unet=3,
        hidden_channels=(8, 16, 32, 64), input_patch_size=(2, 2, 2),
        unetr_res_block="none", unetr_up_block="swin",
        num_heads_encoder=2, num_heads_decoder=2,
        attn_window_size=(4, 4, 2), pos_bias_embed_dim=8,
        max_prompts=1, tokens_per_prompt_encoder=4,
        tokens_per_prompt_decoder=4, use_encoder_prompting=True,
        use_decoder_prompting=True, output_channels_downstream=2,
        attn_impl=attn_impl, pad_mode="aligned",
        compute_dtype="float32", fold_head_hw=fold_head_hw)


def _stitched(conf, variables, vol_np):
    model = SwinUnetR(conf)
    variables = prefill_bias_cache(model, variables, ROI,
                                   conf.input_channels)

    def apply_fn(batch):
        return model.apply(variables, batch, deterministic=True)["downstream"]

    slices, starts, grid_shape = window_starts(VOLUME, ROI)
    run = make_sliding_window_fn(apply_fn, ROI, CHUNK,
                                 conf.output_channels_downstream,
                                 mode="gaussian", grid_shape=grid_shape)
    v = vol_np[slices[0], slices[1], slices[2]]
    starts_p, n_valid = pad_starts(starts, CHUNK)
    wacc = jnp.asarray(gaussian_weight_acc(starts_p, n_valid, ROI,
                                           v.shape[:3]))
    out = run(jnp.asarray(v), jnp.asarray(starts_p), n_valid, wacc)
    return np.asarray(out)


def test_full_tier_composition_matches_xla(monkeypatch):
    rng = np.random.default_rng(0)
    vol = rng.normal(0.3, 0.2, size=(*VOLUME, 1)).astype(np.float32)

    ref_conf = _conf("xla", fold_head_hw=False)
    model = SwinUnetR(ref_conf)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, *ROI, 1)), deterministic=True)

    want = _stitched(ref_conf, variables, vol)
    assert np.isfinite(want).all()

    # Full tier (round-3 defaults): fused block kernels with the
    # in-kernel window shift + mask-DMA label masks, pair kernel off,
    # head fold off — exactly what `python bench.py` tier 0 runs.
    for gate in ("MIVP_NO_KERNEL_SHIFT", "MIVP_NO_FUSED_BLOCK",
                 "MIVP_MASK_DMA", "MIVP_PAIR_KERNEL",
                 "MIVP_NO_PAIR_KERNEL"):
        monkeypatch.delenv(gate, raising=False)
    monkeypatch.setattr(wap, "_FORCE_INTERPRET", True)
    got = _stitched(_conf("auto", fold_head_hw=False), variables, vol)

    assert got.shape == want.shape
    # bf16 MXU casts inside the kernels; stitching averages (never
    # amplifies) the per-window error.
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
    # The served product is the label map: demand exact agreement on
    # all but a sliver of decision-boundary voxels.
    agree = (got.argmax(-1) == want.argmax(-1)).mean()
    assert agree >= 0.995, f"label agreement {agree:.4f}"


def test_training_grad_composition_within_noise_floor(monkeypatch):
    """Full-model training gradient with the fused pair kernels vs the
    fp32 XLA path, judged against the MEASURED mixed-precision noise
    floor — the training-side analogue of the serving composition test.

    At full-model depth, gradient divergence between two CORRECT
    implementations is dominated by bf16 quantization of the residual
    stream: the control (pure-XLA bf16 vs pure-XLA fp32, no kernels
    anywhere) measures per-leaf rel-L2 up to ~0.24 here.  A fixed
    elementwise tolerance is therefore meaningless; instead the kernel
    path's global divergence from the fp32 reference must not exceed
    the XLA-bf16 control's own divergence (the kernels may not ADD
    gradient error), plus a loose per-leaf bound that still catches
    O(1) composition bugs (wrong shift/mask/dropout stream in a
    backward)."""
    import dataclasses

    conf32 = dataclasses.replace(_conf("xla", fold_head_hw=False),
                                 use_checkpoint=True)
    conf16 = dataclasses.replace(conf32, compute_dtype="bfloat16")
    conf_k = dataclasses.replace(conf16, attn_impl="auto")
    x = jax.random.normal(jax.random.PRNGKey(3), (1, *ROI, 1))
    variables = SwinUnetR(conf32).init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, deterministic=True)

    def grads(conf):
        model = SwinUnetR(conf)

        def f(params):
            out, _ = model.apply(
                {**variables, "params": params}, x, deterministic=True,
                mutable=["batch_stats"])
            o = out["downstream"].astype(jnp.float32)
            return 0.5 * jnp.sum(o * o)

        return jax.tree_util.tree_leaves(jax.grad(f)(variables["params"]))

    ref = grads(conf32)          # fp32 XLA reference
    ctrl = grads(conf16)         # bf16 XLA: the intrinsic noise floor
    monkeypatch.setattr(wap, "_FORCE_INTERPRET", True)
    monkeypatch.setenv("MIVP_PAIR_KERNEL", "1")  # max-kernel surface
    got = grads(conf_k)          # bf16 fused pair kernels

    def gap(a, b):
        num = den = 0.0
        for ga, gb in zip(a, b):
            ga = np.asarray(ga, np.float64)
            gb = np.asarray(gb, np.float64)
            num += float(np.sum((ga - gb) ** 2))
            den += float(np.sum(gb ** 2))
        return np.sqrt(num / den)

    assert all(np.isfinite(np.asarray(g)).all() for g in got)
    floor = gap(ctrl, ref)
    kern = gap(got, ref)
    assert kern <= max(1.5 * floor, 1e-3), (
        f"kernel grad divergence {kern:.4f} vs bf16 noise floor "
        f"{floor:.4f}")
    # O(1) bug guard, per leaf.
    for gw, gg in zip(ref, got):
        gw = np.asarray(gw, np.float64)
        gg = np.asarray(gg, np.float64)
        err = np.linalg.norm(gg - gw)
        assert err <= 0.5 * (np.linalg.norm(gw) + 1e-3)
