"""Cross-platform AOT lowering of the TPU kernel paths.

``jax.export(..., platforms=["tpu"])`` runs the full Pallas→Mosaic
dialect lowering CLIENT-side (no device, no remote-compile tunnel), so
these tests catch unsupported-op/layout mistakes in every flagship
kernel — fused pairs, in-kernel window shift, label masks, in-kernel
dropout, folded convs — long before a real TPU sees the program.  (The
Mosaic→LLO backend compile, e.g. scoped-VMEM pressure, still only
fails on hardware; the bench fallback ladder covers that.)

The kernel code paths are selected at trace time by backend checks;
``wap._FORCE_TPU_PATH`` makes them fire under the CPU test platform
WITHOUT interpret mode.
"""

import jax
import jax.numpy as jnp
from jax import export

from medical_image_segmentation_with_visual_prompts_tpu.ops import (
    window_attention_pallas as wap)


def _export_tpu(fn, *args):
    exp = export.export(jax.jit(fn), platforms=["tpu"])(*args)
    assert len(exp.mlir_module_serialized) > 0
    return exp


def test_flagship_chunk_forward_lowers_for_tpu(monkeypatch):
    """The whole production serving forward (bf16 trunk, pair kernels at
    every stage incl. the fused window shift and label masks, folded
    convs, parity seg head) lowers for TPU."""
    from __graft_entry__ import _flagship_conf
    from medical_image_segmentation_with_visual_prompts_tpu.models import (
        SwinUnetR, prefill_bias_cache)

    monkeypatch.setenv("MIVP_PAIR_KERNEL", "1")  # max-kernel surface
    conf = _flagship_conf(compute_dtype="bfloat16", fold_head_hw=True)
    model = SwinUnetR(conf)
    roi = (128, 128, 8)
    x = jnp.zeros((16, *roi, 1), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x[:1], deterministic=True)
    variables = prefill_bias_cache(model, variables, roi, 1)
    monkeypatch.setattr(wap, "_FORCE_TPU_PATH", True)

    def fwd(xx):
        return model.apply(variables, xx, deterministic=True)["downstream"]

    _export_tpu(fwd, x)


def test_training_pair_with_dropout_lowers_for_tpu(monkeypatch):
    """Forward AND custom_vjp backward of a dropout-carrying pair (the
    canonical training configuration) lower for TPU — covers the
    counter-hash dropout kernels and the jnp backward."""
    from medical_image_segmentation_with_visual_prompts_tpu.models import (
        ConsecutiveSwinBlocks)

    c, heads = 48, 4
    blk = ConsecutiveSwinBlocks(
        hidden_channels=c, num_heads=heads, pos_bias_embed_dim=8,
        max_prompts=1, tokens_per_prompt=4, use_token_params=True,
        window_size=(8, 8, 4), down=False, use_checkpoint=True,
        attn_drop=0.1, proj_drop=0.1, attn_impl="auto", pad_mode="aligned")
    x = jnp.zeros((1, 32, 32, 4, c))
    ps = tuple(jnp.zeros((1, 4, c)) for _ in range(2))
    params = blk.init({"params": jax.random.PRNGKey(0),
                       "dropout": jax.random.PRNGKey(1)}, x, ps)
    monkeypatch.setattr(wap, "_FORCE_TPU_PATH", True)
    monkeypatch.setenv("MIVP_PAIR_KERNEL", "1")
    monkeypatch.setenv("MIVP_MASK_DMA", "0")  # in-kernel label masks

    def loss(pr, xx):
        out = blk.apply(pr, xx, ps, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(2)})
        return jnp.sum(out.astype(jnp.float32) ** 2)

    _export_tpu(jax.grad(loss), params, x)


def test_kernel_bwd_cache_p_lowers_for_tpu(monkeypatch):
    """The MIVP_BWD_CACHE_P opt-in (reuse pass-1 softmax probabilities
    in the backward kernel) lowers for TPU with dropout + masks."""
    from medical_image_segmentation_with_visual_prompts_tpu.models import (
        ConsecutiveSwinBlocks)

    c, heads = 48, 4
    blk = ConsecutiveSwinBlocks(
        hidden_channels=c, num_heads=heads, pos_bias_embed_dim=8,
        max_prompts=1, tokens_per_prompt=4, use_token_params=True,
        window_size=(8, 8, 4), down=False, use_checkpoint=True,
        attn_drop=0.1, proj_drop=0.1, attn_impl="auto", pad_mode="aligned")
    x = jnp.zeros((1, 32, 32, 4, c))
    ps = tuple(jnp.zeros((1, 4, c)) for _ in range(2))
    params = blk.init({"params": jax.random.PRNGKey(0),
                       "dropout": jax.random.PRNGKey(1)}, x, ps)
    monkeypatch.setattr(wap, "_FORCE_TPU_PATH", True)
    monkeypatch.setenv("MIVP_BWD_CACHE_P", "1")

    def loss(pr, xx):
        out = blk.apply(pr, xx, ps, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(2)})
        return jnp.sum(out.astype(jnp.float32) ** 2)

    _export_tpu(jax.grad(loss), params, x)


def test_mask_dma_fallback_lowers_for_tpu(monkeypatch):
    """The MIVP_MASK_DMA ladder tier (materialized-mask DMA instead of
    int32 label operands) also lowers for TPU — it must stay a WORKING
    fallback, not rot behind the default path."""
    from medical_image_segmentation_with_visual_prompts_tpu.models import (
        ConsecutiveSwinBlocks)

    c, heads = 48, 4
    blk = ConsecutiveSwinBlocks(
        hidden_channels=c, num_heads=heads, pos_bias_embed_dim=8,
        max_prompts=1, tokens_per_prompt=4, use_token_params=True,
        window_size=(8, 8, 4), down=False, use_checkpoint=False,
        attn_drop=0.0, proj_drop=0.0, attn_impl="auto", pad_mode="aligned")
    x = jnp.zeros((1, 32, 32, 4, c))
    ps = tuple(jnp.zeros((1, 4, c)) for _ in range(2))
    params = blk.init(jax.random.PRNGKey(0), x, ps)
    monkeypatch.setattr(wap, "_FORCE_TPU_PATH", True)
    monkeypatch.setenv("MIVP_MASK_DMA", "1")
    _export_tpu(lambda xx: blk.apply(params, xx, ps), x)


def test_flagship_train_grad_lowers_for_tpu(monkeypatch):
    """Full-model gradient at the CANONICAL training config (attn/proj
    dropout 0.1, remat on) lowers for TPU — covers the dropout-carrying
    kernels at the stage-1/2 geometries (C=96/192, head-chunked) that
    the single-pair test above does not reach, the exact territory of
    the round-2 VMEM-picker OOMs."""
    from __graft_entry__ import _flagship_conf
    from medical_image_segmentation_with_visual_prompts_tpu.models import (
        SwinUnetR)

    conf = _flagship_conf(attn_drop=0.1, proj_drop=0.1,
                          use_checkpoint=True)
    model = SwinUnetR(conf)
    x = jnp.zeros((1, 128, 128, 8, 1), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, deterministic=True)
    monkeypatch.setattr(wap, "_FORCE_TPU_PATH", True)

    def loss(params, xx):
        out, _ = model.apply(
            {**variables, "params": params}, xx, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"])
        return jnp.sum(out["downstream"].astype(jnp.float32) ** 2)

    _export_tpu(jax.grad(loss), variables["params"], x)


def test_rank8_dilated_window_blockspec_lowers_for_tpu():
    """The BlockSpec-driven dilated-window DMA layout (PERF.md round-3
    design note) lowers for TPU: an 8-D view [B, th, p1, tw, p2, td,
    p3, C] of the feature map with one [1, th, 1, tw, 1, td, 1, C]
    block per window — the pipeline DMA performs the dilated gather
    that window_partition does at trace level today.  Client-side
    viability gate for the g=1 kernel-layout experiment."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, TH, P1, TW, P2, TD, P3, C = 2, 8, 8, 8, 8, 4, 1, 48
    M = TH * TW * TD

    def kernel(x_ref, w_ref, o_ref):
        x = x_ref[0, :, 0, :, 0, :, 0, :].reshape(M, C).astype(jnp.float32)
        w = w_ref[:].astype(jnp.float32)
        y = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, :, 0, :, 0, :, 0, :] = \
            y.reshape(TH, TW, TD, C).astype(o_ref.dtype)

    def run(x, w):
        x8 = x.reshape(B, TH, P1, TW, P2, TD, P3, C)
        idx = lambda b, w1, w2, w3: (b, 0, w1, 0, w2, 0, w3, 0)
        spec = pl.BlockSpec((1, TH, 1, TW, 1, TD, 1, C), idx,
                            memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=(B, P1, P2, P3),
            in_specs=[spec, pl.BlockSpec((C, C), lambda *a: (0, 0),
                                         memory_space=pltpu.VMEM)],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(x8.shape, x.dtype),
        )(x8, w)
        return out.reshape(x.shape)

    x = jnp.zeros((B, TH * P1, TW * P2, TD * P3, C), jnp.bfloat16)
    w = jnp.zeros((C, C), jnp.bfloat16)
    _export_tpu(run, x, w)


def test_bias_fold_flagship_lowers_for_tpu(monkeypatch):
    """The opt-in in-matmul bias fold (ops/bias_fold.py) lowers for TPU
    across the whole flagship forward — guards the lane-extended
    operand layouts and the per-head fma against rot while the default
    stays off."""
    from __graft_entry__ import _flagship_conf
    from medical_image_segmentation_with_visual_prompts_tpu.models import (
        SwinUnetR, prefill_bias_cache)

    monkeypatch.setenv("MIVP_BIAS_FOLD", "1")
    conf = _flagship_conf(compute_dtype="bfloat16")
    model = SwinUnetR(conf)
    roi = (128, 128, 8)
    x = jnp.zeros((4, *roi, 1), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x[:1], deterministic=True)
    variables = prefill_bias_cache(model, variables, roi, 1)
    monkeypatch.setattr(wap, "_FORCE_TPU_PATH", True)

    def fwd(xx):
        return model.apply(variables, xx, deterministic=True)["downstream"]

    _export_tpu(fwd, x)


# (The rank-7 Pallas window-relayout opt-in and its lowering guard were
# removed in round 5: device-measured to land on XLA's same ~77 GB/s
# access-pattern bound with no geometry where it can win — see the
# ARCHITECTURE opt-in audit and docs/PERF.md round 4.)
