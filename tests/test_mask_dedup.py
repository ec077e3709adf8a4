"""Deduplicated attention-mask DMA (``MIVP_MASK_DEDUP``).

Under mask-DMA the masked fused kernels streamed the group's
``[g, m, n]`` slice of the full per-window equality mask — the largest
per-step HBM read of those kernels (~335 MB per 16-window chunk per
stage-0 instance).  At shifted geometries the mask table has only
``2**n_shifted_axes`` distinct rows (a window either contains the
cyclic wrap boundary on an axis or it doesn't — reference
swin_block.py:312-364 semantics), so ``_label_operands`` now streams
ONE ``[1, m, n]`` class block per grid step, picked by index_map
arithmetic (``_mask_class_plan``).  These tests pin:

* the plan's thresholds/strides/representatives at the flagship
  geometries, and its refusal when groups are class-mixed or the
  labels don't factor;
* BITWISE equality of the deduped path vs the full mask stream vs the
  in-kernel label compare (all three build the same mask VALUES);
* gradients through the custom_vjp with dedupe on;
* client-side Mosaic lowering of the class index_map.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_segmentation_with_visual_prompts_tpu.ops import (
    fused_block as fb)
from medical_image_segmentation_with_visual_prompts_tpu.ops import (
    window_attention_pallas as wap)
from medical_image_segmentation_with_visual_prompts_tpu.ops.windows import (
    get_attn_labels)

STAGE0 = dict(shape=(64, 64, 4), wc=(8, 8, 4), shift=(4, 4, 0),
              grid=(8, 8, 1))


def _labels(n_tokens=0, **kw):
    lab = get_attn_labels(kw["shape"], kw["wc"], kw["shift"], (0,) * 6)
    if n_tokens:
        lab = np.concatenate(
            [lab, np.full((lab.shape[0], n_tokens), -1, np.int32)],
            axis=-1)
    return lab


def test_plan_stage0():
    lab = _labels(n_tokens=64, **STAGE0)
    plan = fb._mask_class_plan(lab, STAGE0["grid"])
    # Both shifted axes split at p - s0 = 4; depth never splits; one
    # representative window per (h-wrap, w-wrap) combination.
    assert plan == ((8, 8, 1), (4, 4, 1), (2, 1, 0), (0, 4, 32, 36))
    # 4 distinct rows out of 64 windows.
    assert np.unique(lab, axis=0).shape[0] == 4


def test_plan_keys_group_uniformity():
    # g=4 destination groups are class-uniform at stage 0; g=8 groups
    # span both w-wrap classes (the dedupe then falls back to the full
    # per-window stream — checked per call site in _label_operands).
    lab = _labels(**STAGE0)
    grid, t, s, _ = fb._mask_class_plan(lab, STAGE0["grid"])
    keys = fb._plan_keys(grid, t, s)
    assert not (keys.reshape(-1, 4) != keys.reshape(-1, 4)[:, :1]).any()
    assert (keys.reshape(-1, 8) != keys.reshape(-1, 8)[:, :1]).any()


def test_plan_rejects_non_factoring_labels():
    lab = _labels(**STAGE0).copy()
    lab[3, :5] = 77  # break the axis-product structure for one window
    assert fb._mask_class_plan(lab, STAGE0["grid"]) is None


def test_plan_rejects_grid_mismatch():
    lab = _labels(**STAGE0)
    assert fb._mask_class_plan(lab, (4, 4, 1)) is None
    assert fb._mask_class_plan(lab, None) is None


def test_plan_single_class_is_eligible():
    # Unshifted-with-pads layouts can collapse to ONE mask row; the
    # dedupe then streams a single constant block.
    lab = np.tile(_labels(**STAGE0)[:1], (64, 1))
    plan = fb._mask_class_plan(lab, STAGE0["grid"])
    assert plan is not None
    _, _, strides, reps = plan
    assert strides == (0, 0, 0) and reps == (0,)


def _block_setup(seed=0):
    rng = np.random.default_rng(seed)
    b, P, m, c, i, heads = 2, 64, 256, 48, 64, 4
    x = jnp.asarray(rng.standard_normal((b, P, m, c)), jnp.float32)
    tokens = jnp.asarray(rng.standard_normal((i, c)), jnp.float32)
    shapes = {"ln1_scale": (c,), "ln1_bias": (c,), "wq": (c, c),
              "wk": (c, c), "wv": (c, c), "wproj": (c, c), "bproj": (c,),
              "ln2_scale": (c,), "ln2_bias": (c,), "wmlp": (c, c),
              "bmlp": (c,)}
    params = {k: jnp.asarray(rng.standard_normal(s), jnp.float32) * 0.05
              for k, s in shapes.items()}
    params["ln1_scale"] = jnp.ones((c,))
    params["ln2_scale"] = jnp.ones((c,))
    bias = jnp.asarray(rng.standard_normal((heads, m, m + i)),
                       jnp.float32) * 0.1
    labels = _labels(n_tokens=i, **STAGE0)
    shift_geom = (STAGE0["grid"], STAGE0["wc"], STAGE0["shift"])
    scale = (c // heads) ** -0.5
    return x, tokens, params, bias, labels, scale, heads, shift_geom


@pytest.fixture
def interpret(monkeypatch):
    monkeypatch.setattr(wap, "_FORCE_INTERPRET", True)


def _run(monkeypatch, dedup, mask_dma="1"):
    monkeypatch.setenv("MIVP_MASK_DMA", mask_dma)
    monkeypatch.setenv("MIVP_MASK_DEDUP", dedup)
    x, tokens, params, bias, labels, scale, heads, sg = _block_setup()
    return fb.fused_swin_block(x, tokens, params, bias, labels, scale,
                               heads, fold_mode=0, shift_geom=sg)


def test_dedup_bitwise_vs_full_stream(monkeypatch, interpret):
    out_dedup = _run(monkeypatch, "1")
    out_full = _run(monkeypatch, "0")
    assert jnp.all(out_dedup == out_full)


def test_dedup_bitwise_vs_in_kernel_labels(monkeypatch, interpret):
    out_dedup = _run(monkeypatch, "1")
    out_lab = _run(monkeypatch, "1", mask_dma="0")
    assert jnp.all(out_dedup == out_lab)


def test_dedup_grads_bitwise(monkeypatch, interpret):
    x, tokens, params, bias, labels, scale, heads, sg = _block_setup()

    def loss(xx, tt):
        return jnp.sum(fb.fused_swin_block(
            xx, tt, params, bias, labels, scale, heads,
            fold_mode=0, shift_geom=sg) ** 2)

    monkeypatch.setenv("MIVP_MASK_DMA", "1")
    monkeypatch.setenv("MIVP_MASK_DEDUP", "1")
    gx1, gt1 = jax.grad(loss, argnums=(0, 1))(x, tokens)
    monkeypatch.setenv("MIVP_MASK_DEDUP", "0")
    gx0, gt0 = jax.grad(loss, argnums=(0, 1))(x, tokens)
    assert jnp.all(gx1 == gx0) and jnp.all(gt1 == gt0)


def test_dedup_lowers_for_tpu(monkeypatch):
    """The class-selecting index_map (where/compare arithmetic) passes
    the client-side Pallas→Mosaic lowering."""
    from jax import export

    monkeypatch.setenv("MIVP_MASK_DMA", "1")
    monkeypatch.setenv("MIVP_MASK_DEDUP", "1")
    monkeypatch.setattr(wap, "_FORCE_TPU_PATH", True)
    x, tokens, params, bias, labels, scale, heads, sg = _block_setup()

    def fwd(xx, tt):
        return fb.fused_swin_block(xx, tt, params, bias, labels, scale,
                                   heads, fold_mode=0, shift_geom=sg)

    exp = export.export(jax.jit(fwd), platforms=["tpu"])(
        jax.ShapeDtypeStruct(x.shape, x.dtype),
        jax.ShapeDtypeStruct(tokens.shape, tokens.dtype))
    assert len(exp.mlir_module_serialized) > 0
