"""Max-subtraction-free softmax (ops/fused_block.py::_softmax).

Pins that the fast formulation (a) matches the stabilized softmax to
fp32 rounding through the full fused block (kernel AND jnp reference
change together — one definition), (b) keeps the -1e30 fold/mask bias
columns at exactly zero weight (underflow, no nan/inf), and (c) stays
OFF for dropout-carrying calls (training overflow safety).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_segmentation_with_visual_prompts_tpu.models import (
    ConsecutiveSwinBlocks)
from medical_image_segmentation_with_visual_prompts_tpu.ops import (
    fused_block as fb)
from medical_image_segmentation_with_visual_prompts_tpu.ops import (
    window_attention_pallas as wap)


def _pair(c=8, heads=2, window=(4, 4, 4), drop=0.0):
    return ConsecutiveSwinBlocks(
        hidden_channels=c, num_heads=heads, pos_bias_embed_dim=8,
        max_prompts=1, tokens_per_prompt=3, use_token_params=True,
        window_size=window, down=False, use_checkpoint=False,
        attn_drop=drop, proj_drop=drop, attn_impl="auto",
        pad_mode="aligned")


def _run(monkeypatch, fast: str, shape=(2, 16, 16, 2, 8), drop=0.0,
         key=0, late_div: str = "0"):
    """Fused-block pair forward in interpret mode with the env gates.

    ``late_div`` defaults OFF here so the fast-vs-stable comparison
    isolates the max-subtraction change (late-div moves the bf16
    rounding point and is pinned separately below)."""
    monkeypatch.setattr(wap, "_FORCE_INTERPRET", True)
    monkeypatch.setenv("MIVP_FAST_SOFTMAX", fast)
    monkeypatch.setenv("MIVP_LATE_DIV", late_div)
    blk = _pair(drop=drop)
    x = jax.random.normal(jax.random.PRNGKey(key), shape)
    ps = tuple(
        jnp.broadcast_to(
            jax.random.normal(jax.random.PRNGKey(10 + i), (1, 3, 8)),
            (shape[0], 3, 8))
        for i in range(2))
    variables = blk.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        x, ps)
    det = drop == 0.0
    out = blk.apply(variables, x, ps, deterministic=det,
                    rngs=None if det else {"dropout": jax.random.PRNGKey(3)})
    return np.asarray(out, np.float32)


def test_fast_matches_stable_through_fused_block(monkeypatch):
    # Shifted + depth-folded geometry: exercises the -1e30 dead fold
    # columns and the label-equality mask under both formulations.
    a = _run(monkeypatch, "1")
    b = _run(monkeypatch, "0")
    assert np.all(np.isfinite(a))
    np.testing.assert_allclose(a, b, rtol=0, atol=2e-5)


def test_fast_softmax_unit_matches_jax():
    s = jnp.asarray(np.random.default_rng(0).normal(0, 5, (3, 8, 16)),
                    jnp.float32)
    # dead columns must underflow to exactly zero weight
    s = s.at[..., -2:].set(-1e30)
    fast = fb._softmax(s, True)
    ref = jax.nn.softmax(s, axis=-1)
    assert np.all(np.isfinite(np.asarray(fast)))
    assert float(jnp.max(fast[..., -2:])) == 0.0
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               atol=1e-6)


def test_gated_off_under_dropout():
    assert not fb._fast_softmax_enabled(0.1, 0.0)
    assert not fb._fast_softmax_enabled(0.0, 0.1)
    assert fb._fast_softmax_enabled(0.0, 0.0)


def test_dropout_calls_unaffected_by_gate(monkeypatch):
    # Training-shaped (dropout) calls must produce IDENTICAL outputs
    # whatever the env gate says: the fast path never applies there.
    a = _run(monkeypatch, "1", drop=0.1)
    b = _run(monkeypatch, "0", drop=0.1)
    np.testing.assert_array_equal(a, b)


def test_late_div_matches_normalized(monkeypatch):
    """Late-divide normalization (divide AFTER the PV matmul —
    MIVP_LATE_DIV) agrees with the normalized fast softmax at the bf16
    noise floor: the bf16 cast moves from p to unnormalized exp(s), so
    only the rounding point changes, never the math."""
    a = _run(monkeypatch, "1", late_div="1")
    b = _run(monkeypatch, "1", late_div="0")
    assert np.all(np.isfinite(a))
    err = np.abs(a - b)
    scale = np.abs(b).max()
    assert err.max() <= 2e-2 * scale, (err.max(), scale)


def test_late_div_gated_to_fast():
    assert fb._late_div_enabled(True)
    assert not fb._late_div_enabled(False)


def test_late_div_dropout_calls_unaffected(monkeypatch):
    monkeypatch.setenv("MIVP_LATE_DIV", "1")
    a = _run(monkeypatch, "1", drop=0.1, late_div="1")
    b = _run(monkeypatch, "1", drop=0.1, late_div="0")
    np.testing.assert_array_equal(a, b)
