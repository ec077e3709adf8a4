"""bench.py fallback ladder + MIVP_NO_FUSED_BLOCK escape hatch.

The driver consumes exactly one JSON line from bench.py per round; a
backend/Mosaic regression in the newest kernels must degrade the bench
to a slower-but-working configuration, never crash it.  These tests
drive bench.main() with a stubbed builder to verify the tier fallthrough
and check that the no-fused-block knob produces the same numerics as the
fused path on the real model code.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bench
from medical_image_segmentation_with_visual_prompts_tpu.models import (
    SwinTransformerBlock)
from medical_image_segmentation_with_visual_prompts_tpu.ops import (
    window_attention_pallas as wap)


class _FakeOut:
    def block_until_ready(self):
        return self


def _fake_built():
    conf = object()  # MFU accounting failure is tolerated by design
    starts = np.zeros((8, 3), np.int32)
    return (conf, (128, 128, 8), None, None, starts, 8, _FakeOut)


def _run_main(capsys):
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1, f"expected ONE stdout line, got {out}"
    return json.loads(out[0])


def test_ladder_falls_through_to_working_tier(monkeypatch, capsys):
    calls = []

    def fake_build(attn_impl, fold_head_hw):
        calls.append((attn_impl, fold_head_hw,
                      os.environ.get("MIVP_NO_KERNEL_SHIFT"),
                      os.environ.get("MIVP_NO_FUSED_BLOCK"),
                      os.environ.get("MIVP_MASK_DMA")))
        if len(calls) < 5:  # everything above no-fused-block dies
            raise RuntimeError("mosaic lowering failed")
        return _fake_built()

    monkeypatch.setattr(bench, "_build_run", fake_build)
    monkeypatch.setattr(bench, "_device_preflight", lambda: True)
    monkeypatch.setattr(bench, "REPEATS", 1)
    for var in ("MIVP_NO_FUSED_BLOCK", "MIVP_NO_KERNEL_SHIFT",
                "MIVP_MASK_DMA"):
        monkeypatch.delenv(var, raising=False)
    rec = _run_main(capsys)
    assert rec["metric"] == "sliding_window_volumes_per_sec_per_chip"
    assert rec["value"] > 0
    # Tier 0 = round-3 defaults (mask-DMA ambient, fold off); tier 1
    # swaps to in-kernel masks, tier 2 drops the kernel shift, tier 3
    # both, the winning tier 4 adds no-fused-block.
    assert calls[0][1] is False and calls[0][4] is None
    assert calls[1][4] == "0" and calls[1][2] is None
    assert calls[2][2] == "1" and calls[2][4] is None
    assert calls[3][2] == "1" and calls[3][4] == "0"
    assert calls[4][1] is False
    assert calls[4][2] == "1" and calls[4][3] == "1"
    # The ladder's env mutations must not leak into the process.
    for var in ("MIVP_NO_FUSED_BLOCK", "MIVP_NO_KERNEL_SHIFT",
                "MIVP_MASK_DMA"):
        assert var not in os.environ


def test_ladder_reports_zero_when_everything_fails(monkeypatch, capsys):
    def fake_build(attn_impl, fold_head_hw):
        raise RuntimeError("no device")

    monkeypatch.setattr(bench, "_build_run", fake_build)
    monkeypatch.setattr(bench, "_device_preflight", lambda: True)
    rec = _run_main(capsys)
    assert rec["value"] == 0.0
    assert rec["vs_baseline"] == 0.0


def test_hung_backend_preflight_reports_zero(monkeypatch, capsys):
    """A wedged TPU tunnel hangs jax.devices() instead of raising; the
    subprocess preflight must kill it and emit the zero datapoint."""
    def fake_build(attn_impl, fold_head_hw):  # must never be reached
        raise AssertionError("ladder ran despite failed preflight")

    monkeypatch.setattr(bench, "_build_run", fake_build)
    # A timeout far below interpreter startup makes the probe "hang".
    monkeypatch.setenv("BENCH_PREFLIGHT_TIMEOUT", "0.01")
    rec = _run_main(capsys)
    assert rec["value"] == 0.0


def test_preflight_passes_on_cpu(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert bench._device_preflight() is True


def test_preflight_error_falls_through_to_ladder(monkeypatch):
    """A probe that errors FAST (bad platform, device held elsewhere) is
    not a wedged tunnel: the ladder must get its chance."""
    monkeypatch.setenv("JAX_PLATFORMS", "definitely-not-a-backend")
    assert bench._device_preflight() is True


def test_preflight_skip_knob(monkeypatch):
    monkeypatch.setenv("BENCH_PREFLIGHT_TIMEOUT", "0")
    assert bench._device_preflight() is True
    # Malformed value must not crash the bench (ladder still runs).
    monkeypatch.setenv("BENCH_PREFLIGHT_TIMEOUT", "5m")
    assert bench._device_preflight() is True


def _block(impl, c=8, heads=2, window=(4, 4, 4)):
    return SwinTransformerBlock(
        hidden_channels=c, window_size=window, pos_bias_embed_dim=8,
        num_heads=heads, max_prompts=1, tokens_per_prompt=3,
        use_token_params=True, shift_size=(2, 2, 2), attn_impl=impl,
        pad_mode="aligned")


@pytest.mark.parametrize("shape", [(2, 8, 8, 4, 8),   # masked shift
                                   (2, 8, 8, 2, 8)])  # fold-eligible depth
def test_no_fused_block_knob_matches_xla(monkeypatch, shape):
    """MIVP_NO_FUSED_BLOCK=1 must route through the standalone packed
    kernels (materialized label-derived masks) and reproduce the XLA
    reference — this is the numerics guarantee behind bench tier 2."""
    x = jax.random.normal(jax.random.PRNGKey(0), shape)
    p = jnp.broadcast_to(
        jax.random.normal(jax.random.PRNGKey(1), (1, 3, shape[-1])),
        (shape[0], 3, shape[-1]))
    ref = _block("xla")
    params = ref.init(jax.random.PRNGKey(2), x, p)
    want = ref.apply(params, x, p)

    monkeypatch.setenv("MIVP_NO_FUSED_BLOCK", "1")
    monkeypatch.setattr(wap, "_FORCE_INTERPRET", True)
    got = _block("auto").apply(params, x, p)
    # Tolerance class of the kernel parity suite (fp reassociation in
    # the packed block-diagonal matmuls — see test_pad_folding.py).
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)
