"""Scoped-VMEM regression tests for the fused-block (g, hb) picker.

Mosaic's per-kernel scoped-VMEM stack is 16M; blowing it is a COMPILE
error that only surfaces on real TPU (the interpret-mode parity tests
never see it, and the remote-compile tunnel makes each discovery a
~10-minute round trip).  These tests pin the picker against the two
geometries that actually OOM'd on v5e during round 2, and sweep every
fused-block geometry the flagship model emits, asserting the picked
(g, hb) keeps the calibrated estimate under the safe limit.
"""

import pytest

from medical_image_segmentation_with_visual_prompts_tpu.ops import (
    fused_block as fb)


# (g, hb, m, n, c, cw, heads, masked, dropout, observed_mib) —
# (g, hb) choices that blew the 16M scoped-vmem stack on v5e during
# round 2 (compiler-reported sizes); the estimate must reject them.
_OOMED = [
    # fused-KV masked stage-0 at g=8/hb=1 (inference, dropout-free).
    # The 17.59M observation predates in-kernel label masking (the
    # kernel then double-buffered full [g, m, n] fp32 mask DMA blocks,
    # charged 2x; labels replace that with one in-kernel fp32 mask
    # temp), so the tightness claim no longer applies — the estimate
    # must still reject this geometry with its post-labels charge.
    (8, 1, 256, 320, 48, 96, 3, True, False, 17.59, False),
    # non-fused folded C=192 at g=8/hb=2 (train step: dropout temps)
    (8, 2, 128, 200, 192, 192, 16, False, True, 17.67, False),
    # non-fused folded C=192 at g=4/hb=4 (train step, second attempt)
    (4, 4, 128, 200, 192, 192, 16, False, True, 18.79, True),
]


@pytest.mark.parametrize("g,hb,m,n,c,cw,heads,masked,drop,observed,tight",
                         _OOMED)
def test_estimate_rejects_observed_ooms(g, hb, m, n, c, cw, heads,
                                        masked, drop, observed, tight):
    est = fb._vmem_estimate(g, hb, m, n, c, cw, heads, masked, drop)
    assert est > fb._SCOPED_VMEM_SAFE
    if tight:
        # the calibration claim: estimate within 10% of the compiler's
        # reported stack size for these geometries
        assert abs(est / 2**20 - observed) / observed < 0.10


def test_picker_avoids_observed_ooms():
    # masked stage-0, fused-KV (bp=1024 windows, 64 mask programs)
    g, hb = fb._pick_g_hb(1024, 64, 3, 256, 320, True, 48, True)
    assert fb._vmem_estimate(
        g, hb, 256, 320, 48, 96, 3, True) <= fb._SCOPED_VMEM_SAFE
    # training-step folded C=192 (bp=8 windows, dropout active)
    g, hb = fb._pick_g_hb(8, None, 16, 128, 200, False, 192, False,
                          with_dropout=True)
    assert fb._vmem_estimate(
        g, hb, 128, 200, 192, 192, 16, False,
        True) <= fb._SCOPED_VMEM_SAFE


def test_known_good_configs_still_accepted():
    # Validated-green configs must keep fitting (perf regression guard):
    # the 12.3 vol/s bench's unmasked fused stage-0 at g=8/hb=1 ...
    assert fb._vmem_estimate(
        8, 1, 256, 264, 48, 96, 3, False) <= fb._SCOPED_VMEM_SAFE
    # ... and the round-2 training campaign's C=192 g=1/hb=8 pick.
    assert fb._vmem_estimate(
        1, 8, 128, 200, 192, 192, 16, False, True) <= fb._SCOPED_VMEM_SAFE


def test_picker_fits_all_flagship_geometries():
    """Sweep (m, n, c, heads, mask) over every window geometry the
    flagship model can emit (all stages, fold modes, token counts,
    window-batch sizes from training bs=1 to inference chunk=16) and
    assert the picked config's estimate stays under the safe limit."""
    # Per-stage (c, heads, window token counts): the canonical roi
    # 128x128x8 / patch 2 / window (8,8,4) gives stage spatials
    # 64x64x4 -> 32x32x2 -> 16x16x2 -> 8x8x2, so the depth-clamped
    # window token count m is 256 at stage 0 and 128 beyond (64/32 for
    # smaller training crops).
    stages = (
        (48, 3, (128, 256)),
        (96, 8, (64, 128, 256)),
        (192, 16, (64, 128)),
        (384, 32, (32, 128)),
    )
    for c, heads, ms in stages:
        cw = 2 * c if 2 * c <= 128 else c
        fused = 2 * c <= 128
        for m in ms:
            for extra in (0, 8, 72):     # fold/token column variants
                n = m + extra
                for masked in (False, True):
                    for drop in (False, True):
                        for bp in (8, 64, 1024, 2048):
                            p = 64 if masked and bp >= 64 else (
                                8 if masked else None)
                            g, hb = fb._pick_g_hb(bp, p, heads, m, n,
                                                  masked, c, fused,
                                                  with_dropout=drop)
                            assert bp % g == 0
                            assert heads % hb == 0
                            est = fb._vmem_estimate(g, hb, m, n, c, cw,
                                                    heads, masked, drop)
                            assert est <= fb._SCOPED_VMEM_SAFE, (
                                (c, heads, m, n, masked, drop, bp, g,
                                 hb, est))


def test_forced_knobs_respected(monkeypatch):
    monkeypatch.setenv("MIVP_FORCE_G", "2")
    g, hb = fb._pick_g_hb(1024, 64, 3, 256, 320, True, 48, True)
    assert g <= 2
