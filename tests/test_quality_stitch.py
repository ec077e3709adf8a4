"""Smoke test of the stitched-mode quality harness (tools/quality_stitch).

The recorded BASELINE.md quality tables come from this harness; this
test keeps it runnable (train → checkpoint → all six evaluation
protocols) at a fast setting.  Absolute Dice at 4 epochs is noise —
only structure and ranges are pinned.
"""

import numpy as np


def test_quality_harness_runs_all_protocols():
    from tools.quality_stitch import run
    report = run(epochs=4, seed=3)
    protos = report["protocols"]
    assert set(protos) == {
        "per_window", "gaussian@0.5", "gaussian@0.75", "gaussian@1.0",
        "gaussian@0.5+pad", "gaussian@0.75+pad"}
    for name, r in protos.items():
        assert 0.0 <= r["dice_mean"] <= 1.0, (name, r)
        assert 0.0 <= r["iou_mean"] <= 1.0
        assert r["n_volumes"] == 4
        assert np.isfinite(r["dice_delta_vs_per_window"])
    assert protos["per_window"]["dice_delta_vs_per_window"] == 0.0
