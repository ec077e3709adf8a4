"""Docs-vs-perf-log drift guard (VERDICT r3 item 8).

The repo front page (README.md) and docs/ARCHITECTURE.md once lagged the
device-measured headline in docs/PERF.md.  docs/HEADLINE.json is now the
single machine-readable source of truth: whenever a new device headline
is recorded in PERF.md, HEADLINE.json is updated and these tests force
README/ARCHITECTURE to quote the same numbers.
"""

import json
import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _headline():
    return json.loads((REPO / "docs" / "HEADLINE.json").read_text())


def test_headline_json_matches_perf_log():
    """HEADLINE.json itself must match a device row recorded in PERF.md."""
    h = _headline()
    perf = (REPO / "docs" / "PERF.md").read_text()
    values = [float(m) for m in re.findall(r"(\d+\.\d+)\s*vol(?:umes)?/s", perf)]
    assert values, "PERF.md has no vol/s rows?"
    assert any(abs(round(v, 2) - h["volumes_per_sec"]) < 1e-9 for v in values), (
        f"HEADLINE.json says {h['volumes_per_sec']} vol/s but no PERF.md "
        f"device row rounds to it (rows: {sorted(set(values))})"
    )


def test_readme_quotes_headline():
    h = _headline()
    readme = (REPO / "README.md").read_text()
    expect = f"{h['volumes_per_sec']:.2f} volumes/sec/chip"
    assert expect in readme, f"README.md headline != HEADLINE.json ({expect})"
    assert f"{h['vs_baseline']:.2f}x" in readme
    assert f"MFU {h['mfu_pct']:.2f}%" in readme
    assert f"{h['phase2_step_ms']:g} ms" in readme


def test_headline_band_is_honest():
    """VERDICT r4 weak #5: a drift guard that pins only the flattering
    record is half a guard.  HEADLINE.json must carry the session band
    and the latest driver capture, and README must quote BOTH the
    record and the driver-comparable number next to the band."""
    h = _headline()
    assert h.get("session_band_pct", 0) >= 5
    drv = h["last_driver_bench"]
    readme = (REPO / "README.md").read_text()
    assert f"±{h['session_band_pct']:g}%" in readme
    assert f"{drv['volumes_per_sec']:g}" in readme
    # The parity-grid number makes record vs driver comparable when the
    # headline grid differs from the driver's last capture.
    assert f"{h['stride05_parity_grid_volumes_per_sec']:g}" in readme


def test_architecture_quotes_headline():
    h = _headline()
    arch = (REPO / "docs" / "ARCHITECTURE.md").read_text()
    assert f"{h['volumes_per_sec']:.2f} vol/s/chip" in arch
    assert f"{h['ms_per_volume']:.2f} ms/volume" in arch
    assert f"MFU {h['mfu_pct']:.2f}%" in arch
