"""FLOP accounting and MFU helpers.

``model_flops`` lowers the reference-equivalent forward (XLA attention
path — matches the reference's computation op-for-op) and reads XLA's
analytic HLO cost: the *model* FLOPs, independent of how our kernels
schedule or pad them.  MFU = achieved model-FLOPs/s over the chip's
bf16 peak.
"""

from __future__ import annotations

import jax

# Published bf16 dense peak per chip.
PEAK_TFLOPS = {
    "TPU v5 lite": 197.0,   # v5e
    "TPU v5e": 197.0,
    "TPU v4": 275.0,
    "TPU v6 lite": 918.0,   # v6e / Trillium
}


def chip_peak_tflops(default: float = 197.0) -> float:
    try:
        kind = jax.devices()[0].device_kind
    except Exception:
        return default
    for name, peak in PEAK_TFLOPS.items():
        if kind.startswith(name):
            return peak
    return default


def lowered_flops(fn, *args) -> float:
    """Analytic HLO flop count of ``fn(*args)`` (no device execution
    when the lowering supports it; falls back to compiling)."""
    lowered = jax.jit(fn).lower(*args)
    cost = lowered.cost_analysis()
    if cost is None:  # some backends only cost-analyze post-compile
        cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return float(cost.get("flops", 0.0))
