"""Multi-chip scaling evidence (VERDICT r4 item 4).

Pins, on the virtual CPU mesh, the two properties the scaling
projection in docs/ARCHITECTURE.md rests on:

* the per-device DP train program is INVARIANT in ops/shapes across
  mesh sizes at fixed per-device batch (only collective replica sets
  and batch-mean scalars change) — weak scaling runs the same kernels;
* the train step's communication is exactly the gradient all-reduce
  (bytes constant in mesh size), and the serving step carries no
  collective besides the final logits all-gather.
"""

import numpy as np

from tools.multichip_scaling import (_build, collective_bytes,
                                     normalized_hlo_hash)


def test_train_program_invariant_and_collectives_accounted():
    t2, s2, pbytes = _build(2)
    t4, s4, _ = _build(4)

    # Per-device program: identical op/shape stream across mesh sizes.
    assert normalized_hlo_hash(t2) == normalized_hlo_hash(t4)

    # Train communication: only all-reduce appears, and its payload
    # does not grow with the mesh (DP weak scaling).  The volume
    # exceeds the raw trainable bytes because XLA reduces the
    # position-bias cotangent BEFORE contracting it into the small PE
    # tables — still O(model), never O(batch) or O(mesh).
    c2, c4 = collective_bytes(t2), collective_bytes(t4)
    assert set(c2) == {"all-reduce"} and set(c4) == {"all-reduce"}
    assert c2["all-reduce"]["bytes"] == c4["all-reduce"]["bytes"] > 0
    assert c2["all-reduce"]["bytes"] >= pbytes  # carries all grads

    # Serving: windows are independent — the ONLY collective is the
    # final replicated-logits all-gather, whose payload scales with
    # the global batch.
    sc2, sc4 = collective_bytes(s2), collective_bytes(s4)
    assert set(sc2) == {"all-gather"} and set(sc4) == {"all-gather"}
    assert sc4["all-gather"]["bytes"] == 2 * sc2["all-gather"]["bytes"]


def test_single_device_has_no_collectives():
    t1, s1, _ = _build(1)
    assert collective_bytes(t1) == {}
    assert collective_bytes(s1) == {}
