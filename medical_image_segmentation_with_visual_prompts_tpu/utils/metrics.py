"""Segmentation metrics: MeanIoU and DiceCoefficient accumulators.

Same accumulation semantics as the reference (/root/reference/src/modules/
utils.py:14-64): argmax over the class channel, per-class running
intersection and union across ``update`` calls, and

* MeanIoU.compute  = mean_c  I_c / (U_c + 1e-6)      with U = |P| + |T| - I
* Dice.compute     = mean_c 2 I_c / (S_c + 1e-6)     with S = |P| + |T|

TPU-first design: the per-class sums are computed in a single jitted,
one-hot matmul-free reduction on device (``seg_stats``); the tiny
``[num_classes]`` vectors are the only host transfer.  ``seg_stats`` is
also usable directly inside a jitted train/eval step for fully on-device
accumulation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("num_classes",))
def seg_stats(preds: jax.Array, target: jax.Array, num_classes: int,
              sample_weights=None):
    """Per-class (intersection, pred_sum, target_sum) sums.

    Args:
      preds: logits ``[B, ..., num_classes]`` (channels-last).
      target: integer labels ``[B, ...]`` or ``[B, ..., 1]``.
      sample_weights: optional ``[B]`` weights (0 for the wrap-around
        padding samples a data-parallel mesh adds to partial batches).

    Returns:
      Three ``[num_classes]`` float32 vectors.
    """
    pred = jnp.argmax(preds, axis=-1)
    target = target.reshape(pred.shape).astype(jnp.int32)
    classes = jnp.arange(num_classes, dtype=jnp.int32)
    pred_onehot = (pred[..., None] == classes).astype(jnp.float32)
    target_onehot = (target[..., None] == classes).astype(jnp.float32)
    per_sample_axes = tuple(range(1, pred.ndim))
    intersection = jnp.sum(pred_onehot * target_onehot,
                           axis=per_sample_axes)          # [B, C]
    pred_sum = jnp.sum(pred_onehot, axis=per_sample_axes)
    target_sum = jnp.sum(target_onehot, axis=per_sample_axes)
    if sample_weights is not None:
        w = sample_weights.astype(jnp.float32)[:, None]
        intersection, pred_sum, target_sum = (
            intersection * w, pred_sum * w, target_sum * w)
    return (jnp.sum(intersection, axis=0), jnp.sum(pred_sum, axis=0),
            jnp.sum(target_sum, axis=0))


class _SegMetric:
    def __init__(self, num_classes: int, threshold: float = 0.5):
        self.num_classes = num_classes
        self.threshold = threshold
        self.reset()

    def reset(self) -> None:
        self.intersection = np.zeros(self.num_classes, dtype=np.float64)
        self.union = np.zeros(self.num_classes, dtype=np.float64)

    def update_stats(self, intersection, pred_sum, target_sum) -> None:
        """Accumulate from precomputed per-class stats (device or host)."""
        raise NotImplementedError

    def update(self, preds, target) -> None:
        i, p, t = seg_stats(jnp.asarray(preds), jnp.asarray(target),
                            self.num_classes)
        self.update_stats(np.asarray(i), np.asarray(p), np.asarray(t))


class MeanIoU(_SegMetric):
    """Reference modules/utils.py:14-38."""

    def update_stats(self, intersection, pred_sum, target_sum) -> None:
        self.intersection += intersection
        self.union += pred_sum + target_sum - intersection

    def compute(self) -> float:
        return float(np.mean(self.intersection / (self.union + 1e-6)))


class DiceCoefficient(_SegMetric):
    """Reference modules/utils.py:41-64."""

    def update_stats(self, intersection, pred_sum, target_sum) -> None:
        self.intersection += intersection
        self.union += pred_sum + target_sum

    def compute(self) -> float:
        return float(np.mean(2.0 * self.intersection / (self.union + 1e-6)))
