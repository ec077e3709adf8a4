"""Dice, Focal and DiceFocal segmentation losses.

From-scratch JAX equivalents of the MONAI losses the reference imports:

* ``DiceLoss(include_background, to_onehot_y=True, softmax=True)`` —
  students_teacher.py:96-100;
* ``DiceFocalLoss(include_background, to_onehot_y=True, softmax=True,
  gamma=4.0)`` — segmentation.py:44-50.

MONAI semantics implemented: softmax over the class channel, one-hot
target, optional background-channel drop, per-(batch, class) dice over
spatial dims with ``smooth_nr = smooth_dr = 1e-5``, mean reduction;
focal term ``-(1 - p_t)^gamma * log(p_t)`` on softmax probabilities with
mean reduction over all elements; DiceFocal = dice + focal (both
lambdas 1).

Layout: channels-last — ``preds`` are logits ``[B, ..., C]``, ``target``
integer labels ``[B, ..., 1]`` or ``[B, ...]``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _prep(preds: jnp.ndarray, target: jnp.ndarray, include_background: bool):
    num_classes = preds.shape[-1]
    p = jax.nn.softmax(preds, axis=-1)
    if target.shape[-1] == 1 and target.ndim == preds.ndim:
        target = target[..., 0]
    t = jax.nn.one_hot(target.astype(jnp.int32), num_classes)
    if not include_background:
        p = p[..., 1:]
        t = t[..., 1:]
    return p, t


def _wmean_over_batch(per_sample: jnp.ndarray, w) -> jnp.ndarray:
    """Weighted mean of per-sample values ``[B, ...]`` over the batch
    (plain mean when ``w`` is None).  Used to ignore the wrap-around
    padding samples a data-parallel mesh adds to partial batches
    (train/common.py DeviceCtx.stage)."""
    if w is None:
        return jnp.mean(per_sample)
    rest = tuple(range(1, per_sample.ndim))
    per_sample = jnp.mean(per_sample, axis=rest) if rest else per_sample
    w = w.astype(per_sample.dtype)
    return jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1e-8)


def dice_loss(preds: jnp.ndarray, target: jnp.ndarray,
              include_background: bool = True,
              smooth_nr: float = 1e-5, smooth_dr: float = 1e-5,
              sample_weights=None) -> jnp.ndarray:
    p, t = _prep(preds, target, include_background)
    spatial = tuple(range(1, p.ndim - 1))
    intersection = jnp.sum(p * t, axis=spatial)
    denom = jnp.sum(p, axis=spatial) + jnp.sum(t, axis=spatial)
    dice = 1.0 - (2.0 * intersection + smooth_nr) / (denom + smooth_dr)
    return _wmean_over_batch(dice, sample_weights)


def focal_loss(preds: jnp.ndarray, target: jnp.ndarray, gamma: float = 2.0,
               include_background: bool = True,
               sample_weights=None) -> jnp.ndarray:
    p, t = _prep(preds, target, include_background)
    p = jnp.clip(p, 1e-8, 1.0)
    loss = -t * (1.0 - p) ** gamma * jnp.log(p)
    return _wmean_over_batch(loss, sample_weights)


def dice_focal_loss(preds: jnp.ndarray, target: jnp.ndarray,
                    gamma: float = 4.0, include_background: bool = True,
                    lambda_dice: float = 1.0,
                    lambda_focal: float = 1.0,
                    sample_weights=None) -> jnp.ndarray:
    return (lambda_dice * dice_loss(preds, target, include_background,
                                    sample_weights=sample_weights)
            + lambda_focal * focal_loss(preds, target, gamma,
                                        include_background,
                                        sample_weights=sample_weights))
