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


def dice_loss(preds: jnp.ndarray, target: jnp.ndarray,
              include_background: bool = True,
              smooth_nr: float = 1e-5, smooth_dr: float = 1e-5) -> jnp.ndarray:
    p, t = _prep(preds, target, include_background)
    spatial = tuple(range(1, p.ndim - 1))
    intersection = jnp.sum(p * t, axis=spatial)
    denom = jnp.sum(p, axis=spatial) + jnp.sum(t, axis=spatial)
    dice = 1.0 - (2.0 * intersection + smooth_nr) / (denom + smooth_dr)
    return jnp.mean(dice)


def focal_loss(preds: jnp.ndarray, target: jnp.ndarray, gamma: float = 2.0,
               include_background: bool = True) -> jnp.ndarray:
    p, t = _prep(preds, target, include_background)
    p = jnp.clip(p, 1e-8, 1.0)
    loss = -t * (1.0 - p) ** gamma * jnp.log(p)
    return jnp.mean(loss)


def dice_focal_loss(preds: jnp.ndarray, target: jnp.ndarray,
                    gamma: float = 4.0, include_background: bool = True,
                    lambda_dice: float = 1.0,
                    lambda_focal: float = 1.0) -> jnp.ndarray:
    return (lambda_dice * dice_loss(preds, target, include_background)
            + lambda_focal * focal_loss(preds, target, gamma,
                                        include_background))
