"""Data-parallel training over a device mesh (pjit-style).

NEW capability vs. the single-device reference (SURVEY.md §2 parallelism
table): the downstream train step jitted with sharding annotations —
batch sharded over the ``data`` mesh axis, parameters/optimizer state
replicated; XLA inserts the gradient all-reduce over ICI from the
shardings alone.  The same machinery drives the driver's
``dryrun_multichip`` entry and the v5e-8 "DP training + batched
sliding-window serving" target config (BASELINE.md).
"""

from __future__ import annotations

import jax
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..losses import dice_focal_loss
from ..models import partition
from ..ops.augment import map_label_indices
from .mesh import batch_sharding, replicated


def make_dp_train_step(model, tx, frozen, mesh: Mesh, active_labels,
                       include_background: bool = True):
    """Jitted DP train step: (trainable, batch_stats, opt_state, image,
    mask, rng) -> (trainable', batch_stats', opt_state', loss).

    Inputs image/mask must be device_put with axis-0 sharding (see
    mesh.shard_batch); parameter trees may be unsharded host trees — the
    out_shardings pin them replicated.
    """
    rep = replicated(mesh)
    data = batch_sharding(mesh)
    active = tuple(active_labels)

    def step(trainable, batch_stats, opt_state, image, mask, rng):
        seg_true = map_label_indices(mask, active)

        def loss_fn(tr):
            params = partition.merge_params(tr, frozen)
            out, updates = model.apply(
                {"params": params, "batch_stats": batch_stats},
                image, deterministic=False, rngs={"dropout": rng},
                mutable=["batch_stats"])
            loss = dice_focal_loss(out["downstream"], seg_true, gamma=4.0,
                                   include_background=include_background)
            return loss, updates["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable)
        updates, new_opt = tx.update(grads, opt_state, trainable)
        new_tr = optax.apply_updates(trainable, updates)
        return new_tr, new_bs, new_opt, loss

    return jax.jit(
        step,
        in_shardings=(rep, rep, rep, data, data, rep),
        out_shardings=(rep, rep, rep, rep),
    )


def make_dp_serving_step(model, variables, mesh: Mesh):
    """Batched prompt-conditioned sliding-window serving step: windows
    sharded across the mesh, logits gathered back replicated."""
    rep = replicated(mesh)
    data = batch_sharding(mesh)

    def forward(windows):
        out = model.apply(variables, windows, deterministic=True)
        return out["downstream"]

    return jax.jit(forward, in_shardings=(data,), out_shardings=rep)
