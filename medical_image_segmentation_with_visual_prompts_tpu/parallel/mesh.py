"""Device-mesh construction and sharding helpers.

The reference is single-process/single-GPU (SURVEY.md §2: no DDP/NCCL
anywhere; ``gpu`` only toggles ``torch.device``).  Data parallelism is
therefore a NEW, first-class capability of the TPU framework: a 1-D
``data`` mesh (extensible to ``(data, model)``), batches sharded on axis
0, parameters replicated, gradient all-reduce inserted by XLA from the
sharding annotations — collectives ride the ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int = -1, devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over ``n_data`` devices (-1 = all local)."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data == -1:
        n_data = len(devices)
    if n_data > len(devices):
        raise ValueError(
            f"Requested mesh of {n_data} devices, have {len(devices)}.")
    return Mesh(np.array(devices[:n_data]), axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across ``data``."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """device_put every array in a batch dict with axis-0 sharding."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh) if hasattr(x, "shape") and
        getattr(x, "ndim", 0) > 0 else x, batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
