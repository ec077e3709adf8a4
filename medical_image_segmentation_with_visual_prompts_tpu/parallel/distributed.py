"""Multi-host initialization (jax.distributed) for multi-slice meshes.

The reference has no distributed story at all (SURVEY.md §2: no
NCCL/MPI/Gloo).  Single-host v5e-8 DP needs nothing beyond the mesh in
``mesh.py``; this module adds the multi-host controller handshake so the
same ``mesh_data`` config scales past one host: every process calls
``maybe_initialize_distributed`` before first backend use, after which
``jax.devices()`` is the GLOBAL device list and the existing
DeviceCtx/mesh machinery works unchanged (collectives ride ICI within a
slice and DCN across slices, scheduled by XLA).

Config keys (all optional):
  distributed: true            # opt-in; default off (single process)
  coordinator_address: host:port
  num_processes: N             # omit to autodetect (TPU metadata / env)
  process_id: i                # omit to autodetect
"""

from __future__ import annotations

import jax

_initialized = False


def maybe_initialize_distributed(conf, logger=None) -> bool:
    """Call ``jax.distributed.initialize`` when configured; idempotent.

    Returns True when running multi-process after the call.
    """
    global _initialized
    if not getattr(conf, "distributed", False):
        return False
    if not _initialized:
        kwargs = {}
        for key in ("coordinator_address", "num_processes", "process_id"):
            val = getattr(conf, key, None)
            if val is not None and val != "":
                kwargs[key] = val
        # With no explicit kwargs jax autodetects from the TPU metadata
        # server / cluster environment variables.
        jax.distributed.initialize(**kwargs)
        _initialized = True
    if logger is not None:
        logger.info(
            f"jax.distributed: process {jax.process_index()} of "
            f"{jax.process_count()}; {jax.device_count()} global / "
            f"{jax.local_device_count()} local devices.")
    return jax.process_count() > 1


def stage_global_batch(mesh, batch: dict, exclude=("name",)):
    """Multi-host batch staging: each process holds its LOCAL shard of
    the global batch; assemble global arrays sharded on axis 0.

    Single-process callers should use ``DeviceCtx.stage`` (this path is
    equivalent there but goes through the local-data assembly API).
    """
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P("data"))
    n_local = jax.local_device_count()
    out = {}
    padded = 0
    for k, v in batch.items():
        if k in exclude or not hasattr(v, "shape"):
            out[k] = v
            continue
        # Wrap-pad partial final batches to a local-device multiple, as
        # DeviceCtx.stage does single-host; padding samples are masked
        # out of losses/metrics via the '_valid' key below.
        b = v.shape[0]
        pad = (-b) % n_local
        if pad:
            reps = int(np.ceil((b + pad) / b))
            v = np.concatenate([np.asarray(v)] * reps)[:b + pad]
            padded = pad
        out[k] = jax.make_array_from_process_local_data(sharding, v)
    if padded:
        b_tot = next(v.shape[0] for k, v in batch.items()
                     if k not in exclude and hasattr(v, "shape")) + padded
        valid = np.ones((b_tot,), np.float32)
        valid[b_tot - padded:] = 0.0
        out["_valid"] = jax.make_array_from_process_local_data(
            sharding, valid)
    return out
