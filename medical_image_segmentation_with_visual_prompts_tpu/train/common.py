"""Shared trainer machinery: optimizers, state, EMA, batch staging.

Trainer design (TPU-first, vs the reference's imperative torch loops):

* the model's parameters are split once into (trainable, frozen) pytrees
  by partition label — the idiomatic replacement for ``requires_grad``
  freezing (reference swin_unetr.py:21-44); gradients are only ever
  computed for the trainable subset;
* per-group learning rates / weight decays (reference param groups,
  multi_view.py:57-77, students_teacher.py:24-68) become
  ``optax.multi_transform`` over the same labels;
* one jitted ``train_step`` per trainer does forward + loss + backward +
  optimizer update + BatchNorm stat update + metric stats in a single
  XLA program — the host only streams batches and logs scalars.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Iterable, Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import traverse_util

from ..models import partition


def labels_tree(params: Dict) -> Dict:
    return partition.param_labels(params)


def make_grouped_optimizer(params: Dict,
                           group_of: Callable[[str], str],
                           transforms: Mapping[str, optax.GradientTransformation]
                           ) -> optax.GradientTransformation:
    """multi_transform keyed by ``group_of(partition_label)``."""
    flat = traverse_util.flatten_dict(params)
    label_tree = traverse_util.unflatten_dict(
        {k: group_of(partition.label_of(k)) for k in flat})
    return optax.multi_transform(dict(transforms), label_tree)


def adamw(lr: Callable[[int], float] | float,
          weight_decay: float) -> optax.GradientTransformation:
    """torch-default AdamW (betas 0.9/0.999, eps 1e-8)."""
    return optax.adamw(learning_rate=lr, b1=0.9, b2=0.999, eps=1e-8,
                       weight_decay=weight_decay)


def ema_update(teacher_params: Dict, student_params: Dict,
               tau: float) -> Dict:
    """teacher = tau * teacher + (1 - tau) * student (momentum_model.py:27-35)."""
    return jax.tree_util.tree_map(
        lambda t, s: tau * t + (1.0 - tau) * s,
        teacher_params, student_params)


def count_params(tree) -> int:
    return int(sum(np.size(x) for x in jax.tree_util.tree_leaves(tree)))


def to_device(batch: Dict, exclude: Tuple[str, ...] = ("name",)) -> Dict:
    out = {}
    for k, v in batch.items():
        if k in exclude:
            out[k] = v
        else:
            out[k] = jnp.asarray(v)
    return out


def valid_of(batch: Dict):
    """Per-sample validity weights ``[B]``: the ``_valid`` mask
    :meth:`DeviceCtx.stage` attaches to wrap-padded partial batches, or
    all-ones for complete batches."""
    v = batch.get("_valid")
    if v is not None:
        return v
    b = next(x.shape[0] for k, x in batch.items()
             if k != "_valid" and hasattr(x, "shape"))
    return jnp.ones((b,), jnp.float32)


def scalar(x) -> float:
    return float(jax.device_get(x))


class DeviceCtx:
    """Execution context: single device, or data-parallel over a mesh.

    Honors the ``mesh_data`` config key (NEW capability — the reference
    is single-device, SURVEY.md §2 parallelism table): ``mesh_data: N``
    builds an N-device 1-D ``data`` mesh (``-1`` = all local devices);
    0/1/absent runs single-device.  Trainers build their jitted steps
    through :meth:`jit` (batch args sharded on axis 0, everything else
    replicated — XLA inserts the gradient all-reduce over ICI) and stage
    host batches through :meth:`stage`.
    """

    def __init__(self, hparams, logger=None):
        self.mesh = None
        self.logger = logger
        self._warned_pad = False
        n = int(getattr(hparams, "mesh_data", 0) or 0)
        if n == -1 or n > 1:
            from ..parallel.mesh import make_mesh
            self.mesh = make_mesh(n)
            if logger is not None:
                logger.info(
                    f"Data-parallel mesh: {self.mesh.devices.size} devices "
                    f"on axis 'data'.")

    @property
    def n_devices(self) -> int:
        return 1 if self.mesh is None else int(self.mesh.devices.size)

    def round_batch(self, batch_size: int) -> int:
        """Smallest multiple of the mesh size >= batch_size."""
        n = self.n_devices
        return -(-batch_size // n) * n

    def jit(self, fn, n_args: int, data_argnums=()):
        """jax.jit with DP shardings: ``data_argnums`` sharded on axis 0
        over the ``data`` mesh axis, all other args replicated.  A dict
        arg position shards every leaf in the subtree."""
        if self.mesh is None:
            return jax.jit(fn)
        from jax.sharding import NamedSharding, PartitionSpec as P
        rep = NamedSharding(self.mesh, P())
        data = NamedSharding(self.mesh, P("data"))
        shardings = tuple(data if i in data_argnums else rep
                          for i in range(n_args))
        return jax.jit(fn, in_shardings=shardings)

    def stage(self, batch: Dict, exclude: Tuple[str, ...] = ("name",)
              ) -> Dict:
        """Move a host batch to device(s); under a mesh, axis 0 is
        sharded across ``data``, padded (wrap-around) to a multiple of
        the mesh size when the loader emits a partial batch."""
        if self.mesh is None:
            return to_device(batch, exclude)
        if jax.process_count() > 1:
            # Multi-host: every process holds its local shard of the
            # global batch (parallel/distributed.py).
            from ..parallel.distributed import stage_global_batch
            return stage_global_batch(self.mesh, batch, exclude)
        from jax.sharding import NamedSharding, PartitionSpec as P
        data = NamedSharding(self.mesh, P("data"))
        n = self.n_devices
        out = {}
        padded = 0
        for k, v in batch.items():
            if k in exclude or not hasattr(v, "shape"):
                out[k] = v
                continue
            b = v.shape[0]
            pad = (-b) % n
            if pad:
                if not self._warned_pad and self.logger is not None:
                    self.logger.info(
                        f"Padding partial batch of {b} to {b + pad} for "
                        f"the {n}-device mesh (wrap-around samples, "
                        f"masked out of losses/metrics via '_valid').")
                    self._warned_pad = True
                reps = int(np.ceil((b + pad) / b))
                v = np.concatenate([np.asarray(v)] * reps)[:b + pad]
                padded = pad
            # device_put shards straight from host memory (no staging
            # copy through device 0).
            if not isinstance(v, jax.Array):
                v = np.asarray(v)
            out[k] = jax.device_put(v, data)
        if padded:
            b_tot = next(v.shape[0] for k, v in out.items()
                         if k not in exclude and hasattr(v, "shape"))
            valid = np.ones((b_tot,), np.float32)
            valid[b_tot - padded:] = 0.0
            out["_valid"] = jax.device_put(valid, data)
        return out


class StepProfiler:
    """Per-step timing + optional jax.profiler trace capture.

    New observability capability (the reference only logs losses,
    SURVEY.md §5): wall-clock per train step is tracked and logged, and
    when ``profile_dir`` is configured a device trace is captured for a
    few steps of the first epoch (viewable with any XPlane/TensorBoard
    profile reader).
    """

    def __init__(self, logger, profile_dir=None, trace_steps=(2, 6)):
        self.logger = logger
        self.profile_dir = profile_dir
        self.trace_start, self.trace_stop = trace_steps
        self._tracing = False
        self._t_last = None
        self.durations: list = []

    def step_begin(self, global_step: int) -> None:
        if (self.profile_dir and not self._tracing
                and global_step == self.trace_start):
            jax.profiler.start_trace(str(self.profile_dir))
            self._tracing = True
        self._t_last = time.perf_counter()

    def step_end(self, global_step: int) -> None:
        if self._t_last is not None:
            self.durations.append(time.perf_counter() - self._t_last)
        if self._tracing and global_step >= self.trace_stop:
            jax.profiler.stop_trace()
            self._tracing = False
            self.logger.info(f"Profiler trace written to {self.profile_dir}.")

    def mean_ms(self, last: int = 50) -> float:
        if not self.durations:
            return 0.0
        window = self.durations[-last:]
        return 1e3 * sum(window) / len(window)

    def close(self) -> None:
        if self._tracing:
            jax.profiler.stop_trace()
            self._tracing = False


class AvgLosses:
    """Per-epoch loss accumulators mirroring the reference's dict-of-lists
    (values are detached floats — fixing reference quirk #8 of keeping
    live graph tensors)."""

    def __init__(self, names: Iterable[str]):
        self.store: Dict[str, list] = {n: [] for n in names}

    def append(self, name: str, value) -> None:
        self.store[name].append(scalar(value))

    def last(self, name: str) -> float:
        return self.store[name][-1]

    def mean_and_clear(self) -> Dict[str, float]:
        out = {}
        for name, vals in self.store.items():
            if vals:
                out[name] = float(np.mean(vals))
            vals.clear()
        return out
