"""Checkpointing: two families, same dict schema as the reference.

The reference saves ``torch.save`` dicts
``{current_epoch, model_state_dict, optimizer_state_dict,
scheduler_state_dict[, teacher_state_dict]}`` — backbone checkpoints every
10 epochs (multi_view.py:220-229, students_teacher.py:234-244) and
"prompt token" checkpoints (actually the full model state) every 20
epochs (segmentation.py:145-154) — into separate
``checkpoints/backbone/`` and ``checkpoints/prompt_tokens/`` dirs.

Here the same schema is serialized with flax msgpack (pure pytrees of
numpy arrays, no pickling of code).  ``model_state_dict`` is the flax
variables pytree (``{'params': ..., 'batch_stats': ...}``);
``optimizer_state_dict`` the optax state; ``scheduler_state_dict`` a
small dict with the step/epoch counters the schedules are a function of.

Partial, tolerant loading of a backbone checkpoint into a bigger
downstream model (reference segmentation.py:69-75 / students_teacher.py
:131-136 dict-merge) is provided by ``merge_state``: keys present in the
checkpoint overwrite the current tree, everything else (prompt tokens,
new heads) keeps its fresh initialization.  Unlike the reference's
phase-2 branch — which mutated a *copy* and never loaded it
(students_teacher.py:131-136, a documented latent no-op bug) — the merge
here is actually applied.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict

import jax
import numpy as np
from flax import serialization


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _flat_leaves(tree):
    """Serialize arbitrary pytrees (optax states contain custom nodes
    msgpack can't encode) as a flat leaf list; ``restore_like`` rebuilds
    the structure from a live template."""
    return {"__flat_leaves__": [np.asarray(x)
                                for x in jax.tree_util.tree_leaves(tree)]}


def save_checkpoint(path: Path, current_epoch: int, model_state: Any,
                    optimizer_state: Any = None, scheduler_state: Any = None,
                    teacher_state: Any = None) -> Path:
    """Write ``<path>`` (a file) or ``<path>/<epoch:04d>.ckpt`` (a dir)."""
    path = Path(path)
    if path.suffix != ".ckpt":
        path.mkdir(parents=True, exist_ok=True)
        path = path / f"{current_epoch:04d}.ckpt"
    payload: Dict[str, Any] = {
        "current_epoch": int(current_epoch),
        "model_state_dict": _to_numpy(model_state),
        "optimizer_state_dict": _flat_leaves(optimizer_state),
        "scheduler_state_dict": _to_numpy(scheduler_state),
    }
    if teacher_state is not None:
        payload["teacher_state_dict"] = _to_numpy(teacher_state)
    path.write_bytes(serialization.msgpack_serialize(payload))
    return path


def load_checkpoint(path: Path) -> Dict[str, Any]:
    """Read a checkpoint dict written by :func:`save_checkpoint`.

    Given a directory (the per-epoch layout ``save_checkpoint`` writes
    for suffix-less paths, mirroring reference segmentation.py:145-154),
    loads the highest-epoch ``*.ckpt`` inside it — the reference's
    ``torch.load`` would crash here, so this is a strict usability
    superset, not a parity break.
    """
    path = Path(path)
    if path.is_dir():
        ckpts = sorted(path.glob("*.ckpt"))
        if not ckpts:
            raise FileNotFoundError(f"No *.ckpt files in directory {path}")
        path = ckpts[-1]
    return serialization.msgpack_restore(path.read_bytes())


def restore_like(template: Any, state: Any) -> Any:
    """Rebuild ``state`` with the exact pytree structure of ``template``.

    msgpack restores nested dicts; optax states are namedtuple pytrees.
    This re-attaches the structure by flattening the template and
    unflattening the restored leaves into it (shapes must match).
    """
    template_leaves, treedef = jax.tree_util.tree_flatten(template)
    state_leaves = jax.tree_util.tree_leaves(state)
    if len(template_leaves) != len(state_leaves):
        raise ValueError(
            f"Checkpoint has {len(state_leaves)} leaves but the live state "
            f"has {len(template_leaves)}; structures are incompatible.")
    leaves = [np.asarray(s).reshape(np.shape(t)).astype(np.asarray(t).dtype)
              for t, s in zip(template_leaves, state_leaves)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def merge_state(current: Dict[str, Any], loaded: Dict[str, Any]) -> Dict[str, Any]:
    """Tolerant dict-merge: loaded keys overwrite where they exist.

    Nested-dict analogue of the reference's filtered state_dict merge
    (students_teacher.py:133-135 ``if name in current_state_dict``):
    paths present in BOTH trees take the loaded value; paths only in
    ``current`` (e.g. prompt tokens, new heads) keep their fresh init;
    paths only in ``loaded`` (e.g. phase-1 proxy heads entering a
    decoder-mode model) are ignored.  Unlike the reference — where both
    merge sites mutate a state_dict copy that is never loaded back (a
    silent no-op, SURVEY appendix #4) — the result here is actually used.
    """

    def _merge(cur, new):
        if isinstance(cur, dict) and isinstance(new, dict):
            return {k: (_merge(v, new[k]) if k in new else v)
                    for k, v in cur.items()}
        return np.asarray(new).reshape(np.shape(cur)).astype(
            np.asarray(cur).dtype)

    return _merge(current, loaded)
