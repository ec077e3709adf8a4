"""Device-side training-view ops: rotation, masking, label remapping.

JAX equivalents of the reference's host-side view utilities
(/root/reference/src/modules/utils.py):

* ``random_rotate`` (:335-348) — per-sample 0-3 × 90° rotation in the
  H-W plane plus the rotation class label.  The reference loops over the
  batch on the host; here all four rotations are computed and selected
  per sample, fully on device under jit.
* ``random_mask`` (:267-295) — exact-count patchwise masking (not
  Bernoulli): round(n_patches·(1−ratio)) patches survive.
* ``random_permute`` (:298-307) — one of three spatial permutations; the
  choice is a static Python int (shape-changing under jit).
* ``align_rotation`` (:310-332) — undo/redo per-sample rotations.
* ``map_label_indices`` (:372-388) — keep ``active_labels``, zero the
  rest, remap to 0..K-1.  The reference mutates in place and can collide
  when remapped indices overlap original labels; this version builds the
  output functionally, fixing that documented bug while preserving the
  intended mapping.

Layout: channels-last ``[B, H, W, D, C]`` (the reference's H-W plane
``dims=(2,3)`` becomes ``axes=(1,2)``).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def random_rotate(x: jnp.ndarray, key: jax.Array
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-sample random 90° rotation in the H-W plane (requires H == W)."""
    b = x.shape[0]
    ks = jax.random.randint(key, (b,), 0, 4)
    rots = jnp.stack([x,
                      jnp.rot90(x, 1, axes=(1, 2)),
                      jnp.rot90(x, 2, axes=(1, 2)),
                      jnp.rot90(x, 3, axes=(1, 2))])  # [4, B, ...]
    idx = ks[None, :, None, None, None, None]
    out = jnp.take_along_axis(rots, idx, axis=0)[0]
    return out, ks


def align_rotation(x: jnp.ndarray, src_rot=None, dst_rot=None) -> jnp.ndarray:
    """Rotate back by src_rot and/or forward by dst_rot (ref :310-332)."""
    if src_rot is None and dst_rot is None:
        raise ValueError("src_rot or dst_rot is None!")

    def apply(x, ks, invert):
        rots = jnp.stack([x,
                          jnp.rot90(x, 3 if invert else 1, axes=(1, 2)),
                          jnp.rot90(x, 2, axes=(1, 2)),
                          jnp.rot90(x, 1 if invert else 3, axes=(1, 2))])
        idx = ks.reshape((1, -1) + (1,) * (x.ndim - 1))
        return jnp.take_along_axis(rots, idx, axis=0)[0]

    if src_rot is not None:
        x = apply(x, src_rot, invert=True)
    if dst_rot is not None:
        x = apply(x, dst_rot, invert=False)
    return x


def random_mask(x: jnp.ndarray, key: jax.Array, input_size: Sequence[int],
                patch_size: Sequence[int], masking_ratio: float
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Patchwise masking; returns (masked x, keep-mask [H, W, D] bool)."""
    if any(s0 % s1 != 0 for s0, s1 in zip(input_size, patch_size)):
        raise ValueError(
            f"Input size {tuple(input_size)} and patch size "
            f"{tuple(patch_size)} is not compatible!")
    mask_shape = [s0 // s1 for s0, s1 in zip(input_size, patch_size)]
    n_patches = int(np.prod(mask_shape))
    keep = round(n_patches * (1 - masking_ratio))
    rank = jax.random.permutation(key, n_patches)
    masked = (rank >= keep).reshape(mask_shape)  # True = masked
    for ax, rep in enumerate(patch_size):
        masked = jnp.repeat(masked, rep, axis=ax)
    x_masked = jnp.where(masked[None, ..., None], 0.0, x)
    return x_masked, ~masked


_PERMUTATIONS = ((0, 2, 1, 3, 4), (0, 3, 2, 1, 4), (0, 1, 3, 2, 4))


def random_permute(x: jnp.ndarray, choice: int) -> jnp.ndarray:
    """One of three spatial permutations; ``choice`` is static (ref :298-307)."""
    return jnp.transpose(x, _PERMUTATIONS[choice])


def permute_inverse(x: jnp.ndarray, choice: int) -> jnp.ndarray:
    """All three reference permutations are involutions (axis swaps)."""
    return jnp.transpose(x, _PERMUTATIONS[choice])


def map_label_indices(masks: jnp.ndarray, active_labels: Sequence[int]
                      ) -> jnp.ndarray:
    """Keep active labels, zero others, remap to 0..K-1 (ref :372-388)."""
    labels = sorted(int(l) for l in active_labels)
    out = jnp.zeros_like(masks)
    for new, lbl in enumerate(labels):
        out = jnp.where(masks == float(lbl), float(new), out)
    return out
