"""Clustered-prototype distillation loss (phase 2).

Parity with the reference ``ClusteredPrototypeLoss``
(/root/reference/src/modules/losses/clustered_prototype_loss.py:13-206):

1. Subsample teacher embeddings twice (prototype grid at
   ``reduction_factor*2``, teacher grid at ``reduction_factor``) and each
   student with random spatial jitter, via grid_sample-style trilinear
   sampling at half-pixel centers (:163-206);
2. soft k-means over teacher embeddings with Gaussian position weighting
   (σ = fwhm/2.355), re-aggregating prototype embeddings *and*
   coordinates each iteration (:89-137);
3. per student: nearest-teacher-coordinate lookup within
   ``max_dist = 4`` voxels, then clustered cross-entropy between the
   student→prototype softmax (temp 0.066) and the teacher assignment
   (temp 0.033) (:63-86, :140-160).

TPU-first jit design (SURVEY.md §7 hard part (b)):

* The reference jitters by *slicing* the student volume (dynamic shapes).
  Here the jitter is folded into the sampling coordinates — identical
  samples, static shapes.
* The reference's boolean ``mask_max_dist`` indexing (dynamic size) is a
  fixed-shape weighted mean: ``sum(ce·mask)/max(sum(mask), 1)`` per batch
  element (an all-false mask yields 0 instead of the reference's NaN — a
  documented bug fix).
* grid_sample is separable per-axis gather+lerp with traced coordinates;
  edge handling clamps to [0, L-1], which coincides with torch's
  ``reflection`` + align_corners=False for these strictly-interior
  sample grids.

Layout: embeddings ``[B, H, W, D, C]`` channels-last; coordinate grids
``[B, H, W, D, 3]``.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp


def _axis_positions(length: int, out: int, j0, j1):
    """Half-pixel sample positions of torch affine_grid+grid_sample
    (align_corners=False) over the sub-range [j0, length - j1)."""
    eff = length - j0 - j1  # traced or static int
    i = jnp.arange(out, dtype=jnp.float32)
    return (i + 0.5) * eff / out - 0.5 + j0


def _gather_lerp(x: jnp.ndarray, pos: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Linear interpolation of ``x`` at float positions ``pos`` along ``axis``."""
    length = x.shape[axis]
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, length - 1)
    hi = jnp.clip(lo + 1, 0, length - 1)
    w = (pos - jnp.floor(pos)).astype(x.dtype)
    x_lo = jnp.take(x, lo, axis=axis)
    x_hi = jnp.take(x, hi, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = -1
    w = w.reshape(shape)
    return x_lo * (1 - w) + x_hi * w


def sample_embedding(emb: jnp.ndarray, coord: jnp.ndarray,
                     reduction_factor: float,
                     jitter: Optional[jnp.ndarray] = None
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Trilinear-subsample emb and coord to a reduced grid (ref :163-206).

    Args:
      emb: ``[B, H, W, D, C]``; coord: ``[B, H, W, D, 3]``.
      jitter: optional ``[6]`` int array (front/back crop per axis),
        folded into the sampling coordinates instead of slicing.

    Returns: ``(emb_sampled [B, N', C], coord_sampled [B, N', 3])``.
    """
    spatial = emb.shape[1:4]
    reduced = [max(int(s // reduction_factor), 1) for s in spatial]
    js = [0] * 6 if jitter is None else [jitter[i] for i in range(6)]
    for ax in range(3):
        pos = _axis_positions(spatial[ax], reduced[ax],
                              js[2 * ax], js[2 * ax + 1])
        emb = _gather_lerp(emb, pos, axis=1 + ax)
        coord = _gather_lerp(coord, pos, axis=1 + ax)
    b = emb.shape[0]
    return (emb.reshape(b, -1, emb.shape[-1]),
            coord.reshape(b, -1, 3))


def _normalize(x: jnp.ndarray) -> jnp.ndarray:
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True).clip(1e-12)


def _pos_weights(coord_x: jnp.ndarray, coord_y: jnp.ndarray,
                 fwhm: float) -> jnp.ndarray:
    """Gaussian position weights exp(-d²/2σ²), σ = fwhm/2.355 (ref :140-156)."""
    diff = coord_x[:, :, None, :] - coord_y[:, None, :, :]  # [B, N1, N2, 3]
    dist2 = jnp.sum(diff * diff, axis=-1)
    sigma_sq = (fwhm / 2.355) ** 2
    return jnp.exp(-dist2 / (2.0 * sigma_sq))


def _closest(coord_x: jnp.ndarray, coord_y: jnp.ndarray,
             max_dist: float = 4.0):
    """(argmin index, within-max_dist mask) over coord_y (ref :157-160)."""
    diff = coord_x[:, :, None, :] - coord_y[:, None, :, :]
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    pos_min = jnp.min(dist, axis=-1)
    idx = jnp.argmin(dist, axis=-1)
    return idx, (pos_min <= max_dist)


def cluster_prototype(emb_p: jnp.ndarray, coord_p: jnp.ndarray,
                      emb_t: jnp.ndarray, coord_t: jnp.ndarray,
                      n_iter: int, temp: float, fwhm: float):
    """Soft k-means with Gaussian position weighting (ref :89-137)."""
    emb_p_n = _normalize(emb_p)
    emb_t_n = _normalize(emb_t)
    for _ in range(n_iter):
        sim_soft = jax.nn.softmax(
            jnp.einsum("bnc,bpc->bnp", emb_t_n, emb_p_n) / temp, axis=-1)
        pos_weight = _pos_weights(coord_t, coord_p, fwhm)
        sim_weighted = sim_soft * pos_weight  # [B, N, P]
        denom = jnp.sum(sim_weighted, axis=1)[..., None]  # [B, P, 1]
        emb_p = jnp.einsum("bnp,bnc->bpc", sim_weighted, emb_t) / denom
        emb_p_n = _normalize(emb_p)
        coord_p = jnp.einsum("bnp,bnc->bpc", sim_weighted, coord_t) / denom
    sim_soft = jax.nn.softmax(
        jnp.einsum("bnc,bpc->bnp", emb_t_n, emb_p_n) / temp, axis=-1)
    sim_weighted = sim_soft * _pos_weights(coord_t, coord_p, fwhm)
    return emb_p, coord_p, sim_weighted


def assign_prototype(emb_z: jnp.ndarray, coord_z: jnp.ndarray,
                     emb_t: jnp.ndarray, coord_t: jnp.ndarray,
                     emb_p: jnp.ndarray, sim_t_p: jnp.ndarray,
                     temp: float) -> jnp.ndarray:
    """Per-batch clustered CE against nearest-teacher assignment (ref :63-86)."""
    emb_z_n = _normalize(emb_z)
    emb_p_n = _normalize(emb_p)
    idx_closest, mask = _closest(coord_z, coord_t)  # [B, M], [B, M]
    sim_soft = jax.nn.softmax(
        jnp.einsum("bmc,bpc->bmp", emb_z_n, emb_p_n) / temp, axis=-1)
    assignment = jnp.take_along_axis(
        sim_t_p, idx_closest[..., None], axis=1)  # [B, M, P]
    log_sim = jnp.clip(jnp.log(sim_soft + 1e-16), -1e3, 0.0)
    ce = -jnp.sum(assignment * log_sim, axis=-1)  # [B, M]
    maskf = mask.astype(ce.dtype)
    per_b = jnp.sum(ce * maskf, axis=1) / jnp.maximum(jnp.sum(maskf, axis=1), 1.0)
    return per_b  # [B]


def clustered_prototype_loss(
        emb_s: List[jnp.ndarray], emb_t: jnp.ndarray,
        coord_s: List[jnp.ndarray], coord_t: jnp.ndarray,
        rng: jax.Array,
        reduction_factor: float = 8.0,
        k_means_iterations: int = 3,
        fwhm: float = 128.0,
        temp_s: float = 0.066,
        temp_t: float = 0.033) -> jnp.ndarray:
    """Full phase-2 loss (ref :24-60); students jittered via ``rng``."""
    emb_p0, coord_p0 = sample_embedding(emb_t, coord_t, reduction_factor * 2)
    emb_t_s, coord_t_s = sample_embedding(emb_t, coord_t, reduction_factor)
    emb_p, coord_p, sim_t_p = cluster_prototype(
        emb_p0, coord_p0, emb_t_s, coord_t_s,
        k_means_iterations, temp_t, fwhm)
    total = jnp.zeros((), emb_t.dtype)
    high = max(int(math.ceil(reduction_factor)), 1)
    for i, (es, cs) in enumerate(zip(emb_s, coord_s)):
        key = jax.random.fold_in(rng, i)
        jitter = jax.random.randint(key, (6,), 0, high)
        es_s, cs_s = sample_embedding(es, cs, reduction_factor, jitter=jitter)
        per_b = assign_prototype(es_s, cs_s, emb_t_s, coord_t_s,
                                 emb_p, sim_t_p, temp_s)
        total = total + jnp.mean(per_b)
    return total
