"""Prompt-token similarity aggregation and pseudo-mask generation.

Equivalents of /root/reference/src/modules/utils.py:92-130 and :351-368.
Neither function is called by any reference trainer (SURVEY appendix
#11); they are part of the library surface for prompt-similarity
analysis, so they are provided (and tested) here for completeness.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .augment import align_rotation, permute_inverse


def _normalize(x):
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True).clip(1e-12)


def similarity_aggregation(latent: jnp.ndarray, prompt: jnp.ndarray,
                           temp: float = 0.1,
                           mean_aggregation: bool = False) -> jnp.ndarray:
    """Cosine similarity of latent voxels to prompt tokens (ref :115-130).

    latent: [B, M, C]; prompt: [B, I, N, C] (I prompts of N tokens).
    Returns [B, I, M].
    """
    sim = (jnp.einsum("bmc,binc->binm", _normalize(latent),
                      _normalize(prompt)) + 1.0) / 2.0
    if not mean_aggregation:
        weights = jax.nn.softmax(jax.lax.stop_gradient(sim) / temp, axis=2)
        return jnp.sum(weights * sim, axis=2)
    return jnp.mean(sim, axis=2)


def generate_pseudo_mask_from_multi_view(latent: jnp.ndarray,
                                         prompt: jnp.ndarray,
                                         n_tokens: int,
                                         src_rot=None, dst_rot=None,
                                         permutation_choice=None
                                         ) -> jnp.ndarray:
    """Pseudo-mask from prompt-token similarity maps (ref :92-112).

    latent: [B, H, W, D, C]; prompt: [B, I*n_tokens, C].
    Returns [B, H, W, D, I] channels-last similarity volumes, optionally
    un-permuted / rotation-aligned back to the source view.
    """
    b, h, w, d, c = latent.shape
    lat = latent.reshape(b, -1, c)
    prm = prompt.reshape(b, -1, n_tokens, c)
    sim = similarity_aggregation(lat, prm)  # [B, I, M]
    i = sim.shape[1]
    pse = sim.reshape(b, i, h, w, d).transpose(0, 2, 3, 4, 1)
    if permutation_choice is not None:
        pse = permute_inverse(pse, permutation_choice)
    if src_rot is not None or dst_rot is not None:
        pse = align_rotation(pse, src_rot=src_rot, dst_rot=dst_rot)
    return pse


def sinkhorn_knopp(q: jnp.ndarray, num_iters: int = 3) -> jnp.ndarray:
    """Sinkhorn-Knopp normalization (ref :351-368; unused by trainers).

    q: [B, H, W, D, C] channels-last scores.
    """
    b, h, w, d, c = q.shape
    qf = q.reshape(b, h * w * d, c).transpose(0, 2, 1)  # [B, C, M]
    qf = jnp.exp(qf / jnp.linalg.norm(qf, axis=1, keepdims=True).clip(1e-12))
    qf = qf / jnp.sum(qf)
    for _ in range(num_iters):
        qf = qf / jnp.sum(qf, axis=0, keepdims=True)
        qf = qf / c
        qf = qf / jnp.sum(qf, axis=1, keepdims=True)
        qf = qf / b
    qf = qf * b
    return qf.transpose(0, 2, 1).reshape(b, h, w, d, c)
