"""SimCLR NT-Xent pair loss.

Parity with the reference ``ContrastivePairLoss``
(/root/reference/src/modules/losses/contrastive_pair_loss.py:6-31):
2N x 2N cosine-similarity matrix over the concatenated normalized
embeddings of two views, positives on the ±N diagonals, identity-masked
negatives, temperature 0.5, mean over 2N.

``bs`` is static (batch_size × num_samples, multi_view.py:39-41), so the
negative mask is a trace-time constant.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def contrastive_pair_loss(x_i: jnp.ndarray, x_j: jnp.ndarray,
                          temp: float = 0.5) -> jnp.ndarray:
    """x_i, x_j: ``[bs, D]`` contrastive codes of the two views."""
    bs = x_i.shape[0]
    z_i = x_i / jnp.linalg.norm(x_i, axis=1, keepdims=True).clip(1e-12)
    z_j = x_j / jnp.linalg.norm(x_j, axis=1, keepdims=True).clip(1e-12)
    z = jnp.concatenate([z_i, z_j], axis=0)  # [2bs, D]
    sim = z @ z.T  # cosine similarity (already normalized)
    sim_ij = jnp.diagonal(sim, offset=bs)
    sim_ji = jnp.diagonal(sim, offset=-bs)
    pos = jnp.exp(jnp.concatenate([sim_ij, sim_ji]) / temp)  # [2bs]
    neg_mask = jnp.asarray(1.0 - np.eye(2 * bs, dtype=np.float32))
    neg = neg_mask * jnp.exp(sim / temp)
    return jnp.sum(-jnp.log(pos / jnp.sum(neg, axis=1))) / (2 * bs)
