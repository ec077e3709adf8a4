"""Decomposed per-axis relative positional bias with prompt-token bias.

Functional parity with the reference ``RelativePE``
(/root/reference/src/modules/multi_head_attention/
relative_positional_encoding.py:7-154):

* learnable per-axis embeddings ``[2*win-1, E]`` indexed by clamped
  relative distances, projected per head and **averaged over the three
  axes (/3)**, scaled by ``E**-0.5`` (:104-123);
* learnable prompt-token embeddings ``[max_prompts, tokens, E]`` with a
  per-head projection: content→token *columns* carry the token scores,
  token *rows* (and the token-token block) stay exactly 0 (:127-142).

TPU-first: the clamped relative-distance index tables are trace-time
numpy constants, and the bias tensor is assembled once per (window,
n_tokens) instantiation — under jit it is a loop-invariant the compiler
hoists; no per-step recomputation beyond the (tiny) head projections.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

_xavier = nn.initializers.xavier_uniform()


@lru_cache(maxsize=None)
def _relative_index(max_abs_pos: int, max_cap_dist: int, dim: int) -> np.ndarray:
    """Clamped relative-distance index table [dim, dim] (reference :40-62)."""
    pos = np.arange(max_abs_pos, dtype=np.int64)
    rel = pos.reshape(1, -1) - pos.reshape(-1, 1)
    rel = np.clip(rel + max_cap_dist - 1, 0, (max_cap_dist - 1) * 2)
    return rel[:dim, :dim]


class RelativePE(nn.Module):
    embed_dim: int
    num_heads: int
    max_abs_pos: Sequence[int]
    max_cap_dist: Sequence[int]
    max_prompts: int
    tokens_per_prompt: int
    use_token_params: bool = True

    @nn.compact
    def __call__(self, dim_h: int, dim_w: int, dim_d: int, dim_i: int = 0):
        """Bias ``[1, num_heads, n + dim_i, n + dim_i]``, n = dim_h*dim_w*dim_d.

        The bias is a pure function of the params and static dims, yet a
        jitted scan over model forwards (sliding-window inference)
        re-derives it every chunk — XLA's LICM declines the broadcast-
        heavy fusion.  When the caller provides a pre-filled
        ``bias_cache`` collection (see
        ``models.swin_unetr.prefill_bias_cache``), the assembled tensor
        is read back instead of recomputed; never use the cache in
        training, where params change step to step.
        """
        cache_key = f"bias_{dim_h}x{dim_w}x{dim_d}_{dim_i}"
        if not self.is_initializing() and self.has_variable("bias_cache",
                                                            cache_key):
            return self.get_variable("bias_cache", cache_key)
        scale = self.embed_dim ** -0.5
        axes = []
        for name, dim, cap, ap in (("h", dim_h, self.max_cap_dist[0], self.max_abs_pos[0]),
                                   ("w", dim_w, self.max_cap_dist[1], self.max_abs_pos[1]),
                                   ("d", dim_d, self.max_cap_dist[2], self.max_abs_pos[2])):
            enc = self.param(f"enc_content_{name}", _xavier,
                             (2 * cap - 1, self.embed_dim))
            weights = self.param(f"weights_content_{name}", _xavier,
                                 (self.num_heads, self.embed_dim))
            idx = jnp.asarray(_relative_index(ap, cap, dim))
            # jnp.take, not enc[idx]: restored checkpoints can carry numpy
            # leaves, and numpy.__getitem__ on a traced index array fails.
            emb = jnp.take(jnp.asarray(enc), idx, axis=0)  # [dim, dim, E]
            axes.append(jnp.einsum("hc,nmc->hnm", weights, emb))  # [heads, dim, dim]
        row, col, dep = axes
        content = (row[:, :, None, None, :, None, None]
                   + col[:, None, :, None, None, :, None]
                   + dep[:, None, None, :, None, None, :]) / 3.0
        n = dim_h * dim_w * dim_d
        content = content.reshape(self.num_heads, n, n) * scale

        if self.use_token_params:
            # Parameters exist regardless of dim_i so the checkpoint
            # schema is stable (reference creates them in __init__ :83-97).
            enc_token = self.param("enc_token", _xavier,
                                   (self.max_prompts, self.tokens_per_prompt,
                                    self.embed_dim))
            weights_token = self.param("weights_token", _xavier,
                                       (self.num_heads, self.embed_dim))
        if dim_i == 0:
            out = content[None]
        else:
            token_emb = enc_token.reshape(-1, self.embed_dim)[:dim_i]
            token_scores = jnp.einsum("hc,nc->hn", weights_token,
                                      token_emb) * scale
            total = jnp.zeros((self.num_heads, n + dim_i, n + dim_i),
                              content.dtype)
            total = total.at[:, :n, :n].set(content)
            total = total.at[:, :n, n:].set(jnp.broadcast_to(
                token_scores[:, None, :], (self.num_heads, n, dim_i)))
            out = total[None]
        if (not self.is_initializing()
                and self.is_mutable_collection("bias_cache")):
            self.put_variable("bias_cache", cache_key, out)
        return out
