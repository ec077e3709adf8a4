"""Multi-head window attention over ``[B, P, N, C]`` token windows.

Parity with the reference ``WindowAttention``
(/root/reference/src/modules/multi_head_attention/window_attention.py:11-61):
bias-free q/k/v projections, scaled QK^T, **additive** positional bias,
**multiplicative** pre-softmax mask (zeroed logits, not −inf — a
deliberate reference quirk: fully-masked prompt-query rows degrade to
uniform attention rather than NaN), softmax, attention dropout, value
aggregation, output projection + dropout.

Two execution paths share the projections:

* ``xla``   — einsum attention; XLA fuses bias/mask/softmax but
  materializes the ``[B, P, H, N, N]`` score tensor in HBM.
* ``pallas`` — fused TPU kernel (ops/window_attention_pallas.py) that
  keeps scores in VMEM; selected when the platform is TPU, dropout is
  inactive, and ``attn_impl`` is ``auto``/``pallas``.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

_xavier = nn.initializers.xavier_uniform()


def _use_pallas(impl: str, deterministic: bool, attn_drop: float) -> bool:
    if impl == "xla":
        return False
    from ..ops import window_attention_pallas as _wap
    if _wap.force_interpret():  # test hook: interpret-mode kernels on CPU
        dropout_active = (not deterministic) and attn_drop > 0.0
        return not dropout_active
    dropout_active = (not deterministic) and attn_drop > 0.0
    if dropout_active:
        return False
    on_tpu = _wap.on_tpu_path()
    if impl == "pallas":
        return on_tpu
    return on_tpu  # auto


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    attn_impl: str = "auto"  # auto | xla | pallas
    dtype: Any = None  # compute dtype (matmuls); softmax stays fp32

    @nn.compact
    def __call__(self,
                 q: jnp.ndarray,
                 k: jnp.ndarray,
                 v: jnp.ndarray,
                 pos_bias: Optional[jnp.ndarray] = None,
                 mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True,
                 q_rows: Optional[int] = None) -> jnp.ndarray:
        """q: [B, P, M, C]; k/v: [B, P, N, C] (M == N or M < N for
        content-query attention); pos_bias: [1, 1, H, M, N];
        mask: [1, P, 1, M, N].  When q/k/v are the SAME array, pass
        ``q_rows`` to restrict queries to the first rows (content-query
        attention) — enables the qkv-fused kernel."""
        if self.dim % self.num_heads != 0:
            raise ValueError(
                "WindowAttention: The dimension is not compatible "
                "with the number of heads!")
        head_dim = self.dim // self.num_heads
        scale = head_dim ** -0.5

        # Raw bias-free projection weights (reference
        # window_attention.py:27-29), shared by the XLA path and the
        # qkv-fused Pallas kernel.
        wq = self.param("to_q_kernel", _xavier, (q.shape[-1], self.dim))
        wk = self.param("to_k_kernel", _xavier, (k.shape[-1], self.dim))
        wv = self.param("to_v_kernel", _xavier, (v.shape[-1], self.dim))

        b, p = q.shape[:2]
        m = q_rows if (q_rows is not None and q is k) else q.shape[2]
        n = k.shape[2]

        if _use_pallas(self.attn_impl, deterministic, self.attn_drop) \
                and self.dim <= 128 and q is k and k is v:
            # qkv-fused packed kernel: projections + block-diagonal head
            # packing run inside VMEM; only the post-LN activations are
            # read from HBM once.
            from ..ops.window_attention_pallas import \
                fused_window_attention_packed_qkv
            out = fused_window_attention_packed_qkv(
                k, wq, wk, wv, m_len=m, pos_bias=pos_bias, mask=mask,
                scale=scale, num_heads=self.num_heads,
                compute_dtype=self.dtype or jnp.float32)
            out = nn.Dense(self.dim, kernel_init=_xavier, dtype=self.dtype,
                           name="proj")(out)
            out = nn.Dropout(self.proj_drop, name="proj_dropout")(
                out, deterministic=deterministic)
            return out

        cast = (lambda t: t.astype(self.dtype)) if self.dtype else (lambda t: t)
        q = (cast(q) @ cast(wq))[:, :, :m]
        k = cast(k) @ cast(wk)
        v = cast(v) @ cast(wv)

        if _use_pallas(self.attn_impl, deterministic, self.attn_drop) \
                and self.dim <= 128:
            # Packed kernel without qkv fusion (distinct q/kv inputs).
            from ..ops.window_attention_pallas import \
                fused_window_attention_packed
            out = fused_window_attention_packed(
                q, k, v, pos_bias=pos_bias, mask=mask, scale=scale,
                num_heads=self.num_heads)
            out = nn.Dense(self.dim, kernel_init=_xavier, dtype=self.dtype,
                           name="proj")(out)
            out = nn.Dropout(self.proj_drop, name="proj_dropout")(
                out, deterministic=deterministic)
            return out

        split = lambda t: t.reshape(b, p, t.shape[2], self.num_heads,
                                    head_dim)
        qh, kh, vh = split(q), split(k), split(v)  # [B, P, M|N, H, Dh]

        if _use_pallas(self.attn_impl, deterministic, self.attn_drop):
            from ..ops.window_attention_pallas import fused_window_attention
            out = fused_window_attention(
                qh, kh, vh, pos_bias=pos_bias, mask=mask, scale=scale)
        else:
            # Scores/softmax in fp32 regardless of the compute dtype.
            attn = jnp.einsum("bpihd,bpjhd->bphij", qh, kh,
                              preferred_element_type=jnp.float32) * scale
            if pos_bias is not None:
                attn = attn + pos_bias
            if mask is not None:
                attn = attn * mask
            attn = jax.nn.softmax(attn, axis=-1)
            attn = nn.Dropout(self.attn_drop, name="attn_dropout")(
                attn, deterministic=deterministic)
            out = jnp.einsum("bphij,bpjhd->bpihd",
                             attn.astype(vh.dtype), vh)
        out = out.reshape(b, p, m, self.dim)
        out = nn.Dense(self.dim, kernel_init=_xavier, dtype=self.dtype,
                       name="proj")(out)
        out = nn.Dropout(self.proj_drop, name="proj_dropout")(
            out, deterministic=deterministic)
        return out
