"""Fused Pallas TPU kernel for prompted shifted-window attention.

The reference's hot loop (SURVEY.md §3.1 ★) is window attention over
short sequences (window 8·8·4 = 256 voxels + 64 prompt tokens = 320).
The XLA path materializes the ``[B, P, H, N, N]`` score tensor in HBM
between the two matmuls — for the canonical encoder stage that is
hundreds of MB of HBM traffic per layer.  This kernel keeps Q·K^T,
bias-add, multiplicative masking, softmax and the value aggregation
entirely in VMEM: one HBM read of q/k/v, one HBM write of the output.

Semantics (parity with window_attention.py:49-58):
  scores = (q @ k^T) * scale + pos_bias        (additive bias)
  scores = scores * mask                       (multiplicative pre-softmax
                                                0/1 mask — NOT -inf)
  out    = softmax(scores) @ v

Differentiation: ``pallas_call`` has no automatic VJP, so the op carries
a ``jax.custom_vjp`` whose backward pass recomputes the (cheap, short-N)
scores in plain XLA and applies the analytic softmax backward — flash
style recompute-in-bwd.  The forward therefore never stores the score
tensor.

Grid: one program per (batch·window); heads are unrolled inside the
kernel (2-16 heads, head_dim 12-96).  All shapes static; mask is indexed
per window via the BlockSpec index map.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attention_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref, *,
                      scale: float, num_heads: int, group: int,
                      with_mask: bool):
    """Process ``group`` windows × all heads per program.

    Matmuls run on the MXU in bf16 with fp32 accumulation, batched over
    (group·heads); bias add, masking and softmax stay fp32 in VMEM.
    """
    g, h = group, num_heads
    n, dh = q_ref.shape[2], q_ref.shape[3]
    q = q_ref[:].astype(jnp.bfloat16).reshape(g * h, n, dh)
    k = k_ref[:].astype(jnp.bfloat16).reshape(g * h, n, dh)
    v = v_ref[:].astype(jnp.bfloat16).reshape(g * h, n, dh)
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).reshape(g, h, n, n) * scale
    s = s + bias_ref[:].astype(jnp.float32)[None]
    if with_mask:
        s = s * mask_ref[:].astype(jnp.float32)[:, None]
    probs = jax.nn.softmax(s, axis=-1).reshape(g * h, n, n)
    o = jax.lax.dot_general(
        probs.astype(jnp.bfloat16), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[:] = o.reshape(g, h, n, dh).astype(o_ref.dtype)


_VMEM_BUDGET = 8 * 1024 * 1024  # conservative half of ~16 MB VMEM


def _pick_blocks(bp: int, p, num_heads: int, n: int):
    """(window group g, head block hb) keeping scores+probs+bias in budget.

    Per-program VMEM ≈ 2·g·hb·n²·4 (fp32 scores + softmax temp)
    + hb·n²·4 (bias block); qkv blocks are comparatively tiny.
    """
    per_head = n * n * 4
    hb = num_heads
    while hb > 1 and (3 * hb * per_head > _VMEM_BUDGET or num_heads % hb):
        hb -= 1
    g = max(int((_VMEM_BUDGET - hb * per_head) // (2 * hb * per_head)), 1)
    g = min(g, 8)
    while g > 1 and (bp % g or (p is not None and p % g)):
        g -= 1
    return g, hb


def _forward_pallas(q, k, v, bias, mask, scale, interpret=False):
    """q/k/v: [BP, H, N, Dh]; bias: [H, N, N]; mask: [P, N, N] or None."""
    bp, num_heads, n, dh = q.shape
    p = mask.shape[0] if mask is not None else None
    g, hb = _pick_blocks(bp, p, num_heads, n)
    kernel = functools.partial(
        _attention_kernel, scale=scale, num_heads=hb, group=g,
        with_mask=mask is not None)
    qkv_spec = pl.BlockSpec((g, hb, n, dh), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((hb, n, n), lambda i, j: (j, 0, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [qkv_spec, qkv_spec, qkv_spec, bias_spec]
    args = [q, k, v, bias]
    if mask is not None:
        pg = p // g
        in_specs.append(pl.BlockSpec((g, n, n), lambda i, j: (i % pg, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mask)
    else:
        # Placeholder ref so the kernel signature is uniform.
        in_specs.append(pl.BlockSpec((1, 1, 1), lambda i, j: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(jnp.zeros((1, 1, 1), q.dtype))
    flops = 4 * bp * num_heads * n * n * dh
    return pl.pallas_call(
        kernel,
        grid=(bp // g, num_heads // hb),
        in_specs=in_specs,
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((bp, num_heads, n, dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(3 * q.size + q.size) * q.dtype.itemsize,
            transcendentals=bp * num_heads * n * n),
        interpret=interpret,
    )(*args)


def _scores(q, k, bias, mask, scale):
    s = jnp.einsum("xhnd,xhmd->xhnm", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    s = s + bias[None].astype(jnp.float32)
    if mask is not None:
        bp = q.shape[0]
        p = mask.shape[0]
        b = bp // p
        m = jnp.tile(mask, (b, 1, 1))[:, None]  # [BP, 1, N, N]
        s = s * m
    return s


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _fused(q, k, v, bias, scale, interpret, mask):
    if mask is None:
        return _forward_pallas(q, k, v, bias, None, scale, interpret)
    return _forward_pallas(q, k, v, bias, mask, scale, interpret)


def _fused_fwd(q, k, v, bias, scale, interpret, mask):
    out = _fused(q, k, v, bias, scale, interpret, mask)
    return out, (q, k, v, bias, mask)


def _fused_bwd(scale, interpret, res, g):
    q, k, v, bias, mask = res
    qf, kf, vf = (t.astype(jnp.float32) for t in (q, k, v))
    s = _scores(qf, kf, bias, mask, scale)
    p = jax.nn.softmax(s, axis=-1)
    g32 = g.astype(jnp.float32)
    dv = jnp.einsum("xhnm,xhnd->xhmd", p, g32)
    dp = jnp.einsum("xhnd,xhmd->xhnm", g32, vf)
    dm = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    if mask is not None:
        bp = q.shape[0]
        pwin = mask.shape[0]
        b = bp // pwin
        dm = dm * jnp.tile(mask, (b, 1, 1))[:, None]
    dq = jnp.einsum("xhnm,xhmd->xhnd", dm, kf) * scale
    dk = jnp.einsum("xhnm,xhnd->xhmd", dm, qf) * scale
    dbias = jnp.sum(dm, axis=0)  # bias broadcast over BP
    # The mask is a compile-time 0/1 constant; its cotangent is never
    # used but custom_vjp requires a structural match.
    dmask = None if mask is None else jnp.zeros_like(mask)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dbias.astype(bias.dtype), dmask)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_window_attention(qh: jnp.ndarray, kh: jnp.ndarray, vh: jnp.ndarray,
                           pos_bias: Optional[jnp.ndarray],
                           mask: Optional[jnp.ndarray],
                           scale: float,
                           interpret: bool = False) -> jnp.ndarray:
    """Fused attention over head-split windows.

    Args:
      qh/kh/vh: ``[B, P, N, H, Dh]``.
      pos_bias: ``[1, 1, H, N, N]`` or None.
      mask: ``[1, P, 1, N, N]`` 0/1 multiplicative mask or None.
      scale: softmax scale (``Dh**-0.5``).

    Returns: ``[B, P, N, H, Dh]``.
    """
    b, p, n, h, dh = qh.shape
    to_bp = lambda t: t.transpose(0, 1, 3, 2, 4).reshape(b * p, h, n, dh)
    q, k, v = to_bp(qh), to_bp(kh), to_bp(vh)
    if pos_bias is None:
        bias = jnp.zeros((h, n, n), q.dtype)
    else:
        bias = pos_bias.reshape(h, n, n)
    m = None if mask is None else mask.reshape(p, n, n)
    out = _fused(q, k, v, bias, scale, interpret, m)
    return out.reshape(b, p, h, n, dh).transpose(0, 1, 3, 2, 4)
