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
    m, dh = q_ref.shape[2], q_ref.shape[3]
    n = k_ref.shape[2]
    # scale folded into q pre-matmul (fp32): saves one fp32 pass over
    # the h-times-larger [g, h, m, n] score tile.
    q = (q_ref[:].astype(jnp.float32) * jnp.float32(scale)) \
        .astype(jnp.bfloat16).reshape(g * h, m, dh)
    k = k_ref[:].astype(jnp.bfloat16).reshape(g * h, n, dh)
    v = v_ref[:].astype(jnp.bfloat16).reshape(g * h, n, dh)
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).reshape(g, h, m, n)
    s = s + bias_ref[:].astype(jnp.float32)[None]
    if with_mask:
        s = s * mask_ref[:].astype(jnp.float32)[:, None]
    probs = jax.nn.softmax(s, axis=-1).reshape(g * h, m, n)
    o = jax.lax.dot_general(
        probs.astype(jnp.bfloat16), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[:] = o.reshape(g, h, m, dh).astype(o_ref.dtype)


# Conservative: Mosaic stack-allocates softmax temporaries beyond the
# explicit buffers, so size for ~16 MB VMEM with ~2.5x headroom.
# Env-tunable for perf sweeps (bytes).
import os as _os

_VMEM_BUDGET = int(_os.environ.get("MIVP_VMEM_BUDGET", 6 * 1024 * 1024))

# Test hook: when True, module code treats Pallas as available and every
# kernel runs in interpreter mode — lets CPU tests exercise the full
# fused/folded model paths, not just the kernels in isolation.
_FORCE_INTERPRET = False

# Test hook: pretend the trace targets TPU so the kernel paths are taken
# WITHOUT interpret mode — used by the cross-platform AOT lowering tests
# (jax.export platforms=["tpu"]), which verify the Pallas→Mosaic dialect
# lowering of every flagship kernel without a live device.
_FORCE_TPU_PATH = False


def force_interpret() -> bool:
    return _FORCE_INTERPRET


def mosaic_params(vmem_limit_bytes=None) -> "pltpu.CompilerParams | None":
    """Per-kernel Mosaic compiler params shared by every pallas_call.

    When the sweep/env raises the repo's scoped-VMEM picker budget past
    the compiler default (``MIVP_VMEM_SAFE_MB`` > 14), raise Mosaic's own
    VMEM limit to match (+4 MB scheduling headroom).  Per-kernel
    ``vmem_limit_bytes`` travels inside the serialized Mosaic payload, so
    unlike ``--xla_tpu_scoped_vmem_limit_kib`` it survives this
    environment's remote-compile tunnel (the local process does not even
    register TPU XLA flags).

    ``vmem_limit_bytes``: explicit PER-CALL limit (the tuned tiling
    table, fused_block._pick_tiling) — raising one hot kernel's budget
    without perturbing every other kernel's tiling, which is how the
    round-4 global-env A/B lost 7.5% model-level while winning 12%
    kernel-level (docs/PERF.md).
    """
    if vmem_limit_bytes is not None:
        return pltpu.CompilerParams(vmem_limit_bytes=int(vmem_limit_bytes))
    mb = float(_os.environ.get("MIVP_VMEM_SAFE_MB", "14"))
    if mb <= 14:
        return None
    return pltpu.CompilerParams(
        vmem_limit_bytes=int((mb + 4) * 1024 * 1024))


def on_tpu_path() -> bool:
    """True when kernel code paths should be selected at trace time."""
    import jax
    return jax.default_backend() == "tpu" or _FORCE_TPU_PATH


def _pick_blocks(bp: int, p, num_heads: int, m: int, n: int):
    """(window group g, head block hb) keeping scores+probs+bias in budget.

    Per-program VMEM ≈ 2·g·hb·m·n·4 (fp32 scores + softmax temp)
    + hb·m·n·4 (bias block); qkv blocks are comparatively tiny.
    """
    per_head = m * n * 4
    hb = num_heads
    while hb > 1 and (3 * hb * per_head > _VMEM_BUDGET or num_heads % hb):
        hb -= 1
    g = max(int((_VMEM_BUDGET - hb * per_head) // (2 * hb * per_head)), 1)
    g = min(g, 8)
    while g > 1 and (bp % g or (p is not None and p % g)):
        g -= 1
    return g, hb


def _forward_pallas(q, k, v, bias, mask, scale, interpret=False):
    """q: [BP, H, M, Dh]; k/v: [BP, H, N, Dh]; bias: [H, M, N];
    mask: [P, M, N] or None."""
    bp, num_heads, m, dh = q.shape
    n = k.shape[2]
    p = mask.shape[0] if mask is not None else None
    g, hb = _pick_blocks(bp, p, num_heads, m, n)
    kernel = functools.partial(
        _attention_kernel, scale=scale, num_heads=hb, group=g,
        with_mask=mask is not None)
    q_spec = pl.BlockSpec((g, hb, m, dh), lambda i, j: (i, j, 0, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((g, hb, n, dh), lambda i, j: (i, j, 0, 0),
                           memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((hb, m, n), lambda i, j: (j, 0, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [q_spec, kv_spec, kv_spec, bias_spec]
    args = [q, k, v, bias]
    if mask is not None:
        pg = p // g
        in_specs.append(pl.BlockSpec((g, m, n), lambda i, j: (i % pg, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mask)
    else:
        # Placeholder ref so the kernel signature is uniform.
        in_specs.append(pl.BlockSpec((1, 1, 1), lambda i, j: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(jnp.zeros((1, 1, 1), q.dtype))
    flops = 4 * bp * num_heads * m * n * dh
    return pl.pallas_call(
        kernel,
        grid=(bp // g, num_heads // hb),
        in_specs=in_specs,
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((bp, num_heads, m, dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(2 * k.size + 2 * q.size) * q.dtype.itemsize,
            transcendentals=bp * num_heads * m * n),
        interpret=interpret or _FORCE_INTERPRET,
        compiler_params=mosaic_params(),
    )(*args)


# ---------------------------------------------------------------- packed
# For C = num_heads * head_dim <= 128 (one MXU k-tile), per-head matmuls
# waste 128/head_dim of the systolic array's contraction dim (head_dim is
# 12-24 here).  The packed kernel instead builds a block-diagonal query
# Q' [(h·m), C] (row block h carries only head h's feature columns) so
#   Q' @ K^T  ->  [(h·m), n]  ==  per-head scores stacked on rows,
# one dense MXU matmul at full k-width.  The value aggregation runs as
# P [(h·m), n] @ V [n, C] followed by a per-head column extraction.


def _packed_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, colmask_ref,
                   o_ref, *, scale: float, num_heads: int, group: int,
                   with_mask: bool):
    """3D-only ops (Mosaic-friendly): the per-head structure is expressed
    with static slices/concats along the sublane axis, never 4D
    broadcasts.  bias_ref is pre-packed host-side as [(h·m), n]."""
    g, h = group, num_heads
    m, c = q_ref.shape[1], q_ref.shape[2]
    n = k_ref.shape[1]
    # scale folded into q pre-matmul (fp32): saves one fp32 pass over
    # the h-times-larger [g, h*m, n] score tile.
    q = (q_ref[:].astype(jnp.float32) * jnp.float32(scale)) \
        .astype(jnp.bfloat16)                    # [g, m, C]
    colmask = colmask_ref[:].astype(jnp.bfloat16)  # [h, C]
    # Block-diagonal queries: concat per-head masked copies -> [g, h*m, C].
    qp = jnp.concatenate([q * colmask[hh][None, None, :]
                          for hh in range(h)], axis=1)
    k = k_ref[:].astype(jnp.bfloat16)            # [g, n, C]
    v = v_ref[:].astype(jnp.bfloat16)
    s = jax.lax.dot_general(
        qp, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)      # [g, h*m, n]
    s = s + bias_ref[:].astype(jnp.float32)[None]    # [(h m), n] broadcast
    if with_mask:
        mask = mask_ref[:].astype(jnp.float32)       # [g, m, n]
        s = s * jnp.concatenate([mask] * h, axis=1)
    p = jax.nn.softmax(s, axis=-1)
    o_full = jax.lax.dot_general(
        p.astype(jnp.bfloat16), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)      # [g, h*m, C]
    colmask32 = colmask_ref[:].astype(jnp.float32)
    o = o_full[:, 0:m, :] * colmask32[0][None, None, :]
    for hh in range(1, h):
        o = o + o_full[:, hh * m:(hh + 1) * m, :] \
            * colmask32[hh][None, None, :]
    o_ref[:] = o.astype(o_ref.dtype)


def _pick_group_packed(bp: int, p, num_heads: int, m: int, n: int) -> int:
    # Perf-SWEEP knobs, default off: MIVP_FORCE_HB overrides the head
    # count used for the VMEM bound (the fused block kernel blocks heads,
    # so hb<heads shrinks its score tile and allows larger groups);
    # MIVP_FORCE_G caps the group.  DANGER: the plain packed kernel has
    # NO head blocking — forcing hb<num_heads while it is in use
    # undersizes its [g, H*m, n] score tile and OOMs VMEM.  Never set
    # these outside tiling sweeps.
    hb = int(_os.environ.get("MIVP_FORCE_HB", "0")) or num_heads
    force_g = int(_os.environ.get("MIVP_FORCE_G", "0"))
    per_g = 2 * hb * m * n * 4  # fp32 scores + softmax temp
    g = max(int(_VMEM_BUDGET // max(per_g, 1)), 1)
    g = min(g, force_g or 8)
    while g > 1 and (bp % g or (p is not None and p % g)):
        g -= 1
    return g


def _forward_packed(q, k, v, bias, mask, scale, num_heads, interpret=False):
    """q: [BP, M, C]; k/v: [BP, N, C]; bias: [H, M, N]; mask [P, M, N]."""
    import numpy as np
    bp, m, c = q.shape
    n = k.shape[1]
    dh = c // num_heads
    p = mask.shape[0] if mask is not None else None
    g = _pick_group_packed(bp, p, num_heads, m, n)
    colmask_np = np.zeros((num_heads, c), np.float32)
    for hh in range(num_heads):
        colmask_np[hh, hh * dh:(hh + 1) * dh] = 1.0
    kernel = functools.partial(
        _packed_kernel, scale=scale, num_heads=num_heads, group=g,
        with_mask=mask is not None)
    q_spec = pl.BlockSpec((g, m, c), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((g, n, c), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((num_heads * m, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    colmask_spec = pl.BlockSpec((num_heads, c), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
    in_specs = [q_spec, kv_spec, kv_spec, bias_spec]
    args = [q, k, v, bias.reshape(num_heads * m, n)]
    if mask is not None:
        pg = p // g
        in_specs.append(pl.BlockSpec((g, m, n), lambda i: (i % pg, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mask)
    else:
        in_specs.append(pl.BlockSpec((1, 1, 1), lambda i: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(jnp.zeros((1, 1, 1), q.dtype))
    in_specs.append(colmask_spec)
    args.append(jnp.asarray(colmask_np))
    return pl.pallas_call(
        kernel,
        grid=(bp // g,),
        in_specs=in_specs,
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((bp, m, c), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bp * num_heads * m * n * dh,
            bytes_accessed=(2 * k.size + 2 * q.size) * q.dtype.itemsize,
            transcendentals=bp * num_heads * m * n),
        interpret=interpret or _FORCE_INTERPRET,
        compiler_params=mosaic_params(),
    )(*args)


def _scores(q, k, bias, mask, scale):
    """q: [BP,H,M,Dh]; k: [BP,H,N,Dh] -> [BP,H,M,N]."""
    s = jnp.einsum("xhmd,xhnd->xhmn", q.astype(jnp.float32),
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
    s = _scores(qf, kf, bias, mask, scale)  # [BP, H, M, N]
    p = jax.nn.softmax(s, axis=-1)
    g32 = g.astype(jnp.float32)
    dv = jnp.einsum("xhmn,xhmd->xhnd", p, g32)
    dp = jnp.einsum("xhmd,xhnd->xhmn", g32, vf)
    dm = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    if mask is not None:
        bp = q.shape[0]
        pwin = mask.shape[0]
        b = bp // pwin
        dm = dm * jnp.tile(mask, (b, 1, 1))[:, None]
    dq = jnp.einsum("xhmn,xhnd->xhmd", dm, kf) * scale
    dk = jnp.einsum("xhmn,xhmd->xhnd", dm, qf) * scale
    dbias = jnp.sum(dm, axis=0)  # bias broadcast over BP
    # The mask is a compile-time 0/1 constant; its cotangent is never
    # used but custom_vjp requires a structural match.
    dmask = None if mask is None else jnp.zeros_like(mask)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dbias.astype(bias.dtype), dmask)


_fused.defvjp(_fused_fwd, _fused_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _fused_packed(q, k, v, bias, scale, num_heads, interpret, mask):
    return _forward_packed(q, k, v, bias, mask, scale, num_heads, interpret)


def _fused_packed_fwd(q, k, v, bias, scale, num_heads, interpret, mask):
    out = _fused_packed(q, k, v, bias, scale, num_heads, interpret, mask)
    return out, (q, k, v, bias, mask)


def _fused_packed_bwd(scale, num_heads, interpret, res, g):
    q, k, v, bias, mask = res
    bp, m, c = q.shape
    n = k.shape[1]
    dh = c // num_heads
    split = lambda t: t.reshape(bp, t.shape[1], num_heads, dh).transpose(
        0, 2, 1, 3)
    merge = lambda t: t.transpose(0, 2, 1, 3).reshape(bp, t.shape[2], c)
    dq, dk, dv, dbias, dmask = _fused_bwd(
        scale, interpret, (split(q), split(k), split(v), bias, mask),
        split(g))
    return merge(dq), merge(dk), merge(dv), dbias, dmask


_fused_packed.defvjp(_fused_packed_fwd, _fused_packed_bwd)


# -------------------------------------------------------------- qkv-fused
# One step further for C <= 128: the q/k/v projections run inside the
# kernel too, so HBM sees ONE read of the post-LN activations instead of
# three projected tensors (plus the layout-conversion copies XLA inserted
# for the kernel operands — ~2 ms/forward in traces).


def _packed_qkv_kernel(y_ref, wq_ref, wk_ref, wv_ref, bias_ref, mask_ref,
                       colmask_ref, o_ref, *, scale: float, num_heads: int,
                       group: int, m_len: int, with_mask: bool):
    g, h, m = group, num_heads, m_len
    n, c = y_ref.shape[1], y_ref.shape[2]
    y = y_ref[:].astype(jnp.bfloat16)                  # [g, n, C]
    wq = wq_ref[:].astype(jnp.bfloat16)
    wk = wk_ref[:].astype(jnp.bfloat16)
    wv = wv_ref[:].astype(jnp.bfloat16)
    y_m = y[:, :m, :]
    # Mosaic requires fp32 matmul accumulators; cast results to bf16.
    q = jax.lax.dot_general(y_m, wq, (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32
                            ).astype(jnp.bfloat16)
    k = jax.lax.dot_general(y, wk, (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32
                            ).astype(jnp.bfloat16)
    v = jax.lax.dot_general(y, wv, (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32
                            ).astype(jnp.bfloat16)
    colmask = colmask_ref[:].astype(jnp.bfloat16)      # [h, C]
    qp = jnp.concatenate([q * colmask[hh][None, None, :]
                          for hh in range(h)], axis=1)  # [g, h*m, C]
    s = jax.lax.dot_general(
        qp, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale     # [g, h*m, n]
    s = s + bias_ref[:].astype(jnp.float32)[None]
    if with_mask:
        mask = mask_ref[:].astype(jnp.float32)          # [g, m, n]
        s = s * jnp.concatenate([mask] * h, axis=1)
    p = jax.nn.softmax(s, axis=-1)
    o_full = jax.lax.dot_general(
        p.astype(jnp.bfloat16), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)             # [g, h*m, C]
    colmask32 = colmask_ref[:].astype(jnp.float32)
    o = o_full[:, 0:m, :] * colmask32[0][None, None, :]
    for hh in range(1, h):
        o = o + o_full[:, hh * m:(hh + 1) * m, :] \
            * colmask32[hh][None, None, :]
    o_ref[:] = o.astype(o_ref.dtype)


def _forward_packed_qkv(y, wq, wk, wv, bias, mask, scale, num_heads, m_len,
                        interpret=False):
    """y: [BP, N, C]; w*: [C, C]; bias: [H, M, N]; mask: [P, M, N]."""
    import numpy as np
    bp, n, c = y.shape
    dh = c // num_heads
    p = mask.shape[0] if mask is not None else None
    g = _pick_group_packed(bp, p, num_heads, m_len, n)
    colmask_np = np.zeros((num_heads, c), np.float32)
    for hh in range(num_heads):
        colmask_np[hh, hh * dh:(hh + 1) * dh] = 1.0
    kernel = functools.partial(
        _packed_qkv_kernel, scale=scale, num_heads=num_heads, group=g,
        m_len=m_len, with_mask=mask is not None)
    y_spec = pl.BlockSpec((g, n, c), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((g, m_len, c), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((c, c), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((num_heads * m_len, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    colmask_spec = pl.BlockSpec((num_heads, c), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
    in_specs = [y_spec, w_spec, w_spec, w_spec, bias_spec]
    args = [y, wq, wk, wv, bias.reshape(num_heads * m_len, n)]
    if mask is not None:
        pg = p // g
        in_specs.append(pl.BlockSpec((g, m_len, n),
                                     lambda i: (i % pg, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mask)
    else:
        in_specs.append(pl.BlockSpec((1, 1, 1), lambda i: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(jnp.zeros((1, 1, 1), y.dtype))
    in_specs.append(colmask_spec)
    args.append(jnp.asarray(colmask_np))
    return pl.pallas_call(
        kernel,
        grid=(bp // g,),
        in_specs=in_specs,
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((bp, m_len, c), y.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bp * num_heads * m_len * n * dh
            + 6 * bp * n * c * c,
            bytes_accessed=2 * y.size * y.dtype.itemsize,
            transcendentals=bp * num_heads * m_len * n),
        interpret=interpret or _FORCE_INTERPRET,
        compiler_params=mosaic_params(),
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _fused_packed_qkv(y, wq, wk, wv, scale, num_heads, m_len, interpret,
                      bias, mask):
    return _forward_packed_qkv(y, wq, wk, wv, bias, mask, scale, num_heads,
                               m_len, interpret)


def _fused_packed_qkv_fwd(y, wq, wk, wv, scale, num_heads, m_len, interpret,
                          bias, mask):
    out = _fused_packed_qkv(y, wq, wk, wv, scale, num_heads, m_len,
                            interpret, bias, mask)
    return out, (y, wq, wk, wv, bias, mask)


def _fused_packed_qkv_bwd(scale, num_heads, m_len, interpret, res, g):
    y, wq, wk, wv, bias, mask = res
    yf = y.astype(jnp.float32)
    q = (yf[:, :m_len] @ wq.astype(jnp.float32))
    k = yf @ wk.astype(jnp.float32)
    v = yf @ wv.astype(jnp.float32)
    dq, dk, dv, dbias, dmask = _fused_packed_bwd(
        scale, num_heads, interpret, (q, k, v, bias, mask),
        g.astype(jnp.float32))
    dwq = jnp.einsum("xnc,xnd->cd", yf[:, :m_len], dq)
    dwk = jnp.einsum("xnc,xnd->cd", yf, dk)
    dwv = jnp.einsum("xnc,xnd->cd", yf, dv)
    dy = dk @ wk.astype(jnp.float32).T + dv @ wv.astype(jnp.float32).T
    dy_q = dq @ wq.astype(jnp.float32).T
    dy = dy.at[:, :m_len].add(dy_q)
    return (dy.astype(y.dtype), dwq.astype(wq.dtype),
            dwk.astype(wk.dtype), dwv.astype(wv.dtype), dbias, dmask)


_fused_packed_qkv.defvjp(_fused_packed_qkv_fwd, _fused_packed_qkv_bwd)


def fused_window_attention_packed_qkv(y: jnp.ndarray, wq: jnp.ndarray,
                                      wk: jnp.ndarray, wv: jnp.ndarray,
                                      m_len: int,
                                      pos_bias: Optional[jnp.ndarray],
                                      mask: Optional[jnp.ndarray],
                                      scale: float, num_heads: int,
                                      compute_dtype=jnp.float32,
                                      interpret: bool = False) -> jnp.ndarray:
    """qkv-fused packed attention on shared post-LN activations.

    Args:
      y: ``[B, P, N, C]`` post-norm window tokens (content rows first);
      wq/wk/wv: ``[C, C]`` bias-free projections;
      m_len: number of content-query rows;
      pos_bias: ``[1, 1, H, M, N]``; mask: ``[1, P, 1, M, N]``.

    Returns: ``[B, P, M, C]`` attention output (pre-proj).
    """
    b, p, n, c = y.shape
    if pos_bias is None:
        bias = jnp.zeros((num_heads, m_len, n), jnp.float32)
    else:
        bias = pos_bias.reshape(num_heads, m_len, n)
    msk = None if mask is None else mask.reshape(p, m_len, n)
    yf = y.reshape(b * p, n, c).astype(compute_dtype)
    out = _fused_packed_qkv(yf, wq.astype(compute_dtype),
                            wk.astype(compute_dtype),
                            wv.astype(compute_dtype), scale, num_heads,
                            m_len, interpret, bias, msk)
    return out.reshape(b, p, m_len, c)


def fused_window_attention_packed(q: jnp.ndarray, k: jnp.ndarray,
                                  v: jnp.ndarray,
                                  pos_bias: Optional[jnp.ndarray],
                                  mask: Optional[jnp.ndarray],
                                  scale: float, num_heads: int,
                                  interpret: bool = False) -> jnp.ndarray:
    """Packed (block-diagonal head) fused attention for C <= 128.

    Args:
      q: ``[B, P, M, C]`` (heads NOT split); k/v: ``[B, P, N, C]``.
      pos_bias: ``[1, 1, H, M, N]`` or None; mask: ``[1, P, 1, M, N]``.

    Returns: ``[B, P, M, C]``.
    """
    b, p, m_len, c = q.shape
    n = k.shape[2]
    fold = lambda t: t.reshape(b * p, t.shape[2], c)
    if pos_bias is None:
        bias = jnp.zeros((num_heads, m_len, n), q.dtype)
    else:
        bias = pos_bias.reshape(num_heads, m_len, n)
    msk = None if mask is None else mask.reshape(p, m_len, n)
    out = _fused_packed(fold(q), fold(k), fold(v), bias, scale, num_heads,
                        interpret, msk)
    return out.reshape(b, p, m_len, c)


def fused_window_attention(qh: jnp.ndarray, kh: jnp.ndarray, vh: jnp.ndarray,
                           pos_bias: Optional[jnp.ndarray],
                           mask: Optional[jnp.ndarray],
                           scale: float,
                           interpret: bool = False) -> jnp.ndarray:
    """Fused attention over head-split windows.

    Args:
      qh: ``[B, P, M, H, Dh]`` (M may be < N: content-query attention).
      kh/vh: ``[B, P, N, H, Dh]``.
      pos_bias: ``[1, 1, H, M, N]`` or None.
      mask: ``[1, P, 1, M, N]`` 0/1 multiplicative mask or None.
      scale: softmax scale (``Dh**-0.5``).

    Returns: ``[B, P, M, H, Dh]``.
    """
    b, p, m_len, h, dh = qh.shape
    n = kh.shape[2]
    to_bp = lambda t: t.transpose(0, 1, 3, 2, 4).reshape(
        b * p, h, t.shape[2], dh)
    q, k, v = to_bp(qh), to_bp(kh), to_bp(vh)
    if pos_bias is None:
        bias = jnp.zeros((h, m_len, n), q.dtype)
    else:
        bias = pos_bias.reshape(h, m_len, n)
    m = None if mask is None else mask.reshape(p, m_len, n)
    out = _fused(q, k, v, bias, scale, interpret, m)
    return out.reshape(b, p, h, m_len, dh).transpose(0, 1, 3, 2, 4)
