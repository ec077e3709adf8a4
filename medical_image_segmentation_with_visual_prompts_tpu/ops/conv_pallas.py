"""Pallas 3x3 (depth-folded) convolution with in-VMEM tap reduction.

The two remaining conv hot spots (docs/PERF.md round 2) both round-trip
a tap tensor through HBM:

* seg head 48->2 at [16,128,128,8]: einsum to 54 tap columns (226 MB),
  an XLA layout-fix copy (453 MB touched) and a 27-slice reduce —
  ~2.05 ms;
* decoder conv_concat 144->48 at [16,64,64,4]: ~2.14 ms as folded tap
  matmuls.

Both depth-fold to a 3x3 2D conv over ``[B, H, W, D*Cin]`` (see
ops/conv_fold.py).  This kernel computes, per (batch, row-tile) program:

    xs   <- DMA of the tile + 1 halo row each side        (bf16, VMEM)
    xs   <- xs * scale + shift; optional leaky_relu       (folded prenorm)
    z    = xs @ Wall[Cf, 9*Co]        one full-width MXU matmul
    out  = sum over 9 taps of row/col-shifted z slices    (fp32, VMEM)

One HBM read of x, one write of out — the tap tensor never leaves VMEM.
W-edge effects are masked with iota row masks; H-halo rows come from a
1-row zero pad added by the caller.  Gradients: ``jax.custom_vjp``
differentiating the jnp depth-folded reference (conv is linear).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .conv_fold import conv3d_depth_folded, depth_fold_weights
from .window_attention_pallas import mosaic_params as _mosaic_params


def _kernel(x_hbm, wall_ref, aff_ref, bias_ref, o_ref, xs, sem, *,
            th: int, wdt: int, cf: int, co: int, n_h: int, leaky: bool,
            with_affine: bool, tap_group: int):
    step = pl.program_id(0)
    n_prog = pl.num_programs(0)
    i = step % n_h

    # Double-buffered input DMA: scratch persists across the sequential
    # grid, so program ``step`` prefetches ``step+1``'s tile while its
    # own (started by ``step-1``) completes.
    def dma(s, slot):
        return pltpu.make_async_copy(
            x_hbm.at[s // n_h, pl.ds((s % n_h) * th, th + 2)],
            xs.at[slot], sem.at[slot])

    @pl.when(step == 0)
    def _():
        dma(0, 0).start()

    @pl.when(step + 1 < n_prog)
    def _():
        dma(step + 1, (step + 1) % 2).start()

    dma(step, step % 2).wait()
    x = xs[step % 2]                                    # [th+2, W, Cf] bf16
    if with_affine:
        x = x * aff_ref[0].astype(x.dtype)[None, None, :] \
            + aff_ref[1].astype(x.dtype)[None, None, :]
    if leaky:
        # max(x, 0.01*x) == leaky_relu for slope<1; Mosaic has no bf16
        # cmpf, so avoid jnp.where on bf16 operands.
        x = jnp.maximum(x, jnp.asarray(0.01, x.dtype) * x)
    if with_affine or leaky:
        # Conv zero-padding applies AFTER the affine prologue: re-zero
        # the halo rows that lie outside the volume (boundary tiles).
        row = jax.lax.broadcasted_iota(jnp.int32, (th + 2, 1, 1), 0)
        lo_bad = ((row == 0) & (i == 0))
        hi_bad = ((row == th + 1) & (i == n_h - 1))
        x = jnp.where(lo_bad | hi_bad, jnp.asarray(0.0, x.dtype), x)
    rows = (th + 2) * wdt
    x2 = x.reshape(rows, cf)
    out_rows = th * wdt
    # W-edge masks over the OUTPUT rows (w = row % W).
    w_of = jax.lax.broadcasted_iota(jnp.int32, (out_rows, 1), 0) % wdt
    not_w0 = (w_of != 0).astype(jnp.float32)
    not_wl = (w_of != wdt - 1).astype(jnp.float32)
    acc = bias_ref[0].astype(jnp.float32)[None, :] \
        * jnp.ones((out_rows, 1), jnp.float32)
    gt = tap_group
    for g in range(9 // gt):
        # Tap-group matmul keeps the fp32 z tile VMEM-bounded.
        z = jax.lax.dot_general(
            x2, wall_ref[:, g * gt * co:(g + 1) * gt * co].astype(
                jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)         # [rows, gt*Co]
        zpad = jnp.zeros((8, gt * co), jnp.float32)
        z = jnp.concatenate([zpad, z, zpad], axis=0)
        for j in range(gt):
            t = g * gt + j
            ih, iw = t // 3, t % 3
            start = 8 + wdt + (ih - 1) * wdt + (iw - 1)
            zs = z[start:start + out_rows, j * co:(j + 1) * co]
            if iw == 0:
                zs = zs * not_w0
            elif iw == 2:
                zs = zs * not_wl
            acc = acc + zs
    o_ref[:] = acc.reshape(1, th, wdt, co).astype(o_ref.dtype)


def _pick_tile(h: int, wdt: int, cf: int, co: int,
               budget: int = 4 * 1024 * 1024):
    """(tile height, tap group) with 2x xs (double buffer) + fp32 z tile
    + acc in budget (Mosaic stack-allocates beyond the explicit
    buffers)."""
    for th in range(min(h, 32), 0, -1):
        if h % th:
            continue
        for gt in (9, 3, 1):
            xs = 2 * (th + 2) * wdt * cf * 2
            z = ((th + 2) * wdt + 16) * gt * co * 4
            out = th * wdt * co * 4
            if xs + z + out <= budget:
                return th, gt
    return 1, 1


def _forward(x2, w2, bias, scale, shift, leaky, out_dtype,
             interpret=False):
    """x2: [B, H, W, Cf]; w2: [3, 3, Cf, Co] (depth-folded weights)."""
    b, h, wdt, cf = x2.shape
    co = w2.shape[-1]
    # Lane-align the folded channel count: DMA slices of a lane-padded
    # HBM buffer must cover whole 128-lane tiles.
    cpad = (-cf) % 128
    if cpad:
        x2 = jnp.pad(x2, ((0, 0), (0, 0), (0, 0), (0, cpad)))
        w2 = jnp.pad(w2, ((0, 0), (0, 0), (0, cpad), (0, 0)))
        if scale is not None:
            scale = jnp.pad(scale, (0, cpad))
            shift = jnp.pad(shift, (0, cpad))
        cf += cpad
    th, gt = _pick_tile(h, wdt, cf, co)
    n_h = h // th
    xp = jnp.pad(x2, ((0, 0), (1, 1), (0, 0), (0, 0)))  # H halo rows
    wall = w2.reshape(9, cf, co).transpose(1, 0, 2).reshape(cf, 9 * co)
    with_affine = scale is not None
    if with_affine:
        aff = jnp.stack([scale, shift]).astype(jnp.float32)  # [2, Cf]
    else:
        aff = jnp.zeros((2, cf), jnp.float32)
    kernel = functools.partial(
        _kernel, th=th, wdt=wdt, cf=cf, co=co, n_h=n_h, leaky=leaky,
        with_affine=with_affine, tap_group=gt)
    return pl.pallas_call(
        kernel,
        grid=(b * n_h,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),           # x stays HBM
            pl.BlockSpec((cf, 9 * co), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, cf), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, wdt, co),
            lambda i: (i // n_h, i % n_h, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, wdt, co), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, wdt, cf), x2.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * wdt * cf * 9 * co,
            bytes_accessed=x2.size * x2.dtype.itemsize
            + b * h * wdt * co * 4,
            transcendentals=0),
        interpret=interpret or _force_interpret(),
        compiler_params=_mosaic_params(),
    )(xp, wall, aff, bias.reshape(1, co))


def _force_interpret():
    from . import window_attention_pallas as wap
    return wap.force_interpret()


def _reference(x, kernel, bias, scale, shift, leaky):
    """jnp mirror at the 3D level (differentiable)."""
    xf = x.astype(jnp.float32)
    if scale is not None:
        xf = xf * scale + shift
    if leaky:
        xf = jnp.where(xf >= 0, xf, 0.01 * xf)
    return conv3d_depth_folded(xf.astype(jnp.bfloat16), kernel, bias,
                               dtype=jnp.bfloat16).astype(jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _conv_op(x, kernel, bias, scale, shift, leaky, out_dtype, interpret):
    b, h, wdt, d, cin = x.shape
    co = kernel.shape[-1]
    w2 = depth_fold_weights(kernel.astype(jnp.bfloat16), d)
    x2 = x.astype(jnp.bfloat16).reshape(b, h, wdt, d * cin)
    sc = None if scale is None else jnp.tile(scale, d)
    sh = None if scale is None else jnp.tile(shift, d)
    bias2 = jnp.tile(bias, d)
    y2 = _forward(x2, w2, bias2, sc, sh, leaky, out_dtype, interpret)
    return y2.reshape(b, h, wdt, d, co)


def _conv_op_fwd(x, kernel, bias, scale, shift, leaky, out_dtype,
                 interpret):
    out = _conv_op(x, kernel, bias, scale, shift, leaky, out_dtype,
                   interpret)
    return out, (x, kernel, bias, scale, shift)


def _conv_op_bwd(leaky, out_dtype, interpret, res, g):
    x, kernel, bias, scale, shift = res
    if scale is None:
        ref = lambda x_, k_, b_: _reference(x_, k_, b_, None, None,
                                            leaky).astype(out_dtype)
        _, vjp = jax.vjp(ref, x, kernel, bias)
        dx, dk, db = vjp(g.astype(out_dtype))
        return dx, dk, db, None, None
    ref = lambda *a: _reference(*a, leaky).astype(out_dtype)
    _, vjp = jax.vjp(ref, x, kernel, bias, scale, shift)
    return vjp(g.astype(out_dtype))


_conv_op.defvjp(_conv_op_fwd, _conv_op_bwd)


def conv3x3_fused(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
                  scale: Optional[jnp.ndarray] = None,
                  shift: Optional[jnp.ndarray] = None,
                  leaky: bool = False, out_dtype=jnp.float32,
                  interpret: bool = False) -> jnp.ndarray:
    """'same' stride-1 3x3x3 conv over [B, H, W, D, Cin] with an optional
    fused per-channel affine (+ LeakyReLU) prologue.

    ``scale``/``shift`` fold a preceding (inference-mode) BatchNorm into
    the kernel; pass None to skip.  Returns [B, H, W, D, Cout] in
    ``out_dtype``.
    """
    return _conv_op(x, kernel, bias, scale, shift, leaky, out_dtype,
                    interpret)


# ---------------------------------------------------------------- pair
# Decoder conv_concat without materializing the concat: the channel
# concat, post-concat depth-fold reshape and 640-lane pad around
# conv3x3_fused cost ~4.2 ms/volume of pure data formatting in traces
# (pad_maximum_fusion + reshape + pad).  This variant takes the two
# concat inputs (upsampled trunk, skip) SEPARATELY in their own
# depth-folded 2D forms and splits the tap matmul by linearity:
#
#     z = xa2 @ Wall_a + xb2 @ Wall_b
#
# where Wall_a / Wall_b are the folded weight rows permuted to each
# part's (depth, channel) row order.  MXU cost is identical (same total
# contraction rows); the concatenated tensor never exists.


def _kernel_pair(xa_hbm, xb_hbm, wa_ref, wb_ref, aff_ref, bias_ref,
                 o_ref, xsa, xsb, sema, semb, *, th: int, wdt: int,
                 cfa: int, cfb: int, co: int, n_h: int, leaky: bool,
                 with_affine: bool, tap_group: int):
    step = pl.program_id(0)
    n_prog = pl.num_programs(0)
    i = step % n_h

    def dma(s, slot, src, dst, sem):
        return pltpu.make_async_copy(
            src.at[s // n_h, pl.ds((s % n_h) * th, th + 2)],
            dst.at[slot], sem.at[slot])

    @pl.when(step == 0)
    def _():
        dma(0, 0, xa_hbm, xsa, sema).start()
        dma(0, 0, xb_hbm, xsb, semb).start()

    @pl.when(step + 1 < n_prog)
    def _():
        dma(step + 1, (step + 1) % 2, xa_hbm, xsa, sema).start()
        dma(step + 1, (step + 1) % 2, xb_hbm, xsb, semb).start()

    dma(step, step % 2, xa_hbm, xsa, sema).wait()
    dma(step, step % 2, xb_hbm, xsb, semb).wait()

    row = jax.lax.broadcasted_iota(jnp.int32, (th + 2, 1, 1), 0)
    lo_bad = (row == 0) & (i == 0)
    hi_bad = (row == th + 1) & (i == n_h - 1)

    def prep(xs, c0, cn):
        x = xs
        if with_affine:
            x = x * aff_ref[0, c0:c0 + cn].astype(x.dtype)[None, None, :] \
                + aff_ref[1, c0:c0 + cn].astype(x.dtype)[None, None, :]
        if leaky:
            x = jnp.maximum(x, jnp.asarray(0.01, x.dtype) * x)
        if with_affine or leaky:
            x = jnp.where(lo_bad | hi_bad, jnp.asarray(0.0, x.dtype), x)
        return x.reshape((th + 2) * wdt, cn)

    xa2 = prep(xsa[step % 2], 0, cfa)
    xb2 = prep(xsb[step % 2], cfa, cfb)
    out_rows = th * wdt
    w_of = jax.lax.broadcasted_iota(jnp.int32, (out_rows, 1), 0) % wdt
    not_w0 = (w_of != 0).astype(jnp.float32)
    not_wl = (w_of != wdt - 1).astype(jnp.float32)
    acc = bias_ref[0].astype(jnp.float32)[None, :] \
        * jnp.ones((out_rows, 1), jnp.float32)
    gt = tap_group
    for g in range(9 // gt):
        cols = slice(g * gt * co, (g + 1) * gt * co)
        z = jax.lax.dot_general(
            xa2, wa_ref[:, cols].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) \
            + jax.lax.dot_general(
                xb2, wb_ref[:, cols].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        zpad = jnp.zeros((8, gt * co), jnp.float32)
        z = jnp.concatenate([zpad, z, zpad], axis=0)
        for j in range(gt):
            t = g * gt + j
            ih, iw = t // 3, t % 3
            start = 8 + wdt + (ih - 1) * wdt + (iw - 1)
            zs = z[start:start + out_rows, j * co:(j + 1) * co]
            if iw == 0:
                zs = zs * not_w0
            elif iw == 2:
                zs = zs * not_wl
            acc = acc + zs
    o_ref[:] = acc.reshape(1, th, wdt, co).astype(o_ref.dtype)


def _lane_pad(x2, cf):
    pad = (-cf) % 128
    if pad:
        x2 = jnp.pad(x2, ((0, 0), (0, 0), (0, 0), (0, pad)))
    return x2, cf + pad


def _forward_pair(xa2, xb2, wa, wb, bias, scale, shift, leaky, out_dtype,
                  interpret=False):
    """xa2: [B, H, W, CfA]; xb2: [B, H, W, CfB] (depth-folded parts);
    wa/wb: [CfX, 9*co] row-permuted folded weights; affine over the
    (CfA + CfB) folded-part channel order."""
    b, h, wdt, cfa = xa2.shape
    cfb = xb2.shape[-1]
    co = wa.shape[-1] // 9
    xa2, cfa_p = _lane_pad(xa2, cfa)
    xb2, cfb_p = _lane_pad(xb2, cfb)
    if cfa_p != cfa:
        wa = jnp.pad(wa, ((0, cfa_p - cfa), (0, 0)))
    if cfb_p != cfb:
        wb = jnp.pad(wb, ((0, cfb_p - cfb), (0, 0)))
    with_affine = scale is not None
    if with_affine:
        sa, sb = scale[:cfa], scale[cfa:]
        ha, hb = shift[:cfa], shift[cfa:]
        aff = jnp.stack([
            jnp.concatenate([sa, jnp.zeros((cfa_p - cfa,), sa.dtype),
                             sb, jnp.zeros((cfb_p - cfb,), sb.dtype)]),
            jnp.concatenate([ha, jnp.zeros((cfa_p - cfa,), ha.dtype),
                             hb, jnp.zeros((cfb_p - cfb,), hb.dtype)]),
        ]).astype(jnp.float32)
    else:
        aff = jnp.zeros((2, cfa_p + cfb_p), jnp.float32)
    th, gt = _pick_tile(h, wdt, cfa_p + cfb_p, co)
    n_h = h // th
    xap = jnp.pad(xa2, ((0, 0), (1, 1), (0, 0), (0, 0)))
    xbp = jnp.pad(xb2, ((0, 0), (1, 1), (0, 0), (0, 0)))
    kernel = functools.partial(
        _kernel_pair, th=th, wdt=wdt, cfa=cfa_p, cfb=cfb_p, co=co,
        n_h=n_h, leaky=leaky, with_affine=with_affine, tap_group=gt)
    return pl.pallas_call(
        kernel,
        grid=(b * n_h,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((cfa_p, 9 * co), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cfb_p, 9 * co), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, cfa_p + cfb_p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, wdt, co),
            lambda i: (i // n_h, i % n_h, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, wdt, co), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, wdt, cfa_p), xa2.dtype),
            pltpu.VMEM((2, th + 2, wdt, cfb_p), xb2.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * wdt * (cfa_p + cfb_p) * 9 * co,
            bytes_accessed=(xa2.size + xb2.size) * xa2.dtype.itemsize
            + b * h * wdt * co * 4,
            transcendentals=0),
        interpret=interpret or _force_interpret(),
        compiler_params=_mosaic_params(),
    )(xap, xbp, wa, wb, aff, bias.reshape(1, co))


def _pair_rows(d: int, ca: int, cb: int):
    """Row indices of each part within the folded concat row order
    (depth-major, then concat channel)."""
    cin = ca + cb
    ia = np.concatenate([np.arange(k * cin, k * cin + ca)
                         for k in range(d)])
    ib = np.concatenate([np.arange(k * cin + ca, (k + 1) * cin)
                         for k in range(d)])
    return ia, ib


def _reference_pair(xa, xb, kernel, bias, scale, shift, leaky):
    return _reference(jnp.concatenate([xa, xb], axis=-1), kernel, bias,
                      scale, shift, leaky)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _conv_pair_op(xa, xb, kernel, bias, scale, shift, leaky, out_dtype,
                  interpret):
    b, h, wdt, d, ca = xa.shape
    cb = xb.shape[-1]
    co = kernel.shape[-1]
    w2 = depth_fold_weights(kernel.astype(jnp.bfloat16), d)
    cin = ca + cb
    wall = w2.reshape(9, d * cin, d * co).transpose(1, 0, 2) \
        .reshape(d * cin, 9 * d * co)
    ia, ib = _pair_rows(d, ca, cb)
    wa, wb = wall[ia], wall[ib]
    if scale is not None:
        sc = jnp.concatenate([jnp.tile(scale[:ca], d),
                              jnp.tile(scale[ca:], d)])
        sh = jnp.concatenate([jnp.tile(shift[:ca], d),
                              jnp.tile(shift[ca:], d)])
    else:
        sc = sh = None
    bias2 = jnp.tile(bias, d)
    xa2 = xa.astype(jnp.bfloat16).reshape(b, h, wdt, d * ca)
    xb2 = xb.astype(jnp.bfloat16).reshape(b, h, wdt, d * cb)
    y2 = _forward_pair(xa2, xb2, wa, wb, bias2, sc, sh, leaky, out_dtype,
                       interpret)
    return y2.reshape(b, h, wdt, d, co)


def _conv_pair_fwd(xa, xb, kernel, bias, scale, shift, leaky, out_dtype,
                   interpret):
    out = _conv_pair_op(xa, xb, kernel, bias, scale, shift, leaky,
                        out_dtype, interpret)
    return out, (xa, xb, kernel, bias, scale, shift)


def _conv_pair_bwd(leaky, out_dtype, interpret, res, g):
    xa, xb, kernel, bias, scale, shift = res
    if scale is None:
        ref = lambda a_, b_, k_, bb_: _reference_pair(
            a_, b_, k_, bb_, None, None, leaky).astype(out_dtype)
        _, vjp = jax.vjp(ref, xa, xb, kernel, bias)
        dxa, dxb, dk, db = vjp(g.astype(out_dtype))
        return dxa, dxb, dk, db, None, None
    ref = lambda *a: _reference_pair(*a, leaky).astype(out_dtype)
    _, vjp = jax.vjp(ref, xa, xb, kernel, bias, scale, shift)
    return vjp(g.astype(out_dtype))


_conv_pair_op.defvjp(_conv_pair_fwd, _conv_pair_bwd)


def conv3x3_fused_pair(xa: jnp.ndarray, xb: jnp.ndarray,
                       kernel: jnp.ndarray, bias: jnp.ndarray,
                       scale: Optional[jnp.ndarray] = None,
                       shift: Optional[jnp.ndarray] = None,
                       leaky: bool = False, out_dtype=jnp.float32,
                       interpret: bool = False) -> jnp.ndarray:
    """``conv3x3_fused(concat([xa, xb], -1), ...)`` without ever
    materializing the concatenated tensor in HBM.

    ``kernel``/``scale``/``shift`` are over the concatenated channel dim
    (xa's channels first, matching ``jnp.concatenate([x, c], -1)`` at
    models/unet_blocks.py SwinUpBlock).  xa/xb: [B, H, W, D, C*].
    """
    return _conv_pair_op(xa, xb, kernel, bias, scale, shift, leaky,
                         out_dtype, interpret)
