"""Depth-folded 3D convolutions for shallow-depth feature maps.

The decoder's ``conv_concat`` convs run at 16x16x1 / 32x32x2 / 64x64x4
with small channel counts; XLA's direct 3D conv leaves most of the MXU
idle there (trace-measured 2.5 ms at ~31 TF/s for the 144->48 conv at
full feature resolution — tools/bench_conv.py).

Folding the depth axis into channels turns a 3x3x3 conv over
``[B,H,W,D,Cin]`` into a 3x3 2D conv over ``[B,H,W,D*Cin]`` with
band-structured weights ``[3,3,D*Cin,D*Cout]`` (the (id,od) band is the
depth tap |id-od|<=1; out-of-band blocks are zero) — exactly equivalent
to the zero-padded 3D conv, with MXU-friendly channel tiles:

* D == 1: strictly cheaper (the dead depth taps vanish) — measured
  0.196 -> 0.072 ms for 576->192 at 16x16.
* D == 4 with tiny Cout: the banded matmul pays for its 33% extra
  compute through full lane tiles; the tap-matmul form (9 shifted
  matmuls of the folded weights) measured 2.59 -> 1.84 ms for 144->48.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def depth_fold_weights(kernel: jnp.ndarray, d: int) -> jnp.ndarray:
    """[3,3,3,Cin,Cout] -> banded [3,3,D*Cin,D*Cout] (2D-conv weights)."""
    kh, kw, kd, cin, cout = kernel.shape
    blocks = []
    for od in range(d):
        col = []
        for idd in range(d):
            t = idd - od + kd // 2
            if 0 <= t < kd:
                col.append(kernel[:, :, t])
            else:
                col.append(jnp.zeros((kh, kw, cin, cout), kernel.dtype))
        blocks.append(jnp.concatenate(col, axis=2))
    return jnp.concatenate(blocks, axis=3)


def conv3d_depth_folded(x: jnp.ndarray, kernel: jnp.ndarray,
                        bias=None, dtype=None) -> jnp.ndarray:
    """'same'-padded stride-1 3x3x3 conv via one folded 2D conv."""
    b, h, w, d, cin = x.shape
    cout = kernel.shape[-1]
    cast = (lambda t: t.astype(dtype)) if dtype is not None else (lambda t: t)
    w2 = depth_fold_weights(cast(kernel), d)
    x2 = cast(x).reshape(b, h, w, d * cin)
    y2 = jax.lax.conv_general_dilated(
        x2, w2, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y2.reshape(b, h, w, d, cout)
    if bias is not None:
        y = y + cast(bias)
    return y


def conv3d_tap_matmul(x: jnp.ndarray, kernel: jnp.ndarray,
                      bias=None, dtype=None) -> jnp.ndarray:
    """'same'-padded stride-1 3x3x3 conv as 9 shifted (H,W)-tap matmuls
    of the depth-folded weights — pure MXU dot_generals, no conv op."""
    b, h, w, d, cin = x.shape
    kh, kw = kernel.shape[0], kernel.shape[1]
    cout = kernel.shape[-1]
    cast = (lambda t: t.astype(dtype)) if dtype is not None else (lambda t: t)
    w2 = depth_fold_weights(cast(kernel), d)      # [3,3,D*Cin,D*Cout]
    x2 = cast(x).reshape(b, h, w, d * cin)
    y = None
    for ih in range(kh):
        for iw in range(kw):
            z = jnp.einsum("bhwc,co->bhwo", x2, w2[ih, iw])
            oh, ow = ih - kh // 2, iw - kw // 2
            pads = [(0, 0), (max(-oh, 0), max(oh, 0)),
                    (max(-ow, 0), max(ow, 0)), (0, 0)]
            zs = jnp.pad(z, pads)[:, max(oh, 0):max(oh, 0) + h,
                                  max(ow, 0):max(ow, 0) + w, :]
            y = zs if y is None else y + zs
    y = y.reshape(b, h, w, d, cout)
    if bias is not None:
        y = y + cast(bias)
    return y


def conv3d_depth_lanes(x: jnp.ndarray, kernel: jnp.ndarray, bias=None,
                       scale=None, shift=None,
                       dtype=jnp.bfloat16) -> jnp.ndarray:
    """'same'-padded stride-1 3x3x3 conv: ONE einsum to all 9 (H,W) taps
    of the depth-folded weights (lanes = 9*D*Cout), one zero-pad, nine
    static slice-adds accumulated in fp32.

    The win over ``conv3d_tap_matmul`` / ``conv_small``: the tap tensor
    is written once in a layout the reduce can consume (no XLA
    layout-fix copy), every lane of the tap matmul is useful even for
    2-channel heads, and only 9 shifted adds remain (depth taps ride the
    lane dim).  Traced 1.21 ms vs 2.33 for the 48->2 seg head at
    [16,128,128,8] (tools/bench_head_variants.py).  ``scale``/``shift``
    fold a preceding inference-mode BatchNorm; XLA fuses them into the
    einsum's read.  Returns fp32.
    """
    b, h, w, d, cin = x.shape
    cout = kernel.shape[-1]
    y = x
    if scale is not None:
        y = y * scale + shift
    x2 = y.astype(dtype).reshape(b, h, w, d * cin)
    w2 = depth_fold_weights(kernel.astype(dtype), d)   # [3,3,D*Cin,D*Cout]
    wall = w2.transpose(2, 0, 1, 3).reshape(d * cin, 9 * d * cout)
    z = jnp.einsum("bhwc,co->bhwo", x2, wall)
    out = _tap_slice_add(z, h, w, d * cout).reshape(b, h, w, d, cout)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out



def _depth_composed_w3(kernel: jnp.ndarray, d_hi: int,
                       up_matrix=None) -> jnp.ndarray:
    """Depth-folded conv weights with an optional depth-resize composed
    in (fp32): ``[3(kh), 3(kw), d_lo*cin, d_hi*cout]``.

    wall'[(j,c),col] = sum_d U[d,j] w2[(d,c),col] — the resize is linear
    in the depth lanes, so it folds into the banded tap matrix,
    including the clamped interpolation border rows (ordinary rows of
    the dense matrix)."""
    cin, cout = kernel.shape[-2:]
    w2 = depth_fold_weights(kernel.astype(jnp.float32), d_hi)
    w3 = w2.reshape(3, 3, d_hi, cin, d_hi * cout)
    if up_matrix is not None:
        w3 = jnp.einsum("dj,abdco->abjco", up_matrix.astype(jnp.float32), w3)
    d_lo = w3.shape[2]
    return w3.reshape(3, 3, d_lo * cin, d_hi * cout)


def _tap_slice_add(z: jnp.ndarray, h: int, w: int, block: int,
                   pad_mode: str = "constant") -> jnp.ndarray:
    """Accumulate the 9 shifted (H, W) taps of a lane-blocked tap tensor
    ``z [B, H, W, 9*block]`` in fp32: one spatial pad, nine static
    slice-adds (lanes carry the depth/parity/cout structure)."""
    zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)), mode=pad_mode)
    out = jnp.zeros((z.shape[0], h, w, block), jnp.float32)
    idx = 0
    for ih in range(3):
        for iw in range(3):
            out = out + zp[:, ih:ih + h, iw:iw + w,
                           idx * block:(idx + 1) * block].astype(jnp.float32)
            idx += 1
    return out


def conv3d_depth_lanes_upsampled(x: jnp.ndarray, kernel: jnp.ndarray,
                                 bias=None, scale=None, shift=None,
                                 d_hi: int = None, up_matrix=None,
                                 dtype=jnp.bfloat16) -> jnp.ndarray:
    """``conv3d_depth_lanes`` composed with a depth-axis linear resize.

    Exactly equivalent (up to fp rounding) to
    ``conv3d_depth_lanes(resize_d(x, d_hi), ...)`` where ``resize_d``
    applies ``up_matrix [d_hi, d_lo]`` along depth: the resize is linear
    in the depth lanes, so it folds into the banded tap matrix —
    including the clamped interpolation border rows, which are ordinary
    rows of the dense matrix.  Kills the most expensive axis of the
    decoder output upsample (the full-resolution depth einsum) and
    halves the head matmul's contraction dim: the head consumes the
    depth-LOW tensor directly and emits depth-HIGH lanes.

    A preceding inference-mode BatchNorm (``scale``/``shift``) is
    applied per channel on the low-depth input — exact, because the
    per-channel affine commutes with the depth interpolation (every
    interpolation row sums to 1).
    """
    b, h, w, d_lo, cin = x.shape
    cout = kernel.shape[-1]
    y = x
    if scale is not None:
        y = y * scale + shift
    x2 = y.astype(dtype).reshape(b, h, w, d_lo * cin)
    w3 = _depth_composed_w3(kernel, d_hi, up_matrix)
    wall = (w3.transpose(2, 0, 1, 3)
            .reshape(d_lo * cin, 9 * d_hi * cout).astype(dtype))
    z = jnp.einsum("bhwc,co->bhwo", x2, wall)
    out = _tap_slice_add(z, h, w, d_hi * cout).reshape(b, h, w, d_hi, cout)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


# Parity (subpixel) stencils for a x2 linear upsample composed with a
# 3-tap conv along the same axis.  With align_corners=False torch
# semantics, high row 2s   = 0.25*low[s-1] + 0.75*low[s]   and
#            high row 2s+1 = 0.75*low[s]   + 0.25*low[s+1];
# EDGE-replicate padding of the low tensor makes these exact at the
# clamped borders too (the clamped interp rows collapse to low[0] /
# low[H-1], which is what replicate padding produces).  Composing with
# conv taps kh in {-1,0,1} at high resolution, each output parity p is a
# 3-tap stencil over low rows: _PARITY_A[p, t, kh] is the weight of
# low[j+t] inside high[2j+p+kh].
# p=0: high rows 2j-1 (0.75 low[j-1] + 0.25 low[j]),
#      2j (0.25 low[j-1] + 0.75 low[j]), 2j+1 (0.75 low[j] + 0.25 low[j+1])
# p=1: high rows 2j, 2j+1, 2j+2 (0.25 low[j] + 0.75 low[j+1])
_PARITY_A = np.asarray(
    [[[0.75, 0.25, 0.0], [0.25, 0.75, 0.75], [0.0, 0.0, 0.25]],
     [[0.25, 0.0, 0.0], [0.75, 0.75, 0.25], [0.0, 0.25, 0.75]]],
    dtype=np.float32)                           # [parity, tap t, conv kh]


def conv3d_parity_upsampled(x: jnp.ndarray, kernel: jnp.ndarray,
                            bias=None, scale=None, shift=None,
                            d_hi: int = None, up_matrix=None,
                            dtype=jnp.bfloat16) -> jnp.ndarray:
    """``conv3d_depth_lanes_upsampled`` with the x2 H/W upsample folded
    in as a parity (subpixel) decomposition.

    Exactly equivalent (up to fp rounding) to a 'same'-zero-padded
    3x3x3 conv applied to ``resize_trilinear(x*scale+shift, (2H, 2W,
    d_hi), align_corners=False)`` — but the tap einsum runs at the LOW
    H/W resolution with 4x the output lanes (one (p_h, p_w) parity pair
    per lane block), so the full-resolution upsample einsums
    (ops/resize.py) never materialize.  Only the final [B,H,W,2,2,*]
    -> [B,2H,2W,*] interleave touches full resolution, at the head's
    tiny channel count.

    Exactness at the borders: EDGE-replicate padding of the tap tensor
    reproduces the clamped interpolation rows exactly; the conv's
    zero-padding at the outermost HIGH-res rows (r=0 with tap kh=-1,
    r=2H-1 with kh=+1) is restored by subtracting the spurious stencil
    contribution on those four border rows/cols plus adding back the
    four corner cross terms (inclusion-exclusion over the two axes).
    The depth axis composes densely via ``up_matrix`` as in
    ``conv3d_depth_lanes_upsampled``.
    """
    b, h, w, d_lo, cin = x.shape
    cout = kernel.shape[-1]
    if d_hi is None:
        d_hi = d_lo
    m = d_hi * cout
    y = x
    if scale is not None:
        y = y * scale + shift
    x2 = y.astype(dtype).reshape(b, h, w, d_lo * cin)
    # Depth composition (fp32): w3 [3(kh), 3(kw), d_lo*cin, d_hi*cout].
    w3 = _depth_composed_w3(kernel, d_hi, up_matrix)
    a = jnp.asarray(_PARITY_A)
    # Parity composition: [t_h, t_w, p_h, p_w, c, m] -> lane matrix with
    # tap-major lanes so the slice-add loop consumes contiguous blocks.
    wp = jnp.einsum("ptk,qul,klcm->tupqcm", a, a, w3)
    wall = (wp.transpose(4, 0, 1, 2, 3, 5)
            .reshape(d_lo * cin, 9 * 4 * m).astype(dtype))
    z = jnp.einsum("bhwc,co->bhwo", x2, wall)
    # EDGE padding: the stencil's clamped-interp borders (see _PARITY_A).
    out = _tap_slice_add(z, h, w, 4 * m, pad_mode="edge")
    out = out.reshape(b, h, w, 2, 2, m)

    # --- border corrections (conv zero-pad at high-res rows 0 / 2H-1) ---
    def stencil_1d(src, wall1, n):
        """[B, n, C] x [C, 3*2m] tap einsum + edge pad + 3 slice-adds."""
        zz = jnp.einsum("bnc,co->bno", src, wall1)
        zzp = jnp.pad(zz, ((0, 0), (1, 1), (0, 0)), mode="edge")
        acc = jnp.zeros((b, n, 2 * m), jnp.float32)
        for t in range(3):
            acc = acc + zzp[:, t:t + n, t * 2 * m:(t + 1) * 2 * m
                            ].astype(jnp.float32)
        return acc.reshape(b, n, 2, m)

    # (kernel-tap index khi, low row index, output parity) per border.
    for khi, jh, ph in ((0, 0, 0), (2, h - 1, 1)):
        # E_h (x) T_w: W-axis parity stencil of the kh* kernel slice.
        wh1 = (jnp.einsum("qul,lcm->ucqm", a, w3[khi])
               .transpose(1, 0, 2, 3).reshape(d_lo * cin, 3 * 2 * m)
               .astype(dtype))
        ch = stencil_1d(x2[:, jh, :, :], wh1, w)
        out = out.at[:, jh, :, ph].add(-ch)
    for kwi, jw, pw in ((0, 0, 0), (2, w - 1, 1)):
        # T_h (x) E_w: H-axis parity stencil of the kw* kernel slice.
        ww1 = (jnp.einsum("ptk,kcm->tcpm", a, w3[:, kwi])
               .transpose(1, 0, 2, 3).reshape(d_lo * cin, 3 * 2 * m)
               .astype(dtype))
        cw = stencil_1d(x2[:, :, jw, :], ww1, h)
        out = out.at[:, :, jw, :, pw].add(-cw)
    for khi, jh, ph in ((0, 0, 0), (2, h - 1, 1)):
        for kwi, jw, pw in ((0, 0, 0), (2, w - 1, 1)):
            # + E_h (x) E_w corner cross term.
            cc = (x2[:, jh, jw, :].astype(jnp.float32)
                  @ w3[khi, kwi])
            out = out.at[:, jh, jw, ph, pw].add(cc)

    # Interleave parities into full resolution; add bias.
    out = (out.reshape(b, h, w, 2, 2, d_hi, cout)
           .transpose(0, 1, 3, 2, 4, 5, 6)
           .reshape(b, 2 * h, 2 * w, d_hi, cout))
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def fold_plan(x_shape, kernel_size, strides, padding, features):
    """Pick a folded implementation, or None for the direct conv.

    Only 'same'-padded stride-1 3x3x3 convs with shallow depth qualify;
    thresholds follow the trace measurements in tools/bench_conv.py.
    """
    if tuple(kernel_size) != (3, 3, 3) or tuple(strides) != (1, 1, 1):
        return None
    if tuple(padding) != (1, 1, 1):
        return None
    d = x_shape[3]
    if d == 1:
        return "fold2d"
    if 2 <= d <= 4 and features <= 64:
        return "tapmm"
    return None
