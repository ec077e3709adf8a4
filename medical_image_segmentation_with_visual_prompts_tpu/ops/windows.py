"""Window partitioning and shifted-window attention masks.

The reference's window partition (swin_block.py:292-309) factors each
padded axis as ``(h p1)`` with ``h = window_size`` the *slow* factor —
producing **dilated/grid** windows (stride = #windows per axis), not
contiguous Swin blocks.  This quirk is replicated exactly (SURVEY.md §7
"hard parts" (a)); windows and masks must agree, and checkpointed models
depend on it.

The shifted-window mask (swin_block.py:312-364) labels 27 shift regions,
then — when padding exists — relabels the whole *non-padded interior*
with a single label 100 (:345-350) so padded voxels can only attend to
padded voxels.  The mask is multiplicative on pre-softmax logits
(0 = blocked), matching window_attention.py:54-55.

TPU-first: every input to these builders (shape, window, shift, padding)
is static under jit, so masks are computed once in numpy at trace time
and embedded as compile-time constants — no device-side mask
construction, no HBM traffic for mask builds.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def window_partition(x: jnp.ndarray, window_size: Sequence[int]) -> jnp.ndarray:
    """[B, H, W, D, C] -> [B, P, N, C] with dilated windows.

    N = prod(window_size); window p contains voxels at stride
    (H/wh, W/ww, D/wd) — the reference's einops ``(h p1)`` factoring
    (swin_block.py:292-299) transposed to channels-last.
    """
    b, h, w, d, c = x.shape
    wh, ww, wd = window_size
    p1, p2, p3 = h // wh, w // ww, d // wd
    if p3 == 1:
        # Fully-windowed depth (every hot stage): (wd, p3=1, c) is one
        # contiguous unit, so the relayout collapses to a 6-D transpose
        # with a wd*c-element inner unit — XLA's transpose emitter tiles
        # that far better than the 8-D form (device probe:
        # tools/probe_partition.py).
        x = x.reshape(b, wh, p1, ww, p2, wd * c)
        x = x.transpose(0, 2, 4, 1, 3, 5)
        return x.reshape(b, p1 * p2, wh * ww * wd, c)
    x = x.reshape(b, wh, p1, ww, p2, wd, p3, c)
    # -> [b, p1, p2, p3, wh, ww, wd, c]
    x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)
    return x.reshape(b, p1 * p2 * p3, wh * ww * wd, c)


def window_reverse(x: jnp.ndarray, window_size: Sequence[int],
                   shape_x: Sequence[int]) -> jnp.ndarray:
    """Inverse of :func:`window_partition`: [B, P, N, C] -> [B, H, W, D, C]."""
    b = x.shape[0]
    c = x.shape[-1]
    wh, ww, wd = window_size
    hp, wp, dp = shape_x
    p1, p2, p3 = hp // wh, wp // ww, dp // wd
    if p3 == 1:
        # Depth-merged 6-D inverse (see window_partition).
        x = x.reshape(b, p1, p2, wh, ww, wd * c)
        x = x.transpose(0, 3, 1, 4, 2, 5)
        return x.reshape(b, hp, wp, dp, c)
    x = x.reshape(b, p1, p2, p3, wh, ww, wd, c)
    x = x.transpose(0, 4, 1, 5, 2, 6, 3, 7)
    return x.reshape(b, hp, wp, dp, c)


def _window_partition_np(m: np.ndarray, window_size: Sequence[int]) -> np.ndarray:
    """numpy [H, W, D] -> [P, N] with the same dilated factoring."""
    h, w, d = m.shape
    wh, ww, wd = window_size
    p1, p2, p3 = h // wh, w // ww, d // wd
    m = m.reshape(wh, p1, ww, p2, wd, p3)
    m = m.transpose(1, 3, 5, 0, 2, 4)
    return m.reshape(p1 * p2 * p3, wh * ww * wd)


@lru_cache(maxsize=None)
def get_attn_labels(shape_x: Tuple[int, int, int],
                    window_size: Tuple[int, int, int],
                    shift_size: Tuple[int, int, int],
                    paddings: Tuple[int, int, int, int, int, int]
                    ) -> np.ndarray:
    """Per-window shift-region labels ``[P, N]`` (int32).

    The attention mask is pure label EQUALITY (equal labels may attend),
    so kernels can consume these labels directly — [P, N] instead of
    [P, N, N] — and compare on the fly; :func:`get_attn_mask` builds the
    materialized mask from the same labels for the non-kernel paths.
    Padded voxels keep their 27-region shift labels while the non-padded
    interior is relabeled 100, replicating the reference's behavior
    (padding can't interact with true content; under padding the
    interior's shift-region separation collapses — a documented
    reference quirk we preserve for parity, swin_block.py:312-364).
    """
    image_mask = np.zeros(shape_x, dtype=np.float32)
    # Literal reference slicing (swin_block.py:320-334) including its
    # negative-zero semantics: with shift 0, ``slice(-ws, -0)`` is empty
    # and ``slice(-0, None)`` covers the whole axis (the final region
    # label wins there).
    slices = []
    for ws, ss in zip(window_size, shift_size):
        slices.append((slice(0, -ws), slice(-ws, -ss), slice(-ss, None)))
    cnt = 0
    for hs in slices[0]:
        for ws_ in slices[1]:
            for ds in slices[2]:
                image_mask[hs, ws_, ds] = cnt
                cnt += 1
    if any(p > 0 for p in paddings):
        image_mask[paddings[0]: shape_x[0] - paddings[1],
                   paddings[2]: shape_x[1] - paddings[3],
                   paddings[4]: shape_x[2] - paddings[5]] = 100
    mask_windows = _window_partition_np(image_mask, window_size)  # [P, N]
    return mask_windows.astype(np.int32)


@lru_cache(maxsize=None)
def get_attn_mask(shape_x: Tuple[int, int, int],
                  window_size: Tuple[int, int, int],
                  shift_size: Tuple[int, int, int],
                  paddings: Tuple[int, int, int, int, int, int]) -> np.ndarray:
    """Multiplicative 0/1 mask ``[P, N, N]``: 1 where the
    :func:`get_attn_labels` region labels match (may attend)."""
    labels = get_attn_labels(shape_x, window_size, shift_size, paddings)
    diff = labels[:, :, None] - labels[:, None, :]
    return (diff == 0).astype(np.float32)  # 1 where same region


def compute_paddings(shape_x: Sequence[int], window_size: Sequence[int],
                     mode: str = "reference") -> Tuple[int, ...]:
    """Symmetric padding to window multiples.

    ``mode="reference"`` replicates the reference EXACTLY
    (swin_block.py:150-163): when ANY axis is misaligned, EVERY axis is
    padded by ``(ws - dim % ws) / 2`` per side — including already-
    aligned axes, which receive a spurious half-window of zeros on each
    side (e.g. 32→40 at the canonical stage-1 geometry).  The reference
    computes (floor, ceil) per axis but applies them through
    ``tuple(reversed(paddings))`` in ``F.pad``, which swaps each axis's
    lo/hi — so the APPLIED padding is (ceil, floor); we return the
    applied values.  For odd pad totals the reference's mask/unpad
    slices disagree with its own applied padding (each block output
    shifts by one voxel on that axis); :func:`unpad_paddings` returns
    the (floor, ceil) values crops/masks must use so pad_mode
    "reference" replicates that behavior bit-exactly.  Every canonical
    geometry has even totals where the two agree.

    ``mode="aligned"`` pads only misaligned axes — the production
    optimization (identical results for checkpoints trained in this
    framework; NOT output-compatible with reference checkpoints at
    geometries that trigger the quirk).
    """
    import math
    if mode == "reference" and not any(
            s % ws for s, ws in zip(shape_x, window_size)):
        return (0, 0, 0, 0, 0, 0)
    pads = []
    for s, ws in zip(shape_x, window_size):
        rem = s % ws
        if mode != "reference" and rem == 0:
            pads.extend([0, 0])
        else:
            total = (ws - rem) % ws if mode != "reference" else ws - rem
            if mode == "reference":
                pads.extend([math.ceil(total / 2), math.floor(total / 2)])
            else:
                pads.extend([math.floor(total / 2), math.ceil(total / 2)])
    return tuple(pads)


def unpad_paddings(paddings: Sequence[int], mode: str) -> Tuple[int, ...]:
    """Per-axis (lo, hi) the reference uses for its UNPAD crop and mask
    interior slicing.

    The reference computes ``(floor, ceil)`` per axis but APPLIES
    ``(ceil, floor)`` — ``tuple(reversed(paddings))`` in ``F.pad``
    reverses the axis order AND flips each axis's lo/hi
    (swin_block.py:155-163) — while ``get_attn_mask``'s interior-100
    slice (:345-350) and the final unpad crop (:247-253) keep indexing
    with the ORIGINAL ``(floor, ceil)`` values.  For odd pad totals the
    two disagree: each block's output gains a zero row at the front of
    the axis and loses its last content row.  ``mode="reference"``
    returns the (floor, ceil) list (swap of the applied values
    ``compute_paddings`` returns) so crops/masks replicate that
    behavior bit-exactly; ``mode="aligned"`` keeps the self-consistent
    applied values.  Canonical geometries only produce even totals,
    where the two coincide.
    """
    if mode != "reference":
        return tuple(paddings)
    return (paddings[1], paddings[0], paddings[3], paddings[2],
            paddings[5], paddings[4])


def kernel_shift_plan(grid: Sequence[int], wc: Sequence[int],
                      shift: Sequence[int], g: int):
    """Static plan for fusing the cyclic window shift INTO the fused
    block kernel, or None when the geometry does not allow it.

    In the dilated factoring ``pos = t * p + w`` (window_partition), a
    spatial roll by ``-s`` (``s = q0 * p + s0``) decomposes into a
    window-index permutation ``w → (w + s0) mod p`` plus an in-window
    token roll by ``-(q0 + borrow)`` where ``borrow = (w + s0 >= p)``.
    The kernel can absorb both for free — the permutation as input and
    output ``index_map`` arithmetic, the roll as an in-VMEM
    ``pltpu.roll`` — PROVIDED each g-window grid block maps to one
    contiguous g-aligned source block with a block-uniform roll:

    * on the axis a block only partially covers: ``p % g_ax == 0`` and
      ``s0 % g_ax == 0`` (segment boundaries stay block-aligned);
    * on axes a block fully covers: ``s0 == 0`` (pure token roll);
    * depth shifts must be window-internal (``shift[2]`` a multiple of
      ``grid[2]`` with grid 1 — in practice 0: every flagship stage
      zeroes the depth shift adaptively); the in-kernel roll views are
      only built for the H/W token axes.

    Returns ``(grid, wc, s0s, q0s)`` as a hashable nested tuple.
    """
    grid = tuple(int(v) for v in grid)
    wc = tuple(int(v) for v in wc)
    shift = tuple(int(v) for v in shift)
    p1, p2, p3 = grid
    P = p1 * p2 * p3
    if P % g and g % P:
        return None
    s0s = tuple(s % p for s, p in zip(shift, grid))
    q0s = tuple(s // p for s, p in zip(shift, grid))
    if shift[2] != 0:
        return None  # depth roll views not built (never shifted here)
    # Walk axes from fastest; ``cover`` is how many windows of the block
    # remain to span on the current and coarser axes.
    cover = g
    for ax in (2, 1, 0):
        p = grid[ax]
        if cover <= 1:
            break  # coarser axes are fixed per block: any s0 is fine
        if cover < p:
            if p % cover or s0s[ax] % cover:
                return None
            cover = 1
        else:
            if s0s[ax] != 0:
                return None
            if cover % p:
                return None
            cover //= p
    # cover > 1 left means the block spans multiple images: only pure
    # rolls (no permutation anywhere) keep it image-consistent — which
    # the loop above already guaranteed (all partially/fully covered
    # axes hit the s0 == 0 branch when cover >= p).
    return (grid, wc, s0s, q0s)


def window_shift(x_win: jnp.ndarray, grid: Sequence[int],
                 window_size: Sequence[int], shift_size: Sequence[int],
                 inverse: bool = False) -> jnp.ndarray:
    """Apply the cyclic shift directly in window-major layout.

    Equivalent to ``window_partition(roll(window_reverse(x_win), -s))``
    (or the inverse with ``+s``) but WITHOUT the two 8-D transposes: in
    the dilated factoring ``pos = i * p + π`` (window_partition above),
    a spatial roll by ``-s`` maps ``(π, i) → ((π + s) mod p,
    (i + (π + s)//p) mod w)`` — a window-index slice/concat plus token
    rolls of ``s//p`` (and one more on the wrapped slab), per axis.
    Pure slicing, XLA fuses it.

    Args:
      x_win: ``[B, P, M, C]`` from :func:`window_partition`.
      grid: windows per axis ``(p1, p2, p3)``.
      shift_size: per-axis shift ``s`` (any ``s < grid*window``).
      inverse: undo the shift (``roll(+s)`` equivalent).
    """
    b, p_tot, m_tot, c = x_win.shape
    y = x_win.reshape(b, *grid, *window_size, c)

    # Per-axis maps touch disjoint axes (window axis 1+ax, token axis
    # 4+ax), so they commute; the cascade equals ONE concat over the
    # Cartesian product of per-axis window segments, each block
    # materialized once with its token rolls — a single pass over the
    # tensor instead of one materialization per shifted axis.
    def axis_segments(ax):
        """[(window (lo, hi), token roll), ...] along axis ``ax``."""
        s, p = shift_size[ax], grid[ax]
        s0, q0 = s % p, s // p
        if s == 0:
            return [((0, p), 0)]
        if not inverse:
            if s0 == 0:
                return [((0, p), -q0)]
            return [((s0, p), -q0), ((0, s0), -(q0 + 1))]
        if s0 == 0:
            return [((0, p), q0)]
        return [((p - s0, p), q0 + 1), ((0, p - s0), q0)]

    segs = [axis_segments(ax) for ax in range(3)]

    def block(w1, r1, w2, r2, w3, r3):
        blk = y[:, w1[0]:w1[1], w2[0]:w2[1], w3[0]:w3[1]]
        for ia, r in ((4, r1), (5, r2), (6, r3)):
            if r % window_size[ia - 4]:
                blk = jnp.roll(blk, r, axis=ia)
        return blk

    def cat(parts, axis):
        return parts[0] if len(parts) == 1 \
            else jnp.concatenate(parts, axis=axis)

    y = cat([cat([cat([block(w1, r1, w2, r2, w3, r3)
                       for w3, r3 in segs[2]], 3)
                  for w2, r2 in segs[1]], 2)
             for w1, r1 in segs[0]], 1)
    return y.reshape(b, p_tot, m_tot, c)
