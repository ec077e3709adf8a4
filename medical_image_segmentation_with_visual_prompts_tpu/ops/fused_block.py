"""Fully fused Swin block kernel: LN → qkv → attention → proj → MLP.

The per-block elementwise chain around attention (two LayerNorms, the
projection, the single-Linear MLP, two residual adds, the prompt-token
concat) costs ~6 ms of XLA fusions and layout copies per forward in
traces.  This kernel executes the ENTIRE
``SwinTransformerBlock.forward_attn_mlp`` inner body (reference
swin_block.py:205-227) in VMEM per window group:

    y    = LN1(x)                      (fp32 statistics, eps 1e-6)
    q    = y Wq ; k = concat(y Wk, ktok) ; v = concat(y Wv, vtok)
           (bf16 MXU, fp32 acc; ktok/vtok = LN1(tokens) Wk/Wv are
            per-batch constants hoisted out of the kernel)
    a    = packed block-diagonal head attention    (fp32 softmax)
    x1   = x + (a Wproj + bproj)                   (residual)
    x2   = x1 + (LN2(x1) Wmlp + bmlp)              (single-Linear "MLP")

One HBM read of x / one write of x2 per block.  Gradients: a
``jax.custom_vjp`` whose backward differentiates an exactly-matching
pure-jnp reference implementation (``_block_reference``) — correct for
any consumer, while the inference path never materializes
intermediates.

Prompt tokens are passed UNBATCHED ``[I, C]`` (they are broadcast model
parameters, identical across the batch by construction).

Pad-folding (``fold_mode``): on axes where the feature map is SMALLER
than the attention window, the reference pads every window with the
same zero voxels (symmetric floor/ceil, swin_block.py:150-163).  A
zero voxel after LayerNorm is exactly the LN bias vector, so all pad
keys/values within a window are IDENTICAL — their entire contribution
to attention folds into ONE virtual key column, exactly:

* unshifted block (``fold_mode=1``): every pad column j contributes
  ``exp(q·k_pad·scale + bias_j)`` with the SAME ``k_pad = LN1_bias·Wk``
  → one column with logit ``q·k_pad·scale + logsumexp_j(bias_j)``
  (the logsumexp is precomputed into the assembled bias outside).
* shifted block (``fold_mode=2``): the multiplicative mask zeroes every
  content-row×pad-column logit (pads carry shift-region labels ≠ the
  interior's 100 — ops/windows.py), so each pad column contributes
  ``exp(0)=1`` → one UNMASKED column with k_pad = 0 and bias
  ``ln(n_pad)``.

In both cases the virtual column's value row is ``v_pad = LN1_bias·Wv``
and pad QUERY rows are dropped entirely (their outputs are discarded by
the block's un-pad).  This shrinks the window geometry from
``prod(window)`` tokens to the content count (4x at 16x16x1 stages) at
bit-exact-up-to-fp-reassociation numerics.

Heads are processed in chunks of ``head_block`` (VMEM-bounded), which
extends the packed formulation past C=128 (stage-2 C=192, bottleneck
C=384) — each chunk's fp32 score tile dies before the next is built.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import window_attention_pallas as _wap

_EPS = 1e-6

FOLD_NONE = 0    # no virtual pad column
FOLD_KEY = 1     # unshifted: k_pad = LN1_bias @ Wk, bias carries lse
FOLD_COUNT = 2   # shifted: k_pad = 0, bias carries ln(n_pad)


def _mask_dma() -> bool:
    """Default ON: materialize the label-equality attention mask at
    trace level and stream ``[g, m, n]`` fp32 blocks into the kernels,
    instead of building the mask in-VMEM from int32 region-label
    operands.  Device A/B (round 3, real v5e): mask-DMA is FASTER than
    the in-kernel compare at the flagship geometry — 13.51 vs 13.21
    vol/s combined with the other winning gates, and +0.15 vol/s at the
    round-2 defaults — the broadcast compare costs more VPU time than
    the extra DMA costs bandwidth at m=n≈304.  ``MIVP_MASK_DMA=0`` opts
    back into the in-kernel label path (less HBM traffic; may win at
    larger windows).  Numerics are identical (the mask VALUES are the
    same equality; parity pinned bitwise in tests/test_pair_kernel.py
    and tests/test_pallas_attention.py)."""
    import os
    return os.environ.get("MIVP_MASK_DMA", "1") not in ("0", "")


def _mask_dedup() -> bool:
    """Default ON: under mask-DMA, stream one [1, m, n] mask block per
    grid step selected from the few DISTINCT mask rows by index_map
    arithmetic, instead of the group's [g, m, n] slice of the full
    per-window mask.  At the flagship stage-0 shifted geometry the
    64-window mask has only FOUR distinct rows (per shifted axis a
    window either contains the cyclic wrap boundary or it doesn't), so
    the mask stream shrinks g*P/K-fold (~4x at g=4) — it was the
    largest per-step HBM read of the masked kernels (~335 MB/chunk per
    stage-0 instance).  Bitwise-identical mask VALUES; applies only
    when :func:`_mask_class_plan` verifies the axis-separable class
    structure against the actual labels (else the full stream is
    kept).  ``MIVP_MASK_DEDUP=0`` opts out."""
    import os
    return os.environ.get("MIVP_MASK_DEDUP", "1") not in ("0", "")


def _mask_class_plan(labels: np.ndarray, grid):
    """Axis-separable dedupe plan for the per-window attention masks.

    ``get_attn_labels`` (reference swin_block.py:312-364 semantics)
    labels each window's tokens by shift region; for a pure cyclic
    shift every axis splits the window grid into two contiguous runs —
    windows below ``t_a = p_a - s0_a`` (no wrap) and windows at/above
    it (containing the wrap) — so the [P, N] label table has at most
    ``2**n_shifted_axes`` distinct rows, in an axis-product layout.

    Verifies that structure directly against ``labels`` (thresholds
    derived from the observed class table, then the product form is
    CHECKED, never assumed) and returns the hashable plan
    ``(grid, thresholds, key_strides, representative_window_per_key)``
    for the index_map, or ``None`` when the labels don't factor (e.g.
    pad-relabel layouts) — the caller then keeps the full per-window
    stream.  Runs where the labels are still STATIC numpy (the
    ``fused_swin_block``/``fused_swin_pair`` wrappers, before the
    custom_vjp boundary turns them into tracers under jit); the
    per-``g``-group uniformity check happens per call site in
    :func:`_label_operands` (forward/pair/backward pick different g).
    """
    if grid is None or not isinstance(labels, np.ndarray):
        return None
    p1, p2, p3 = grid
    if labels.shape[0] != p1 * p2 * p3:
        return None
    _, inv = np.unique(labels, axis=0, return_inverse=True)
    base = inv.reshape(p1, p2, p3)
    thresholds, strides = [], []
    stride = 1
    for a, pa in ((2, p3), (1, p2), (0, p1)):
        # Does the class change along this axis? Expected pattern: a
        # contiguous low run equal to the o_a=0 hyperplane, then a
        # contiguous high run (the wrap-containing windows).
        ref0 = np.take(base, [0], axis=a)
        differs = (np.take(base, range(pa), axis=a) != ref0)
        row_diff = np.moveaxis(differs, a, 0).reshape(pa, -1).any(axis=1)
        if row_diff.any():
            t = int(np.argmax(row_diff))
            # contiguous high run (low run clean by argmax): the exact
            # key -> row mapping is re-verified in full below.
            if not row_diff[t:].all():
                return None
            thresholds.append(t)
            strides.append(stride)
            stride *= 2
        else:
            thresholds.append(pa)   # never splits: bit always 0
            strides.append(0)
    thresholds = thresholds[::-1]   # back to (axis0, axis1, axis2) order
    strides = strides[::-1]
    # (stride == 1 means every window shares ONE mask row — the dedupe
    # then streams a single block with a constant index, still a win.)
    # Verify the product form exactly: key -> single label row.
    o = np.stack(np.unravel_index(np.arange(labels.shape[0]),
                                  (p1, p2, p3)))
    keys = sum(((o[a] >= thresholds[a]).astype(np.int64) * strides[a])
               for a in range(3))
    n_keys = int(keys.max()) + 1
    reps = np.full(n_keys, -1, np.int64)
    for w in range(labels.shape[0]):
        k = int(keys[w])
        if reps[k] < 0:
            reps[k] = w
        elif not np.array_equal(labels[w], labels[reps[k]]):
            return None             # same key, different mask row
    if (reps < 0).any():
        return None                 # a key value never occurs
    return (tuple(grid), tuple(thresholds), tuple(strides),
            tuple(int(r) for r in reps))


def _plan_keys(grid, thresholds, strides) -> np.ndarray:
    """Static per-window class keys of a :func:`_mask_class_plan` —
    the numpy mirror of the index_map arithmetic."""
    o = np.stack(np.unravel_index(np.arange(int(np.prod(grid))), grid))
    return sum((o[a] >= thresholds[a]).astype(np.int64) * strides[a]
               for a in range(3))


def _ln(x, scale, bias):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu
    y = (x - mu) * jax.lax.rsqrt(var + _EPS)
    return y * scale + bias


def _fast_softmax_enabled(attn_drop: float, proj_drop: float) -> bool:
    """Max-subtraction-free softmax for inference-shaped calls.

    ``softmax(s) = exp(s)/sum(exp(s))`` without the stabilizing
    ``s - max(s)`` saves the reduce_max + broadcast-subtract VPU passes
    over the fp32 ``[g, hb*m, n]`` score tile — the largest non-MXU
    tensor the kernel touches.  Mathematically identical; in fp32 it is
    safe while logits stay below ~88 (exp overflow): post-LN tokens are
    bounded by ~sqrt(C) and the -1e30 fold/mask columns UNDERFLOW to 0,
    which is exactly their intended weight.  Gated to calls with both
    dropouts zero (inference and dropout-free eval; training spikes
    could overflow mid-run) and off via ``MIVP_FAST_SOFTMAX=0``.  The
    jnp reference applies the SAME formulation so the custom_vjp
    backward and the interpret-mode parity tests see one definition.
    """
    import os
    if attn_drop > 0.0 or proj_drop > 0.0:
        return False
    return os.environ.get("MIVP_FAST_SOFTMAX", "1") not in ("0", "")


def _softmax(s, fast: bool):
    if fast:
        e = jnp.exp(s)
        return e / jnp.sum(e, axis=-1, keepdims=True)
    return jax.nn.softmax(s, axis=-1)


def _late_div_enabled(fast: bool) -> bool:
    """Fold the softmax normalization to AFTER the PV matmul.

    ``softmax(s) @ v == (exp(s) @ v) / sum(exp(s))`` — moving the
    divide past the matmul replaces a VPU pass over the fp32
    ``[g, hb*m, n]`` score tile (n≈320) with one over the
    ``[g, hb*m, cw]`` output tile (cw=96 at the flagship geometry),
    ~3x less divide work on the kernel's largest tensor.  Safe exactly
    when the fast softmax is safe: unnormalized ``exp(s)`` stays below
    bf16 max (3.4e38 ≈ exp(88.7)) for the same logit bound that keeps
    fp32 ``exp`` finite, and bf16's RELATIVE precision is
    scale-invariant so the cast rounding class is unchanged.  Requires
    ``fast`` (dropout-free); ``MIVP_LATE_DIV=0`` opts out."""
    import os
    if not fast:
        return False
    return os.environ.get("MIVP_LATE_DIV", "1") not in ("0", "")


def _token_rolls(x, plan, g: int, read: bool):
    """In-VMEM cyclic token rolls of the fused window shift.

    ``plan = (grid, wc, s0s, q0s)`` from ``windows.kernel_shift_plan``.
    On read the kernel assembles the SHIFTED window's tokens from the
    unshifted source block (roll by ``-(q0 + borrow)`` per axis, in
    that axis's token units); on write it undoes the roll.  The borrow
    is block-uniform (plan eligibility), computed from the grid step's
    first shifted-window coordinates.
    """
    grid, wc, s0s, q0s = plan
    p1, p2, p3 = grid
    fw = (pl.program_id(0) * g) % (p1 * p2 * p3)
    coords = (fw // (p2 * p3), (fw // p3) % p2, fw % p3)

    def tsh(q, ax):
        return ((-q if read else q)) % wc[ax]  # static python int

    def roll(y, amt, axis):
        if amt == 0:
            return y
        return pltpu.roll(y, amt, axis)

    for ax in (0, 1):
        s0, q0, p = s0s[ax], q0s[ax], grid[ax]
        if s0 == 0 and q0 == 0:
            continue
        # The borrowed roll amount is BINARY (q0 or q0+1, block-uniform).
        # Mosaic's dynamic_rotate only supports 32-bit lanes ("Rotate
        # with non-32-bit data", a TPU-backend-only failure invisible to
        # client-side lowering), and its canonicalizer folds BOTH an
        # fp32-round-tripped dynamic roll AND a select-of-two-static-
        # rotates back into the bf16 dynamic_rotate.  Two structural
        # defenses: callers pass the fp32 WORKING tile (rolls commute
        # with the dtype casts, so numerics are unchanged, and a worst-
        # case re-folded dynamic_rotate is 32-bit = supported), and the
        # binary case is a multiplicative BLEND of the two static
        # rotates (w ∈ {0, 1} exactly → r1*w + r0*(1-w) is bit-exact,
        # and mul/add arithmetic has no select to fold).
        if ax == 0:
            view = lambda y: y                       # [g, m, c], roll axis 1
            stride, axis = wc[1] * wc[2], 1
        else:
            def view(y):                             # [g, wh, ww*wd, c]
                return y.reshape(y.shape[0], wc[0], wc[1] * wc[2],
                                 y.shape[2])
            stride, axis = wc[2], 2
        xv = view(x)
        if s0:
            t0, t1 = tsh(q0, ax), tsh(q0 + 1, ax)
            if t0 == t1:
                x = roll(xv, t0 * stride, axis).reshape(x.shape)
            else:
                borrow = coords[ax] >= p - s0        # traced bool scalar
                w = borrow.astype(x.dtype)           # exactly 0.0 or 1.0
                x = (roll(xv, t1 * stride, axis).reshape(x.shape) * w
                     + roll(xv, t0 * stride, axis).reshape(x.shape)
                     * (jnp.asarray(1, x.dtype) - w))
        else:
            x = roll(xv, tsh(q0, ax) * stride, axis).reshape(x.shape)
    return x


def _phase(x, ktok_ref, vtok_ref, ln1s_ref, ln1b_ref, wq_ref,
           wkv_ref, wp_ref, bp_ref, ln2s_ref, ln2b_ref, wm_ref,
           bm_ref, bias_ref, vq_ref, kext_ref, lq_ref, lk_ref,
           colmask_ref, seed_a, seed_p, w0, *,
           scale: float, num_heads: int, group: int, n_tokens: int,
           with_mask: bool, fold_mode: int, n_fold: int,
           head_block: int, attn_drop: float, proj_drop: float,
           fused_kv: bool, mask_dma: bool = False,
           mask_classes: bool = False, bias_folded: bool = False):
    """One full Swin block body on an in-VMEM fp32 ``[g, m, c]`` tile —
    shared by the single-block kernel and the pair kernel (which runs
    two phases back to back with the window shift rolled in between).
    ``seed_a``/``seed_p`` are the block's dropout seed scalars; ``w0``
    the block's first GLOBAL window index (uint32, dropout hashing).
    ``bias_folded``: the position bias rides the score matmul's free
    contraction lanes (ops/bias_fold.py) — ``vq_ref``/``kext_ref`` are
    the fold tables, the weight operands are lane-extended, and the
    per-head-block bias-add pass is skipped (``bias_ref`` is a dummy).
    Returns the fp32 block output tile."""
    from .prng import keep_mask
    g, h, i = group, num_heads, n_tokens
    m, c = x.shape[1], x.shape[2]
    n = m + n_fold + i
    # Working lane width: the fused-KV formulation (C <= 64) carries K in
    # lanes [0, c) and V in lanes [c, 2c) of ONE tensor end to end —
    # never sliced apart (lane slices force Mosaic relayouts).  Instead
    # q/colmask are zero in the V lanes (scores see only K), the
    # per-head output masks are zero in the K lanes (attention output
    # sees only V), and the projection weight has zero rows for the K
    # lanes.  Same MXU pass structure, half the k/v projection passes.
    cw = 2 * c if fused_kv else c
    if bias_folded:
        from .bias_fold import fold_lane_width
        cw = fold_lane_width(cw)
    # Prompt-token K/V rows are per-batch constants: their LN and Wk/Wv
    # projections are hoisted OUT of the kernel (computed once per layer
    # call in _forward) and DMA'd in pre-projected — the in-kernel k/v
    # matmuls run on content (+fold) rows only.
    ln1b = ln1b_ref[0].astype(jnp.float32)
    y = _ln(x, ln1s_ref[0].astype(jnp.float32)[None, None, :],
            ln1b[None, None, :])
    if fold_mode:
        # Virtual pad rows: row 0's key is LN(0) = ln1_bias (FOLD_KEY)
        # or zero (FOLD_COUNT, the q·k term must vanish — fixed up after
        # the projection below); its value is always LN(0).  Rows
        # 1..n_fold-1 are sublane-alignment padding, neutralized by the
        # -1e30 bias columns assembled outside.
        vrow = jnp.concatenate([ln1b[None, None, :]] * g, axis=0)  # [g,1,c]
        if n_fold > 1:
            zpad = jnp.zeros((g, n_fold - 1, c), jnp.float32)
            vrow = jnp.concatenate([vrow, zpad], axis=1)
        yv = jnp.concatenate([y, vrow], axis=1)
    else:
        yv = y
    y16 = y.astype(jnp.bfloat16)
    # The window-group batch is FLATTENED into M for every projection
    # matmul: one MXU sequence instead of g batched ones (per-sequence
    # fixed overhead dominates at this k=C geometry — PERF.md ablation:
    # the kernel is matmul-pipeline-bound, not FLOP-bound).
    nk = yv.shape[1]
    dot2 = lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # ``scale`` is folded into q at the fp32->bf16 cast: the q·k logits
    # come out of the MXU already scaled, saving one fp32 pass over the
    # much larger [g, hb*m, n] score tile per head block.
    # (fused_kv: wq_ref is [c, 2c] = [Wq | 0], so q's V lanes are zero.)
    q = (dot2(y16[:, :m].reshape(g * m, c),
              wq_ref[:].astype(jnp.bfloat16))
         * jnp.float32(scale)).astype(jnp.bfloat16).reshape(g, m, cw)
    yv16 = yv.astype(jnp.bfloat16).reshape(g * nk, c)
    if fused_kv:
        # K and V in ONE MXU sequence: their input rows are identical
        # (the FOLD_COUNT key fold row differs — zeroed below), and the
        # fused [c, 2c] weight stays within one 128-lane tile at C<=64,
        # halving the k/v projection pass count.
        kv = dot2(yv16, wkv_ref[:].astype(jnp.bfloat16)) \
            .astype(jnp.bfloat16).reshape(g, nk, cw)
        if fold_mode == FOLD_COUNT:
            # The shifted-fold KEY row must be ZERO (its q·k term
            # vanishes; the ln(n_pad) bias column carries the whole
            # contribution) — zero the K lanes of the fold row the
            # fused matmul produced; its V lanes stay LN(0)·Wv.
            rows = jax.lax.broadcasted_iota(jnp.int32, (g, nk, cw), 1)
            lanes = jax.lax.broadcasted_iota(jnp.int32, (g, nk, cw), 2)
            kv = jnp.where((rows == m) & (lanes < c), jnp.bfloat16(0), kv)
        if i > 0:
            kvtok = ktok_ref[:].astype(jnp.bfloat16)      # [i, 2c]
            kv = jnp.concatenate(
                [kv, jnp.concatenate([kvtok[None]] * g, axis=0)], axis=1)
        k = v = kv
    else:
        k = dot2(yv16, wkv_ref[0].astype(jnp.bfloat16)) \
            .astype(jnp.bfloat16).reshape(g, nk, cw)
        v = dot2(yv16, wkv_ref[1].astype(jnp.bfloat16)) \
            .astype(jnp.bfloat16).reshape(g, nk, cw)
        if fold_mode == FOLD_COUNT:
            rows = jax.lax.broadcasted_iota(jnp.int32, (g, nk, 1), 1)
            k = jnp.where(rows == m, jnp.bfloat16(0), k)
        if i > 0:
            ktok = ktok_ref[:].astype(jnp.bfloat16)       # [i, cw]
            vtok = vtok_ref[:].astype(jnp.bfloat16)
            k = jnp.concatenate(
                [k, jnp.concatenate([ktok[None]] * g, axis=0)], axis=1)
            v = jnp.concatenate(
                [v, jnp.concatenate([vtok[None]] * g, axis=0)], axis=1)
    if bias_folded:
        # k rows gain the fold components in lanes [cw_base, cw): the
        # k-side one-hots / token scores / fold-column markers
        # (ops/bias_fold.py).  Their lanes are exactly zero in k (zero
        # weight columns), so the add is an exact lane fill.
        kx = kext_ref[:].astype(jnp.bfloat16)[None]        # [1, n, cw]
        if fused_kv:
            k = v = kv = kv + kx
        else:
            k = k + kx
    # fused_kv: colmask_ref is [2, h, cw] — plane 0 masks each head's K
    # lanes (for q), plane 1 its V lanes (for the attention output).
    if fused_kv:
        colmask = colmask_ref[0].astype(jnp.bfloat16)     # [h, cw]
        colmask32 = colmask_ref[1].astype(jnp.float32)
    else:
        colmask = colmask_ref[:].astype(jnp.bfloat16)     # [h, c]
        colmask32 = colmask_ref[:].astype(jnp.float32)
    if with_mask:
        if mask_dma:
            # MIVP_MASK_DMA fallback: the trace-level materialized
            # equality mask arrives as a [g, m, n] fp32 block (in the
            # lq operand slot; lk is a dummy) — or, deduped
            # (MIVP_MASK_DEDUP), as ONE [1, m, n] class block shared by
            # the whole group, expanded here in VMEM.
            mask = lq_ref[:].astype(jnp.float32)
            if mask_classes and g > 1:
                mask = jnp.concatenate([mask] * g, axis=0)  # [g, m, n]
        else:
            # The attention mask is pure label EQUALITY: build it
            # in-kernel from the per-window region labels ([g, m, 1]
            # query rows vs [g, 1, n] key columns, -1 = always-
            # attendable fold/prompt column) instead of DMA'ing a
            # [g, m, n] fp32 mask block per grid step — removes the
            # largest per-step HBM stream of the masked kernels and
            # its double-buffered VMEM.
            lq = lq_ref[:]                                # [g, m, 1] i32
            lk = lk_ref[:]                                # [g, 1, n] i32
            mask = jnp.where((lq == lk) | (lk < 0),
                             jnp.float32(1),
                             jnp.float32(0))              # [g, m, n]
    attn = None
    fast = _fast_softmax_enabled(attn_drop, proj_drop)
    late_div = _late_div_enabled(fast)
    for h0 in range(0, num_heads, head_block):
        hb = min(head_block, num_heads - h0)
        if bias_folded:
            # q rows gain the per-head q-side fold tables in the free
            # lanes; the score matmul then produces q·k + bias in its
            # fp32 accumulator directly (no bias-add pass, no [H*M, N]
            # bias block in VMEM).
            qp = jnp.concatenate(
                [q * colmask[hh][None, None, :]
                 + vq_ref[hh].astype(jnp.bfloat16)[None]
                 for hh in range(h0, h0 + hb)], axis=1)   # [g, hb*m, cw]
        else:
            qp = jnp.concatenate([q * colmask[hh][None, None, :]
                                  for hh in range(h0, h0 + hb)],
                                 axis=1)                  # [g, hb*m, cw]
        s = jax.lax.dot_general(
            qp, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)           # [g, hb*m, n]
        if not bias_folded:
            s = s + bias_ref[h0 * m:(h0 + hb) * m, :] \
                .astype(jnp.float32)[None]
        if with_mask:
            s = s * jnp.concatenate([mask] * hb, axis=1)
        if late_div:
            probs = jnp.exp(s)
            denom = jnp.sum(probs, axis=-1, keepdims=True)
        else:
            probs = _softmax(s, fast)
        if attn_drop > 0.0:
            # Counter-based dropout, reproduced bit-exactly by the jnp
            # backward: idx = ((window*H + head)*m + row)*n + col.
            ig = jax.lax.broadcasted_iota(jnp.uint32, (g, hb * m, n), 0)
            rr = jax.lax.broadcasted_iota(jnp.uint32, (g, hb * m, n), 1)
            jj = jax.lax.broadcasted_iota(jnp.uint32, (g, hb * m, n), 2)
            head = h0 + rr // m
            idx = (((w0 + ig) * num_heads + head) * m + rr % m) * n + jj
            probs = probs * keep_mask(seed_a, idx, attn_drop)
        o_full = jax.lax.dot_general(
            probs.astype(jnp.bfloat16), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)           # [g, hb*m, cw]
        if late_div:
            o_full = o_full / denom
        for j in range(hb):
            part = o_full[:, j * m:(j + 1) * m, :] \
                * colmask32[h0 + j][None, None, :]
            attn = part if attn is None else attn + part
    # fused_kv: wp_ref is [2c, c] with zero rows for the K lanes — the
    # garbage K-lane columns of o_full never reach the projection.
    proj = dot2(attn.astype(jnp.bfloat16).reshape(g * m, cw),
                wp_ref[:].astype(jnp.bfloat16)).reshape(g, m, c) \
        + bp_ref[0].astype(jnp.float32)[None, None, :]
    if proj_drop > 0.0:
        ig = jax.lax.broadcasted_iota(jnp.uint32, (g, m, c), 0)
        rr = jax.lax.broadcasted_iota(jnp.uint32, (g, m, c), 1)
        jj = jax.lax.broadcasted_iota(jnp.uint32, (g, m, c), 2)
        idx = ((w0 + ig) * m + rr) * c + jj
        proj = proj * keep_mask(seed_p, idx, proj_drop)
    x1 = x + proj
    l2 = _ln(x1, ln2s_ref[0].astype(jnp.float32)[None, None, :],
             ln2b_ref[0].astype(jnp.float32)[None, None, :])
    mlp = dot2(l2.astype(jnp.bfloat16).reshape(g * m, c),
               wm_ref[:].astype(jnp.bfloat16)).reshape(g, m, c) \
        + bm_ref[0].astype(jnp.float32)[None, None, :]
    return x1 + mlp


def _source_window(plan, idx0):
    """Flat SOURCE window index feeding shifted window ``idx0`` — the
    single definition of the shift's (o + s0) mod p flattening, shared
    by the kernels' dropout hashing and BOTH index_maps (input and
    output must agree bitwise)."""
    (p1, p2, p3), _, s0s, _ = plan
    P = p1 * p2 * p3
    img, w = idx0 // P, idx0 % P
    o1, o2, o3 = w // (p2 * p3), (w // p3) % p2, w % p3
    s1 = (o1 + s0s[0]) % p1
    s2 = (o2 + s0s[1]) % p2
    s3 = (o3 + s0s[2]) % p3
    return img * P + (s1 * p2 + s2) * p3 + s3


def _src_w0(plan, g: int) -> jnp.ndarray:
    """First SOURCE window index of this grid step's block (uint32)."""
    return _source_window(plan, pl.program_id(0) * g).astype(jnp.uint32)


def _x_index(plan, g: int):
    """Input/output ``index_map`` for the window-permuted x blocks:
    grid step idx (shifted windows [idx*g, idx*g+g)) reads AND writes
    the g-aligned source block — contiguous by plan eligibility; the
    kernel's inverse write-roll lands the block back unshifted."""
    if plan is None or not any(plan[2]):
        return lambda idx: (idx, 0, 0)
    return lambda idx: (_source_window(plan, idx * g) // g, 0, 0)


def _block_kernel(x_ref, ktok_ref, vtok_ref, ln1s_ref, ln1b_ref, wq_ref,
                  wkv_ref, wp_ref, bp_ref, ln2s_ref, ln2b_ref, wm_ref,
                  bm_ref, bias_ref, vq_ref, kext_ref, lq_ref, lk_ref,
                  colmask_ref, seed_ref, o_ref, *,
                  scale: float, num_heads: int, group: int, n_tokens: int,
                  with_mask: bool, fold_mode: int, n_fold: int,
                  head_block: int, attn_drop: float, proj_drop: float,
                  fused_kv: bool, shift_plan=None, mask_dma: bool = False,
                  mask_classes: bool = False, bias_folded: bool = False):
    g = group
    # Global index of this block's first window (uint32 for hashing).
    w0 = (pl.program_id(0) * g).astype(jnp.uint32)
    # fp32 from the start: the token rolls must run on the 32-bit
    # working tile (see _token_rolls) and _phase wants fp32 anyway.
    x = x_ref[:].astype(jnp.float32)                      # [g, m, c]
    if shift_plan is not None:
        # Fused window shift: the block DMA'd the (index_map-permuted)
        # source windows; assemble the shifted windows by token roll.
        x = _token_rolls(x, shift_plan, g, read=True)
    out = _phase(x, ktok_ref, vtok_ref, ln1s_ref,
                 ln1b_ref, wq_ref, wkv_ref, wp_ref, bp_ref, ln2s_ref,
                 ln2b_ref, wm_ref, bm_ref, bias_ref, vq_ref, kext_ref,
                 lq_ref, lk_ref,
                 colmask_ref, seed_ref[0, 0], seed_ref[0, 1], w0,
                 scale=scale, num_heads=num_heads, group=g,
                 n_tokens=n_tokens, with_mask=with_mask,
                 fold_mode=fold_mode, n_fold=n_fold, head_block=head_block,
                 attn_drop=attn_drop, proj_drop=proj_drop,
                 fused_kv=fused_kv, mask_dma=mask_dma,
                 mask_classes=mask_classes, bias_folded=bias_folded)
    if shift_plan is not None:
        # Undo the read roll so the (same-permuted) output write lands
        # the block back in unshifted window-major order.  Roll while
        # still fp32 (permutation commutes with the cast below).
        out = _token_rolls(out, shift_plan, g, read=False)
    o_ref[:] = out.astype(o_ref.dtype)


def _pair_kernel(x_ref,
                 ktok0_ref, vtok0_ref, ln1s0_ref, ln1b0_ref, wq0_ref,
                 wkv0_ref, wp0_ref, bp0_ref, ln2s0_ref, ln2b0_ref, wm0_ref,
                 bm0_ref, bias0_ref, vq0_ref, kext0_ref,
                 ktok1_ref, vtok1_ref, ln1s1_ref, ln1b1_ref, wq1_ref,
                 wkv1_ref, wp1_ref, bp1_ref, ln2s1_ref, ln2b1_ref, wm1_ref,
                 bm1_ref, bias1_ref, vq1_ref, kext1_ref,
                 lq_ref, lk_ref, colmask_ref, seed_ref, o_ref, *,
                 scale: float, num_heads: int, group: int, n_tokens: int,
                 with_mask: bool, fold_modes: tuple, n_fold: int,
                 head_block: int, attn_drop: float, proj_drop: float,
                 fused_kv: bool, shift_plan=None, mask_dma: bool = False,
                 mask_classes: bool = False, bias_folded: bool = False):
    """Both blocks of a Swin pair in ONE kernel.

    The cyclic shift is a window-to-window bijection, so one grid step
    owns a closed set: block 1 on the g source windows (this step's
    permuted input block), the read-roll to shifted order, block 2
    (masked), and the write-roll back — block 1's output NEVER reaches
    HBM, and Mosaic gets two blocks of independent matmul work per
    step to pipeline.  ``seed_ref`` is ``[1, 4]``: (attn0, proj0,
    attn1, proj1).
    """
    g = group
    common = dict(scale=scale, num_heads=num_heads, group=g,
                  n_tokens=n_tokens, n_fold=n_fold, head_block=head_block,
                  attn_drop=attn_drop, proj_drop=proj_drop,
                  fused_kv=fused_kv, mask_dma=mask_dma,
                  mask_classes=mask_classes, bias_folded=bias_folded)
    # Block 1 runs on SOURCE windows: hash dropout with their indices.
    if shift_plan is not None and any(shift_plan[2]):
        w0_src = _src_w0(shift_plan, g)
    else:
        w0_src = (pl.program_id(0) * g).astype(jnp.uint32)
    x = x_ref[:]
    x1 = _phase(x.astype(jnp.float32), ktok0_ref, vtok0_ref, ln1s0_ref,
                ln1b0_ref, wq0_ref, wkv0_ref, wp0_ref, bp0_ref, ln2s0_ref,
                ln2b0_ref, wm0_ref, bm0_ref, bias0_ref, vq0_ref, kext0_ref,
                None, None,
                colmask_ref, seed_ref[0, 0], seed_ref[0, 1], w0_src,
                with_mask=False, fold_mode=fold_modes[0], **common)
    # Round to the array dtype exactly as the two-kernel path does at
    # its HBM boundary — keeps the pair kernel BITWISE equal to it —
    # but keep the tile fp32 so the token rolls stay 32-bit
    # (see _token_rolls; the round-trip preserves the bf16 values).
    x1 = x1.astype(x_ref.dtype).astype(jnp.float32)
    if shift_plan is not None:
        x1 = _token_rolls(x1, shift_plan, g, read=True)
    w0 = (pl.program_id(0) * g).astype(jnp.uint32)
    x2 = _phase(x1, ktok1_ref, vtok1_ref, ln1s1_ref,
                ln1b1_ref, wq1_ref,
                wkv1_ref, wp1_ref, bp1_ref, ln2s1_ref, ln2b1_ref, wm1_ref,
                bm1_ref, bias1_ref, vq1_ref, kext1_ref, lq_ref, lk_ref,
                colmask_ref,
                seed_ref[0, 2], seed_ref[0, 3], w0,
                with_mask=with_mask, fold_mode=fold_modes[1], **common)
    if shift_plan is not None:
        # Inverse roll while still fp32 (commutes with the cast below).
        x2 = _token_rolls(x2, shift_plan, g, read=False)
    o_ref[:] = x2.astype(o_ref.dtype)


def _block_reference(x, tokens, params, bias, labels, scale, num_heads,
                     fold_mode=FOLD_NONE, n_fold=1, seeds=None,
                     attn_drop=0.0, proj_drop=0.0):
    """Pure-jnp mirror of the kernel (differentiable; used by the VJP).

    Dropout masks are regenerated from (seeds, element index) with the
    same counter hash as the kernel (ops/prng.py) — bit-identical."""
    from .prng import keep_mask
    bp, m, c = x.shape
    dh = c // num_heads
    xf = x.astype(jnp.float32)
    if tokens is not None:
        tok = jnp.broadcast_to(tokens.astype(jnp.float32)[None],
                               (bp,) + tokens.shape)
        kv = jnp.concatenate([xf, tok], axis=1)
    else:
        kv = xf
    y = _ln(kv, params["ln1_scale"], params["ln1_bias"])
    if fold_mode:
        ln1b = params["ln1_bias"].astype(jnp.float32)
        vrow = jnp.broadcast_to(ln1b[None, None, :], (bp, 1, c))
        krow = vrow if fold_mode == FOLD_KEY else jnp.zeros_like(vrow)
        if n_fold > 1:
            zpad = jnp.zeros((bp, n_fold - 1, c), jnp.float32)
            krow = jnp.concatenate([krow, zpad], axis=1)
            vrow = jnp.concatenate([vrow, zpad], axis=1)
        yk = jnp.concatenate([y[:, :m], krow, y[:, m:]], axis=1)
        yv = jnp.concatenate([y[:, :m], vrow, y[:, m:]], axis=1)
    else:
        yk = yv = y
    y = y.astype(jnp.bfloat16)
    q = (y[:, :m] @ params["wq"].astype(jnp.bfloat16)).astype(jnp.float32)
    k = (yk.astype(jnp.bfloat16)
         @ params["wk"].astype(jnp.bfloat16)).astype(jnp.float32)
    v = (yv.astype(jnp.bfloat16)
         @ params["wv"].astype(jnp.bfloat16)).astype(jnp.float32)
    split = lambda t: t.reshape(bp, t.shape[1], num_heads, dh)
    qh, kh, vh = split(q), split(k), split(v)
    s = jnp.einsum("xmhd,xnhd->xhmn", qh, kh) * scale
    s = s + bias[None]
    if labels is not None:
        # labels are per WINDOW POSITION ([p, n_keys]); x rows are
        # batch-major (b*p) — tile over the batch like the kernel's
        # ``idx % pg`` block indexing does.  The multiplicative mask is
        # label equality (-1 = always-attendable fold/prompt column).
        lab = labels
        if lab.shape[0] != bp:
            lab = jnp.tile(lab, (bp // lab.shape[0], 1))
        mask = jnp.where((lab[:, :m, None] == lab[:, None, :])
                         | (lab[:, None, :] < 0),
                         jnp.float32(1), jnp.float32(0))
        s = s * mask[:, None]
    fast = _fast_softmax_enabled(attn_drop, proj_drop)
    denom = None
    if _late_div_enabled(fast):
        probs = jnp.exp(s)
        denom = jnp.sum(probs, axis=-1, keepdims=True)  # [bp, h, m, 1]
    else:
        probs = _softmax(s, fast)
    n = kh.shape[1]
    if attn_drop > 0.0 and seeds is not None:
        w = jnp.arange(bp, dtype=jnp.uint32)[:, None, None, None]
        hh = jnp.arange(num_heads, dtype=jnp.uint32)[None, :, None, None]
        rr = jnp.arange(m, dtype=jnp.uint32)[None, None, :, None]
        jj = jnp.arange(n, dtype=jnp.uint32)[None, None, None, :]
        idx = ((w * num_heads + hh) * m + rr) * n + jj
        probs = probs * keep_mask(seeds[0], idx, attn_drop)
    attn = jnp.einsum("xhmn,xnhd->xmhd", probs, vh)
    if denom is not None:
        attn = attn / denom.transpose(0, 2, 1, 3)
    attn = attn.reshape(bp, m, c)
    proj = (attn.astype(jnp.bfloat16)
            @ params["wproj"].astype(jnp.bfloat16)).astype(jnp.float32) \
        + params["bproj"]
    if proj_drop > 0.0 and seeds is not None:
        w = jnp.arange(bp, dtype=jnp.uint32)[:, None, None]
        rr = jnp.arange(m, dtype=jnp.uint32)[None, :, None]
        jj = jnp.arange(c, dtype=jnp.uint32)[None, None, :]
        idx = (w * m + rr) * c + jj
        proj = proj * keep_mask(seeds[1], idx, proj_drop)
    x1 = xf + proj
    l2 = _ln(x1, params["ln2_scale"], params["ln2_bias"])
    mlp = (l2.astype(jnp.bfloat16)
           @ params["wmlp"].astype(jnp.bfloat16)).astype(jnp.float32) \
        + params["bmlp"]
    return (x1 + mlp).astype(x.dtype)


_PARAM_KEYS = ("ln1_scale", "ln1_bias", "wq", "wk", "wv", "wproj", "bproj",
               "ln2_scale", "ln2_bias", "wmlp", "bmlp")


# Mosaic's scoped-vmem stack limit is 16M; leave 2M for scheduling
# copies / temps the estimate below cannot see.
_SCOPED_VMEM_SAFE = int(float(os.environ.get(
    "MIVP_VMEM_SAFE_MB", "14")) * 1024 * 1024)
# The default tracks the compiler's default scoped-VMEM budget (~16M
# usable; measured OOMs at 17.5-18.8M).  Raising it past 14 also raises
# Mosaic's per-kernel vmem_limit_bytes to match (every pallas_call
# passes window_attention_pallas.mosaic_params()) so deeper (g, hb)
# tilings actually compile.


def _vmem_estimate(g: int, hb: int, m: int, n: int, c: int, cw: int,
                   num_heads: int, with_mask: bool,
                   with_dropout: bool = False,
                   with_shift: bool = False,
                   with_pair: bool = False,
                   mask_dma: bool = False,
                   folded: bool = False) -> int:
    """Estimated peak scoped-VMEM bytes of one fused-block grid step.

    Calibrated against measured Mosaic stack OOMs: predicts the
    dropout-free fused-KV C=48/m=256/n=320/g=8 geometry at 17.4M vs the
    compiler's reported 17.59M, and the dropout-carrying
    C=192/m=128/n=200/g=4/hb=4 training geometry at 18.2M vs reported
    18.79M.  A scores-tile-only proxy under-counts two things: the
    g-scaled fp32 x-copies (LN out, residuals, attn accumulator, MLP
    temps) + bf16 q/k/v at large C, and — in TRAINING only — the
    counter-based dropout's u32 index tensors (ig/rr/jj/head/idx, each
    the size of the scores tile), which is why the first two picker
    iterations OOM'd only in the train step, never in the (dropout-
    free) inference bench.
    """
    if folded:
        # Bias-fold (ops/bias_fold.py): q/k/v/o_full widen from cw to
        # the next K-tile multiple, the [H*M, N] bias block disappears,
        # and the bf16 vq/kext fold tables ride along instead.
        from .bias_fold import fold_lane_width
        cwx = fold_lane_width(cw)
        bias_bytes = (num_heads * m + n) * cwx * 2
        cw = cwx
    else:
        bias_bytes = num_heads * m * n * 4      # bias block
    est = 2 * g * hb * m * n * 4        # fp32 scores + softmax temp
    est += bias_bytes
    if with_mask:
        # In-kernel label-equality mask: one fp32 [g, m, n] temp
        # (labels themselves are [g, m, 1] + [g, 1, n] — negligible).
        # Half the old cost of the double-buffered DMA'd mask blocks;
        # the MIVP_MASK_DMA fallback pays that full cost.
        est += (2 if mask_dma else 1) * g * m * n * 4
    if with_dropout:
        est += 4 * g * hb * m * n * 4   # u32 iota/index temps (keep_mask)
    est += 6 * g * m * c * 4            # fp32 x copies (y, x1, attn, out, MLP)
    est += 2 * g * n * c * 4            # yv fp32 + bf16 cast
    est += 3 * g * (m + n) * cw * 2     # q/k/v bf16 (token concat incl.)
    est += g * hb * m * cw * 4          # o_full
    if with_shift:
        # Borrow blend materializes BOTH static-rotate copies plus the
        # blended output, all at the fp32 working width.
        est += 3 * g * m * c * 4
    if with_pair:
        # Pair kernel: phase-1 output tile stays alive into phase 2,
        # plus the second set of double-buffered weight/bias blocks
        # (fold-table blocks instead when the bias rides the matmul).
        est += 2 * g * m * c * 4 + 2 * bias_bytes
    return est


def _pick_g_hb(bp: int, p, num_heads: int, m: int, n: int,
               with_mask: bool, c: int, fused_kv: bool,
               with_dropout: bool = False,
               with_shift: bool = False,
               with_pair: bool = False,
               mask_dma: bool = False,
               folded: bool = False) -> tuple:
    """Joint (window group g, head block hb) pick for the fused block.

    Prefers the LARGEST g that fits :func:`_vmem_estimate` under the
    scoped-VMEM safe limit, with the largest divisor hb that still
    fits — measured faster than maximizing hb at the hot
    [1024, 256, 48] geometry (PERF.md tiling sweep: g=8/hb=1 2.16 ms vs
    g=2/hb=4 2.25 ms; landscape flat elsewhere).  More, smaller head
    iterations also give Mosaic independent MXU/VPU work to overlap
    (scores matmul of head i+1 vs softmax of head i).
    """
    import os
    forced_g = int(os.environ.get("MIVP_FORCE_G", "0"))
    forced_hb = int(os.environ.get("MIVP_FORCE_HB", "0"))
    cw = 2 * c if fused_kv else c
    for g in range(min(forced_g or 8, 8), 0, -1):
        if bp % g or (p is not None and p % g):
            continue
        for hb in range(num_heads, 0, -1):
            if num_heads % hb:
                continue
            if _vmem_estimate(g, hb, m, n, c, cw, num_heads, with_mask,
                              with_dropout, with_shift,
                              with_pair, mask_dma,
                              folded) <= _SCOPED_VMEM_SAFE:
                if forced_hb and num_heads % forced_hb == 0:
                    hb = forced_hb
                return g, hb
        # not even hb=1 fits at this g: try a smaller group
    return 1, forced_hb if (
        forced_hb and num_heads % forced_hb == 0) else 1


def _pick_tiling(bp: int, p, num_heads: int, m: int, n: int,
                 with_mask: bool, c: int, fused_kv: bool,
                 with_dropout: bool = False, with_shift: bool = False,
                 with_pair: bool = False, mask_dma: bool = False,
                 folded: bool = False):
    """(g, hb, per-call Mosaic vmem_limit_bytes | None).

    A round-4 device-tuned tiling table lived here (hb=2 at a 44M
    per-call Mosaic budget, 2-5% faster in isolation) and was REMOVED
    after the same-session full-bench A/B showed a ~6.5% model-level
    loss: scoped-VMEM reservation starves cross-op DMA overlap, a cost
    isolated-kernel sweeps cannot see (docs/PERF.md round 4; the
    ARCHITECTURE opt-in audit records the removal).  Sweeps force
    tilings via MIVP_FORCE_G / MIVP_FORCE_HB instead."""
    g, hb = _pick_g_hb(bp, p, num_heads, m, n, with_mask, c, fused_kv,
                       with_dropout=with_dropout, with_shift=with_shift,
                       with_pair=with_pair, mask_dma=mask_dma,
                       folded=folded)
    return g, hb, None


def _colmask_np(num_heads: int, c: int, cw: int,
                fused_kv: bool) -> np.ndarray:
    """Per-head lane masks.  fused_kv: plane 0 masks each head's K lanes
    (applied to q), plane 1 its V lanes (attention output)."""
    dh = c // num_heads
    if fused_kv:
        cm = np.zeros((2, num_heads, cw), np.float32)
        for hh in range(num_heads):
            cm[0, hh, hh * dh:(hh + 1) * dh] = 1.0
            cm[1, hh, c + hh * dh:c + (hh + 1) * dh] = 1.0
    else:
        # ``cw`` may exceed ``c`` under the bias fold (lane-extended
        # operands); the extension lanes stay zero in both planes.
        cm = np.zeros((num_heads, cw), np.float32)
        for hh in range(num_heads):
            cm[hh, hh * dh:(hh + 1) * dh] = 1.0
    return cm


def _operand_args(params, tokens, i, c, cw, fused_kv, num_heads, m, n,
                  bias, fold_meta=None, fold_mode=0, n_fold=0,
                  folded=False):
    """The 15 operand ARRAYS of one block, in kernel-signature order —
    a pure function of (params, tokens, bias) so the kernel-backward
    path can ``jax.vjp`` it to map operand cotangents back to
    param/token/bias cotangents.

    ``folded`` (ops/bias_fold.py): the weight/token operands are
    lane-extended to the next K-tile multiple, the bias slot becomes a
    dummy (the bias rides the matmul via the vq/kext fold tables in
    slots 14/15); unfolded, vq/kext are dummies.  The fold-table slots
    carry ZERO cotangents by design (the bias gradient is exactly
    ``ds * mask``, accumulated into the bias slot by the backward —
    see ops/bias_fold.py docstring), so the vjp mapping here stays
    correct in both modes."""
    # Prompt-token K/V: per-batch constants, so LN + Wk/Wv run ONCE here
    # (tiny [i, c] matmuls) instead of once per grid step inside the
    # kernel — the in-kernel k/v matmuls cover content (+fold) rows only.
    cwx = cw
    if folded:
        from .bias_fold import fold_lane_width
        cwx = fold_lane_width(cw)
    if i > 0:
        tln = _ln(tokens.astype(jnp.float32),
                  params["ln1_scale"].astype(jnp.float32)[None, :],
                  params["ln1_bias"].astype(jnp.float32)[None, :])
        t16 = tln.astype(jnp.bfloat16)
        hdot = lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        ktok = hdot(t16, params["wk"].astype(jnp.bfloat16)) \
            .astype(jnp.bfloat16)
        vtok = hdot(t16, params["wv"].astype(jnp.bfloat16)) \
            .astype(jnp.bfloat16)
    else:
        ktok = vtok = jnp.zeros((1, c), jnp.bfloat16)
    zeros_w = jnp.zeros((c, c), params["wq"].dtype)

    def extend(a, width, axis=1):
        pad = width - a.shape[axis]
        if pad <= 0:
            return a
        shape = list(a.shape)
        shape[axis] = pad
        return jnp.concatenate([a, jnp.zeros(shape, a.dtype)], axis=axis)

    if fused_kv:
        # [Wq | 0]: q's V lanes come out zero, so scores contract over
        # the K lanes only; [0 ; Wproj]: the projection ignores the
        # garbage K lanes of the attention output.
        wq_arg = extend(jnp.concatenate([params["wq"], zeros_w], axis=1),
                        cwx)
        wkv = extend(jnp.concatenate([params["wk"], params["wv"]], axis=1),
                     cwx)
        wp_arg = extend(jnp.concatenate(
            [zeros_w.astype(params["wproj"].dtype), params["wproj"]],
            axis=0), cwx, axis=0)
        ktok_arg = vtok_arg = extend(
            jnp.concatenate([ktok, vtok], axis=1), cwx)
    else:
        wq_arg = extend(params["wq"], cwx)
        wkv = jnp.stack([extend(params["wk"], cwx),
                         extend(params["wv"], cwx)], axis=0)  # [2, c, cwx]
        wp_arg = extend(params["wproj"], cwx, axis=0)
        ktok_arg, vtok_arg = extend(ktok, cwx), extend(vtok, cwx)
    if folded:
        from .bias_fold import fold_tables
        vq, kext = fold_tables(bias, fold_meta, num_heads, m, n_fold, i,
                               fold_mode, cw)
        bias_arg = jnp.zeros((1, 1), jnp.float32)
    else:
        vq = jnp.zeros((1, 1, 1), jnp.bfloat16)
        kext = jnp.zeros((1, 1), jnp.bfloat16)
        bias_arg = bias.reshape(num_heads * m, n)
    v2 = lambda a: a.reshape(1, -1)
    return [ktok_arg, vtok_arg,
            v2(params["ln1_scale"]), v2(params["ln1_bias"]), wq_arg,
            wkv, wp_arg, v2(params["bproj"]),
            v2(params["ln2_scale"]), v2(params["ln2_bias"]),
            params["wmlp"], v2(params["bmlp"]),
            bias_arg, vq, kext]


def _operand_specs(i, c, cw, fused_kv, num_heads, m, n, folded=False):
    """BlockSpecs matching :func:`_operand_args`, all block-invariant."""
    cwx = cw
    if folded:
        from .bias_fold import fold_lane_width
        cwx = fold_lane_width(cw)
    vec = lambda ln: pl.BlockSpec((1, ln), lambda idx: (0, 0),
                                  memory_space=pltpu.VMEM)
    fix = lambda *shape: pl.BlockSpec(shape, lambda idx: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    if folded:
        bias_spec, vq_spec, kext_spec = \
            fix(1, 1), fix(num_heads, m, cwx), fix(n, cwx)
    else:
        bias_spec = pl.BlockSpec((num_heads * m, n), lambda idx: (0, 0),
                                 memory_space=pltpu.VMEM)
        vq_spec, kext_spec = fix(1, 1, 1), fix(1, 1)
    return [fix(max(i, 1), cwx), fix(max(i, 1), cwx), vec(c), vec(c),
            fix(c, cwx),
            fix(c, cwx) if fused_kv else fix(2, c, cwx),
            fix(cwx, c), vec(c), vec(c), vec(c), fix(c, c), vec(c),
            bias_spec, vq_spec, kext_spec]


def _block_operands(params, tokens, i, c, cw, fused_kv, num_heads, m, n,
                    bias, fold_meta=None, fold_mode=0, n_fold=0,
                    folded=False):
    """(specs, args) for ONE block's 15 weight/bias kernel operands, in
    kernel-signature order (ktok, vtok, ln1 scale/bias, wq, wkv, wproj,
    bproj, ln2 scale/bias, wmlp, bmlp, assembled bias, vq/kext fold
    tables) — the single definition of the fused-KV operand layout
    ([Wq | 0], [0 ; Wproj], concatenated prompt K/V), shared by the
    single-block and the pair builders so their numerics can never
    diverge."""
    specs = _operand_specs(i, c, cw, fused_kv, num_heads, m, n,
                           folded=folded)
    args = _operand_args(params, tokens, i, c, cw, fused_kv, num_heads,
                         m, n, bias, fold_meta=fold_meta,
                         fold_mode=fold_mode, n_fold=n_fold, folded=folded)
    return specs, args


def _label_operands(labels, m, n, g, p, mask_dma, mask_plan=None):
    """(specs, args, deduped) for the two mask operand slots: the int32
    label row/column pair in the default in-kernel mode, or
    (materialized fp32 equality mask, dummy) under ``MIVP_MASK_DMA`` —
    shared by the single-block, pair, and backward builders.

    Under mask-DMA, when the caller supplies a verified
    :func:`_mask_class_plan` (computed where the labels were still
    static numpy) and this call site's ``g``-groups are class-uniform,
    the mask operand is DEDUPED to its distinct rows ``[K, m, n]`` and
    each grid step DMAs one ``[1, m, n]`` block picked by index_map
    arithmetic on the step's first-window coordinates (index_maps may
    not capture arrays, so the class is recomputed from
    thresholds/strides each step).  ``deduped`` tells the kernel to
    expand the block across its ``g`` windows."""
    dum = pl.BlockSpec((1, 1, 1), lambda idx: (0, 0, 0),
                       memory_space=pltpu.VMEM)
    if labels is None:
        return [dum, dum], [jnp.zeros((1, 1, 1), jnp.int32)] * 2, False
    pg = p // g

    def _eq_mask(lab):
        return jnp.where((lab[:, :m, None] == lab[:, None, :])
                         | (lab[:, None, :] < 0),
                         jnp.float32(1), jnp.float32(0))
    if mask_dma:
        plan = mask_plan if _mask_dedup() else None
        if plan is not None:
            keys = _plan_keys(plan[0], plan[1], plan[2])
            if (keys.reshape(-1, g) != keys.reshape(-1, g)[:, :1]).any():
                plan = None         # class-mixed groups at this g
        if plan is not None:
            grid, (t1, t2, t3), (k1, k2, k3), reps = plan
            p1, p2, p3 = grid
            # labels may be a tracer here (custom_vjp boundary); static
            # fancy indexing with the plan's representatives is fine.
            lab_k = labels[np.asarray(reps)]                 # [K, N]

            def _class_index(idx):
                w = (idx % pg) * g
                key = 0
                if k1:
                    key = key + jnp.where(w // (p2 * p3) >= t1, k1, 0)
                if k2:
                    key = key + jnp.where((w // p3) % p2 >= t2, k2, 0)
                if k3:
                    key = key + jnp.where(w % p3 >= t3, k3, 0)
                return (key, 0, 0)
            return ([pl.BlockSpec((1, m, n), _class_index,
                                  memory_space=pltpu.VMEM), dum],
                    [_eq_mask(lab_k), jnp.zeros((1, 1, 1), jnp.int32)],
                    True)
        mask = _eq_mask(labels)                              # [p, m, n]
        return ([pl.BlockSpec((g, m, n), lambda idx: (idx % pg, 0, 0),
                              memory_space=pltpu.VMEM), dum],
                [mask, jnp.zeros((1, 1, 1), jnp.int32)], False)
    # Per-window region labels, split into query-row ([p, m, 1]) and
    # key-column ([p, 1, n]) operands so the in-kernel equality
    # broadcasts along natural (sublane / lane) axes.
    return ([pl.BlockSpec((g, m, 1), lambda idx: (idx % pg, 0, 0),
                          memory_space=pltpu.VMEM),
             pl.BlockSpec((g, 1, n), lambda idx: (idx % pg, 0, 0),
                          memory_space=pltpu.VMEM)],
            [labels[:, :m, None], labels[:, None, :]], False)


def _forward(x, tokens, params, bias, labels, scale, num_heads, fold_mode,
             n_fold, seeds=None, attn_drop=0.0, proj_drop=0.0,
             interpret=False, shift_geom=None, mask_plan=None,
             fold_meta=None):
    import os as _os
    from .bias_fold import fold_applicable, fold_lane_width
    bp, m, c = x.shape
    i = 0 if tokens is None else tokens.shape[0]
    n = m + n_fold + i
    dh = c // num_heads
    p = labels.shape[0] if labels is not None else None
    # Fused-KV formulation only below C<=64: at larger C the [c, 2c]
    # weight spills past one 128-lane tile and the pass-count advantage
    # disappears (C=96/384 neutral, and the extended q/scores lanes
    # would DOUBLE the scores pass count at C=96).
    fused_kv = 2 * c <= 128
    cw = 2 * c if fused_kv else c
    folded = fold_applicable(fold_meta, num_heads, m, n_fold, i,
                             fold_mode, cw)
    cwk = fold_lane_width(cw) if folded else cw
    mask_dma = labels is not None and _mask_dma()
    g, hb, vmem_limit = _pick_tiling(
        bp, p, num_heads, m, n, labels is not None, c, fused_kv,
        with_dropout=attn_drop > 0.0, with_shift=shift_geom is not None,
        mask_dma=mask_dma, folded=folded)
    # Fused window shift (``shift_geom = (grid, wc, shift)``): the caller
    # passes UNSHIFTED window-major x; the kernel absorbs the cyclic
    # shift (index_map window permutation + in-VMEM token rolls) when
    # the geometry allows, else the shift materializes here at trace
    # level (exactly the old caller-side ``window_shift`` behavior).
    plan = None
    unshift = None
    if shift_geom is not None:
        from .windows import kernel_shift_plan, window_shift
        grid_s, wc_s, sh_s = shift_geom
        if _os.environ.get("MIVP_NO_KERNEL_SHIFT", "0") in ("0", ""):
            plan = kernel_shift_plan(grid_s, wc_s, sh_s, g)
        if plan is None:
            P_s = int(np.prod(grid_s))
            bb = bp // P_s

            def _shift(t, inverse):
                t4 = t.reshape(bb, P_s, m, c)
                t4 = window_shift(t4, grid_s, wc_s, sh_s, inverse=inverse)
                return t4.reshape(bp, m, c)

            x = _shift(x, False)
            unshift = lambda t: _shift(t, True)
    colmask_np = _colmask_np(num_heads, c, cwk, fused_kv)
    lab_specs, lab_args, deduped = _label_operands(
        labels, m, n, g, p, mask_dma, mask_plan=mask_plan)
    kernel = functools.partial(
        _block_kernel, scale=scale, num_heads=num_heads, group=g,
        n_tokens=i, with_mask=labels is not None, fold_mode=fold_mode,
        n_fold=n_fold, head_block=hb, attn_drop=attn_drop,
        proj_drop=proj_drop, fused_kv=fused_kv, shift_plan=plan,
        mask_dma=mask_dma, mask_classes=deduped, bias_folded=folded)
    x_spec = pl.BlockSpec((g, m, c), _x_index(plan, g),
                          memory_space=pltpu.VMEM)
    fix = lambda *shape: pl.BlockSpec(shape, lambda idx: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    colmask_spec = fix(*colmask_np.shape)
    blk_specs, blk_args = _block_operands(params, tokens, i, c, cw,
                                          fused_kv, num_heads, m, n, bias,
                                          fold_meta=fold_meta,
                                          fold_mode=fold_mode,
                                          n_fold=n_fold, folded=folded)
    in_specs = [x_spec] + blk_specs
    args = [x] + blk_args
    in_specs += lab_specs
    args += lab_args
    in_specs.append(colmask_spec)
    args.append(jnp.asarray(colmask_np))
    in_specs.append(pl.BlockSpec((1, 2), lambda idx: (0, 0),
                                 memory_space=pltpu.SMEM))
    args.append(jnp.zeros((1, 2), jnp.uint32) if seeds is None
                else seeds.reshape(1, 2).astype(jnp.uint32))
    out = pl.pallas_call(
        kernel,
        grid=(bp // g,),
        in_specs=in_specs,
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((bp, m, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bp * num_heads * m * n * dh + 12 * bp * n * c * c,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=bp * num_heads * m * n),
        interpret=interpret or _wap._FORCE_INTERPRET,
        compiler_params=_wap.mosaic_params(vmem_limit),
    )(*args)
    return unshift(out) if unshift is not None else out


def _reference_with_shift(x, tokens, params, bias, labels, scale, num_heads,
                          fold_mode, n_fold, seeds, attn_drop, proj_drop,
                          shift_geom):
    """jnp reference of the kernel semantics INCLUDING the fused window
    shift: shift (trace-level window_shift), block, inverse shift."""
    if shift_geom is None:
        return _block_reference(x, tokens, params, bias, labels, scale,
                                num_heads, fold_mode, n_fold, seeds,
                                attn_drop, proj_drop)
    from .windows import window_shift
    grid_s, wc_s, sh_s = shift_geom
    P_s = int(np.prod(grid_s))
    bp, m, c = x.shape
    bb = bp // P_s
    xs = window_shift(x.reshape(bb, P_s, m, c), grid_s, wc_s, sh_s)
    out = _block_reference(xs.reshape(bp, m, c), tokens, params, bias,
                           labels, scale, num_heads, fold_mode, n_fold,
                           seeds, attn_drop, proj_drop)
    out = window_shift(out.reshape(bb, P_s, m, c), grid_s, wc_s, sh_s,
                       inverse=True)
    return out.reshape(bp, m, c)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16))
def _fused_block(x, tokens, param_tuple, bias, labels, seeds, scale,
                 num_heads, has_tokens, fold_mode, n_fold, attn_drop,
                 proj_drop, interpret, shift_geom, mask_plan, fold_meta):
    params = dict(zip(_PARAM_KEYS, param_tuple))
    return _forward(x, tokens if has_tokens else None, params, bias, labels,
                    scale, num_heads, fold_mode, n_fold, seeds, attn_drop,
                    proj_drop, interpret, shift_geom, mask_plan, fold_meta)


def _fused_block_fwd(x, tokens, param_tuple, bias, labels, seeds, scale,
                     num_heads, has_tokens, fold_mode, n_fold, attn_drop,
                     proj_drop, interpret, shift_geom, mask_plan, fold_meta):
    out = _fused_block(x, tokens, param_tuple, bias, labels, seeds, scale,
                       num_heads, has_tokens, fold_mode, n_fold, attn_drop,
                       proj_drop, interpret, shift_geom, mask_plan,
                       fold_meta)
    return out, (x, tokens, param_tuple, bias, labels, seeds)


def _fused_block_bwd(scale, num_heads, has_tokens, fold_mode, n_fold,
                     attn_drop, proj_drop, interpret, shift_geom, mask_plan,
                     fold_meta, res, g):
    x, tokens, param_tuple, bias, labels, seeds = res
    from .fused_block_bwd import (block_backward, kernel_bwd_enabled,
                                  kernel_bwd_fits)
    bp, m, c = x.shape
    i = tokens.shape[0] if has_tokens else 0
    if kernel_bwd_enabled() and kernel_bwd_fits(
            bp, labels.shape[0] if labels is not None else None, num_heads,
            m, m + n_fold + i, c, labels is not None,
            attn_drop > 0.0 or proj_drop > 0.0,
            labels is not None and _mask_dma()):
        return block_backward(x, g, tokens, param_tuple, bias, labels,
                              seeds, scale, num_heads, has_tokens,
                              fold_mode, n_fold, attn_drop, proj_drop,
                              interpret, shift_geom, mask_plan)

    def ref(x_, tokens_, param_tuple_, bias_, labels_, seeds_):
        params = dict(zip(_PARAM_KEYS, param_tuple_))
        return _reference_with_shift(
            x_, tokens_ if has_tokens else None, params, bias_, labels_,
            scale, num_heads, fold_mode, n_fold, seeds_, attn_drop,
            proj_drop, shift_geom)

    _, vjp = jax.vjp(ref, x, tokens, param_tuple, bias, labels, seeds)
    return vjp(g)


_fused_block.defvjp(_fused_block_fwd, _fused_block_bwd)


def pair_kernel_available(bp: int, p, num_heads: int, m: int, i: int,
                          c: int, attn_drop: float, shift_geom,
                          fold: bool) -> bool:
    """Can the PAIR kernel run this geometry?

    Mirrors ``_forward_pair``'s (g, hb) pick, then requires an eligible
    shift plan (the mid-kernel shift cannot materialize at trace level).

    Default OFF since round 3: on the real chip the pair kernel LOSES
    to the two-kernel path at the flagship geometry (11.50 vs 11.76
    vol/s at round-2 defaults; 12.94 vs 13.21 with the head fold off;
    neutral on train steps) — the inter-block HBM round-trip it saves
    is cheaper than the VMEM-pressure-driven smaller g it forces.
    ``MIVP_PAIR_KERNEL=1`` opts in (e.g. geometries where the saved
    round-trip dominates); ``MIVP_NO_PAIR_KERNEL=1`` still force-
    disables and wins over the opt-in.
    """
    import os
    if os.environ.get("MIVP_NO_PAIR_KERNEL", "0") not in ("0", ""):
        return False
    if os.environ.get("MIVP_PAIR_KERNEL", "0") in ("0", ""):
        return False
    if shift_geom is not None and \
            os.environ.get("MIVP_NO_KERNEL_SHIFT", "0") not in ("0", ""):
        return False  # the pair kernel REQUIRES the in-kernel shift
    n_fold = fold_width(m, i) if fold else 0
    n = m + n_fold + i
    fused_kv = 2 * c <= 128
    g, _ = _pick_g_hb(bp, p, num_heads, m, n, shift_geom is not None, c,
                      fused_kv, with_dropout=attn_drop > 0.0,
                      with_shift=shift_geom is not None, with_pair=True,
                      mask_dma=shift_geom is not None and _mask_dma())
    if shift_geom is None:
        return True
    from .windows import kernel_shift_plan
    grid_s, wc_s, sh_s = shift_geom
    return kernel_shift_plan(grid_s, wc_s, sh_s, g) is not None


def _forward_pair(x, tokens0, tokens1, params0, params1, bias0, bias1,
                  labels, scale, num_heads, fold_modes, n_fold, seeds=None,
                  attn_drop=0.0, proj_drop=0.0, interpret=False,
                  shift_geom=None, mask_plan=None, fold_meta=None):
    from .bias_fold import fold_applicable, fold_lane_width
    bp, m, c = x.shape
    i = 0 if tokens0 is None else tokens0.shape[0]
    n = m + n_fold + i
    dh = c // num_heads
    p = labels.shape[0] if labels is not None else None
    fused_kv = 2 * c <= 128
    cw = 2 * c if fused_kv else c
    # Both phases fold or neither (shared colmask width / kernel flag).
    folded = (fold_applicable(fold_meta, num_heads, m, n_fold, i,
                              fold_modes[0], cw)
              and fold_applicable(fold_meta, num_heads, m, n_fold, i,
                                  fold_modes[1], cw))
    cwk = fold_lane_width(cw) if folded else cw
    mask_dma = labels is not None and _mask_dma()
    g, hb = _pick_g_hb(bp, p, num_heads, m, n, labels is not None, c,
                       fused_kv, with_dropout=attn_drop > 0.0,
                       with_shift=shift_geom is not None, with_pair=True,
                       mask_dma=mask_dma, folded=folded)
    plan = None
    if shift_geom is not None:
        from .windows import kernel_shift_plan
        grid_s, wc_s, sh_s = shift_geom
        plan = kernel_shift_plan(grid_s, wc_s, sh_s, g)
        if plan is None:
            # Geometry drifted from pair_kernel_available's gate (or a
            # future caller skipped it): degrade to the two-kernel path
            # with the trace-level shift — never fail mid-trace.
            x1 = _forward(x, tokens0, params0, bias0, None, scale,
                          num_heads, fold_modes[0], n_fold,
                          None if seeds is None else seeds[:2],
                          attn_drop, proj_drop, interpret,
                          fold_meta=fold_meta)
            return _forward(x1, tokens1, params1, bias1, labels, scale,
                            num_heads, fold_modes[1], n_fold,
                            None if seeds is None else seeds[2:],
                            attn_drop, proj_drop, interpret, shift_geom,
                            mask_plan, fold_meta)
    colmask_np = _colmask_np(num_heads, c, cwk, fused_kv)
    lab_specs, lab_args, deduped = _label_operands(
        labels, m, n, g, p, mask_dma, mask_plan=mask_plan)
    kernel = functools.partial(
        _pair_kernel, scale=scale, num_heads=num_heads, group=g,
        n_tokens=i, with_mask=labels is not None, fold_modes=fold_modes,
        n_fold=n_fold, head_block=hb, attn_drop=attn_drop,
        proj_drop=proj_drop, fused_kv=fused_kv, shift_plan=plan,
        mask_dma=mask_dma, mask_classes=deduped, bias_folded=folded)
    x_spec = pl.BlockSpec((g, m, c), _x_index(plan, g),
                          memory_space=pltpu.VMEM)
    fix = lambda *shape: pl.BlockSpec(shape, lambda idx: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    s0, a0 = _block_operands(params0, tokens0, i, c, cw, fused_kv,
                             num_heads, m, n, bias0, fold_meta=fold_meta,
                             fold_mode=fold_modes[0], n_fold=n_fold,
                             folded=folded)
    s1, a1 = _block_operands(params1, tokens1, i, c, cw, fused_kv,
                             num_heads, m, n, bias1, fold_meta=fold_meta,
                             fold_mode=fold_modes[1], n_fold=n_fold,
                             folded=folded)
    in_specs = [x_spec] + s0 + s1
    args = [x] + a0 + a1
    in_specs += lab_specs
    args += lab_args
    in_specs.append(fix(*colmask_np.shape))
    args.append(jnp.asarray(colmask_np))
    in_specs.append(pl.BlockSpec((1, 4), lambda idx: (0, 0),
                                 memory_space=pltpu.SMEM))
    args.append(jnp.zeros((1, 4), jnp.uint32) if seeds is None
                else seeds.reshape(1, 4).astype(jnp.uint32))
    return pl.pallas_call(
        kernel,
        grid=(bp // g,),
        in_specs=in_specs,
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((bp, m, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * (4 * bp * num_heads * m * n * dh
                       + 12 * bp * n * c * c),
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=2 * bp * num_heads * m * n),
        interpret=interpret or _wap._FORCE_INTERPRET,
        compiler_params=_wap.mosaic_params(),
    )(*args)


def _pair_reference(x, tokens0, tokens1, ptuple0, ptuple1, bias0, bias1,
                    labels, seeds, scale, num_heads, has_tokens,
                    fold_modes, n_fold, attn_drop, proj_drop, shift_geom):
    """jnp mirror of the pair kernel: block 1 (unshifted), trace-level
    window shift, block 2 (masked), inverse shift."""
    params0 = dict(zip(_PARAM_KEYS, ptuple0))
    params1 = dict(zip(_PARAM_KEYS, ptuple1))
    s0 = None if seeds is None else seeds[:2]
    s1 = None if seeds is None else seeds[2:]
    x1 = _block_reference(x, tokens0 if has_tokens else None, params0,
                          bias0, None, scale, num_heads, fold_modes[0],
                          n_fold, s0, attn_drop, proj_drop)
    if shift_geom is not None:
        from .windows import window_shift
        grid_s, wc_s, sh_s = shift_geom
        P_s = int(np.prod(grid_s))
        bp, m, c = x.shape
        bb = bp // P_s
        x1 = window_shift(x1.reshape(bb, P_s, m, c), grid_s, wc_s,
                          sh_s).reshape(bp, m, c)
    out = _block_reference(x1, tokens1 if has_tokens else None, params1,
                           bias1, labels, scale, num_heads, fold_modes[1],
                           n_fold, s1, attn_drop, proj_drop)
    if shift_geom is not None:
        out = window_shift(out.reshape(bb, P_s, m, c), grid_s, wc_s, sh_s,
                           inverse=True).reshape(bp, m, c)
    return out


@functools.partial(
    jax.custom_vjp,
    nondiff_argnums=(9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19))
def _fused_pair(x, tokens0, tokens1, ptuple0, ptuple1, bias0, bias1,
                labels, seeds, scale, num_heads, has_tokens, fold_modes,
                n_fold, attn_drop, proj_drop, interpret, shift_geom,
                mask_plan, fold_meta):
    return _forward_pair(
        x, tokens0 if has_tokens else None, tokens1 if has_tokens else None,
        dict(zip(_PARAM_KEYS, ptuple0)), dict(zip(_PARAM_KEYS, ptuple1)),
        bias0, bias1, labels, scale, num_heads, fold_modes, n_fold, seeds,
        attn_drop, proj_drop, interpret, shift_geom, mask_plan, fold_meta)


def _fused_pair_fwd(x, tokens0, tokens1, ptuple0, ptuple1, bias0, bias1,
                    labels, seeds, scale, num_heads, has_tokens, fold_modes,
                    n_fold, attn_drop, proj_drop, interpret, shift_geom,
                    mask_plan, fold_meta):
    out = _fused_pair(x, tokens0, tokens1, ptuple0, ptuple1, bias0, bias1,
                      labels, seeds, scale, num_heads, has_tokens,
                      fold_modes, n_fold, attn_drop, proj_drop, interpret,
                      shift_geom, mask_plan, fold_meta)
    return out, (x, tokens0, tokens1, ptuple0, ptuple1, bias0, bias1,
                 labels, seeds)


def _fused_pair_bwd(scale, num_heads, has_tokens, fold_modes, n_fold,
                    attn_drop, proj_drop, interpret, shift_geom, mask_plan,
                    fold_meta, res, g):
    (x, tokens0, tokens1, ptuple0, ptuple1, bias0, bias1, labels,
     seeds) = res
    from .fused_block_bwd import (block_backward, kernel_bwd_enabled,
                                  kernel_bwd_fits)
    bp, m, c = x.shape
    i = tokens0.shape[0] if has_tokens else 0
    n = m + n_fold + i
    dropout = attn_drop > 0.0 or proj_drop > 0.0
    p = labels.shape[0] if labels is not None else None
    if kernel_bwd_enabled() \
            and kernel_bwd_fits(bp, p, num_heads, m, n, c,
                                labels is not None, dropout,
                                labels is not None and _mask_dma()) \
            and kernel_bwd_fits(bp, None, num_heads, m, n, c, False,
                                dropout, False):
        # Pair backward = recompute block 1's output with the forward
        # kernel (rounded to the array dtype exactly as the pair kernel
        # rounds its inter-block tile), then chain two single-block
        # kernel backwards: block 2 (masked, fused shift) then block 1.
        params0 = dict(zip(_PARAM_KEYS, ptuple0))
        # The pair forward folds its bias only when BOTH phases are
        # fold-applicable (_forward_pair); mirror that joint decision
        # here so the recompute cannot fold phase 0 alone and diverge
        # numerically from what the pair kernel actually ran.
        from .bias_fold import fold_applicable
        fused_kv = 2 * c <= 128
        cw = 2 * c if fused_kv else c
        pair_folded = (
            fold_applicable(fold_meta, num_heads, m, n_fold, i,
                            fold_modes[0], cw)
            and fold_applicable(fold_meta, num_heads, m, n_fold, i,
                                fold_modes[1], cw))
        x1 = _forward(x, tokens0 if has_tokens else None, params0, bias0,
                      None, scale, num_heads, fold_modes[0], n_fold,
                      None if seeds is None else seeds[:2], attn_drop,
                      proj_drop, interpret,
                      fold_meta=fold_meta if pair_folded else None)
        dx1, dtok1, dpt1, dbias1, dlab, _ = block_backward(
            x1, g, tokens1, ptuple1, bias1, labels,
            None if seeds is None else seeds[2:], scale, num_heads,
            has_tokens, fold_modes[1], n_fold, attn_drop, proj_drop,
            interpret, shift_geom, mask_plan)
        dx, dtok0, dpt0, dbias0, _, _ = block_backward(
            x, dx1, tokens0, ptuple0, bias0, None,
            None if seeds is None else seeds[:2], scale, num_heads,
            has_tokens, fold_modes[0], n_fold, attn_drop, proj_drop,
            interpret, None)
        dseeds = None if seeds is None \
            else np.zeros(seeds.shape, jax.dtypes.float0)
        return (dx, dtok0, dtok1, dpt0, dpt1, dbias0, dbias1, dlab,
                dseeds)

    def ref(x_, t0_, t1_, p0_, p1_, b0_, b1_, lab_, seeds_):
        return _pair_reference(x_, t0_, t1_, p0_, p1_, b0_, b1_, lab_,
                               seeds_, scale, num_heads, has_tokens,
                               fold_modes, n_fold, attn_drop, proj_drop,
                               shift_geom)

    _, vjp = jax.vjp(ref, x, tokens0, tokens1, ptuple0, ptuple1, bias0,
                     bias1, labels, seeds)
    return vjp(g)


_fused_pair.defvjp(_fused_pair_fwd, _fused_pair_bwd)


def fused_swin_pair(x_win: jnp.ndarray, tokens0, tokens1, params0: dict,
                    params1: dict, bias0: jnp.ndarray, bias1: jnp.ndarray,
                    labels, scale: float, num_heads: int,
                    fold_modes=(FOLD_NONE, FOLD_NONE),
                    shift_geom=None, dropout_seeds=None,
                    attn_drop: float = 0.0, proj_drop: float = 0.0,
                    interpret: bool = False, fold_meta=None) -> jnp.ndarray:
    """Run a full Swin block PAIR (no-shift block, then shifted block) in
    one kernel — the shift lives between the two phases as in-VMEM token
    rolls over index_map-permuted blocks, so the first block's output
    never reaches HBM.

    ``x_win``: UNSHIFTED ``[B, P, M, C]`` window tokens; ``bias1``/
    ``labels`` describe the SHIFTED windows.  Caller must gate on
    :func:`pair_kernel_available`.  ``dropout_seeds``: ``[4]`` uint32
    (attn0, proj0, attn1, proj1) or None.
    """
    b, p, m, c = x_win.shape
    i0 = 0 if tokens0 is None else tokens0.shape[0]
    i1 = 0 if tokens1 is None else tokens1.shape[0]
    if i0 != i1:
        raise ValueError("pair kernel needs equal token counts per block")
    n_fold = fold_width(m, i0) if (fold_modes[0] or fold_modes[1]) else 0
    n = m + n_fold + i0
    xf = x_win.reshape(b * p, m, c)
    lab = None if labels is None \
        else jnp.asarray(labels, jnp.int32).reshape(p, n)
    pt0 = tuple(params0[k] for k in _PARAM_KEYS)
    pt1 = tuple(params1[k] for k in _PARAM_KEYS)
    tok0 = tokens0 if tokens0 is not None else jnp.zeros((1, c), x_win.dtype)
    tok1 = tokens1 if tokens1 is not None else jnp.zeros((1, c), x_win.dtype)
    if dropout_seeds is None:
        dropout_seeds = jnp.zeros((4,), jnp.uint32)
        attn_drop = proj_drop = 0.0
    if shift_geom is not None:
        shift_geom = tuple(tuple(int(v) for v in t) for t in shift_geom)
    if fold_meta is not None:
        window_size, ci = fold_meta
        fold_meta = (tuple(int(v) for v in window_size),
                     None if ci is None else tuple(int(v) for v in ci))
    mask_plan = _static_mask_plan(labels, p, n, shift_geom)
    out = _fused_pair(xf, tok0, tok1, pt0, pt1,
                      bias0.reshape(num_heads, m, n),
                      bias1.reshape(num_heads, m, n), lab, dropout_seeds,
                      scale, num_heads, tokens0 is not None,
                      tuple(fold_modes), n_fold, float(attn_drop),
                      float(proj_drop), interpret, shift_geom, mask_plan,
                      fold_meta)
    return out.reshape(b, p, m, c)


def fold_width(m: int, n_tokens: int) -> int:
    """Virtual-fold column count: 1 real column plus sublane-alignment
    padding so the kernel's key/value row count is a multiple of 8."""
    return 1 + (-(m + n_tokens + 1)) % 8


def _static_mask_plan(labels, p: int, n: int, shift_geom):
    """Mask-dedupe plan for the wrapper level, where ``labels`` is still
    the caller's STATIC numpy table (inside the custom_vjp it becomes a
    tracer under jit, too late for :func:`_mask_class_plan`)."""
    if (labels is None or shift_geom is None
            or not isinstance(labels, np.ndarray)
            or not (_mask_dma() and _mask_dedup())):
        return None
    return _mask_class_plan(np.asarray(labels).reshape(p, n),
                            shift_geom[0])


def fused_swin_block(x_win: jnp.ndarray, tokens: Optional[jnp.ndarray],
                     params: dict, pos_bias: jnp.ndarray,
                     labels: Optional[jnp.ndarray], scale: float,
                     num_heads: int, fold_mode: int = FOLD_NONE,
                     dropout_seeds: Optional[jnp.ndarray] = None,
                     attn_drop: float = 0.0, proj_drop: float = 0.0,
                     interpret: bool = False,
                     shift_geom=None, fold_meta=None) -> jnp.ndarray:
    """Run the full block on windowed content tokens.

    Args:
      x_win: ``[B, P, M, C]`` content window tokens (pre-LN).
      tokens: ``[I, C]`` prompt tokens (unbatched) or None.
      params: dict with ``ln1_scale, ln1_bias, wq, wk, wv, wproj, bproj,
        ln2_scale, ln2_bias, wmlp, bmlp``.
      pos_bias: ``[1, 1, H, M, N]``; labels: per-window shift-region
        labels ``[P, N]`` int32 or None, where ``N = M (+n_fold when
        fold_mode) + I`` — bias/label columns must already be assembled
        in (content, [fold], prompt) order, with label -1 on the
        always-attendable fold/prompt columns.  The multiplicative
        attention mask is label EQUALITY, built inside the kernel
        (no [P, M, N] mask tensor ever reaches HBM).
      fold_mode: FOLD_NONE / FOLD_KEY (unshifted) / FOLD_COUNT (shifted).
      shift_geom: ``(grid, wc, shift)`` static tuples to FUSE the cyclic
        window shift into the kernel: ``x_win`` is then UNSHIFTED
        window-major input and the result is returned unshifted, while
        bias/labels still describe the SHIFTED windows.  When the
        (grid, g) geometry is ineligible (ops/windows.py::
        kernel_shift_plan) — or ``MIVP_NO_KERNEL_SHIFT=1`` — the shift
        materializes at trace level instead (identical semantics).

    Returns: ``[B, P, M, C]`` block output.
    """
    b, p, m, c = x_win.shape
    i = 0 if tokens is None else tokens.shape[0]
    n_fold = fold_width(m, i) if fold_mode else 0
    n = m + n_fold + i
    xf = x_win.reshape(b * p, m, c)
    bias = pos_bias.reshape(num_heads, m, n)
    lab = None if labels is None \
        else jnp.asarray(labels, jnp.int32).reshape(p, n)
    param_tuple = tuple(params[k] for k in _PARAM_KEYS)
    tok_arg = tokens if tokens is not None else jnp.zeros((1, c), x_win.dtype)
    if dropout_seeds is None:
        dropout_seeds = jnp.zeros((2,), jnp.uint32)
        attn_drop = proj_drop = 0.0
    if shift_geom is not None:
        shift_geom = tuple(tuple(int(v) for v in t) for t in shift_geom)
    if fold_meta is not None:
        window_size, ci = fold_meta
        fold_meta = (tuple(int(v) for v in window_size),
                     None if ci is None else tuple(int(v) for v in ci))
    mask_plan = _static_mask_plan(labels, p, n, shift_geom)
    out = _fused_block(xf, tok_arg, param_tuple, bias, lab, dropout_seeds,
                       scale, num_heads, tokens is not None, fold_mode,
                       n_fold, float(attn_drop), float(proj_drop), interpret,
                       shift_geom, mask_plan, fold_meta)
    return out.reshape(b, p, m, c)
