"""Fused Swin-block BACKWARD kernel.

The fused block's ``custom_vjp`` backward differentiates a pure-jnp
reference — correct, but XLA materializes the per-window probability
tensors ``[bp, h, m, n]`` (and their cotangents) in HBM, and the
backward re-runs the whole reference forward first.  At the canonical
training geometries that chain is the single largest slice of the step
(phase-2 trace: ~8.2 ms of 19.2 ms is model backward).

This kernel computes the ENTIRE block backward per window group in
VMEM: it recomputes the forward intermediates (same casts, same
counter-based dropout masks, same fast/stable softmax decision as
ops/fused_block.py::_phase — one definition imported from there), then
chains the gradients:

    mlp -> LN2 -> proj(+dropout) -> attention out -> softmax -> scores
    -> q/k/v projections -> fold rows -> LN1 -> residuals

Outputs: ``dx`` (blocked like ``x``, shift-permuted writes included)
plus fp32 accumulators for every weight/bias operand and the assembled
position bias, accumulated across the sequential grid.  Gradients are
taken w.r.t. the KERNEL OPERANDS (the [Wq | 0] fused layouts, the
pre-projected prompt K/V rows, the assembled bias); the caller maps
them back to (params, tokens, pos_bias) by ``jax.vjp`` of
``_operand_args`` — so the hoisted token LN/projection and the fused
operand layouts are differentiated exactly once, at trace level.

Numerics: cotangent-side matmuls run in bf16 with fp32 accumulation
(the same class as the forward); parity vs the jnp-reference vjp is
pinned in tests/test_fused_block_bwd.py at the bf16 noise floor.

Reference hot loop this accelerates: the training backward of
swin_block.py:205-227 (reference repo), reached through
students_teacher.py:150-207 and segmentation.py:25-39.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import window_attention_pallas as _wap
from .fused_block import (FOLD_COUNT, _EPS, _colmask_np,
                          _fast_softmax_enabled, _label_operands, _ln,
                          _mask_dma, _operand_specs, _softmax,
                          _token_rolls, _x_index)
from .prng import keep_mask

_SCOPED_VMEM_SAFE = 14 * 1024 * 1024


def kernel_bwd_enabled() -> bool:
    """``MIVP_KERNEL_BWD=0`` falls back to the jnp-reference vjp."""
    import os
    return os.environ.get("MIVP_KERNEL_BWD", "1") not in ("0", "")


def bwd_cache_p_enabled() -> bool:
    """p-cache (default ON; ``MIVP_BWD_CACHE_P=0`` is the kill-switch):
    keep each head-block's softmax probabilities (bf16) from the
    forward-recompute pass resident in VMEM and skip the second score
    pass entirely.

    The round-5 ablation (tools/bench_bwd_ablate.py, PERF.md) measured
    the backward kernel as ~2/3 RECOMPUTE: the scores matmul + softmax
    run twice per head block (once for the forward attention output,
    once for the gradient chain).  Caching p trades ``H·g·m·n`` bf16
    bytes of VMEM (modeled in the estimate, so the (g, hb) pick stays
    honest) for eliminating the second pass.  Promoted to default after
    BOTH model-level same-session A/Bs won — phase-2 step 15.68→15.33
    ms, downstream 11.55→10.86 ms — the round-4 VMEM/overlap test
    these decisions require."""
    import os
    return os.environ.get("MIVP_BWD_CACHE_P", "1") not in ("0", "")


def _bwd_ablate() -> str:
    """MEASUREMENT-ONLY ablation arms for tools/bench_bwd_ablate.py
    (the backward twin of the round-3 forward fast-softmax study).

    ``MIVP_BWD_ABLATE`` is a comma list of: ``nosoftmax`` (scores pass
    skips the softmax recompute), ``nobias`` (skip the bias add),
    ``nomask`` (skip the label-mask multiply), ``nofwd`` (skip the
    forward attention-output recompute — the first of the two
    per-head-block passes).  Every arm computes WRONG gradients by
    construction; the default "" is the production kernel, untouched.
    """
    import os
    return os.environ.get("MIVP_BWD_ABLATE", "")


def _vmem_estimate_bwd(g, hb, m, n, c, cw, num_heads, with_mask,
                       with_dropout, mask_dma):
    """Peak scoped-VMEM estimate of one backward grid step (bytes).

    Score-class fp32 tiles dominate: s/p/pd/dpd/ds2 live together at
    the head-block size, the dropout index tensors add u32 copies, and
    the dbias output block plus the dkv accumulator are resident for
    the whole step."""
    score = g * hb * m * n * 4
    est = 6 * score                      # s, p, pd, dpd, ds2, temp
    if with_dropout:
        est += 4 * score                 # u32 iota/idx + keep mask
    est += num_heads * m * n * 4         # bias block
    est += num_heads * m * n * 4         # dbias output block
    if with_mask:
        est += (2 if mask_dma else 1) * g * m * n * 4
    est += 2 * g * n * cw * 4            # dkv accumulator + contrib
    est += 3 * g * (m + n) * cw * 2      # q/k/v bf16
    est += 2 * g * hb * m * cw * 4       # do_full, dqp
    est += 10 * g * m * c * 4            # x, dout, y, x1, l2, dx, ...
    est += 2 * g * n * c * 4             # yv + dyv
    if bwd_cache_p_enabled():
        # bf16 probability cache: ALL head blocks' p live from the
        # forward pass into the gradient loop.
        est += g * num_heads * m * n * 2
    return est


def _pick_g_hb_bwd(bp, p, num_heads, m, n, c, cw, with_mask,
                   with_dropout, mask_dma):
    import os
    forced_g = int(os.environ.get("MIVP_BWD_FORCE_G", "0"))
    for g in range(min(forced_g or 8, 8), 0, -1):
        if bp % g or (p is not None and p % g):
            continue
        for hb in range(num_heads, 0, -1):
            if num_heads % hb:
                continue
            if _vmem_estimate_bwd(g, hb, m, n, c, cw, num_heads,
                                  with_mask, with_dropout,
                                  mask_dma) <= _SCOPED_VMEM_SAFE:
                return g, hb
    return 1, 1


def _ln_bwd(dy, x, scale_row):
    """Backward of ``_ln`` over the lane axis.  Returns (dx,
    sum-of-dscale rows, sum-of-dbias rows) with the sums reduced over
    every leading axis (accumulator-ready ``[1, c]``)."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu
    inv = jax.lax.rsqrt(var + _EPS)
    xhat = (x - mu) * inv
    dscale = jnp.sum(dy * xhat, axis=tuple(range(dy.ndim - 1)))
    dbias = jnp.sum(dy, axis=tuple(range(dy.ndim - 1)))
    dxhat = dy * scale_row
    dx = (dxhat - jnp.mean(dxhat, axis=-1, keepdims=True)
          - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True)) * inv
    return dx, dscale.reshape(1, -1), dbias.reshape(1, -1)


def _bwd_kernel(x_ref, dout_ref,
                ktok_ref, vtok_ref, ln1s_ref, ln1b_ref, wq_ref, wkv_ref,
                wp_ref, bp_ref, ln2s_ref, ln2b_ref, wm_ref, bm_ref,
                bias_ref, vq_ref, kext_ref, lq_ref, lk_ref, colmask_ref,
                seed_ref,
                dx_ref, dktok_ref, dvtok_ref, dln1s_ref, dln1b_ref,
                dwq_ref, dwkv_ref, dwp_ref, dbp_ref, dln2s_ref,
                dln2b_ref, dwm_ref, dbm_ref, dbias_ref, dvq_ref,
                dkext_ref, *,
                scale: float, num_heads: int, group: int, n_tokens: int,
                with_mask: bool, fold_mode: int, n_fold: int,
                head_block: int, attn_drop: float, proj_drop: float,
                fused_kv: bool, shift_plan=None, mask_dma: bool = False,
                mask_classes: bool = False):
    g, h, i = group, num_heads, n_tokens
    m, c = x_ref.shape[1], x_ref.shape[2]
    n = m + n_fold + i
    cw = 2 * c if fused_kv else c
    step = pl.program_id(0)
    w0 = (step * g).astype(jnp.uint32)
    seed_a, seed_p = seed_ref[0, 0], seed_ref[0, 1]
    fast = _fast_softmax_enabled(attn_drop, proj_drop)
    ablate = _bwd_ablate()          # "" in production (measurement-only)

    @pl.when(step == 0)
    def _zero_accs():
        # dvq/dkext stay zero: the bias-fold tables carry no cotangent
        # by design (dbias = ds * mask is the exact total bias gradient
        # — ops/bias_fold.py docstring); the backward always runs with
        # the direct bias operand.
        for ref in (dktok_ref, dvtok_ref, dln1s_ref, dln1b_ref, dwq_ref,
                    dwkv_ref, dwp_ref, dbp_ref, dln2s_ref, dln2b_ref,
                    dwm_ref, dbm_ref, dbias_ref, dvq_ref, dkext_ref):
            ref[...] = jnp.zeros(ref.shape, ref.dtype)

    x = x_ref[:].astype(jnp.float32)
    dout = dout_ref[:].astype(jnp.float32)
    if shift_plan is not None:
        x = _token_rolls(x, shift_plan, g, read=True)
        dout = _token_rolls(dout, shift_plan, g, read=True)

    # ---- forward recompute (mirrors _phase's casts exactly) ----
    ln1s = ln1s_ref[0].astype(jnp.float32)
    ln1b = ln1b_ref[0].astype(jnp.float32)
    y = _ln(x, ln1s[None, None, :], ln1b[None, None, :])
    if fold_mode:
        vrow = jnp.concatenate([ln1b[None, None, :]] * g, axis=0)
        if n_fold > 1:
            zpad = jnp.zeros((g, n_fold - 1, c), jnp.float32)
            vrow = jnp.concatenate([vrow, zpad], axis=1)
        yv = jnp.concatenate([y, vrow], axis=1)
    else:
        yv = y
    nk = yv.shape[1]
    y16 = y.astype(jnp.bfloat16)
    yv16 = yv.astype(jnp.bfloat16).reshape(g * nk, c)
    dot2 = lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    rowdot = lambda a, b: jax.lax.dot_general(  # a^T b over rows
        a, b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    tdot = lambda a, b: jax.lax.dot_general(    # a b^T over lanes
        a, b, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    q = (dot2(y16[:, :m].reshape(g * m, c), wq_ref[:].astype(jnp.bfloat16))
         * jnp.float32(scale)).astype(jnp.bfloat16).reshape(g, m, cw)
    if fused_kv:
        kv = dot2(yv16, wkv_ref[:].astype(jnp.bfloat16)) \
            .astype(jnp.bfloat16).reshape(g, nk, cw)
        if fold_mode == FOLD_COUNT:
            rows = jax.lax.broadcasted_iota(jnp.int32, (g, nk, cw), 1)
            lanes = jax.lax.broadcasted_iota(jnp.int32, (g, nk, cw), 2)
            kv = jnp.where((rows == m) & (lanes < c), jnp.bfloat16(0), kv)
        if i > 0:
            kvtok = ktok_ref[:].astype(jnp.bfloat16)
            kv = jnp.concatenate(
                [kv, jnp.concatenate([kvtok[None]] * g, axis=0)], axis=1)
        k = v = kv
    else:
        k = dot2(yv16, wkv_ref[0].astype(jnp.bfloat16)) \
            .astype(jnp.bfloat16).reshape(g, nk, c)
        v = dot2(yv16, wkv_ref[1].astype(jnp.bfloat16)) \
            .astype(jnp.bfloat16).reshape(g, nk, c)
        if fold_mode == FOLD_COUNT:
            rows = jax.lax.broadcasted_iota(jnp.int32, (g, nk, 1), 1)
            k = jnp.where(rows == m, jnp.bfloat16(0), k)
        if i > 0:
            ktok = ktok_ref[:].astype(jnp.bfloat16)
            vtok = vtok_ref[:].astype(jnp.bfloat16)
            k = jnp.concatenate(
                [k, jnp.concatenate([ktok[None]] * g, axis=0)], axis=1)
            v = jnp.concatenate(
                [v, jnp.concatenate([vtok[None]] * g, axis=0)], axis=1)
    if fused_kv:
        cmK = colmask_ref[0].astype(jnp.bfloat16)
        cmK32 = colmask_ref[0].astype(jnp.float32)
        cmV32 = colmask_ref[1].astype(jnp.float32)
    else:
        cmK = colmask_ref[:].astype(jnp.bfloat16)
        cmK32 = cmV32 = colmask_ref[:].astype(jnp.float32)
    if with_mask:
        if mask_dma:
            # [g, m, n] — or the deduped [1, m, n] class block, expanded
            # across the group here (see fused_block._label_operands).
            mask = lq_ref[:].astype(jnp.float32)
            if mask_classes and g > 1:
                mask = jnp.concatenate([mask] * g, axis=0)
        else:
            mask = jnp.where((lq_ref[:] == lk_ref[:]) | (lk_ref[:] < 0),
                             jnp.float32(1), jnp.float32(0))

    def attn_drop_mask(h0, hb):
        ig = jax.lax.broadcasted_iota(jnp.uint32, (g, hb * m, n), 0)
        rr = jax.lax.broadcasted_iota(jnp.uint32, (g, hb * m, n), 1)
        jj = jax.lax.broadcasted_iota(jnp.uint32, (g, hb * m, n), 2)
        head = h0 + rr // m
        idx = (((w0 + ig) * num_heads + head) * m + rr % m) * n + jj
        return keep_mask(seed_a, idx, attn_drop)

    def scores(h0, hb):
        qp = jnp.concatenate([q * cmK[hh][None, None, :]
                              for hh in range(h0, h0 + hb)], axis=1)
        s = jax.lax.dot_general(
            qp, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        if "nobias" not in ablate:
            s = s + bias_ref[h0 * m:(h0 + hb) * m, :] \
                .astype(jnp.float32)[None]
        if with_mask and "nomask" not in ablate:
            mrep = jnp.concatenate([mask] * hb, axis=1)
            s = s * mrep
        else:
            mrep = None
        p = s if "nosoftmax" in ablate else _softmax(s, fast)
        if attn_drop > 0.0:
            km = attn_drop_mask(h0, hb)
            pd = p * km
        else:
            km = None
            pd = p
        return qp, p, pd, km, mrep

    # Forward attention output (needed before its own backward).
    # With the p-cache (bwd_cache_p_enabled), this pass ALSO retains
    # each head block's softmax probabilities so the gradient loop
    # below skips its entire score recompute (scores matmul + bias +
    # mask + softmax — measured ~40% of the kernel, PERF.md round 5).
    cache_p = bwd_cache_p_enabled() and "nofwd" not in ablate
    p_cache = []
    if "nofwd" in ablate:
        attn = q.astype(jnp.float32)          # shape-correct placeholder
    else:
        attn = None
        for h0 in range(0, num_heads, head_block):
            hb = min(head_block, num_heads - h0)
            _, p1st, pd, _, _ = scores(h0, hb)
            if cache_p:
                p_cache.append(p1st.astype(jnp.bfloat16))
            o_full = jax.lax.dot_general(
                pd.astype(jnp.bfloat16), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            for j in range(hb):
                part = o_full[:, j * m:(j + 1) * m, :] \
                    * cmV32[h0 + j][None, None, :]
                attn = part if attn is None else attn + part
    attn16 = attn.astype(jnp.bfloat16).reshape(g * m, cw)
    proj = dot2(attn16, wp_ref[:].astype(jnp.bfloat16)).reshape(g, m, c) \
        + bp_ref[0].astype(jnp.float32)[None, None, :]
    if proj_drop > 0.0:
        ig = jax.lax.broadcasted_iota(jnp.uint32, (g, m, c), 0)
        rr = jax.lax.broadcasted_iota(jnp.uint32, (g, m, c), 1)
        jj = jax.lax.broadcasted_iota(jnp.uint32, (g, m, c), 2)
        km_p = keep_mask(seed_p, ((w0 + ig) * m + rr) * c + jj, proj_drop)
        projd = proj * km_p
    else:
        km_p = None
        projd = proj
    x1 = x + projd
    ln2s = ln2s_ref[0].astype(jnp.float32)
    l2 = _ln(x1, ln2s[None, None, :],
             ln2b_ref[0].astype(jnp.float32)[None, None, :])
    l216 = l2.astype(jnp.bfloat16).reshape(g * m, c)

    # ---- backward ----
    g16 = dout.astype(jnp.bfloat16).reshape(g * m, c)
    dwm_ref[...] += rowdot(l216, g16)
    dbm_ref[...] += jnp.sum(dout, axis=(0, 1)).reshape(1, c)
    dl2 = tdot(g16, wm_ref[:].astype(jnp.bfloat16)).reshape(g, m, c)
    dx1_ln, dls2, dlb2 = _ln_bwd(dl2, x1, ln2s[None, None, :])
    dln2s_ref[...] += dls2
    dln2b_ref[...] += dlb2
    dx1 = dout + dx1_ln
    dproj = dx1 * km_p if proj_drop > 0.0 else dx1
    dproj16 = dproj.astype(jnp.bfloat16).reshape(g * m, c)
    dwp_ref[...] += rowdot(attn16, dproj16)
    dbp_ref[...] += jnp.sum(dproj, axis=(0, 1)).reshape(1, c)
    dattn = tdot(dproj16, wp_ref[:].astype(jnp.bfloat16)) \
        .reshape(g, m, cw)

    # dk and dv are SEPARATE accumulators: in the fused case k is v
    # (one tensor), so their sum is the kv cotangent; unfused they back
    # into distinct weight columns and must never mix.
    dk_acc = jnp.zeros((g, n, cw), jnp.float32)
    dv_acc = jnp.zeros((g, n, cw), jnp.float32)
    dq_tot = jnp.zeros((g, m, cw), jnp.float32)
    for blk, h0 in enumerate(range(0, num_heads, head_block)):
        hb = min(head_block, num_heads - h0)
        if cache_p:
            # Reuse pass-1 probabilities: only the CHEAP (VPU) pieces
            # of scores() are rebuilt — the per-head q masking, the
            # mask replica and the dropout keep-mask.  The bf16 cache
            # rounding is the same class as the kernel's existing bf16
            # operand casts (parity pinned in tests).
            p = p_cache[blk].astype(jnp.float32)
            qp = jnp.concatenate([q * cmK[hh][None, None, :]
                                  for hh in range(h0, h0 + hb)], axis=1)
            mrep = jnp.concatenate([mask] * hb, axis=1) \
                if with_mask else None
            if attn_drop > 0.0:
                km = attn_drop_mask(h0, hb)
                pd = p * km
            else:
                km = None
                pd = p
        else:
            qp, p, pd, km, mrep = scores(h0, hb)
        do_full = jnp.concatenate(
            [dattn * cmV32[hh][None, None, :]
             for hh in range(h0, h0 + hb)], axis=1)     # [g, hb*m, cw]
        do16 = do_full.astype(jnp.bfloat16)
        dpd = jax.lax.dot_general(
            do16, v, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # [g, hb*m, n]
        dv_acc = dv_acc + jax.lax.dot_general(
            pd.astype(jnp.bfloat16), do16, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # [g, n, cw]
        dp = dpd * km if attn_drop > 0.0 else dpd
        ds2 = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dpre = ds2 * mrep if with_mask else ds2
        dbias_ref[h0 * m:(h0 + hb) * m, :] += jnp.sum(dpre, axis=0)
        dpre16 = dpre.astype(jnp.bfloat16)
        dqp = jax.lax.dot_general(
            dpre16, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # [g, hb*m, cw]
        dk_acc = dk_acc + jax.lax.dot_general(
            dpre16, qp, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # [g, n, cw]
        for j in range(hb):
            dq_tot = dq_tot + dqp[:, j * m:(j + 1) * m, :] \
                * cmK32[h0 + j][None, None, :]
    # q path (the scale multiplier sits between the matmul and the cast)
    dqpre16 = (dq_tot * jnp.float32(scale)).astype(jnp.bfloat16) \
        .reshape(g * m, cw)
    dwq_ref[...] += rowdot(y16[:, :m].reshape(g * m, c), dqpre16)
    dy_q = tdot(dqpre16, wq_ref[:].astype(jnp.bfloat16)).reshape(g, m, c)
    # k/v paths: fold-row zeroing mirrors the forward (grads through
    # forward-zeroed entries are zero), then weights and dyv.
    if fold_mode == FOLD_COUNT:
        rows = jax.lax.broadcasted_iota(jnp.int32, (g, n, cw), 1)
        if fused_kv:
            lanes = jax.lax.broadcasted_iota(jnp.int32, (g, n, cw), 2)
            dk_acc = jnp.where((rows == m) & (lanes < c), jnp.float32(0),
                               dk_acc)
        else:
            dk_acc = jnp.where(rows == m, jnp.float32(0), dk_acc)
    if fused_kv:
        dkv = dk_acc + dv_acc
        if i > 0:
            dktok_ref[...] += jnp.sum(dkv[:, nk:, :], axis=0)
        dkv16 = dkv[:, :nk, :].astype(jnp.bfloat16).reshape(g * nk, cw)
        dwkv_ref[...] += rowdot(yv16, dkv16)
        dyv = tdot(dkv16, wkv_ref[:].astype(jnp.bfloat16)) \
            .reshape(g, nk, c)
    else:
        if i > 0:
            dktok_ref[...] += jnp.sum(dk_acc[:, nk:, :], axis=0)
            dvtok_ref[...] += jnp.sum(dv_acc[:, nk:, :], axis=0)
        dk16 = dk_acc[:, :nk, :].astype(jnp.bfloat16).reshape(g * nk, c)
        dv16 = dv_acc[:, :nk, :].astype(jnp.bfloat16).reshape(g * nk, c)
        dwkv_ref[0] += rowdot(yv16, dk16)
        dwkv_ref[1] += rowdot(yv16, dv16)
        dyv = (tdot(dk16, wkv_ref[0].astype(jnp.bfloat16))
               + tdot(dv16, wkv_ref[1].astype(jnp.bfloat16))) \
            .reshape(g, nk, c)
    if fold_mode:
        dln1b_fold = jnp.sum(dyv[:, m, :], axis=0).reshape(1, c)
    else:
        dln1b_fold = jnp.zeros((1, c), jnp.float32)
    dy = dy_q + dyv[:, :m, :]
    dx_ln, dls1, dlb1 = _ln_bwd(dy, x, ln1s[None, None, :])
    dln1s_ref[...] += dls1
    dln1b_ref[...] += dlb1 + dln1b_fold
    dx = dx1 + dx_ln
    if shift_plan is not None:
        dx = _token_rolls(dx, shift_plan, g, read=False)
    dx_ref[:] = dx.astype(dx_ref.dtype)


def kernel_bwd_fits(bp, p, num_heads, m, n, c, with_mask, with_dropout,
                    mask_dma) -> bool:
    """True when SOME (g, hb) keeps the backward step under the
    scoped-VMEM limit (the picker returns (1, 1) even when nothing
    fits, so re-check the estimate at the floor)."""
    cw = 2 * c if 2 * c <= 128 else c
    g, hb = _pick_g_hb_bwd(bp, p, num_heads, m, n, c, cw, with_mask,
                           with_dropout, mask_dma)
    return _vmem_estimate_bwd(g, hb, m, n, c, cw, num_heads, with_mask,
                              with_dropout, mask_dma) <= _SCOPED_VMEM_SAFE


def block_backward(x, dout, tokens, param_tuple, bias, labels, seeds,
                   scale, num_heads, has_tokens, fold_mode, n_fold,
                   attn_drop, proj_drop, interpret, shift_geom,
                   mask_plan=None):
    """Fused-kernel backward of ONE Swin block.

    Mirrors ``fused_block._forward``'s geometry decisions, runs
    :func:`_bwd_kernel` over the same grid, then maps the 13 operand
    cotangent accumulators back to (params, tokens, bias) by
    ``jax.vjp`` of ``_operand_args``.  Returns the ``custom_vjp``
    cotangent tuple ``(dx, dtokens, dparam_tuple, dbias, dlabels,
    dseeds)`` (the last two are float0 zeros: int operands).
    """
    import functools as _ft
    import os as _os
    from .fused_block import _PARAM_KEYS, _operand_args
    params = dict(zip(_PARAM_KEYS, param_tuple))
    tokens_used = tokens if has_tokens else None
    bp, m, c = x.shape
    i = 0 if tokens_used is None else tokens_used.shape[0]
    n = m + n_fold + i
    p = labels.shape[0] if labels is not None else None
    fused_kv = 2 * c <= 128
    cw = 2 * c if fused_kv else c
    mask_dma = labels is not None and _mask_dma()
    with_dropout = attn_drop > 0.0 or proj_drop > 0.0
    g, hb = _pick_g_hb_bwd(bp, p, num_heads, m, n, c, cw,
                           labels is not None, with_dropout, mask_dma)
    plan = None
    unshift = None
    if shift_geom is not None:
        from .windows import kernel_shift_plan, window_shift
        grid_s, wc_s, sh_s = shift_geom
        if _os.environ.get("MIVP_NO_KERNEL_SHIFT", "0") in ("0", ""):
            plan = kernel_shift_plan(grid_s, wc_s, sh_s, g)
        if plan is None:
            # Trace-level fallback: dout takes the SAME forward shift as
            # x (vjp of a permutation is its inverse; see derivation in
            # the module docstring), dx takes the inverse afterwards.
            P_s = int(np.prod(grid_s))
            bb = bp // P_s

            def _shift(t, inverse):
                t4 = t.reshape(bb, P_s, m, c)
                t4 = window_shift(t4, grid_s, wc_s, sh_s, inverse=inverse)
                return t4.reshape(bp, m, c)

            x = _shift(x, False)
            dout = _shift(dout, False)
            unshift = lambda t: _shift(t, True)
    colmask_np = _colmask_np(num_heads, c, cw, fused_kv)
    x_spec = pl.BlockSpec((g, m, c), _x_index(plan, g),
                          memory_space=pltpu.VMEM)
    fix = lambda *shape: pl.BlockSpec(shape, lambda idx: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    op_specs = _operand_specs(i, c, cw, fused_kv, num_heads, m, n)
    op_args = _operand_args(params, tokens_used, i, c, cw, fused_kv,
                            num_heads, m, n, bias)
    lab_specs, lab_args, deduped = _label_operands(
        labels, m, n, g, p, mask_dma, mask_plan=mask_plan)
    in_specs = [x_spec, x_spec] + op_specs + lab_specs
    args = [x, dout] + op_args + lab_args
    in_specs.append(fix(*colmask_np.shape))
    args.append(jnp.asarray(colmask_np))
    in_specs.append(pl.BlockSpec((1, 2), lambda idx: (0, 0),
                                 memory_space=pltpu.SMEM))
    args.append(jnp.zeros((1, 2), jnp.uint32) if seeds is None
                else seeds.reshape(1, 2).astype(jnp.uint32))
    # One fp32 accumulator output per weight/bias operand, same order.
    grad_structs = [jax.ShapeDtypeStruct(a.shape, jnp.float32)
                    for a in op_args]
    out_specs = [x_spec] + [fix(*a.shape) for a in op_args]
    out_shape = [jax.ShapeDtypeStruct((bp, m, c), x.dtype)] + grad_structs
    kernel = _ft.partial(
        _bwd_kernel, scale=scale, num_heads=num_heads, group=g,
        n_tokens=i, with_mask=labels is not None, fold_mode=fold_mode,
        n_fold=n_fold, head_block=hb, attn_drop=attn_drop,
        proj_drop=proj_drop, fused_kv=fused_kv, shift_plan=plan,
        mask_dma=mask_dma, mask_classes=deduped)
    dh = c // num_heads
    outs = pl.pallas_call(
        kernel,
        grid=(bp // g,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=3 * (4 * bp * num_heads * m * n * dh
                       + 12 * bp * n * c * c),
            bytes_accessed=3 * x.size * x.dtype.itemsize,
            transcendentals=bp * num_heads * m * n),
        interpret=interpret or _wap._FORCE_INTERPRET,
        compiler_params=_wap.mosaic_params(),
    )(*args)
    dx, *dops = outs
    if unshift is not None:
        dx = unshift(dx)

    def op_fn(pt, tk, b):
        ps = dict(zip(_PARAM_KEYS, pt))
        return _operand_args(ps, tk if has_tokens else None, i, c, cw,
                             fused_kv, num_heads, m, n, b)

    primal_out, opvjp = jax.vjp(op_fn, param_tuple, tokens, bias)
    cots = [ct.astype(po.dtype) for ct, po in zip(dops, primal_out)]
    dpt, dtok, dbias = opvjp(cots)
    dlab = None if labels is None \
        else np.zeros(labels.shape, jax.dtypes.float0)
    dseeds = None if seeds is None \
        else np.zeros(seeds.shape, jax.dtypes.float0)
    return dx, dtok, dpt, dbias, dlab, dseeds
