"""Bias-fold: carry the attention position bias in the score matmul.

The fused-block score matmul contracts over ``cw`` lanes (96 at the
flagship C=48 fused-KV geometry) but the MXU prices contractions in
128-lane K-tiles — the remaining ``128*ceil(cw/128) - cw`` lanes are
FREE.  The assembled position bias is exactly low-rank in those lanes:

* the content block is axis-separable by construction
  (models/relative_pe.py: per-axis tables summed and /3-averaged —
  reference relative_positional_encoding.py:104-123), so with base
  coordinates ``(k1*, k2*, k3*)`` chosen among the content columns,

      bias[h, q, k] =   bias[h, q, (k_1, k2*, k3*)]
                      + bias[h, q, (k1*, k_2, k3*)] - bias[h, q, base]
                      + bias[h, q, (k1*, k2*, k_3)] - bias[h, q, base]

  holds EXACTLY — one component per distinct axis value, i.e. a q-side
  table ``vq[h, q, r]`` paired with a k-side one-hot ``kext[k, r]``;
* prompt-token columns are q-independent (reference :127-142): one
  component per head (q-side head one-hot, k-side token scores);
* the virtual fold column (pad folding) is one component with the
  q-side table ``bias[h, q, fold_col]`` (covers the q-dependent
  logsumexp of FOLD_KEY and the constant ln(n_pad) of FOLD_COUNT),
  and the -1e30 alignment columns share one constant component.

Appending ``vq`` to the (per-head) q rows and ``kext`` to the k rows in
lanes ``[cw, cw+R)`` makes the score matmul produce ``q·k + bias`` in
its fp32 accumulator directly — the per-head-block bias-add pass over
the ``[g, hb*m, n]`` score tile (measured ~8% of kernel time,
docs/PERF.md round-2 ablation) disappears, as does the ``[H*M, N]``
fp32 bias block's VMEM residency.  Numerics: the fold tables enter the
MXU in bf16 (one rounding of the bias values, ~1e-3 relative — the
same class as the existing bf16 q/k rounding); the q-side one-hots and
k-side one-hots are exact in bf16.

Applicability: ``ceil((cw+R)/128) == ceil(cw/128)`` — true for C=48
(fused-KV, 96+24<=128), C=96 (96+28<=128) and C=192 (192+35<=256,
already a 2-tile contraction); false for the C=384 bottleneck (3
tiles exactly), which keeps the bias-add path.

Gradient story: the derivation below is a LINEAR map D of the
assembled bias, and the kernel contribution C (vq·kextᵀ) satisfies
``C∘D = Id`` exactly — so the true bias cotangent remains
``dbias = ds * mask``, which is precisely what the backward kernel
already accumulates.  The vq/kext operands therefore carry ZERO
cotangents (their gradient is routed through dbias), and no
``custom_vjp`` gradient plumbing changes.

Reference hot loop this serves: window_attention.py:49-60 (the
``attn + pos_bias`` add at :52-53).
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

FOLD_DEAD = -1e30


def bias_fold_enabled() -> bool:
    """``MIVP_BIAS_FOLD=1`` opts into the in-matmul bias fold.

    Default OFF: device-validated (tools/tpu_validate.py, all arms
    PASS) but wall-clock NEUTRAL — the bias-add pass it eliminates was
    already hidden behind the MXU pipeline (full-bench and kernel-level
    A/Bs, docs/PERF.md round 4).  Kept for geometries where the freed
    [H*M, N] fp32 VMEM block matters."""
    return os.environ.get("MIVP_BIAS_FOLD", "0") not in ("0", "")


@lru_cache(maxsize=None)
def _plan(window_size: Tuple[int, int, int],
          ci: Optional[Tuple[int, ...]], num_heads: int, m: int,
          n_fold: int, n_tokens: int, fold_mode: int, cw: int):
    """Static component plan, or None when the fold cannot apply.

    Returns (cwx, base_col, cols [ncc], sub_flags [ncc], kext_const
    [n, R], tok_base|None, R) — everything numpy/trace-time except the
    bias slices taken later in :func:`fold_tables`.
    """
    n = m + n_fold + n_tokens
    if ci is None:
        ci = tuple(range(int(np.prod(window_size))))
    if len(ci) != m:
        return None
    coords = np.stack(np.unravel_index(np.asarray(ci, np.int64),
                                       window_size), axis=1)  # [m, 3]
    # Components: per axis, one per distinct kept value.
    axis_vals = [np.unique(coords[:, a]) for a in range(3)]
    if len(ci) != int(np.prod([len(v) for v in axis_vals])):
        # The per-component column lookups below require ci to be a full
        # Cartesian product of its per-axis values (content_indices
        # always builds one today); degrade to the unfolded path instead
        # of a trace-time IndexError if that ever changes.
        return None
    ncc = int(sum(len(v) for v in axis_vals))
    r = ncc
    tok_base = None
    if n_tokens > 0:
        tok_base = r
        r += num_heads
    fold_f = fold_d = None
    if fold_mode:
        fold_f = r
        r += 1
        if n_fold > 1:
            fold_d = r
            r += 1
    cwx = 128 * ((cw + 127) // 128)
    if cw + r > cwx:
        return None                      # would add an MXU K-tile
    base = [int(v[0]) for v in axis_vals]
    base_col = int(np.where((coords == base).all(axis=1))[0][0])
    cols = np.empty(ncc, np.int64)
    sub = np.empty(ncc, np.float32)
    kc = np.zeros((n, r), np.float32)
    j = 0
    for a in range(3):
        for u in axis_vals[a]:
            want = list(base)
            want[a] = int(u)
            cols[j] = int(np.where((coords == want).all(axis=1))[0][0])
            sub[j] = 0.0 if a == 0 else 1.0
            kc[:m, j] = (coords[:, a] == u).astype(np.float32)
            j += 1
    if fold_f is not None:
        kc[m, fold_f] = 1.0
    if fold_d is not None:
        kc[m + 1:m + n_fold, fold_d] = FOLD_DEAD
    return (cwx, base_col, cols, sub, kc, tok_base, fold_f, fold_d, r)


def fold_applicable(fold_meta, num_heads: int, m: int, n_fold: int,
                    n_tokens: int, fold_mode: int, cw: int) -> bool:
    """True when this geometry can carry its bias in the matmul."""
    if not bias_fold_enabled() or fold_meta is None:
        return False
    window_size, ci = fold_meta
    return _plan(tuple(window_size), ci, num_heads, m, n_fold, n_tokens,
                 fold_mode, cw) is not None


def fold_lane_width(cw: int) -> int:
    """Lane width of the folded q/k operands (next K-tile multiple)."""
    return 128 * ((cw + 127) // 128)


def fold_tables(bias: jnp.ndarray, fold_meta, num_heads: int, m: int,
                n_fold: int, n_tokens: int, fold_mode: int, cw: int,
                out_dtype=jnp.bfloat16):
    """(vq [heads, m, cwx], kext [n, cwx]) bf16 fold tables.

    ``bias``: the assembled ``[heads, m, n]`` position bias (content
    [+fold] [+prompt] column order).  Lanes ``[0, cw)`` are zero;
    component r lives in lane ``cw + r``.
    """
    window_size, ci = fold_meta
    plan = _plan(tuple(window_size), ci, num_heads, m, n_fold, n_tokens,
                 fold_mode, cw)
    cwx, base_col, cols, sub, kc, tok_base, fold_f, fold_d, r = plan
    parts = []
    # Content components: whole bias columns minus the base column.
    vq_c = jnp.take(bias, jnp.asarray(cols), axis=2)        # [h, m, ncc]
    vq_c = vq_c - jnp.asarray(sub)[None, None, :] \
        * bias[:, :, base_col:base_col + 1]
    parts.append(vq_c)
    kext = jnp.asarray(kc)                                  # [n, R]
    if tok_base is not None:
        # Head one-hots on the q side; token scores on the k side
        # (q-independent by construction — row 0 is representative).
        eye = np.zeros((num_heads, 1, num_heads), np.float32)
        for h in range(num_heads):
            eye[h, 0, h] = 1.0
        parts.append(jnp.broadcast_to(jnp.asarray(eye),
                                      (num_heads, m, num_heads)))
        tok_cols = bias[:, 0, m + n_fold:]                  # [h, i]
        kext = kext.at[m + n_fold:, tok_base:tok_base + num_heads].set(
            tok_cols.T.astype(jnp.float32))
    if fold_f is not None:
        parts.append(bias[:, :, m:m + 1])                   # q-side fold col
    if fold_d is not None:
        parts.append(jnp.ones((num_heads, m, 1), jnp.float32))
    vq = jnp.concatenate(parts, axis=-1)                    # [h, m, R]
    zq = jnp.zeros((num_heads, m, cw), jnp.float32)
    zk = jnp.zeros((bias.shape[2], cw), jnp.float32)
    pad = cwx - cw - r
    if pad:
        vq = jnp.concatenate(
            [zq, vq, jnp.zeros((num_heads, m, pad), jnp.float32)], axis=-1)
        kext = jnp.concatenate(
            [zk, kext, jnp.zeros((kext.shape[0], pad), jnp.float32)],
            axis=-1)
    else:
        vq = jnp.concatenate([zq, vq], axis=-1)
        kext = jnp.concatenate([zk, kext], axis=-1)
    return vq.astype(out_dtype), kext.astype(out_dtype)


def reconstruct(vq: jnp.ndarray, kext: jnp.ndarray) -> jnp.ndarray:
    """Test helper: the bias the folded matmul effectively adds
    (fp32 accumulation of the bf16 tables)."""
    return jnp.einsum("hmr,nr->hmn", vq.astype(jnp.float32),
                      kext.astype(jnp.float32))
