"""Prompted shifted-window Swin transformer blocks.

Parity targets (/root/reference/src/modules/swin_transformer/
swin_block.py):

* ``SwinTransformerBlock`` (:98-289) — symmetric pad to window multiples,
  relative-position bias, cyclic roll shift, trace-time shifted-window
  mask (prompt-token columns force-enabled, prompt rows left 0),
  *dilated* window partition, prompt tokens concatenated per window
  before attention and cut after, pre-LN attention + residual, and a
  single-Linear "MLP" with pre-LN + residual (:138-143,:227 — yes, one
  Linear, a reference quirk preserved for checkpoint parity).
* ``ConsecutiveSwinBlocks`` (:16-95) — a no-shift block then a
  shift=window//2 block, optionally followed by PatchMerging.
* Adaptive shift (:265-270): shift is zeroed on axes where the feature
  map is not larger than the window.

TPU-first: data layout is channels-last ``[B, H, W, D, C]``; masks and
paddings are trace-time numpy constants (ops/windows.py); gradient
checkpointing is ``flax.linen.remat`` at block granularity, matching the
reference's per-block ``torch.utils.checkpoint`` (:257-263).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.windows import (compute_paddings, get_attn_labels, unpad_paddings,
                           get_attn_mask, window_partition,
                           window_reverse)
from .patch_merging import PatchMerging
from .relative_pe import RelativePE
from .window_attention import WindowAttention

_xavier = nn.initializers.xavier_uniform()


def _fused_block_disabled() -> bool:
    """Escape hatch: ``MIVP_NO_FUSED_BLOCK=1`` routes attention through
    the standalone packed/per-head kernels (ops/window_attention_pallas)
    instead of the fused Swin-block kernel — a coarser but independently
    proven path, used by bench.py's fallback ladder if a fused-kernel
    compile ever fails on a new backend version."""
    import os
    return os.environ.get("MIVP_NO_FUSED_BLOCK", "0") not in ("0", "")


def content_indices(dims, window_size, paddings, fold_axes) -> np.ndarray:
    """Flat full-window indices of the CONTENT tokens under pad
    folding (the kept rows/cols of the assembled bias/labels; also the
    coordinate metadata for the bias fold, ops/bias_fold.py)."""
    keep = []
    for i in range(3):
        if i in fold_axes:
            lo = paddings[2 * i]
            keep.append(np.arange(lo, lo + dims[i]))
        else:
            keep.append(np.arange(window_size[i]))
    grid = np.zeros(tuple(window_size), dtype=bool)
    grid[np.ix_(keep[0], keep[1], keep[2])] = True
    return np.where(grid.reshape(-1))[0]


def fold_geometry(dims, window_size, fold_axes, paddings):
    """(content window ``wc``, effective paddings) for pad-folding: folded
    axes use the feature extent as the window and are never materially
    padded; other axes keep the attention window and their paddings."""
    wc = tuple(dims[i] if i in fold_axes else window_size[i]
               for i in range(3))
    pads_eff = tuple(0 if (i // 2) in fold_axes else paddings[i]
                     for i in range(6))
    return wc, pads_eff


class SwinTransformerBlock(nn.Module):
    hidden_channels: int
    window_size: Sequence[int]
    pos_bias_embed_dim: int
    num_heads: int
    max_prompts: int
    tokens_per_prompt: int
    use_token_params: bool = True
    shift_size: Optional[Sequence[int]] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    use_checkpoint: bool = False
    attn_impl: str = "auto"
    pad_mode: str = "reference"
    dtype: Any = None

    def setup(self):
        self.pe = RelativePE(
            embed_dim=self.pos_bias_embed_dim,
            num_heads=self.num_heads,
            max_abs_pos=tuple(self.window_size),
            max_cap_dist=tuple(self.window_size),
            max_prompts=self.max_prompts,
            tokens_per_prompt=self.tokens_per_prompt,
            use_token_params=self.use_token_params,
        )
        self.attn_norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)
        self.attn = WindowAttention(
            dim=self.hidden_channels,
            num_heads=self.num_heads,
            attn_drop=self.attn_drop,
            proj_drop=self.proj_drop,
            attn_impl=self.attn_impl,
            dtype=self.dtype,
        )
        self.mlp_norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)
        self.mlp = nn.Dense(self.hidden_channels, kernel_init=_xavier,
                            dtype=self.dtype)

    def get_shift_size(self, shape_x: Sequence[int]) -> Tuple[int, ...]:
        """Zero the shift on axes not larger than the window (ref :265-270)."""
        shift = list(self.shift_size)
        for i, d in enumerate(shape_x):
            if d <= self.window_size[i]:
                shift[i] = 0
        return tuple(shift)

    def _block_params(self) -> dict:
        """Raw param views for the fused block kernel."""
        attn_params = self.attn.variables["params"]
        ln1 = self.attn_norm.variables["params"]
        ln2 = self.mlp_norm.variables["params"]
        mlp = self.mlp.variables["params"]
        return {
            "ln1_scale": ln1["scale"], "ln1_bias": ln1["bias"],
            "wq": attn_params["to_q_kernel"],
            "wk": attn_params["to_k_kernel"],
            "wv": attn_params["to_v_kernel"],
            "wproj": attn_params["proj"]["kernel"],
            "bproj": attn_params["proj"]["bias"],
            "ln2_scale": ln2["scale"], "ln2_bias": ln2["bias"],
            "wmlp": mlp["kernel"], "bmlp": mlp["bias"],
        }

    def _cached_bias(self, name: str, compute):
        """Memoize a param-only bias tensor in the ``bias_cache``
        collection (pre-filled once per program by
        ``models.swin_unetr.prefill_bias_cache``; recomputed fresh when
        no cache is provided, e.g. during training)."""
        if not self.is_initializing() and self.has_variable("bias_cache",
                                                            name):
            return self.get_variable("bias_cache", name)
        val = compute()
        if (not self.is_initializing()
                and self.is_mutable_collection("bias_cache")):
            self.put_variable("bias_cache", name, val)
        return val

    def _forward_folded(self, x: jnp.ndarray, p: Optional[jnp.ndarray],
                        window_size, shift_size, paddings,
                        fold_axes, deterministic=True) -> jnp.ndarray:
        """Fused-block forward with pad-folding on ``fold_axes``.

        Axes whose feature extent is smaller than the window are NOT
        materially padded; the identical pad tokens of every window are
        folded into one virtual key column (exact algebra in
        ops/fused_block.py).  Everything the reference's padded
        computation observes — the interior-relabel-100 mask quirk, the
        multiplicative exp(0) contribution of masked pads, the
        positional-bias columns of unmasked pads — is reproduced via the
        assembled bias/mask in :meth:`folded_on_windows`.
        """
        dims = tuple(x.shape[1:4])
        wc, pads_eff = fold_geometry(dims, window_size, fold_axes, paddings)
        if any(pp > 0 for pp in pads_eff):
            x = jnp.pad(x, ((0, 0), (pads_eff[0], pads_eff[1]),
                            (pads_eff[2], pads_eff[3]),
                            (pads_eff[4], pads_eff[5]), (0, 0)))
        hp, wp, dp = x.shape[1:4]
        shifted = any(s > 0 for s in shift_size)
        if shifted:
            x = jnp.roll(x, shift=tuple(-s for s in shift_size),
                         axis=(1, 2, 3))
        x_win = window_partition(x, wc)             # [B, P, Mc, C]
        x_win = self.folded_on_windows(x_win, p, dims, window_size,
                                       shift_size, paddings, fold_axes,
                                       deterministic)
        x = window_reverse(x_win, wc, (hp, wp, dp))
        if shifted:
            x = jnp.roll(x, shift=tuple(shift_size), axis=(1, 2, 3))
        if any(pp > 0 for pp in pads_eff):
            x = x[:, pads_eff[0]: x.shape[1] - pads_eff[1],
                  pads_eff[2]: x.shape[2] - pads_eff[3],
                  pads_eff[4]: x.shape[3] - pads_eff[5], :]
        return x

    def folded_assembly(self, dims, window_size, shift_size, paddings,
                        fold_axes, n_tokens):
        """Assembled (bias ``[1,1,H,Mc,N]``, labels np|None, fold_mode)
        for the pad-folded kernel call (virtual fold column, -1e30
        alignment columns, content-cut label rows)."""
        from ..ops.fused_block import FOLD_COUNT, FOLD_KEY, fold_width
        # Content-token index set within the full window's (ih, iw, id)
        # row-major ordering.
        ci = content_indices(dims, window_size, paddings, fold_axes)
        m_c = int(ci.size)
        n_full = int(np.prod(window_size))
        n_pad = n_full - m_c
        # Fold block width: 1 real virtual column + sublane-alignment
        # columns neutralized with a -1e30 bias.
        n_fold = fold_width(m_c, n_tokens)
        padded_full = tuple(dims[i] + paddings[2 * i] + paddings[2 * i + 1]
                            for i in range(3))

        shifted = any(s > 0 for s in shift_size)
        if shifted:
            # Per-window shift-region labels (the kernel builds the
            # equality mask in-VMEM; -1 = always-attendable fold/prompt
            # columns).  Content cut mirrors the old [:, ci][:, :, ci]
            # mask slicing.
            full_labels = get_attn_labels(padded_full, tuple(window_size),
                                          tuple(shift_size),
                                          tuple(paddings))  # numpy [P, N]
            labels_c = full_labels[:, ci]
            pwin = labels_c.shape[0]
            labels = np.concatenate(
                [labels_c, np.full((pwin, n_fold + n_tokens), -1,
                                   np.int32)], axis=-1)
            fold_mode = FOLD_COUNT
        else:
            labels = None
            fold_mode = FOLD_KEY

        def build_bias():
            pos_bias = self.pe(window_size[0], window_size[1],
                               window_size[2], n_tokens)[0]  # [heads, N, N]
            bias_rows = jnp.take(pos_bias, ci, axis=1)   # [H, Mc, N]
            bias_cc = jnp.take(bias_rows, ci, axis=2)    # [H, Mc, Mc]
            bias_cp = bias_rows[:, :, n_full:]           # [H, Mc, I]
            if shifted:
                # Masked pad columns each contribute exp(0): fold into
                # one unmasked column with zero key and bias ln(n_pad).
                fold_col = jnp.full((pos_bias.shape[0], m_c, 1),
                                    float(np.log(n_pad)), pos_bias.dtype)
            else:
                # Unmasked pad columns share one key; fold their
                # positional biases by logsumexp.
                pi = np.setdiff1d(np.arange(n_full), ci)
                bias_pads = jnp.take(bias_rows, pi, axis=2)
                fold_col = jax.nn.logsumexp(bias_pads, axis=-1,
                                            keepdims=True)
            if n_fold > 1:  # alignment cols: softmax weight exp(-1e30)=0
                dead = jnp.full((pos_bias.shape[0], m_c, n_fold - 1),
                                -1e30, pos_bias.dtype)
                fold_col = jnp.concatenate([fold_col, dead], axis=-1)
            return jnp.concatenate([bias_cc, fold_col, bias_cp], axis=-1)

        key = ("foldbias_w{}_d{}_p{}_f{}_s{}_t{}".format(
            "x".join(map(str, window_size)), "x".join(map(str, dims)),
            "-".join(map(str, paddings)),
            "".join(map(str, sorted(fold_axes))), int(shifted), n_tokens))
        bias = self._cached_bias(key, build_bias)
        return bias[None, None], labels, fold_mode  # [1, 1, H, Mc, N']

    def folded_on_windows(self, x_win: jnp.ndarray,
                          p: Optional[jnp.ndarray], dims, window_size,
                          shift_size, paddings, fold_axes,
                          deterministic=True, shift_geom=None) -> jnp.ndarray:
        """Pad-folded fused kernel on already-partitioned ``wc`` windows
        (bias/mask/virtual-column assembly; no spatial-layout ops)."""
        from ..ops.fused_block import fused_swin_block
        n_tokens = 0 if p is None else p.shape[1]
        bias, labels, fold_mode = self.folded_assembly(
            dims, window_size, shift_size, paddings, fold_axes, n_tokens)
        head_dim = self.hidden_channels // self.num_heads
        ci = content_indices(dims, window_size, paddings, fold_axes)
        return fused_swin_block(
            x_win, p[0] if p is not None else None, self._block_params(),
            bias, labels, head_dim ** -0.5, self.num_heads,
            fold_mode=fold_mode, shift_geom=shift_geom,
            fold_meta=(tuple(window_size), tuple(int(v) for v in ci)),
            **self._drop_kw(deterministic))

    def _drop_kw(self, deterministic: bool) -> dict:
        """Kernel dropout kwargs (counter-based seeds) when active."""
        if deterministic or (self.attn_drop == 0.0 and self.proj_drop == 0.0):
            return {}
        return dict(
            dropout_seeds=jax.random.bits(self.make_rng("dropout"),
                                          (2,), jnp.uint32),
            attn_drop=self.attn_drop, proj_drop=self.proj_drop)

    def fused_on_windows(self, x_win: jnp.ndarray, p: Optional[jnp.ndarray],
                         shape_x: Sequence[int],
                         deterministic: bool = True,
                         shift_geom=None) -> jnp.ndarray:
        """Run the fused block kernel on already-partitioned windows.

        Used by the pair-fused path (ConsecutiveSwinBlocks): the caller
        keeps the tensor in window-major ``[B, P, M, C]`` layout across
        the (no-shift, shift) pair; the shifted block's cyclic roll is
        fused into the kernel via ``shift_geom`` (with a trace-level
        ``window_shift`` fallback inside fused_swin_block).  Only valid
        when ``shape_x`` needs no padding (every axis a window multiple).
        """
        bias_rows, labels, _ = self.plain_assembly(
            tuple(shape_x), x_win.shape[2],
            0 if p is None else p.shape[1],
            self.get_shift_size(tuple(shape_x)))
        from ..ops.fused_block import fused_swin_block
        head_dim = self.hidden_channels // self.num_heads
        return fused_swin_block(
            x_win, p[0] if p is not None else None, self._block_params(),
            bias_rows, labels, head_dim ** -0.5, self.num_heads,
            shift_geom=shift_geom,
            fold_meta=(tuple(self.window_size), None),
            **self._drop_kw(deterministic))

    def plain_assembly(self, shape_x, n_content, n_tokens, shift_size):
        """(bias ``[1,1,H,Mc,N]``, labels np|None, FOLD_NONE) for the
        unpadded (window-multiple) kernel call."""
        window_size = tuple(self.window_size)
        pos_bias = self.pe(window_size[0], window_size[1], window_size[2],
                           n_tokens)[:, None]      # [1, 1, heads, N, N]
        if any(s > 0 for s in shift_size):
            labels = get_attn_labels(tuple(shape_x), window_size,
                                     tuple(shift_size), (0,) * 6)  # [P, N]
            if n_tokens:
                # Prompt-token key columns are never masked: label -1.
                labels = np.concatenate(
                    [labels, np.full((labels.shape[0], n_tokens), -1,
                                     np.int32)], axis=-1)
        else:
            labels = None
        return pos_bias[:, :, :, :n_content, :], labels, 0

    def _forward_attn_mlp(self, x: jnp.ndarray, p: Optional[jnp.ndarray],
                          deterministic: bool) -> jnp.ndarray:
        b, h, w, d, c = x.shape
        window_size = tuple(self.window_size)
        shift_size = self.get_shift_size((h, w, d))
        paddings = compute_paddings((h, w, d), window_size, self.pad_mode)
        # The reference's mask slicing and unpad crop use the UNswapped
        # (floor, ceil) values while the data is padded (ceil, floor) —
        # with odd pad totals its block outputs shift by one voxel.
        # Replicated exactly under pad_mode "reference"
        # (ops/windows.py::unpad_paddings); identity under "aligned".
        ref_pads = unpad_paddings(paddings, self.pad_mode)

        # Pad-folding fast path (TPU fused kernel only): axes where the
        # feature map is SMALLER than the window would be zero-padded
        # identically in every window; their entire attention
        # contribution folds into one virtual key column (see
        # ops/fused_block.py docstring for the exact algebra).  Numerics
        # match the reference computation up to fp reassociation.
        # Training with the canonical attn/proj dropout 0.1 ALSO runs in
        # the kernel: counter-based masks (ops/prng.py) are regenerated
        # bit-exactly by the custom_vjp's jnp backward.
        from .window_attention import _use_pallas
        use_fused_block = (
            not self.is_initializing()
            and not _fused_block_disabled()
            and _use_pallas(self.attn_impl, True, 0.0))
        fold_axes = tuple(i for i, dim in enumerate((h, w, d))
                          if dim < self.window_size[i])
        _, pads_eff = fold_geometry((h, w, d), window_size, fold_axes,
                                    paddings)
        if use_fused_block and fold_axes and not any(pads_eff) \
                and paddings == ref_pads:
            # Pad-folding requires that the folded axes be the ONLY
            # padding: with material pads on other axes (pad_mode
            # "reference" pads aligned axes too), material-pad query
            # rows have UNMASKED virtual-pad columns (equal shift
            # labels), breaking the all-masked fold constant — the
            # standard padded kernel path below is exact there.  Odd
            # (asymmetric) fold-axis pads under pad_mode "reference"
            # also take the plain path: the reference mislabels one
            # content row as padding there (see unpad_paddings), which
            # the fold algebra cannot express.
            return self._forward_folded(x, p, window_size, shift_size,
                                        paddings, fold_axes, deterministic)
        drop_kw = {} if not use_fused_block \
            else self._drop_kw(deterministic)

        if any(pp > 0 for pp in paddings):
            x = jnp.pad(x, ((0, 0),
                            (paddings[0], paddings[1]),
                            (paddings[2], paddings[3]),
                            (paddings[4], paddings[5]),
                            (0, 0)))
        hp, wp, dp = x.shape[1:4]
        n_tokens = 0 if p is None else p.shape[1]
        pos_bias = self.pe(window_size[0], window_size[1], window_size[2],
                           n_tokens)  # [1, heads, N, N]
        pos_bias = pos_bias[:, None]  # [1, 1, heads, N, N]

        shifted = any(s > 0 for s in shift_size)
        labels = None
        attn_mask = None
        if shifted:
            x_shifted = jnp.roll(
                x, shift=(-shift_size[0], -shift_size[1], -shift_size[2]),
                axis=(1, 2, 3))
            if use_fused_block:
                # The kernel consumes [P, N] region labels and builds
                # the equality mask in-VMEM (-1 = never-masked prompt
                # key columns).
                labels = get_attn_labels((hp, wp, dp), window_size,
                                         shift_size, ref_pads)
                if p is not None:
                    labels = np.concatenate(
                        [labels, np.full((labels.shape[0], n_tokens), -1,
                                         np.int32)], axis=-1)
            else:
                attn_mask = get_attn_mask((hp, wp, dp), window_size,
                                          shift_size, ref_pads)  # [P, N, N]
                if p is not None:
                    pwin, nwin, _ = attn_mask.shape
                    total = np.zeros((pwin, nwin + n_tokens,
                                      nwin + n_tokens), dtype=np.float32)
                    total[:, :nwin, :nwin] = attn_mask
                    # Prompt tokens are never masked as keys; prompt
                    # query rows stay 0 (ref :187-200 — under the
                    # multiplicative mask those rows degrade to uniform
                    # attention).
                    total[:, :nwin, nwin:] = 1.0
                    attn_mask = total
                attn_mask = jnp.asarray(attn_mask)[None, :, None]
        else:
            x_shifted = x

        x_win = window_partition(x_shifted, window_size)  # [B, P, Nc, C]
        n_content = x_win.shape[2]
        # Content-query attention: the reference computes attention for
        # the prompt-token query rows too and then cuts them away
        # (swin_block.py:215-225) — those rows are pure waste (and under
        # the multiplicative mask they degrade to uniform attention).
        # Restricting queries to the content rows gives bit-identical
        # kept outputs, skips ~tokens/N of the attention work, and keeps
        # the query tile count MXU-aligned.
        bias_rows = pos_bias[:, :, :, :n_content, :]
        mask_rows = None if attn_mask is None \
            else attn_mask[:, :, :, :n_content, :]

        # Fused path also covers training when both dropouts are off: the
        # kernel's custom_vjp differentiates an exactly-matching jnp
        # reference, so gradients are correct.
        if use_fused_block:
            # Entire LN->qkv->attention->proj->LN->MLP body in one Pallas
            # kernel (ops/fused_block.py); prompt tokens are model
            # parameters broadcast over the batch, so row 0 carries them.
            from ..ops.fused_block import fused_swin_block
            head_dim = self.hidden_channels // self.num_heads
            x_win = fused_swin_block(
                x_win, p[0] if p is not None else None,
                self._block_params(), bias_rows, labels,
                head_dim ** -0.5, self.num_heads,
                fold_meta=(tuple(window_size), None), **drop_kw)
        else:
            if p is not None:
                p_b = jnp.broadcast_to(p[:, None].astype(x_win.dtype),
                                       (b, x_win.shape[1], n_tokens, c))
                kv = jnp.concatenate([x_win, p_b], axis=2)  # [B, P, Nc+I, C]
            else:
                kv = x_win
            shortcut = x_win
            y = self.attn_norm(kv)
            y = self.attn(q=y, k=y, v=y, pos_bias=bias_rows, mask=mask_rows,
                          deterministic=deterministic,
                          q_rows=n_content if p is not None else None)
            x_win = y + shortcut
            x_win = x_win + self.mlp(self.mlp_norm(x_win))
        x_shifted = window_reverse(x_win, window_size, (hp, wp, dp))
        if shifted:
            x = jnp.roll(x_shifted,
                         shift=(shift_size[0], shift_size[1], shift_size[2]),
                         axis=(1, 2, 3))
        else:
            x = x_shifted
        if any(pp > 0 for pp in paddings):
            x = x[:, ref_pads[0]: x.shape[1] - ref_pads[1],
                  ref_pads[2]: x.shape[2] - ref_pads[3],
                  ref_pads[4]: x.shape[3] - ref_pads[5], :]
        return x

    def __call__(self, x: jnp.ndarray, p: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        if self.use_checkpoint and not deterministic:
            # Rematerialize the block in backward, the jax.checkpoint
            # analogue of the reference's torch checkpointing (:257-263).
            fn = nn.remat(
                SwinTransformerBlock._forward_attn_mlp,
                static_argnums=(3,),
                prevent_cse=False,
            )
            return fn(self, x, p, deterministic)
        return self._forward_attn_mlp(x, p, deterministic)


class ConsecutiveSwinBlocks(nn.Module):
    """A (no-shift, shifted) block pair with optional PatchMerging (ref :16-71)."""

    hidden_channels: int
    num_heads: int
    pos_bias_embed_dim: int
    max_prompts: int
    tokens_per_prompt: int
    window_size: Sequence[int]
    use_token_params: bool = True
    shift_size: Optional[Sequence[int]] = None
    down: bool = True
    merge_last_dim: bool = True
    use_checkpoint: bool = False
    out_channels: Optional[int] = None
    proj_drop: float = 0.0
    attn_drop: float = 0.0
    attn_impl: str = "auto"
    pad_mode: str = "reference"
    dtype: Any = None

    def setup(self):
        shift = tuple(self.shift_size) if self.shift_size is not None else \
            tuple(s // 2 for s in self.window_size)
        no_shift = tuple(0 for _ in self.window_size)
        self.swin_blocks = [
            SwinTransformerBlock(
                hidden_channels=self.hidden_channels,
                num_heads=self.num_heads,
                pos_bias_embed_dim=self.pos_bias_embed_dim,
                max_prompts=self.max_prompts,
                tokens_per_prompt=self.tokens_per_prompt,
                use_token_params=self.use_token_params,
                window_size=tuple(self.window_size),
                shift_size=no_shift if i == 0 else shift,
                attn_drop=self.attn_drop,
                proj_drop=self.proj_drop,
                use_checkpoint=self.use_checkpoint,
                attn_impl=self.attn_impl,
                pad_mode=self.pad_mode,
                dtype=self.dtype,
                name=f"swin_blocks_{i}",
            ) for i in range(2)
        ]
        if self.down:
            out_ch = (2 * self.hidden_channels if self.out_channels is None
                      else self.out_channels)
            self.merge = PatchMerging(
                in_channels=self.hidden_channels,
                out_channels=out_ch,
                merge_last_dim=self.merge_last_dim,
                dtype=self.dtype,
            )

    def _pair_fusable(self, shape_x) -> bool:
        """Both blocks can run on shared window-major layout: fused
        kernel available and no material padding needed (pad-folded
        axes qualify).  Remat is supported on this path too — at PAIR
        granularity (see __call__)."""
        from .window_attention import _use_pallas
        if self.is_initializing():
            return False
        if _fused_block_disabled():
            return False
        if not _use_pallas(self.attn_impl, True, 0.0):
            return False
        fold_axes = tuple(i for i, d in enumerate(shape_x)
                          if d < self.window_size[i])
        paddings = compute_paddings(shape_x, tuple(self.window_size),
                                    self.pad_mode)
        _, pads_eff = fold_geometry(shape_x, tuple(self.window_size),
                                    fold_axes, paddings)
        # Odd fold-axis pads under pad_mode "reference" need the plain
        # path's exact mislabeled-pad replication (see unpad_paddings).
        return not any(pads_eff) \
            and paddings == unpad_paddings(paddings, self.pad_mode)

    def _pair_forward(self, x: jnp.ndarray, p0, p1,
                      deterministic: bool) -> jnp.ndarray:
        """Pair fusion: one partition + one reverse for BOTH blocks; the
        shifted block's cyclic roll is FUSED INTO the second block's
        kernel (index_map window permutation + in-VMEM token rolls —
        ops/fused_block.py), eliminating two 8-D transposes, two spatial
        rolls and the shifted-copy HBM round trip per pair; geometries
        the kernel plan rejects fall back to the trace-level
        window-major ``window_shift`` inside fused_swin_block.
        Pad-folded stages participate with their content window ``wc``."""
        shape_x = tuple(x.shape[1:4])
        w = tuple(self.window_size)
        fold_axes = tuple(i for i, d in enumerate(shape_x) if d < w[i])
        paddings = compute_paddings(shape_x, w, self.pad_mode)
        wc, _ = fold_geometry(shape_x, w, fold_axes, paddings)
        grid = tuple(d // ws for d, ws in zip(shape_x, wc))

        def run_block(blk, x_win, pp, shift_size, shift_geom=None):
            if fold_axes:
                return blk.folded_on_windows(
                    x_win, pp, shape_x, w, shift_size, paddings,
                    fold_axes, deterministic, shift_geom=shift_geom)
            return blk.fused_on_windows(x_win, pp, shape_x, deterministic,
                                        shift_geom=shift_geom)

        x_win = window_partition(x, wc)
        shift = self.swin_blocks[1].get_shift_size(shape_x)
        shifted = any(s > 0 for s in shift)
        sg = (grid, wc, shift) if shifted else None
        out_win = self._run_pair_kernel(x_win, p0, p1, shape_x, w, paddings,
                                        fold_axes, sg, deterministic)
        if out_win is None:  # pair kernel unavailable: two kernel calls
            x_win = run_block(self.swin_blocks[0], x_win, p0, (0, 0, 0))
            out_win = run_block(self.swin_blocks[1], x_win, p1, shift,
                                shift_geom=sg)
        return window_reverse(out_win, wc, shape_x)

    def _run_pair_kernel(self, x_win, p0, p1, shape_x, w, paddings,
                         fold_axes, shift_geom, deterministic):
        """One-kernel pair execution (ops/fused_block.py::fused_swin_pair)
        or None when the geometry/env rules it out."""
        from ..ops.fused_block import fused_swin_pair, pair_kernel_available
        b0, b1 = self.swin_blocks
        m = x_win.shape[2]
        i = 0 if p0 is None else p0.shape[1]
        i1 = 0 if p1 is None else p1.shape[1]
        drop_active = (not deterministic) and \
            (self.attn_drop > 0.0 or self.proj_drop > 0.0)
        if i != i1 or not pair_kernel_available(
                x_win.shape[0] * x_win.shape[1], x_win.shape[1],
                self.num_heads, m, i, self.hidden_channels,
                self.attn_drop if drop_active else 0.0, shift_geom,
                bool(fold_axes)):
            return None
        shift = shift_geom[2] if shift_geom is not None else (0, 0, 0)
        if fold_axes:
            bias0, _, fm0 = b0.folded_assembly(
                shape_x, w, (0, 0, 0), paddings, fold_axes, i)
            bias1, labels, fm1 = b1.folded_assembly(
                shape_x, w, shift, paddings, fold_axes, i)
        else:
            bias0, _, fm0 = b0.plain_assembly(shape_x, m, i, (0, 0, 0))
            bias1, labels, fm1 = b1.plain_assembly(shape_x, m, i, shift)
        drop_kw = {}
        if drop_active:
            drop_kw = dict(
                dropout_seeds=jax.random.bits(self.make_rng("dropout"),
                                              (4,), jnp.uint32),
                attn_drop=self.attn_drop, proj_drop=self.proj_drop)
        head_dim = self.hidden_channels // self.num_heads
        if fold_axes:
            ci = content_indices(shape_x, w, paddings, fold_axes)
            fold_meta = (tuple(w), tuple(int(v) for v in ci))
        else:
            fold_meta = (tuple(w), None)
        return fused_swin_pair(
            x_win, p0[0] if p0 is not None else None,
            p1[0] if p1 is not None else None,
            b0._block_params(), b1._block_params(), bias0, bias1, labels,
            head_dim ** -0.5, self.num_heads, (fm0, fm1),
            shift_geom=shift_geom, fold_meta=fold_meta, **drop_kw)

    def __call__(self, x: jnp.ndarray, p=(None, None),
                 deterministic: bool = True) -> jnp.ndarray:
        shape_x = tuple(x.shape[1:4])
        if self._pair_fusable(shape_x):
            if self.use_checkpoint and not deterministic:
                # Remat at PAIR granularity: stores one activation for
                # two blocks (the reference remats per block; same
                # recompute class, strictly less saved memory).
                fn = nn.remat(ConsecutiveSwinBlocks._pair_forward,
                              static_argnums=(4,), prevent_cse=False)
                x = fn(self, x, p[0], p[1], deterministic)
            else:
                x = self._pair_forward(x, p[0], p[1], deterministic)
        else:
            for i, blk in enumerate(self.swin_blocks):
                x = blk(x, p[i], deterministic=deterministic)
        if self.down:
            x = self.merge(x)
        return x
