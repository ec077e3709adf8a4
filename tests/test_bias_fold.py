"""Bias-fold (ops/bias_fold.py): the position bias carried in the score
matmul's free contraction lanes.

Three layers of checks:
* the low-rank decomposition reconstructs the REAL assembled bias
  exactly (fp32 tables) for plain, shifted, folded and token-carrying
  geometries — the axis-separability identity the fold relies on;
* the folded fused-block kernel (interpret mode) matches the XLA
  reference path at the usual bf16 tolerance, and matches the unfolded
  kernel tightly (the only delta is one bf16 rounding of the bias);
* gradients still flow correctly (dbias = ds * mask routing).
"""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_segmentation_with_visual_prompts_tpu.models import (
    SwinTransformerBlock)
from medical_image_segmentation_with_visual_prompts_tpu.models.swin_block \
    import content_indices
from medical_image_segmentation_with_visual_prompts_tpu.ops import (
    window_attention_pallas as wap)
from medical_image_segmentation_with_visual_prompts_tpu.ops import bias_fold


def _block(shift, tokens=3, heads=2, c=8, window=(4, 4, 4), impl="xla",
           pad_mode="aligned"):
    return SwinTransformerBlock(
        hidden_channels=c, window_size=window, pos_bias_embed_dim=8,
        num_heads=heads, max_prompts=1,
        tokens_per_prompt=max(tokens, 1), use_token_params=tokens > 0,
        shift_size=shift, attn_impl=impl, pad_mode=pad_mode)


def _init(blk, shape, tokens):
    c = shape[-1]
    x = jax.random.normal(jax.random.PRNGKey(0), shape)
    p = None
    if tokens:
        p = jnp.broadcast_to(
            jax.random.normal(jax.random.PRNGKey(1), (1, tokens, c)),
            (shape[0], tokens, c))
    params = blk.init(jax.random.PRNGKey(2), x, p)
    return x, p, params


# ---------------------------------------------------------- decomposition
@pytest.mark.parametrize("tokens", [0, 3])
@pytest.mark.parametrize("shift", [(0, 0, 0), (2, 2, 2)])
def test_decomposition_exact_plain(shift, tokens):
    window = (4, 4, 2)
    heads, c = 2, 8
    blk = _block(shift, tokens, heads, c, window)
    shape = (1, 8, 8, 4, c)
    x, p, params = _init(blk, shape, tokens)
    m = int(np.prod(window))
    bias, _, _ = blk.apply(params, (8, 8, 4), m, tokens, shift,
                           method=blk.plain_assembly)
    bias = bias.reshape(heads, m, m + tokens)
    meta = (window, None)
    cw = 2 * c
    assert bias_fold.fold_applicable(
        meta, heads, m, 0, tokens, 0, cw) or not bias_fold.bias_fold_enabled()
    vq, kext = bias_fold.fold_tables(bias, meta, heads, m, 0, tokens, 0,
                                     cw, out_dtype=jnp.float32)
    rec = bias_fold.reconstruct(vq[:, :, cw:], kext[:, cw:])
    np.testing.assert_allclose(np.asarray(rec), np.asarray(bias),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("tokens", [0, 3])
@pytest.mark.parametrize("shift", [(0, 0, 0), (2, 2, 2)])
def test_decomposition_exact_folded(shift, tokens):
    # Depth 2 < window 4 -> pad folding (FOLD_KEY unshifted /
    # FOLD_COUNT shifted); the fold column and -1e30 alignment columns
    # must reconstruct exactly too.
    from medical_image_segmentation_with_visual_prompts_tpu.ops. \
        fused_block import fold_width
    window = (4, 4, 4)
    heads, c = 2, 8
    dims = (8, 8, 2)
    blk = _block(shift, tokens, heads, c, window)
    shape = (1, *dims, c)
    x, p, params = _init(blk, shape, tokens)
    paddings = (0, 0, 0, 0, 1, 1)
    fold_axes = (2,)
    bias, _, fold_mode = blk.apply(
        params, dims, window, shift, paddings, fold_axes, tokens,
        method=blk.folded_assembly)
    ci = content_indices(dims, window, paddings, fold_axes)
    m = len(ci)
    n_fold = fold_width(m, tokens)
    bias = bias.reshape(heads, m, m + n_fold + tokens)
    meta = (window, tuple(int(v) for v in ci))
    cw = 2 * c
    vq, kext = bias_fold.fold_tables(bias, meta, heads, m, n_fold, tokens,
                                     fold_mode, cw, out_dtype=jnp.float32)
    rec = bias_fold.reconstruct(vq[:, :, cw:], kext[:, cw:])
    want = np.asarray(bias)
    got = np.asarray(rec)
    # The -1e30 alignment columns only need to stay hugely negative.
    dead = want <= -1e29
    assert (got[dead] <= -1e29).all()
    np.testing.assert_allclose(got[~dead], want[~dead],
                               rtol=1e-5, atol=1e-5)


def test_fold_lane_budget():
    assert bias_fold.fold_lane_width(96) == 128
    assert bias_fold.fold_lane_width(192) == 256
    # C=384: zero free lanes -> not applicable.
    assert not bias_fold.fold_applicable(((8, 8, 4), None), 32, 256, 0,
                                         64, 0, 384)


# ------------------------------------------------------------ block parity
def _run_fold(monkeypatch, shift, shape=(2, 8, 8, 4, 8), tokens=3,
              heads=2, window=(4, 4, 2)):
    c = shape[-1]
    blk_ref = _block(shift, tokens, heads, c, window, impl="xla")
    x, p, params = _init(blk_ref, shape, tokens)
    want = blk_ref.apply(params, x, p)
    monkeypatch.setattr(wap, "_FORCE_INTERPRET", True)
    monkeypatch.setenv("MIVP_BIAS_FOLD", "1")
    got = _block(shift, tokens, heads, c, window, impl="auto").apply(
        params, x, p)
    monkeypatch.setenv("MIVP_BIAS_FOLD", "0")
    base = _block(shift, tokens, heads, c, window, impl="auto").apply(
        params, x, p)
    return np.asarray(want), np.asarray(got), np.asarray(base)


@pytest.mark.parametrize("tokens", [0, 3])
@pytest.mark.parametrize("shift", [(0, 0, 0), (2, 2, 1)])
def test_folded_block_parity(monkeypatch, shift, tokens):
    want, got, base = _run_fold(monkeypatch, shift, tokens=tokens)
    np.testing.assert_allclose(got, want, rtol=4e-2, atol=4e-2)
    # vs the unfolded kernel: only the bias's bf16 rounding differs.
    np.testing.assert_allclose(got, base, rtol=2e-2, atol=2e-2)


def test_folded_block_parity_pad_fold(monkeypatch):
    # Depth smaller than the window: fold column + alignment columns.
    want, got, base = _run_fold(monkeypatch, (2, 2, 2),
                                shape=(2, 8, 8, 2, 8), window=(4, 4, 4))
    np.testing.assert_allclose(got, want, rtol=4e-2, atol=4e-2)
    np.testing.assert_allclose(got, base, rtol=2e-2, atol=2e-2)
    want, got, base = _run_fold(monkeypatch, (0, 0, 0),
                                shape=(2, 8, 8, 2, 8), window=(4, 4, 4))
    np.testing.assert_allclose(got, want, rtol=4e-2, atol=4e-2)


def test_folded_block_gradients(monkeypatch):
    monkeypatch.setattr(wap, "_FORCE_INTERPRET", True)
    c, tokens, heads, window = 8, 3, 2, (4, 4, 2)
    shift = (2, 2, 1)
    blk_ref = _block(shift, tokens, heads, c, window, impl="xla")
    x, p, params = _init(blk_ref, (1, 8, 8, 4, c), tokens)

    def loss(blk):
        def f(pr, x_, p_):
            return jnp.sum(blk.apply(pr, x_, p_).astype(jnp.float32) ** 2)
        return jax.grad(f)(params, x, p)

    g_ref = loss(blk_ref)
    monkeypatch.setenv("MIVP_BIAS_FOLD", "1")
    g_fold = loss(_block(shift, tokens, heads, c, window, impl="auto"))
    flat_r, _ = jax.flatten_util.ravel_pytree(g_ref)
    flat_f, _ = jax.flatten_util.ravel_pytree(g_fold)
    sc = float(jnp.max(jnp.abs(flat_r))) + 1e-6
    np.testing.assert_allclose(np.asarray(flat_f) / sc,
                               np.asarray(flat_r) / sc,
                               rtol=0, atol=4e-2)


def test_fold_with_dropout_matches_reference(monkeypatch):
    # Training path: counter-based dropout inside the folded kernel; the
    # backward kernel recomputes with the direct bias (same dropout
    # masks, bf16-class value delta) — forward must match the jnp
    # reference, which regenerates the identical masks.
    from medical_image_segmentation_with_visual_prompts_tpu.ops import (
        fused_block as fb)
    monkeypatch.setenv("MIVP_BIAS_FOLD", "1")
    c, heads, window, tokens = 8, 2, (4, 4, 2), 3
    m = int(np.prod(window))
    bp = 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, bp, m, c)), jnp.float32)
    tok = jnp.asarray(rng.normal(size=(tokens, c)), jnp.float32)
    params = {k: jnp.asarray(rng.normal(size=(c, c)), jnp.float32)
              for k in ("wq", "wk", "wv", "wproj", "wmlp")}
    params.update({k: jnp.asarray(rng.normal(size=(c,)), jnp.float32)
                   for k in ("ln1_scale", "ln1_bias", "bproj",
                             "ln2_scale", "ln2_bias", "bmlp")})
    bias = jnp.asarray(rng.normal(size=(1, 1, heads, m, m + tokens)),
                       jnp.float32)
    # A separable bias is required for the fold: build one.
    ax = [jnp.asarray(rng.normal(size=(heads, w_, w_)), jnp.float32)
          for w_ in window]
    coords = np.stack(np.unravel_index(np.arange(m), window), 1)
    b3 = (ax[0][:, coords[:, 0]][:, :, coords[:, 0]]
          + ax[1][:, coords[:, 1]][:, :, coords[:, 1]]
          + ax[2][:, coords[:, 2]][:, :, coords[:, 2]]) / 3.0
    tokcol = jnp.asarray(rng.normal(size=(heads, 1, tokens)), jnp.float32)
    bias = jnp.concatenate(
        [b3, jnp.broadcast_to(tokcol, (heads, m, tokens))],
        axis=-1)[None, None]
    seeds = jnp.asarray([7, 9], jnp.uint32)
    scale = (c // heads) ** -0.5
    got = fb.fused_swin_block(
        x, tok, params, bias, None, scale, heads,
        dropout_seeds=seeds, attn_drop=0.1, proj_drop=0.1,
        interpret=True, fold_meta=(window, None))
    want = fb._block_reference(
        x.reshape(bp, m, c), tok, params,
        bias.reshape(heads, m, m + tokens), None, scale, heads,
        seeds=seeds, attn_drop=0.1, proj_drop=0.1)
    w = np.asarray(want)
    # Unit-normal synthetic params give ~15-magnitude outputs (no LN
    # realism) — compare at bf16 tolerance relative to the output scale.
    np.testing.assert_allclose(np.asarray(got).reshape(bp, m, c), w,
                               rtol=0, atol=4e-2 * np.abs(w).max())


def test_pair_kernel_fold_matches_two_kernel(monkeypatch):
    # The pair kernel and the two-kernel path must stay BITWISE equal
    # with the fold on (same folded phase body, same rounding points).
    from medical_image_segmentation_with_visual_prompts_tpu.models import (
        ConsecutiveSwinBlocks)
    monkeypatch.setattr(wap, "_FORCE_INTERPRET", True)
    monkeypatch.setenv("MIVP_BIAS_FOLD", "1")
    c, tokens, heads, window = 8, 3, 2, (2, 2, 2)
    blocks = ConsecutiveSwinBlocks(
        hidden_channels=c, num_heads=heads, pos_bias_embed_dim=8,
        max_prompts=1, tokens_per_prompt=tokens, window_size=window,
        down=False, attn_impl="auto", pad_mode="aligned")
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 4, c))
    p0 = jnp.broadcast_to(
        jax.random.normal(jax.random.PRNGKey(1), (1, tokens, c)),
        (1, tokens, c))
    p1 = p0 + 0.1
    params = blocks.init(jax.random.PRNGKey(2), x, (p0, p1))
    monkeypatch.setenv("MIVP_PAIR_KERNEL", "1")
    got_pair = blocks.apply(params, x, (p0, p1))
    monkeypatch.setenv("MIVP_PAIR_KERNEL", "0")
    got_two = blocks.apply(params, x, (p0, p1))
    np.testing.assert_allclose(np.asarray(got_pair), np.asarray(got_two),
                               rtol=1e-6, atol=1e-6)
