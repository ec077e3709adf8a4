"""Pad-folding parity: the folded fused-block path must reproduce the
reference's padded-window computation.

On axes where the feature map is smaller than the attention window the
reference zero-pads every window identically (swin_block.py:150-163);
after LayerNorm all pad tokens are the same vector, so their attention
contribution folds exactly into one virtual key column
(ops/fused_block.py).  These tests run the REAL model path with the
interpret-mode hook and compare against the unfolded XLA path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_segmentation_with_visual_prompts_tpu.models import (
    SwinTransformerBlock)
from medical_image_segmentation_with_visual_prompts_tpu.ops import (
    window_attention_pallas as wap)


def _block(shift, tokens=3, heads=2, c=8, window=(4, 4, 4), impl="xla",
           pad_mode="aligned"):
    # pad_mode "aligned" keeps these shapes on the FOLD path: under
    # "reference" the pad-all-axes quirk adds material H/W pads, which
    # (correctly) disqualify folding — see test_reference_pad_mode_*.
    return SwinTransformerBlock(
        hidden_channels=c, window_size=window, pos_bias_embed_dim=8,
        num_heads=heads, max_prompts=1,
        tokens_per_prompt=max(tokens, 1), use_token_params=tokens > 0,
        shift_size=shift, attn_impl=impl, pad_mode=pad_mode)


def _run_pair(monkeypatch, shift, shape=(2, 8, 8, 2, 8), tokens=3,
              heads=2, window=(4, 4, 4)):
    c = shape[-1]
    x = jax.random.normal(jax.random.PRNGKey(0), shape)
    p = None
    if tokens:
        p = jax.random.normal(jax.random.PRNGKey(1), (1, tokens, c))
        p = jnp.broadcast_to(p, (shape[0], tokens, c))
    ref_blk = _block(shift, tokens, heads, c, window, impl="xla")
    params = ref_blk.init(jax.random.PRNGKey(2), x, p)
    want = ref_blk.apply(params, x, p)
    # Same params through the folded fused path (interpret-mode kernels).
    monkeypatch.setattr(wap, "_FORCE_INTERPRET", True)
    fold_blk = _block(shift, tokens, heads, c, window, impl="auto")
    got = fold_blk.apply(params, x, p)
    return np.asarray(want), np.asarray(got)


def test_folded_noshift_matches_unfolded(monkeypatch):
    # depth 2 < window 4 -> FOLD_KEY (logsumexp'd pad bias columns).
    want, got = _run_pair(monkeypatch, shift=(0, 0, 0))
    np.testing.assert_allclose(got, want, rtol=4e-2, atol=4e-2)


def test_folded_shift_matches_unfolded(monkeypatch):
    # Shifted block -> mask active -> FOLD_COUNT (ln(n_pad) column).
    want, got = _run_pair(monkeypatch, shift=(2, 2, 2))
    np.testing.assert_allclose(got, want, rtol=4e-2, atol=4e-2)


def test_folded_no_tokens(monkeypatch):
    want, got = _run_pair(monkeypatch, shift=(0, 0, 0), tokens=0)
    np.testing.assert_allclose(got, want, rtol=4e-2, atol=4e-2)
    want, got = _run_pair(monkeypatch, shift=(2, 2, 2), tokens=0)
    np.testing.assert_allclose(got, want, rtol=4e-2, atol=4e-2)


def test_folded_two_axes(monkeypatch):
    # Both W and D smaller than the window: two folded axes at once.
    want, got = _run_pair(monkeypatch, shift=(2, 2, 2),
                          shape=(1, 8, 2, 3, 8))
    np.testing.assert_allclose(got, want, rtol=4e-2, atol=4e-2)


def test_folded_gradients_flow(monkeypatch):
    monkeypatch.setattr(wap, "_FORCE_INTERPRET", True)
    c, tokens = 8, 3
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 2, c))
    p = jnp.broadcast_to(
        jax.random.normal(jax.random.PRNGKey(1), (1, tokens, c)),
        (1, tokens, c))
    blk = _block((2, 2, 2), tokens, 2, c, impl="auto")
    params = blk.init(jax.random.PRNGKey(2), x, p)

    def loss(pr, x_, p_):
        return jnp.sum(blk.apply(pr, x_, p_).astype(jnp.float32) ** 2)

    grads = jax.grad(loss)(params, x, p)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert any(float(jnp.abs(g).sum()) > 0 for g in leaves)
    # Gradient matches the unfolded XLA path.
    blk_ref = _block((2, 2, 2), tokens, 2, c, impl="xla")
    grads_ref = jax.grad(
        lambda pr, x_, p_: jnp.sum(
            blk_ref.apply(pr, x_, p_).astype(jnp.float32) ** 2)
    )(params, x, p)
    for g, gr in zip(jax.tree_util.tree_leaves(grads),
                     jax.tree_util.tree_leaves(grads_ref)):
        g, gr = np.asarray(g), np.asarray(gr)
        # The folded backward is the exact gradient of the BF16 kernel
        # function (custom_vjp of a kernel-matching reference); the XLA
        # comparator is fp32, so element-wise agreement is limited by
        # bf16 quantization — especially on small-magnitude PE leaves.
        # Directional-derivative agreement is ~1.3%; assert per-leaf L2
        # closeness instead of element-wise tolerances.
        err = np.linalg.norm(g - gr)
        assert err <= 0.1 * np.linalg.norm(gr) + 1e-3, (
            err, np.linalg.norm(gr))


def test_head_block_chunking_matches(monkeypatch):
    """Tiny VMEM budget forces head chunking; output must not change."""
    from medical_image_segmentation_with_visual_prompts_tpu.ops.fused_block \
        import _block_reference, fused_swin_block
    b, p_, m, i, h, dh = 1, 2, 16, 4, 4, 8
    c = h * dh
    n = m + i
    keys = jax.random.split(jax.random.PRNGKey(3), 16)
    r = lambda k, s: jax.random.normal(k, s, jnp.float32)
    x = r(keys[0], (b, p_, m, c))
    tokens = r(keys[1], (i, c))
    params = {k: 0.3 * r(kk, (c, c)) if k.startswith("w") else
              0.1 * r(kk, (c,))
              for k, kk in zip(("ln1_scale", "ln1_bias", "wq", "wk", "wv",
                                "wproj", "bproj", "ln2_scale", "ln2_bias",
                                "wmlp", "bmlp"), keys[2:13])}
    bias = r(keys[13], (1, 1, h, m, n))
    scale = dh ** -0.5
    full = fused_swin_block(x, tokens, params, bias, None, scale, h,
                            interpret=True)
    # Budget below one head's score tile -> head_block = 1.
    monkeypatch.setattr(wap, "_VMEM_BUDGET", 2 * m * n * 4)
    chunked = fused_swin_block(x, tokens, params, bias, None, scale, h,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                               rtol=2e-2, atol=2e-2)
    want = _block_reference(x.reshape(b * p_, m, c), tokens, params,
                            bias.reshape(h, m, n), None, scale, h)
    np.testing.assert_allclose(np.asarray(chunked).reshape(b * p_, m, c),
                               np.asarray(want), rtol=4e-2, atol=4e-2)


def test_folded_gradients_batch2_masked(monkeypatch):
    """Regression: batch > 1 with an active shift mask — the backward's
    jnp reference must tile the per-window-position mask over the batch
    the way the kernel's block indexing does (bp = B*P > P)."""
    monkeypatch.setattr(wap, "_FORCE_INTERPRET", True)
    c, tokens = 8, 3
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 2, c))
    p = jnp.broadcast_to(
        jax.random.normal(jax.random.PRNGKey(1), (1, tokens, c)),
        (2, tokens, c))
    blk = _block((2, 2, 2), tokens, 2, c, impl="auto")
    params = blk.init(jax.random.PRNGKey(2), x, p)

    def loss(pr, x_, p_):
        return jnp.sum(blk.apply(pr, x_, p_).astype(jnp.float32) ** 2)

    grads = jax.grad(loss)(params, x, p)
    blk_ref = _block((2, 2, 2), tokens, 2, c, impl="xla")
    grads_ref = jax.grad(
        lambda pr, x_, p_: jnp.sum(
            blk_ref.apply(pr, x_, p_).astype(jnp.float32) ** 2)
    )(params, x, p)
    for g, gr in zip(jax.tree_util.tree_leaves(grads),
                     jax.tree_util.tree_leaves(grads_ref)):
        g, gr = np.asarray(g), np.asarray(gr)
        # Per-leaf L2 closeness (see comment in test_folded_gradients_flow).
        err = np.linalg.norm(g - gr)
        assert err <= 0.1 * np.linalg.norm(gr) + 1e-3, (
            err, np.linalg.norm(gr))


def _pair(tokens, heads, c, window=(4, 4, 2), impl="auto",
          use_checkpoint=False, pad_mode="aligned"):
    from medical_image_segmentation_with_visual_prompts_tpu.models. \
        swin_block import ConsecutiveSwinBlocks
    return ConsecutiveSwinBlocks(
        hidden_channels=c, num_heads=heads, pos_bias_embed_dim=8,
        max_prompts=1, tokens_per_prompt=tokens,
        use_token_params=tokens > 0, window_size=window, down=False,
        use_checkpoint=use_checkpoint, attn_impl=impl, pad_mode=pad_mode)


def test_pair_fused_path_matches_per_block(monkeypatch):
    """ConsecutiveSwinBlocks' window-major pair fusion (partition once,
    window_shift for the roll) must match the per-block XLA path."""
    c, tokens, heads = 8, 3, 2
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4, c))
    ps = []
    for i in range(2):
        pp = jax.random.normal(jax.random.PRNGKey(10 + i), (1, tokens, c))
        ps.append(jnp.broadcast_to(pp, (2, tokens, c)))
    ref = _pair(tokens, heads, c, impl="xla")
    params = ref.init(jax.random.PRNGKey(2), x, tuple(ps))
    want = ref.apply(params, x, tuple(ps))
    monkeypatch.setattr(wap, "_FORCE_INTERPRET", True)
    fused = _pair(tokens, heads, c, impl="auto")
    got = fused.apply(params, x, tuple(ps))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=4e-2, atol=4e-2)


def test_pair_fused_gradients(monkeypatch):
    """Gradients flow through window_shift + both kernels' custom VJPs."""
    c, tokens, heads = 8, 0, 2
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4, c))
    ref = _pair(tokens, heads, c, impl="xla")
    params = ref.init(jax.random.PRNGKey(2), x, (None, None))

    def loss(blk):
        def f(pr, x_):
            out = blk.apply(pr, x_, (None, None), deterministic=False)
            return jnp.sum(out.astype(jnp.float32) ** 2)
        return f

    grads_ref = jax.grad(loss(ref))(params, x)
    monkeypatch.setattr(wap, "_FORCE_INTERPRET", True)
    grads = jax.grad(loss(_pair(tokens, heads, c, impl="auto")))(params, x)
    for g, gr in zip(jax.tree_util.tree_leaves(grads),
                     jax.tree_util.tree_leaves(grads_ref)):
        g, gr = np.asarray(g), np.asarray(gr)
        # Per-leaf L2 closeness (see comment in test_folded_gradients_flow).
        err = np.linalg.norm(g - gr)
        assert err <= 0.1 * np.linalg.norm(gr) + 1e-3, (
            err, np.linalg.norm(gr))


def test_pair_fused_folded_path_matches_per_block(monkeypatch):
    """Pair fusion through the pad-folded window-major path (depth <
    window -> wc windows, FOLD_KEY/FOLD_COUNT) matches per-block XLA."""
    c, tokens, heads = 8, 3, 2
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 2, c))
    ps = []
    for i in range(2):
        pp = jax.random.normal(jax.random.PRNGKey(10 + i), (1, tokens, c))
        ps.append(jnp.broadcast_to(pp, (2, tokens, c)))
    ref = _pair(tokens, heads, c, window=(4, 4, 4), impl="xla")
    params = ref.init(jax.random.PRNGKey(2), x, tuple(ps))
    want = ref.apply(params, x, tuple(ps))
    monkeypatch.setattr(wap, "_FORCE_INTERPRET", True)
    fused = _pair(tokens, heads, c, window=(4, 4, 4), impl="auto")
    got = fused.apply(params, x, tuple(ps))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=4e-2, atol=4e-2)


def test_pair_fused_remat_gradients(monkeypatch):
    """Pair-granularity remat: gradients equal the no-remat pair path."""
    c, heads = 8, 2
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4, c))
    monkeypatch.setattr(wap, "_FORCE_INTERPRET", True)
    plain = _pair(0, heads, c, impl="auto", use_checkpoint=False)
    remat = _pair(0, heads, c, impl="auto", use_checkpoint=True)
    params = plain.init(jax.random.PRNGKey(2), x, (None, None))

    def loss(blk):
        return lambda pr, x_: jnp.sum(blk.apply(
            pr, x_, (None, None), deterministic=False).astype(jnp.float32)
            ** 2)

    g1 = jax.grad(loss(plain))(params, x)
    g2 = jax.grad(loss(remat))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_pair_fused_remat_dropout_consistent(monkeypatch):
    """In-kernel dropout draws identical masks under pair remat (the
    canonical training configuration: dropout 0.1 + use_checkpoint)."""
    from medical_image_segmentation_with_visual_prompts_tpu.models. \
        swin_block import ConsecutiveSwinBlocks
    c, heads = 8, 2
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4, c))

    def make(ckpt):
        return ConsecutiveSwinBlocks(
            hidden_channels=c, num_heads=heads, pos_bias_embed_dim=8,
            max_prompts=1, tokens_per_prompt=0, use_token_params=False,
            window_size=(4, 4, 2), down=False, use_checkpoint=ckpt,
            attn_drop=0.3, proj_drop=0.1, attn_impl="auto")

    monkeypatch.setattr(wap, "_FORCE_INTERPRET", True)
    plain, remat = make(False), make(True)
    params = plain.init(
        {"params": jax.random.PRNGKey(2),
         "dropout": jax.random.PRNGKey(3)}, x, (None, None))
    kw = dict(rngs={"dropout": jax.random.PRNGKey(7)},
              deterministic=False)
    out1 = plain.apply(params, x, (None, None), **kw)
    out2 = remat.apply(params, x, (None, None), **kw)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=1e-5, atol=1e-6)


def test_reference_pad_mode_uses_standard_path(monkeypatch):
    """Under pad_mode='reference' with material pads (the pad-all-axes
    quirk), folding is disqualified and the standard padded kernel path
    must match XLA — the fold constant is WRONG for material-pad query
    rows (unmasked virtual-pad columns), a ~5e-3 fp32 error when it was
    (incorrectly) used here."""
    c, tokens, heads = 8, 3, 2
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 2, c))
    p = jnp.broadcast_to(
        jax.random.normal(jax.random.PRNGKey(1), (1, tokens, c)),
        (1, tokens, c))
    ref = _block((2, 2, 2), tokens, heads, c, impl="xla",
                 pad_mode="reference")
    params = ref.init(jax.random.PRNGKey(2), x, p)
    want = np.asarray(ref.apply(params, x, p), np.float32)
    monkeypatch.setattr(wap, "_FORCE_INTERPRET", True)
    got = np.asarray(_block((2, 2, 2), tokens, heads, c, impl="auto",
                            pad_mode="reference").apply(params, x, p),
                     np.float32)
    np.testing.assert_allclose(got, want, rtol=4e-2, atol=4e-2)
    # Gradients through the standard padded kernel path.
    loss = lambda blk: (lambda pr: jnp.sum(
        blk.apply(pr, x, p).astype(jnp.float32) ** 2))
    g1 = jax.grad(loss(_block((2, 2, 2), tokens, heads, c, impl="auto",
                              pad_mode="reference")))(params)
    g2 = jax.grad(loss(ref))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        a, b = np.asarray(a), np.asarray(b)
        err = np.linalg.norm(a - b)
        assert err <= 0.1 * np.linalg.norm(b) + 1e-3, (
            err, np.linalg.norm(b))
