"""Unit tests for RelativePE, WindowAttention, Swin blocks, PatchMerging."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_segmentation_with_visual_prompts_tpu.models import (
    ConsecutiveSwinBlocks, PatchMerging, RelativePE, SwinTransformerBlock,
    WindowAttention)


def test_relative_pe_shapes_and_token_zeros():
    pe = RelativePE(embed_dim=16, num_heads=2, max_abs_pos=(4, 4, 2),
                    max_cap_dist=(4, 4, 2), max_prompts=1,
                    tokens_per_prompt=3, use_token_params=True)
    params = pe.init(jax.random.PRNGKey(0), 4, 4, 2, 3)
    bias = pe.apply(params, 4, 4, 2, 3)
    n = 4 * 4 * 2
    assert bias.shape == (1, 2, n + 3, n + 3)
    b = np.asarray(bias)
    # Token rows and the token-token block must be exactly zero
    # (reference relative_positional_encoding.py:127-142).
    assert np.all(b[:, :, n:, :] == 0.0)
    # Content->token columns all equal along the content axis.
    np.testing.assert_allclose(b[:, :, 0, n:], b[:, :, n - 1, n:])
    # No-token call returns just the content block, identical values.
    bias0 = pe.apply(params, 4, 4, 2, 0)
    np.testing.assert_allclose(np.asarray(bias0), b[:, :, :n, :n], rtol=1e-6)


def test_relative_pe_axis_average_symmetry():
    # Bias between positions only depends on per-axis relative distances.
    pe = RelativePE(embed_dim=8, num_heads=1, max_abs_pos=(3, 3, 1),
                    max_cap_dist=(3, 3, 1), max_prompts=1,
                    tokens_per_prompt=1, use_token_params=False)
    params = pe.init(jax.random.PRNGKey(1), 3, 3, 1, 0)
    b = np.asarray(pe.apply(params, 3, 3, 1, 0))[0, 0]
    # positions (i,j) flattened as i*3+j; bias[(0,0),(1,1)] == bias[(1,1),(2,2)]
    assert abs(b[0, 4] - b[4, 8]) < 1e-6


def test_window_attention_mask_multiplicative():
    attn = WindowAttention(dim=8, num_heads=2, attn_impl="xla")
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 2, 4, 8))
    params = attn.init(rng, x, x, x)
    # A zero mask zeroes all logits -> uniform attention -> output equals
    # the mean of the value projections (reference quirk of multiplying
    # logits by 0 instead of -inf masking).
    mask0 = jnp.zeros((1, 2, 1, 4, 4))
    out0 = attn.apply(params, x, x, x, None, mask0)
    v = x @ params["params"]["to_v_kernel"]
    v_mean = jnp.mean(v, axis=2, keepdims=True)
    expect = v_mean @ params["params"]["proj"]["kernel"] \
        + params["params"]["proj"]["bias"]
    np.testing.assert_allclose(np.asarray(out0),
                               np.broadcast_to(np.asarray(expect), out0.shape),
                               rtol=1e-5, atol=1e-5)


def test_swin_block_shapes_and_prompt_cut():
    blk = SwinTransformerBlock(
        hidden_channels=8, window_size=(4, 4, 2), pos_bias_embed_dim=8,
        num_heads=2, max_prompts=1, tokens_per_prompt=3,
        use_token_params=True, shift_size=(2, 2, 1), attn_impl="xla")
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 8, 8, 4, 8))
    p = jax.random.normal(rng, (2, 3, 8))
    params = blk.init(rng, x, p)
    out = blk.apply(params, x, p)
    assert out.shape == x.shape  # prompt tokens cut after attention
    out_nop = blk.apply(params, x, None)
    assert out_nop.shape == x.shape
    # Prompting must change the output.
    assert not np.allclose(np.asarray(out), np.asarray(out_nop))


def test_swin_block_padding_roundtrip():
    # Non-multiple spatial dims are padded and unpadded transparently.
    blk = SwinTransformerBlock(
        hidden_channels=4, window_size=(4, 4, 4), pos_bias_embed_dim=8,
        num_heads=2, max_prompts=1, tokens_per_prompt=2,
        use_token_params=False, shift_size=(2, 2, 2), attn_impl="xla")
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 6, 5, 3, 4))
    params = blk.init(rng, x, None)
    out = blk.apply(params, x, None)
    assert out.shape == x.shape


def test_adaptive_shift():
    blk = SwinTransformerBlock(
        hidden_channels=4, window_size=(4, 4, 4), pos_bias_embed_dim=8,
        num_heads=1, max_prompts=1, tokens_per_prompt=1,
        use_token_params=False, shift_size=(2, 2, 2), attn_impl="xla")
    # dims <= window -> shift zeroed (reference swin_block.py:265-270)
    assert blk.get_shift_size((4, 8, 2)) == (0, 2, 0)


def test_patch_merging_channel_math():
    pm = PatchMerging(in_channels=3, out_channels=5, merge_last_dim=True)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 4, 4, 4, 3))
    params = pm.init(rng, x)
    out = pm.apply(params, x)
    assert out.shape == (2, 2, 2, 2, 5)
    assert params["params"]["norm"]["scale"].shape == (24,)  # 8C

    pm2 = PatchMerging(in_channels=3, out_channels=5, merge_last_dim=False)
    params2 = pm2.init(rng, x)
    out2 = pm2.apply(params2, x)
    assert out2.shape == (2, 2, 2, 4, 5)  # depth untouched
    assert params2["params"]["norm"]["scale"].shape == (12,)  # 4C


def test_patch_merging_odd_dims_padded():
    pm = PatchMerging(in_channels=2, out_channels=4, merge_last_dim=False)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 5, 5, 3, 2))
    params = pm.init(rng, x)
    out = pm.apply(params, x)
    # h,w padded to 6 then halved; depth padded to 4, not merged.
    assert out.shape == (1, 3, 3, 4, 4)


def test_consecutive_blocks_with_merge():
    blocks = ConsecutiveSwinBlocks(
        hidden_channels=4, num_heads=2, pos_bias_embed_dim=8, max_prompts=1,
        tokens_per_prompt=2, window_size=(4, 4, 2), use_token_params=True,
        down=True, merge_last_dim=True, attn_impl="xla")
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 8, 8, 4, 4))
    p = jax.random.normal(rng, (1, 2, 4))
    params = blocks.init(rng, x, (p, p))
    out = blocks.apply(params, x, (p, p))
    assert out.shape == (1, 4, 4, 2, 8)


def test_remat_matches_plain():
    # use_checkpoint must not change values (only memory scheduling).
    kw = dict(hidden_channels=4, window_size=(4, 4, 2), pos_bias_embed_dim=8,
              num_heads=2, max_prompts=1, tokens_per_prompt=2,
              use_token_params=False, shift_size=(2, 2, 1), attn_impl="xla")
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 8, 8, 4, 4))
    plain = SwinTransformerBlock(use_checkpoint=False, **kw)
    ckpt = SwinTransformerBlock(use_checkpoint=True, **kw)
    params = plain.init(rng, x, None)

    def loss_plain(p_):
        return jnp.sum(plain.apply(p_, x, None, deterministic=False,
                                   rngs={"dropout": rng}) ** 2)

    def loss_ckpt(p_):
        return jnp.sum(ckpt.apply(p_, x, None, deterministic=False,
                                  rngs={"dropout": rng}) ** 2)

    g1 = jax.grad(loss_plain)(params)
    g2 = jax.grad(loss_ckpt)(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-5, atol=1e-6), g1, g2)


def test_content_query_attention_equals_full_then_cut():
    # The block computes attention only for content-query rows; this must
    # equal the reference formulation (full-sequence attention, prompt
    # rows cut afterwards, swin_block.py:215-225).
    blk = SwinTransformerBlock(
        hidden_channels=8, window_size=(4, 4, 2), pos_bias_embed_dim=8,
        num_heads=2, max_prompts=1, tokens_per_prompt=3,
        use_token_params=True, shift_size=(2, 2, 1), attn_impl="xla")
    rng = jax.random.PRNGKey(3)
    x = jax.random.normal(rng, (2, 8, 8, 4, 8))
    p = jax.random.normal(jax.random.PRNGKey(4), (2, 3, 8))
    params = blk.init(rng, x, p)

    got = blk.apply(params, x, p)

    # Reference formulation re-done manually through the same submodules.
    import numpy as np
    from medical_image_segmentation_with_visual_prompts_tpu.ops.windows import (
        compute_paddings, get_attn_mask, window_partition, window_reverse)

    def ref_apply(mdl):
        b, h, w, d, c = x.shape
        win = (4, 4, 2)
        shift = mdl.get_shift_size((h, w, d))
        pos_bias = mdl.pe(4, 4, 2, 3)[:, None]
        x_sh = jnp.roll(x, shift=(-2, -2, -1), axis=(1, 2, 3))
        am = get_attn_mask((8, 8, 4), win, shift, (0,) * 6)
        nwin = am.shape[1]
        total = np.zeros((am.shape[0], nwin + 3, nwin + 3), np.float32)
        total[:, :nwin, :nwin] = am
        total[:, :nwin, nwin:] = 1.0
        am = jnp.asarray(total)[None, :, None]
        xw = window_partition(x_sh, win)
        pb = jnp.broadcast_to(p[:, None], (b, xw.shape[1], 3, c))
        xw = jnp.concatenate([xw, pb], axis=2)
        shortcut = xw
        y = mdl.attn_norm(xw)
        y = mdl.attn(q=y, k=y, v=y, pos_bias=pos_bias, mask=am)
        xw = y + shortcut
        xw = xw[:, :, :-3, :]
        xw = xw + mdl.mlp(mdl.mlp_norm(xw))
        x_out = window_reverse(xw, win, (8, 8, 4))
        return jnp.roll(x_out, shift=(2, 2, 1), axis=(1, 2, 3))

    want = nn.apply(ref_apply, blk)(params)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_conv_small_cout_matches_lax_conv():
    from medical_image_segmentation_with_visual_prompts_tpu.ops.conv_small import (
        conv3d_small_cout)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 7, 5, 6)).astype(np.float32))
    kern = jnp.asarray(rng.normal(size=(3, 3, 3, 6, 2)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(2,)).astype(np.float32))
    got = conv3d_small_cout(x, kern, bias, compute_dtype=jnp.float32)
    want = jax.lax.conv_general_dilated(
        x, kern, window_strides=(1, 1, 1), padding=[(1, 1)] * 3,
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC")) + bias
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
    # Default bf16 tap compute stays within bf16 tolerance.
    got16 = conv3d_small_cout(x, kern, bias)
    np.testing.assert_allclose(np.asarray(got16), np.asarray(want),
                               rtol=5e-2, atol=2e-1)
