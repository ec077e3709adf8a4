"""In-kernel dropout: counter-hash masks shared by the Pallas forward
and the jnp backward (VERDICT item 3)."""

import jax
import jax.numpy as jnp
import numpy as np

from medical_image_segmentation_with_visual_prompts_tpu.models import (
    SwinTransformerBlock)
from medical_image_segmentation_with_visual_prompts_tpu.ops import (
    window_attention_pallas as wap)
from medical_image_segmentation_with_visual_prompts_tpu.ops.fused_block import (
    _block_reference, fused_swin_block)
from medical_image_segmentation_with_visual_prompts_tpu.ops.prng import (
    hash_u32, keep_mask)

_KEYS = ("ln1_scale", "ln1_bias", "wq", "wk", "wv", "wproj", "bproj",
         "ln2_scale", "ln2_bias", "wmlp", "bmlp")


def _setup(seed=3, b=2, p_=2, m=16, i=4, h=2, dh=8):
    c = h * dh
    keys = jax.random.split(jax.random.PRNGKey(seed), 16)
    r = lambda k, s: jax.random.normal(k, s, jnp.float32)
    x = r(keys[0], (b, p_, m, c))
    tokens = r(keys[1], (i, c))
    params = {k: 0.3 * r(kk, (c, c)) if k.startswith("w") else
              0.1 * r(kk, (c,)) for k, kk in zip(_KEYS, keys[2:13])}
    bias = r(keys[13], (1, 1, h, m, m + i))
    return x, tokens, params, bias, dh ** -0.5, h


def test_keep_mask_statistics():
    idx = jnp.arange(200_000, dtype=jnp.uint32)
    for rate in (0.1, 0.5):
        mask = keep_mask(jnp.uint32(7), idx, rate)
        frac = float((mask > 0).mean())
        assert abs(frac - (1.0 - rate)) < 5e-3
        # Kept entries carry the inverted-dropout scale.
        kept = np.asarray(mask)[np.asarray(mask) > 0]
        np.testing.assert_allclose(kept, 1.0 / (1.0 - rate), rtol=1e-6)
    # Different seeds decorrelate.
    m1 = np.asarray(keep_mask(jnp.uint32(1), idx[:10000], 0.5)) > 0
    m2 = np.asarray(keep_mask(jnp.uint32(2), idx[:10000], 0.5)) > 0
    agree = (m1 == m2).mean()
    assert 0.45 < agree < 0.55


def test_hash_avalanche():
    idx = jnp.arange(4096, dtype=jnp.uint32)
    bits = np.asarray(hash_u32(jnp.uint32(123), idx))
    # Adjacent counters flip about half the bits.
    flips = np.unpackbits(
        (bits[:-1] ^ bits[1:]).astype(">u4").view(np.uint8)).mean()
    assert 0.4 < flips < 0.6


def test_kernel_dropout_matches_reference():
    x, tokens, params, bias, scale, h = _setup()
    b, p_, m, c = x.shape
    seeds = jnp.asarray([11, 22], jnp.uint32)
    got = fused_swin_block(x, tokens, params, bias, None, scale, h,
                           dropout_seeds=seeds, attn_drop=0.2,
                           proj_drop=0.1, interpret=True)
    want = _block_reference(x.reshape(b * p_, m, c), tokens, params,
                            bias.reshape(h, m, -1), None, scale, h,
                            seeds=seeds, attn_drop=0.2, proj_drop=0.1)
    np.testing.assert_allclose(np.asarray(got).reshape(b * p_, m, c),
                               np.asarray(want), rtol=4e-2, atol=4e-2)


def test_kernel_dropout_deterministic_and_seed_sensitive():
    x, tokens, params, bias, scale, h = _setup()
    f = lambda s: np.asarray(fused_swin_block(
        x, tokens, params, bias, None, scale, h,
        dropout_seeds=jnp.asarray(s, jnp.uint32), attn_drop=0.3,
        proj_drop=0.0, interpret=True))
    a1, a2, b1 = f([5, 6]), f([5, 6]), f([7, 6])
    np.testing.assert_array_equal(a1, a2)
    assert np.abs(a1 - b1).max() > 1e-4
    # No dropout == seeds ignored.
    base = np.asarray(fused_swin_block(x, tokens, params, bias, None,
                                       scale, h, interpret=True))
    assert np.abs(a1 - base).max() > 1e-4


def test_kernel_dropout_gradients():
    x, tokens, params, bias, scale, h = _setup(b=1, p_=1, m=8, i=2, dh=4)
    seeds = jnp.asarray([3, 4], jnp.uint32)

    def loss(x_, t_):
        out = fused_swin_block(x_, t_, params, bias, None, scale, h,
                               dropout_seeds=seeds, attn_drop=0.2,
                               proj_drop=0.2, interpret=True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g = jax.grad(loss, argnums=(0, 1))(x, tokens)
    assert all(np.isfinite(np.asarray(gi)).all() for gi in g)
    assert float(jnp.abs(g[0]).sum()) > 0
    # The backward regenerates the same masks: finite differences agree.
    eps = 1e-3
    dx = jnp.zeros_like(x).at[0, 0, 2, 3].set(eps)
    num = (loss(x + dx, tokens) - loss(x - dx, tokens)) / (2 * eps)
    np.testing.assert_allclose(float(num), float(g[0][0, 0, 2, 3]),
                               rtol=5e-2, atol=5e-2)


def test_block_module_trains_with_dropout_in_kernel(monkeypatch):
    """Canonical dropout-0.1 training runs through the fused kernel
    (previously bailed to XLA attention)."""
    monkeypatch.setattr(wap, "_FORCE_INTERPRET", True)
    blk = SwinTransformerBlock(
        hidden_channels=8, window_size=(4, 4, 2), pos_bias_embed_dim=8,
        num_heads=2, max_prompts=1, tokens_per_prompt=3,
        use_token_params=True, shift_size=(2, 2, 0), attn_impl="auto",
        attn_drop=0.1, proj_drop=0.1)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 2, 8))
    p = jnp.broadcast_to(
        jax.random.normal(jax.random.PRNGKey(1), (1, 3, 8)), (1, 3, 8))
    params = blk.init(jax.random.PRNGKey(2), x, p)

    def loss(pr, key):
        out = blk.apply(pr, x, p, deterministic=False,
                        rngs={"dropout": key})
        return jnp.sum(out.astype(jnp.float32) ** 2)

    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    l1, l1b = loss(params, k1), loss(params, k1)
    l2 = loss(params, k2)
    assert float(l1) == float(l1b)          # same rng -> same masks
    assert abs(float(l1) - float(l2)) > 0   # different rng -> different
    g = jax.grad(loss)(params, k1)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x_)).all() for x_ in leaves)
    assert any(float(jnp.abs(x_).sum()) > 0 for x_ in leaves)
