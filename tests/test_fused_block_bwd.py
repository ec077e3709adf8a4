"""Fused backward kernel (ops/fused_block_bwd.py) parity.

The fused block's custom_vjp can now run its backward as ONE Pallas
kernel (recompute + gradient chain in VMEM, operand-grad accumulators
across the sequential grid) instead of differentiating the jnp
reference.  These tests pin the kernel backward against the
jnp-reference vjp (``MIVP_KERNEL_BWD=0``) at the bf16 noise floor, in
interpret mode, across the geometry matrix: fold modes, prompt tokens,
label masks (both mask-DMA and in-kernel), dropout, the fused window
shift, and the unfused C>64 formulation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_segmentation_with_visual_prompts_tpu.models import (
    SwinTransformerBlock)
from medical_image_segmentation_with_visual_prompts_tpu.ops import (
    window_attention_pallas as wap)
from medical_image_segmentation_with_visual_prompts_tpu.ops.fused_block import (
    FOLD_COUNT, FOLD_KEY, FOLD_NONE, _PARAM_KEYS, fold_width,
    fused_swin_block)

_REL, _ATOL = 5e-2, 1e-4


def _setup(seed=3, b=2, p_=2, m=16, i=4, h=2, dh=8):
    c = h * dh
    keys = jax.random.split(jax.random.PRNGKey(seed), 16)
    r = lambda k, s: jax.random.normal(k, s, jnp.float32)
    x = r(keys[0], (b, p_, m, c))
    tokens = r(keys[1], (i, c)) if i else None
    params = {k: 0.3 * r(kk, (c, c)) if k.startswith("w") else
              0.1 * r(kk, (c,)) for k, kk in zip(_PARAM_KEYS, keys[2:13])}
    return x, tokens, params, h, dh ** -0.5


def _bias(m, i, h, fold, seed=13):
    n = m + (fold_width(m, i) if fold else 0) + i
    return jax.random.normal(jax.random.PRNGKey(seed), (1, 1, h, m, n))


def _labels(p_, m, i, fold, seed=5):
    n_fold = fold_width(m, i) if fold else 0
    rng = np.random.RandomState(seed)
    lab = rng.randint(0, 2, (p_, m + n_fold + i)).astype(np.int32)
    lab[:, m:] = -1                      # fold + prompt columns
    return jnp.asarray(lab)


def _compare(g_got, g_want):
    for a, b in zip(jax.tree_util.tree_leaves(g_got),
                    jax.tree_util.tree_leaves(g_want)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        err = np.linalg.norm(a - b)
        assert err <= _REL * np.linalg.norm(b) + _ATOL, (err, a.shape)


def _grads(monkeypatch, loss, args, kernel_bwd):
    monkeypatch.setenv("MIVP_KERNEL_BWD", "1" if kernel_bwd else "0")
    return jax.grad(loss, argnums=tuple(range(len(args))))(*args)


CASES = [
    # (fold_mode, tokens, labels, dh, drop)
    (FOLD_NONE, 4, False, 8, 0.0),
    (FOLD_KEY, 4, False, 8, 0.0),
    (FOLD_COUNT, 4, True, 8, 0.0),
    (FOLD_NONE, 0, False, 8, 0.0),       # no prompt tokens
    (FOLD_NONE, 4, True, 8, 0.0),        # mask without fold
    (FOLD_NONE, 4, False, 48, 0.0),      # unfused c=96 formulation
    (FOLD_NONE, 4, False, 8, 0.2),       # in-kernel dropout
    (FOLD_COUNT, 4, True, 8, 0.2),       # dropout + fold + mask
]


@pytest.mark.parametrize("fold,i,with_labels,dh,drop", CASES)
def test_kernel_bwd_matches_reference_vjp(monkeypatch, fold, i,
                                          with_labels, dh, drop):
    monkeypatch.setattr(wap, "_FORCE_INTERPRET", True)
    x, tokens, params, h, scale = _setup(i=i, dh=dh)
    b, p_, m, c = x.shape
    bias = _bias(m, i, h, fold)
    labels = _labels(p_, m, i, fold) if with_labels else None
    seeds = jnp.asarray([11, 22], jnp.uint32) if drop else None

    def loss(x_, t_, pr_, b_):
        out = fused_swin_block(
            x_, t_ if i else None, pr_, b_, labels, scale, h,
            fold_mode=fold, dropout_seeds=seeds, attn_drop=drop,
            proj_drop=drop, interpret=True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    args = (x, tokens if i else jnp.zeros((1, c)), params, bias)
    g_want = _grads(monkeypatch, loss, args, kernel_bwd=False)
    g_got = _grads(monkeypatch, loss, args, kernel_bwd=True)
    _compare(g_got, g_want)


@pytest.mark.parametrize("mask_dma", ["0", "1"])
def test_kernel_bwd_mask_modes_agree(monkeypatch, mask_dma):
    """Kernel backward parity holds in BOTH label-mask modes."""
    monkeypatch.setattr(wap, "_FORCE_INTERPRET", True)
    monkeypatch.setenv("MIVP_MASK_DMA", mask_dma)
    x, tokens, params, h, scale = _setup()
    b, p_, m, c = x.shape
    bias = _bias(m, 4, h, True)
    labels = _labels(p_, m, 4, True)

    def loss(x_, t_, pr_):
        out = fused_swin_block(x_, t_, pr_, bias, labels, scale, h,
                               fold_mode=FOLD_COUNT, interpret=True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    args = (x, tokens, params)
    g_want = _grads(monkeypatch, loss, args, kernel_bwd=False)
    g_got = _grads(monkeypatch, loss, args, kernel_bwd=True)
    _compare(g_got, g_want)


@pytest.mark.parametrize("cache", ["1", "0"])
@pytest.mark.parametrize("drop", [0.0, 0.2])
def test_kernel_bwd_cache_p_matches_reference(monkeypatch, drop, cache):
    """The p-cache (default ON — reuse pass-1 softmax probabilities
    instead of a second score pass) AND its =0 kill-switch both stay at
    the reference-vjp parity floor, with masks, fold and dropout."""
    monkeypatch.setattr(wap, "_FORCE_INTERPRET", True)
    monkeypatch.setenv("MIVP_BWD_CACHE_P", cache)
    x, tokens, params, h, scale = _setup()
    b, p_, m, c = x.shape
    bias = _bias(m, 4, h, True)
    labels = _labels(p_, m, 4, True)
    seeds = jnp.asarray([11, 22], jnp.uint32) if drop else None

    def loss(x_, t_, pr_):
        out = fused_swin_block(x_, t_, pr_, bias, labels, scale, h,
                               fold_mode=FOLD_COUNT, dropout_seeds=seeds,
                               attn_drop=drop, proj_drop=drop,
                               interpret=True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    args = (x, tokens, params)
    g_want = _grads(monkeypatch, loss, args, kernel_bwd=False)
    g_got = _grads(monkeypatch, loss, args, kernel_bwd=True)
    _compare(g_got, g_want)


@pytest.mark.parametrize("force_g", ["2", "1"])
def test_kernel_bwd_through_shifted_module(monkeypatch, force_g):
    """Full module grads (fused window shift + masks + adaptive fold)
    agree between the kernel backward and the jnp-reference vjp, and
    with the pure-XLA implementation."""
    monkeypatch.setattr(wap, "_FORCE_INTERPRET", True)
    monkeypatch.setenv("MIVP_BWD_FORCE_G", force_g)

    def _blk(impl):
        return SwinTransformerBlock(
            hidden_channels=8, window_size=(4, 4, 2), pos_bias_embed_dim=8,
            num_heads=2, max_prompts=1, tokens_per_prompt=3,
            use_token_params=True, shift_size=(2, 2, 0), attn_impl=impl)

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 2, 8))
    p = jnp.broadcast_to(
        jax.random.normal(jax.random.PRNGKey(1), (1, 3, 8)), (1, 3, 8))
    params = _blk("xla").init(jax.random.PRNGKey(2), x, p)

    def loss(impl):
        return lambda pr, xx: jnp.sum(
            _blk(impl).apply(pr, xx, p).astype(jnp.float32) ** 2)

    g_xla = jax.grad(loss("xla"), argnums=(0, 1))(params, x)
    g_ref = _grads(monkeypatch, loss("auto"), (params, x),
                   kernel_bwd=False)
    g_ker = _grads(monkeypatch, loss("auto"), (params, x),
                   kernel_bwd=True)
    _compare(g_ker, g_ref)
    for a, b in zip(jax.tree_util.tree_leaves(g_ker),
                    jax.tree_util.tree_leaves(g_xla)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        err = np.linalg.norm(a - b)
        assert err <= 0.1 * np.linalg.norm(b) + 1e-3, (err, a.shape)


def test_kernel_bwd_dropout_finite_difference(monkeypatch):
    """The kernel backward regenerates the forward's counter-based
    dropout masks: finite differences through the KERNEL forward agree
    with the kernel-backward gradient."""
    monkeypatch.setattr(wap, "_FORCE_INTERPRET", True)
    monkeypatch.setenv("MIVP_KERNEL_BWD", "1")
    x, tokens, params, h, scale = _setup(b=1, p_=1, m=8, i=2, dh=4)
    bias = _bias(8, 2, h, False)
    seeds = jnp.asarray([3, 4], jnp.uint32)

    def loss(x_):
        out = fused_swin_block(x_, tokens, params, bias, None, scale, h,
                               dropout_seeds=seeds, attn_drop=0.2,
                               proj_drop=0.2, interpret=True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g = jax.grad(loss)(x)
    eps = 1e-3
    dx = jnp.zeros_like(x).at[0, 0, 2, 3].set(eps)
    num = (loss(x + dx) - loss(x - dx)) / (2 * eps)
    np.testing.assert_allclose(float(num), float(g[0, 0, 2, 3]),
                               rtol=5e-2, atol=5e-2)


@pytest.mark.parametrize("drop", [0.0, 0.2])
def test_kernel_bwd_through_pair(monkeypatch, drop):
    """The PAIR custom_vjp backward (forward-kernel recompute of block
    1's output + two single-block kernel backwards) agrees with the
    jnp pair-reference vjp."""
    from medical_image_segmentation_with_visual_prompts_tpu.models import (
        ConsecutiveSwinBlocks)
    monkeypatch.setattr(wap, "_FORCE_INTERPRET", True)
    monkeypatch.setenv("MIVP_PAIR_KERNEL", "1")
    monkeypatch.setenv("MIVP_FORCE_G", "2")
    blk = ConsecutiveSwinBlocks(
        hidden_channels=8, num_heads=2, pos_bias_embed_dim=8,
        max_prompts=1, tokens_per_prompt=3, use_token_params=True,
        window_size=(4, 4, 4), down=False, use_checkpoint=False,
        attn_drop=drop, proj_drop=drop, attn_impl="auto",
        pad_mode="aligned")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 4, 8))
    ps = tuple(
        jnp.broadcast_to(
            jax.random.normal(jax.random.PRNGKey(10 + i), (1, 3, 8)),
            (2, 3, 8)) for i in range(2))
    det = drop == 0.0
    rngs = None if det else {"dropout": jax.random.PRNGKey(7)}
    params = blk.init(
        {"params": jax.random.PRNGKey(2),
         "dropout": jax.random.PRNGKey(3)}, x, ps)

    def loss(pr, xx):
        out = blk.apply(pr, xx, ps, deterministic=det, rngs=rngs)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g_want = _grads(monkeypatch, lambda pr, xx: loss(pr, xx),
                    (params, x), kernel_bwd=False)
    g_got = _grads(monkeypatch, lambda pr, xx: loss(pr, xx),
                   (params, x), kernel_bwd=True)
    _compare(g_got, g_want)
