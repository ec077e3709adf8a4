"""Fused Pallas window-attention kernel: parity vs. the XLA einsum path.

Runs in Pallas interpreter mode on CPU (the real kernel runs on TPU; the
semantics are identical by construction).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_segmentation_with_visual_prompts_tpu.ops.window_attention_pallas import (
    fused_window_attention)


def _reference(qh, kh, vh, pos_bias, mask, scale):
    attn = jnp.einsum("bpihd,bpjhd->bphij", qh, kh) * scale
    if pos_bias is not None:
        attn = attn + pos_bias
    if mask is not None:
        attn = attn * mask
    attn = jax.nn.softmax(attn, axis=-1)
    return jnp.einsum("bphij,bpjhd->bpihd", attn, vh)


def _rand(key, shape):
    return jax.random.normal(key, shape, jnp.float32)


@pytest.mark.parametrize("with_mask", [False, True])
def test_fused_matches_einsum(with_mask):
    b, p, n, h, dh = 2, 4, 24, 2, 8
    keys = jax.random.split(jax.random.PRNGKey(0), 5)
    qh = _rand(keys[0], (b, p, n, h, dh))
    kh = _rand(keys[1], (b, p, n, h, dh))
    vh = _rand(keys[2], (b, p, n, h, dh))
    bias = _rand(keys[3], (1, 1, h, n, n))
    mask = None
    if with_mask:
        m = (jax.random.uniform(keys[4], (1, p, 1, n, n)) > 0.3)
        mask = m.astype(jnp.float32)
    scale = dh ** -0.5
    want = _reference(qh, kh, vh, bias, mask, scale)
    got = fused_window_attention(qh, kh, vh, bias, mask, scale,
                                 interpret=True)
    # Kernel matmuls run in bf16 (fp32 accumulate): bf16-level tolerance.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-2, atol=3e-2)


def test_fused_backward_matches_einsum():
    b, p, n, h, dh = 1, 2, 16, 2, 4
    keys = jax.random.split(jax.random.PRNGKey(1), 5)
    qh = _rand(keys[0], (b, p, n, h, dh))
    kh = _rand(keys[1], (b, p, n, h, dh))
    vh = _rand(keys[2], (b, p, n, h, dh))
    bias = _rand(keys[3], (1, 1, h, n, n))
    mask = (jax.random.uniform(keys[4], (1, p, 1, n, n)) > 0.3).astype(
        jnp.float32)
    scale = dh ** -0.5

    def loss_fused(q, k, v, b_):
        out = fused_window_attention(q, k, v, b_, mask, scale,
                                     interpret=True)
        return jnp.sum(out ** 2)

    def loss_ref(q, k, v, b_):
        return jnp.sum(_reference(q, k, v, b_, mask, scale) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(qh, kh, vh, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(qh, kh, vh, bias)
    # The backward recomputes in fp32, but its incoming cotangent comes
    # from the bf16 forward output — bf16-level tolerance.
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("with_mask", [False, True])
def test_packed_matches_einsum(with_mask):
    from medical_image_segmentation_with_visual_prompts_tpu.ops.window_attention_pallas import (
        fused_window_attention_packed)
    b, p, m, n, h, dh = 2, 4, 16, 24, 4, 8
    c = h * dh
    keys = jax.random.split(jax.random.PRNGKey(2), 5)
    q = _rand(keys[0], (b, p, m, c))
    k = _rand(keys[1], (b, p, n, c))
    v = _rand(keys[2], (b, p, n, c))
    bias = _rand(keys[3], (1, 1, h, m, n))
    mask = None
    if with_mask:
        mask = (jax.random.uniform(keys[4], (1, p, 1, m, n)) > 0.3).astype(
            jnp.float32)
    scale = dh ** -0.5
    split = lambda t: t.reshape(b, p, t.shape[2], h, dh)
    want = _reference(split(q), split(k), split(v), bias, mask, scale)
    want = want.reshape(b, p, m, c)
    got = fused_window_attention_packed(q, k, v, bias, mask, scale, h,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-2, atol=3e-2)


def test_packed_backward_matches_einsum():
    from medical_image_segmentation_with_visual_prompts_tpu.ops.window_attention_pallas import (
        fused_window_attention_packed)
    b, p, m, n, h, dh = 1, 2, 8, 12, 2, 4
    c = h * dh
    keys = jax.random.split(jax.random.PRNGKey(5), 5)
    q = _rand(keys[0], (b, p, m, c))
    k = _rand(keys[1], (b, p, n, c))
    v = _rand(keys[2], (b, p, n, c))
    bias = _rand(keys[3], (1, 1, h, m, n))
    mask = (jax.random.uniform(keys[4], (1, p, 1, m, n)) > 0.3).astype(
        jnp.float32)
    scale = dh ** -0.5
    split = lambda t: t.reshape(b, p, t.shape[2], h, dh)

    def loss_packed(q_, k_, v_, b_):
        out = fused_window_attention_packed(q_, k_, v_, b_, mask, scale, h,
                                            interpret=True)
        return jnp.sum(out ** 2)

    def loss_ref(q_, k_, v_, b_):
        out = _reference(split(q_), split(k_), split(v_), b_, mask, scale)
        return jnp.sum(out ** 2)

    g_packed = jax.grad(loss_packed, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for gf, gr in zip(g_packed, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("with_mask", [False, True])
def test_packed_qkv_matches_einsum(with_mask):
    from medical_image_segmentation_with_visual_prompts_tpu.ops.window_attention_pallas import (
        fused_window_attention_packed_qkv)
    b, p, m, n, h, dh = 2, 4, 16, 24, 4, 8
    c = h * dh
    keys = jax.random.split(jax.random.PRNGKey(7), 6)
    y = _rand(keys[0], (b, p, n, c))
    wq = _rand(keys[1], (c, c)) * 0.2
    wk = _rand(keys[2], (c, c)) * 0.2
    wv = _rand(keys[3], (c, c)) * 0.2
    bias = _rand(keys[4], (1, 1, h, m, n))
    mask = None
    if with_mask:
        mask = (jax.random.uniform(keys[5], (1, p, 1, m, n)) > 0.3).astype(
            jnp.float32)
    scale = dh ** -0.5
    split = lambda t: t.reshape(b, p, t.shape[2], h, dh)
    q = (y @ wq)[:, :, :m]
    k, v = y @ wk, y @ wv
    want = _reference(split(q), split(k), split(v), bias, mask, scale)
    want = want.reshape(b, p, m, c)
    got = fused_window_attention_packed_qkv(
        y, wq, wk, wv, m_len=m, pos_bias=bias, mask=mask, scale=scale,
        num_heads=h, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=4e-2, atol=4e-2)


def test_packed_qkv_backward():
    from medical_image_segmentation_with_visual_prompts_tpu.ops.window_attention_pallas import (
        fused_window_attention_packed_qkv)
    b, p, m, n, h, dh = 1, 2, 8, 12, 2, 4
    c = h * dh
    keys = jax.random.split(jax.random.PRNGKey(8), 6)
    y = _rand(keys[0], (b, p, n, c))
    wq = _rand(keys[1], (c, c)) * 0.2
    wk = _rand(keys[2], (c, c)) * 0.2
    wv = _rand(keys[3], (c, c)) * 0.2
    bias = _rand(keys[4], (1, 1, h, m, n))
    mask = (jax.random.uniform(keys[5], (1, p, 1, m, n)) > 0.3).astype(
        jnp.float32)
    scale = dh ** -0.5
    split = lambda t: t.reshape(b, p, t.shape[2], h, dh)

    def loss_fused(y_, wq_, wk_, wv_, b_):
        out = fused_window_attention_packed_qkv(
            y_, wq_, wk_, wv_, m_len=m, pos_bias=b_, mask=mask, scale=scale,
            num_heads=h, interpret=True)
        return jnp.sum(out ** 2)

    def loss_ref(y_, wq_, wk_, wv_, b_):
        q = (y_ @ wq_)[:, :, :m]
        out = _reference(split(q), split(y_ @ wk_), split(y_ @ wv_), b_,
                         mask, scale)
        return jnp.sum(out ** 2)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(y, wq, wk, wv, bias)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(y, wq, wk, wv, bias)
    for gf, gr in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=5e-2, atol=5e-2)
