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


def test_fused_block_reference_matches_module():
    """The pure-jnp fused-block reference == the unfused module path."""
    from medical_image_segmentation_with_visual_prompts_tpu.models import (
        SwinTransformerBlock)
    from medical_image_segmentation_with_visual_prompts_tpu.ops.fused_block import (
        _block_reference)
    blk = SwinTransformerBlock(
        hidden_channels=8, window_size=(4, 4, 2), pos_bias_embed_dim=8,
        num_heads=2, max_prompts=1, tokens_per_prompt=3,
        use_token_params=True, shift_size=(0, 0, 0), attn_impl="xla")
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 4, 4, 2, 8))
    p = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 8))
    p = jnp.broadcast_to(p, (2, 3, 8))
    params = blk.init(rng, x, p)
    want = blk.apply(params, x, p)  # unfused (CPU) path

    # Rebuild via the fused-block reference math on the windowed tokens.
    from medical_image_segmentation_with_visual_prompts_tpu.ops.windows import (
        window_partition, window_reverse)
    pr = params["params"]
    attn_p = pr["attn"]
    kp = {
        "ln1_scale": pr["attn_norm"]["scale"],
        "ln1_bias": pr["attn_norm"]["bias"],
        "wq": attn_p["to_q_kernel"], "wk": attn_p["to_k_kernel"],
        "wv": attn_p["to_v_kernel"],
        "wproj": attn_p["proj"]["kernel"], "bproj": attn_p["proj"]["bias"],
        "ln2_scale": pr["mlp_norm"]["scale"],
        "ln2_bias": pr["mlp_norm"]["bias"],
        "wmlp": pr["mlp"]["kernel"], "bmlp": pr["mlp"]["bias"],
    }
    import flax.linen as nn

    def pe_bias(mdl):
        return mdl.pe(4, 4, 2, 3)

    bias = nn.apply(pe_bias, blk)(params)[0, :, :32, :]  # [H, M, N] rows
    xw = window_partition(x, (4, 4, 2))  # [2, 1, 32, 8]
    out_w = _block_reference(
        xw.reshape(2, 32, 8), p[0], kp, bias, None, (8 // 2) ** -0.5, 2)
    got = window_reverse(out_w.reshape(2, 1, 32, 8), (4, 4, 2), (4, 4, 2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=4e-2, atol=4e-2)


def test_fused_block_kernel_matches_reference():
    from medical_image_segmentation_with_visual_prompts_tpu.ops.fused_block import (
        _block_reference, fused_swin_block)
    b, p_, m, i, h, dh = 2, 4, 16, 4, 2, 8
    c = h * dh
    n = m + i
    keys = jax.random.split(jax.random.PRNGKey(3), 16)
    x = _rand(keys[0], (b, p_, m, c))
    tokens = _rand(keys[1], (i, c))
    params = {
        "ln1_scale": jnp.ones((c,)) + 0.1 * _rand(keys[2], (c,)),
        "ln1_bias": 0.1 * _rand(keys[3], (c,)),
        "wq": 0.3 * _rand(keys[4], (c, c)),
        "wk": 0.3 * _rand(keys[5], (c, c)),
        "wv": 0.3 * _rand(keys[6], (c, c)),
        "wproj": 0.3 * _rand(keys[7], (c, c)),
        "bproj": 0.1 * _rand(keys[8], (c,)),
        "ln2_scale": jnp.ones((c,)) + 0.1 * _rand(keys[9], (c,)),
        "ln2_bias": 0.1 * _rand(keys[10], (c,)),
        "wmlp": 0.3 * _rand(keys[11], (c, c)),
        "bmlp": 0.1 * _rand(keys[12], (c,)),
    }
    bias = _rand(keys[13], (1, 1, h, m, n))
    # Per-window shift-region labels: random equivalence classes on the
    # content tokens, -1 (never masked) on the prompt-token columns —
    # the production mask semantics (kernel builds equality in-VMEM).
    lab_np = np.concatenate(
        [np.asarray(jax.random.randint(keys[14], (p_, m), 0, 3),
                    np.int32),
         np.full((p_, i), -1, np.int32)], axis=-1)
    labels = jnp.asarray(lab_np)
    scale = dh ** -0.5
    got = fused_swin_block(x, tokens, params, bias, labels, scale, h,
                           interpret=True)
    want = _block_reference(
        x.reshape(b * p_, m, c), tokens, params,
        bias.reshape(h, m, n),
        jnp.tile(labels, (b, 1)), scale, h)
    np.testing.assert_allclose(np.asarray(got).reshape(b * p_, m, c),
                               np.asarray(want), rtol=4e-2, atol=4e-2)


def test_fused_block_grad_via_reference():
    from medical_image_segmentation_with_visual_prompts_tpu.ops.fused_block import (
        fused_swin_block, _block_reference)
    b, p_, m, i, h, dh = 1, 2, 8, 2, 2, 4
    c = h * dh
    n = m + i
    keys = jax.random.split(jax.random.PRNGKey(5), 16)
    x = _rand(keys[0], (b, p_, m, c))
    tokens = _rand(keys[1], (i, c))
    params = {k: 0.3 * _rand(kk, (c, c)) if k.startswith("w") else
              0.1 * _rand(kk, (c,))
              for k, kk in zip(("ln1_scale", "ln1_bias", "wq", "wk", "wv",
                                "wproj", "bproj", "ln2_scale", "ln2_bias",
                                "wmlp", "bmlp"), keys[2:13])}
    bias = _rand(keys[13], (1, 1, h, m, n))
    scale = dh ** -0.5

    def loss(x_, t_):
        out = fused_swin_block(x_, t_, params, bias, None, scale, h,
                               interpret=True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g = jax.grad(loss, argnums=(0, 1))(x, tokens)
    assert all(np.isfinite(np.asarray(gi)).all() for gi in g)
    assert float(jnp.abs(g[1]).sum()) > 0  # grads reach the prompt tokens


def test_fused_block_masked_grad_matches_reference(monkeypatch):
    # Pins the REFERENCE-VJP backward arm (the kernel backward's
    # fallback and its parity oracle): with MIVP_KERNEL_BWD=0 the
    # custom_vjp differentiates _block_reference at the same residuals,
    # so a linear loss must match the reference gradient exactly.  The
    # kernel-backward arm is covered at the bf16 noise floor in
    # tests/test_fused_block_bwd.py.
    monkeypatch.setenv("MIVP_KERNEL_BWD", "0")
    # Backward through the MASKED (labels) path: dropout-free training
    # with shifted windows differentiates through the int32 labels
    # residual (float0 cotangent) and _block_reference's equality mask.
    from medical_image_segmentation_with_visual_prompts_tpu.ops.fused_block import (
        _block_reference, fused_swin_block)
    b, p_, m, i, h, dh = 1, 2, 8, 2, 2, 4
    c = h * dh
    n = m + i
    keys = jax.random.split(jax.random.PRNGKey(11), 16)
    x = _rand(keys[0], (b, p_, m, c))
    tokens = _rand(keys[1], (i, c))
    params = {k: 0.3 * _rand(kk, (c, c)) if k.startswith("w") else
              0.1 * _rand(kk, (c,))
              for k, kk in zip(("ln1_scale", "ln1_bias", "wq", "wk", "wv",
                                "wproj", "bproj", "ln2_scale", "ln2_bias",
                                "wmlp", "bmlp"), keys[2:13])}
    bias = _rand(keys[13], (1, 1, h, m, n))
    labels = jnp.asarray(np.concatenate(
        [np.asarray(jax.random.randint(keys[14], (p_, m), 0, 2), np.int32),
         np.full((p_, i), -1, np.int32)], axis=-1))
    scale = dh ** -0.5

    # LINEAR loss: the cotangent is a constant, so the kernel's
    # custom_vjp (which differentiates _block_reference at the same
    # residuals) must match the reference gradient exactly — a
    # quadratic loss would leak the forward's bf16 rounding into the
    # cotangent and mask label-handling regressions behind a loose
    # tolerance.
    cot = _rand(keys[15], (b, p_, m, c))

    def loss_kernel(x_, t_):
        out = fused_swin_block(x_, t_, params, bias, labels, scale, h,
                               interpret=True)
        return jnp.sum(out.astype(jnp.float32) * cot)

    def loss_ref(x_, t_):
        out = _block_reference(x_.reshape(b * p_, m, c), t_, params,
                               bias.reshape(h, m, n),
                               jnp.tile(labels, (b, 1)), scale, h)
        return jnp.sum(out.astype(jnp.float32)
                       * cot.reshape(b * p_, m, c))

    gk = jax.grad(loss_kernel, argnums=(0, 1))(x, tokens)
    gr = jax.grad(loss_ref, argnums=(0, 1))(x, tokens)
    np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(gr[0]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk[1]), np.asarray(gr[1]),
                               rtol=1e-4, atol=1e-4)


def test_fused_block_kernel_no_tokens():
    from medical_image_segmentation_with_visual_prompts_tpu.ops.fused_block import (
        _block_reference, fused_swin_block)
    b, p_, m, h, dh = 1, 2, 16, 2, 8
    c = h * dh
    keys = jax.random.split(jax.random.PRNGKey(9), 14)
    x = _rand(keys[0], (b, p_, m, c))
    params = {k: 0.3 * _rand(kk, (c, c)) if k.startswith("w") else
              0.1 * _rand(kk, (c,))
              for k, kk in zip(("ln1_scale", "ln1_bias", "wq", "wk", "wv",
                                "wproj", "bproj", "ln2_scale", "ln2_bias",
                                "wmlp", "bmlp"), keys[1:12])}
    bias = _rand(keys[12], (1, 1, h, m, m))
    scale = dh ** -0.5
    got = fused_swin_block(x, None, params, bias, None, scale, h,
                           interpret=True)
    want = _block_reference(x.reshape(b * p_, m, c), None, params,
                            bias.reshape(h, m, m), None, scale, h)
    np.testing.assert_allclose(np.asarray(got).reshape(b * p_, m, c),
                               np.asarray(want), rtol=4e-2, atol=4e-2)


def test_fused_block_mask_dma_bitwise(monkeypatch):
    """MIVP_MASK_DMA=1 (materialized [g, m, n] fp32 mask blocks — the
    bench-ladder fallback for Mosaic backends that reject the int32
    label operands) is BITWISE equal to the in-kernel label path, both
    forward and backward, including fold + dropout."""
    from medical_image_segmentation_with_visual_prompts_tpu.ops import (
        fused_block as fb)
    b, p_, m, i, h, dh = 2, 4, 32, 2, 3, 8
    c = h * dh
    n_fold = fb.fold_width(m, i)
    n = m + n_fold + i
    keys = jax.random.split(jax.random.PRNGKey(21), 16)
    x = _rand(keys[0], (b, p_, m, c))
    tokens = _rand(keys[1], (i, c))
    params = {k: 0.3 * _rand(kk, (c, c)) if k.startswith("w") else
              0.1 * _rand(kk, (c,))
              for k, kk in zip(("ln1_scale", "ln1_bias", "wq", "wk", "wv",
                                "wproj", "bproj", "ln2_scale", "ln2_bias",
                                "wmlp", "bmlp"), keys[2:13])}
    bias = _rand(keys[13], (1, 1, h, m, n))
    labels = jnp.asarray(np.concatenate(
        [np.asarray(jax.random.randint(keys[14], (p_, m), 0, 3), np.int32),
         np.full((p_, n - m), -1, np.int32)], axis=-1))
    seeds = jnp.asarray([3, 7], jnp.uint32)
    scale = dh ** -0.5

    def run(xx):
        return fb.fused_swin_block(
            xx, tokens, params, bias, labels, scale, h,
            fold_mode=fb.FOLD_COUNT, dropout_seeds=seeds,
            attn_drop=0.1, proj_drop=0.1, interpret=True)

    loss = lambda xx: jnp.sum(run(xx) ** 2)
    monkeypatch.setenv("MIVP_MASK_DMA", "0")  # in-kernel label path
    want, g_want = run(x), jax.grad(loss)(x)
    monkeypatch.setenv("MIVP_MASK_DMA", "1")
    got, g_got = run(x), jax.grad(loss)(x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    np.testing.assert_array_equal(np.asarray(g_got), np.asarray(g_want))
