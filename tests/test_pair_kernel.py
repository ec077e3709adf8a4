"""One-kernel Swin block pairs (ops/fused_block.py::fused_swin_pair).

The pair kernel runs block 1, the in-VMEM window shift, and block 2 in
a single pallas_call (block 1's output never reaches HBM).  Tests pin:

* BITWISE equality vs the two-kernel path (the pair kernel rounds its
  inter-block tile to the array dtype exactly where the two-kernel path
  crosses HBM);
* parity vs the per-block XLA reference;
* gradients through the pair custom_vjp;
* in-kernel dropout determinism under pair remat.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_segmentation_with_visual_prompts_tpu.models import (
    ConsecutiveSwinBlocks)
from medical_image_segmentation_with_visual_prompts_tpu.ops import (
    window_attention_pallas as wap)


def _pair(c=8, heads=2, window=(4, 4, 4), impl="auto", tokens=3,
          ckpt=False, drop=0.0):
    return ConsecutiveSwinBlocks(
        hidden_channels=c, num_heads=heads, pos_bias_embed_dim=8,
        max_prompts=1, tokens_per_prompt=max(tokens, 1),
        use_token_params=tokens > 0, window_size=window, down=False,
        use_checkpoint=ckpt, attn_drop=drop, proj_drop=drop,
        attn_impl=impl, pad_mode="aligned")


def _inputs(shape, tokens=3):
    c = shape[-1]
    x = jax.random.normal(jax.random.PRNGKey(0), shape)
    ps = []
    for i in range(2):
        pp = jax.random.normal(jax.random.PRNGKey(10 + i), (1, tokens, c))
        ps.append(jnp.broadcast_to(pp, (shape[0], tokens, c)))
    return x, tuple(ps)


# shapes: window-permuted shift (g=2), pure-roll shift, folded depth,
# unshifted pair (adaptive zero shift at 4x4x4 == window), and an
# unshifted pair whose g=4 grid blocks span FOUR images (P=1 per image).
CASES = [((2, 16, 16, 4, 8), "2"),
         ((2, 8, 8, 4, 8), "0"),
         ((2, 16, 16, 2, 8), "2"),
         ((1, 4, 4, 4, 8), "0"),
         ((4, 4, 4, 4, 8), "0")]


@pytest.mark.parametrize("shape,force_g", CASES)
def test_pair_kernel_bitwise_vs_two_kernels(monkeypatch, shape, force_g):
    x, ps = _inputs(shape)
    monkeypatch.setattr(wap, "_FORCE_INTERPRET", True)
    if force_g != "0":
        monkeypatch.setenv("MIVP_FORCE_G", force_g)
    blk = _pair()
    params = blk.init(jax.random.PRNGKey(2), x, ps)

    monkeypatch.setenv("MIVP_PAIR_KERNEL", "1")  # opt-in since round 3
    monkeypatch.delenv("MIVP_NO_PAIR_KERNEL", raising=False)
    got = blk.apply(params, x, ps)
    monkeypatch.setenv("MIVP_NO_PAIR_KERNEL", "1")
    want = blk.apply(params, x, ps)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("shape,force_g", CASES)
def test_pair_kernel_matches_xla(monkeypatch, shape, force_g):
    x, ps = _inputs(shape)
    ref = _pair(impl="xla")
    params = ref.init(jax.random.PRNGKey(2), x, ps)
    want = ref.apply(params, x, ps)
    monkeypatch.setattr(wap, "_FORCE_INTERPRET", True)
    monkeypatch.setenv("MIVP_PAIR_KERNEL", "1")
    if force_g != "0":
        monkeypatch.setenv("MIVP_FORCE_G", force_g)
    got = _pair().apply(params, x, ps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=4e-2, atol=4e-2)


def test_pair_kernel_gradients(monkeypatch):
    shape = (2, 16, 16, 4, 8)
    x, ps = _inputs(shape)
    ref = _pair(impl="xla")
    params = ref.init(jax.random.PRNGKey(2), x, ps)

    def loss(mod):
        return lambda pr, xx: jnp.sum(mod.apply(pr, xx, ps) ** 2)

    g_want = jax.grad(loss(ref), argnums=(0, 1))(params, x)
    monkeypatch.setattr(wap, "_FORCE_INTERPRET", True)
    monkeypatch.setenv("MIVP_PAIR_KERNEL", "1")
    monkeypatch.setenv("MIVP_FORCE_G", "2")
    g_got = jax.grad(loss(_pair()), argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_got),
                    jax.tree_util.tree_leaves(g_want)):
        a, b = np.asarray(a), np.asarray(b)
        err = np.linalg.norm(a - b)
        assert err <= 0.1 * np.linalg.norm(b) + 1e-3, (err, a.shape)


def test_pair_kernel_dropout_remat_consistent(monkeypatch):
    """Counter-based in-kernel dropout draws identical masks whether the
    pair runs plain or under remat (canonical training config)."""
    monkeypatch.setattr(wap, "_FORCE_INTERPRET", True)
    monkeypatch.setenv("MIVP_PAIR_KERNEL", "1")
    x, ps = _inputs((2, 8, 8, 4, 8))
    plain = _pair(ckpt=False, drop=0.2)
    remat = _pair(ckpt=True, drop=0.2)
    params = plain.init({"params": jax.random.PRNGKey(2),
                         "dropout": jax.random.PRNGKey(3)}, x, ps)
    rngs = {"dropout": jax.random.PRNGKey(7)}
    a = plain.apply(params, x, ps, deterministic=False, rngs=rngs)
    b = remat.apply(params, x, ps, deterministic=False, rngs=rngs)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-6, atol=1e-6)
    # And gradients flow (through the pair custom_vjp + remat).
    def f(pr):
        out = remat.apply(pr, x, ps, deterministic=False, rngs=rngs)
        return jnp.sum(out ** 2)
    grads = jax.grad(f)(params)
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()


def test_pair_kernel_mask_dma_bitwise(monkeypatch):
    """The MIVP_MASK_DMA mask fallback is bitwise equal to the in-kernel
    label path through the masked shifted PAIR kernel."""
    x, ps = _inputs((2, 16, 16, 4, 8))
    monkeypatch.setattr(wap, "_FORCE_INTERPRET", True)
    monkeypatch.setenv("MIVP_PAIR_KERNEL", "1")
    monkeypatch.setenv("MIVP_FORCE_G", "2")
    blk = _pair()
    params = blk.init(jax.random.PRNGKey(2), x, ps)
    monkeypatch.setenv("MIVP_MASK_DMA", "0")  # in-kernel label path
    want = blk.apply(params, x, ps)
    monkeypatch.setenv("MIVP_MASK_DMA", "1")
    got = blk.apply(params, x, ps)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
