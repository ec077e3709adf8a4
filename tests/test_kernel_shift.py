"""Fused window shift: kernel plan eligibility + exactness.

The cyclic shift of the second Swin block in each pair is absorbed into
the fused block kernel (input/output index_map window permutation +
in-VMEM token rolls — ops/fused_block.py, plan in
ops/windows.py::kernel_shift_plan).  These tests pin:

* plan eligibility over the flagship geometries;
* BITWISE equality of the in-kernel shift vs the trace-level
  window_shift fallback (both are pure permutations);
* parity of the whole pair path vs the per-block XLA reference;
* gradients through the permuted custom_vjp.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_segmentation_with_visual_prompts_tpu.models import (
    ConsecutiveSwinBlocks)
from medical_image_segmentation_with_visual_prompts_tpu.ops import (
    window_attention_pallas as wap)
from medical_image_segmentation_with_visual_prompts_tpu.ops.windows import (
    kernel_shift_plan)


def test_plan_flagship_stage0():
    # Stage 0 masked: grid (8,8,1), window (8,8,4), shift (4,4,0), g=4.
    plan = kernel_shift_plan((8, 8, 1), (8, 8, 4), (4, 4, 0), 4)
    assert plan == ((8, 8, 1), (8, 8, 4), (4, 4, 0), (0, 0, 0))


def test_plan_flagship_stage1_pure_roll():
    # Stage 1 folded: grid (4,4,1), wc (8,8,2), shift (4,4,0), g=8:
    # s0 = 0 on every axis -> identity permutation, static roll -1.
    plan = kernel_shift_plan((4, 4, 1), (8, 8, 2), (4, 4, 0), 8)
    assert plan == ((4, 4, 1), (8, 8, 2), (0, 0, 0), (1, 1, 0))


def test_plan_block_spanning_images():
    # g > P: eligible only as a pure roll (no permutation) — grid (2,2,1)
    # with shift 4 has s0 = 0 everywhere.
    plan = kernel_shift_plan((2, 2, 1), (8, 8, 1), (4, 4, 0), 8)
    assert plan == ((2, 2, 1), (8, 8, 1), (0, 0, 0), (2, 2, 0))


def test_plan_rejections():
    # Segment boundary not g-aligned on the partially covered axis.
    assert kernel_shift_plan((8, 8, 1), (8, 8, 4), (4, 2, 0), 4) is None
    # Fully covered axis with a window permutation (s0 != 0).
    assert kernel_shift_plan((4, 4, 1), (4, 4, 4), (2, 2, 0), 8) is None
    # Depth shift (roll view not built).
    assert kernel_shift_plan((4, 4, 2), (4, 4, 2), (0, 0, 1), 2) is None


def _pair(c=8, heads=2, window=(4, 4, 4), impl="auto", tokens=3):
    return ConsecutiveSwinBlocks(
        hidden_channels=c, num_heads=heads, pos_bias_embed_dim=8,
        max_prompts=1, tokens_per_prompt=max(tokens, 1),
        use_token_params=tokens > 0, window_size=window, down=False,
        attn_impl=impl, pad_mode="aligned")


def _inputs(shape, tokens=3, seed=0):
    c = shape[-1]
    x = jax.random.normal(jax.random.PRNGKey(seed), shape)
    ps = []
    for i in range(2):
        pp = jax.random.normal(jax.random.PRNGKey(10 + i), (1, tokens, c))
        ps.append(jnp.broadcast_to(pp, (shape[0], tokens, c)))
    return x, tuple(ps)


# (shape, force_g): permutation case needs g=2 so the s0=2 segment
# boundary stays block-aligned on the partially covered W axis.
CASES = [((2, 16, 16, 4, 8), "2"),   # s0=(2,2,0): index_map permutation
         ((2, 8, 8, 4, 8), "0"),     # s0=(0,0,0), q0=1: pure static roll
         ((2, 16, 16, 2, 8), "2")]   # folded depth + permutation


@pytest.mark.parametrize("shape,force_g", CASES)
def test_kernel_shift_bitwise_vs_fallback(monkeypatch, shape, force_g):
    """In-kernel shift (index_map perm + pltpu.roll) must equal the
    trace-level window_shift fallback BITWISE — both are permutations."""
    x, ps = _inputs(shape)
    monkeypatch.setattr(wap, "_FORCE_INTERPRET", True)
    if force_g != "0":
        monkeypatch.setenv("MIVP_FORCE_G", force_g)
    blk = _pair(window=(4, 4, 4))
    params = blk.init(jax.random.PRNGKey(2), x, ps)

    monkeypatch.delenv("MIVP_NO_KERNEL_SHIFT", raising=False)
    got = blk.apply(params, x, ps)
    monkeypatch.setenv("MIVP_NO_KERNEL_SHIFT", "1")
    want = blk.apply(params, x, ps)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("shape,force_g", CASES)
def test_kernel_shift_matches_xla(monkeypatch, shape, force_g):
    x, ps = _inputs(shape)
    ref = _pair(window=(4, 4, 4), impl="xla")
    params = ref.init(jax.random.PRNGKey(2), x, ps)
    want = ref.apply(params, x, ps)
    monkeypatch.setattr(wap, "_FORCE_INTERPRET", True)
    if force_g != "0":
        monkeypatch.setenv("MIVP_FORCE_G", force_g)
    got = _pair(window=(4, 4, 4)).apply(params, x, ps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=4e-2, atol=4e-2)


def test_kernel_shift_gradients(monkeypatch):
    """custom_vjp through the permuted path: the jnp reference applies
    the same shift at trace level, so grads must match the XLA path."""
    shape = (2, 16, 16, 4, 8)
    x, ps = _inputs(shape)
    ref = _pair(window=(4, 4, 4), impl="xla")
    params = ref.init(jax.random.PRNGKey(2), x, ps)

    def loss(mod):
        return lambda pr, xx: jnp.sum(mod.apply(pr, xx, ps) ** 2)

    g_want = jax.grad(loss(ref), argnums=(0, 1))(params, x)
    monkeypatch.setattr(wap, "_FORCE_INTERPRET", True)
    monkeypatch.setenv("MIVP_FORCE_G", "2")
    g_got = jax.grad(loss(_pair(window=(4, 4, 4))), argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_got),
                    jax.tree_util.tree_leaves(g_want)):
        a, b = np.asarray(a), np.asarray(b)
        # Per-leaf L2 closeness — the kernel path computes matmuls in
        # bf16 vs the fp32-pinned XLA reference (suite convention, see
        # test_pad_folding.py::test_pair_fused_gradients).
        err = np.linalg.norm(a - b)
        assert err <= 0.1 * np.linalg.norm(b) + 1e-3, (err, a.shape)
