"""Position-bias cache: pre-filled biases must not change numerics.

The relative-position bias (and the folded path's assembled fold bias)
is a pure function of the params and static window geometry, yet the
jitted sliding-window scan re-derives it every chunk.
``prefill_bias_cache`` snapshots the tensors into a ``bias_cache``
collection read back by RelativePE / SwinTransformerBlock; these tests
pin that (a) cached and uncached applies agree exactly, (b) the cache
fills only when explicitly requested (never during init or plain
applies), and (c) the folded fused path reads its assembled bias from
the cache too.
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

from medical_image_segmentation_with_visual_prompts_tpu.models import (
    ModelConfig, SwinUnetR, SwinTransformerBlock, prefill_bias_cache)
from medical_image_segmentation_with_visual_prompts_tpu.ops import (
    window_attention_pallas as wap)

from test_swin_unetr import TINY

X_SHAPE = (2, 32, 32, 8, 1)


def _downstream_model():
    conf = ModelConfig(training_mode="downstream", use_encoder_prompting=True,
                       use_decoder_prompting=True, **TINY)
    model = SwinUnetR(conf)
    x = jnp.zeros(X_SHAPE)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, deterministic=True)
    return model, variables


def test_prefill_matches_uncached_full_model():
    model, variables = _downstream_model()
    assert "bias_cache" not in variables  # init never creates the cache
    x = jax.random.normal(jax.random.PRNGKey(3), X_SHAPE)
    want = model.apply(variables, x, deterministic=True)["downstream"]
    cached = prefill_bias_cache(model, variables, X_SHAPE[1:4],
                                input_channels=1)
    assert "bias_cache" in cached
    flat = traverse_util.flatten_dict(cached["bias_cache"])
    assert flat, "prefill produced an empty cache"
    got = model.apply(cached, x, deterministic=True)["downstream"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_plain_apply_never_mutates_cache():
    model, variables = _downstream_model()
    x = jnp.zeros(X_SHAPE)
    # mutable batch_stats only (a training-style apply): no bias_cache
    # entries may appear even though the biases are computed.
    _, mut = model.apply(variables, x, deterministic=False,
                         rngs={"dropout": jax.random.PRNGKey(0)},
                         mutable=["batch_stats"])
    assert "bias_cache" not in mut


def test_folded_path_reads_cached_fold_bias(monkeypatch):
    # Block-level: depth 2 < window 4 puts the fused path on pad-folding;
    # the assembled fold bias must round-trip through the cache.
    monkeypatch.setattr(wap, "_FORCE_INTERPRET", True)
    blk = SwinTransformerBlock(
        hidden_channels=8, window_size=(4, 4, 4), pos_bias_embed_dim=8,
        num_heads=2, max_prompts=1, tokens_per_prompt=3,
        shift_size=(0, 0, 0), attn_impl="auto", pad_mode="aligned")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 2, 8))
    p = jnp.broadcast_to(
        jax.random.normal(jax.random.PRNGKey(1), (1, 3, 8)), (2, 3, 8))
    params = blk.init(jax.random.PRNGKey(2), x, p)
    want, mut = blk.apply(params, x, p, mutable=["bias_cache"])
    keys = list(traverse_util.flatten_dict(mut["bias_cache"]).keys())
    assert any("foldbias" in k[-1] for k in keys), keys
    got = blk.apply({**params, **mut}, x, p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
