"""Full-model tests: forward modes, shapes, partitioning, freezing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from medical_image_segmentation_with_visual_prompts_tpu.models import (
    ModelConfig, SwinUnetR, partition)

# Tiny CPU-friendly config: 2D-thin volumes (driver config 1 style),
# depth 2, small channels/windows.
TINY = dict(
    input_channels=1,
    depth_unet=2,
    hidden_channels=(8, 16, 32),
    # Note: the output layer hardcodes a (2,2,2) upsample (ref :350-355),
    # so the patch embed must also reduce depth by 2 for the latent map to
    # recover the input resolution.
    input_patch_size=(2, 2, 2),
    unetr_res_block="none",
    unetr_up_block="swin",
    num_heads_encoder=2,
    num_heads_decoder=2,
    attn_window_size=(4, 4, 2),
    pos_bias_embed_dim=8,
    use_checkpoint=False,
    attn_drop=0.0,
    proj_drop=0.0,
    max_prompts=1,
    tokens_per_prompt_encoder=4,
    tokens_per_prompt_decoder=4,
    contrastive_coding_dim=16,
    output_channels_pretrain=3,
    output_channels_downstream=2,
    attn_impl="xla",
)
# Depth 8: PatchMerging pads odd depths unconditionally (a
# reference quirk, down.py:23-28), so depths must stay even
# through the encoder for shapes to invert cleanly.
X_SHAPE = (2, 32, 32, 8, 1)  # [B, H, W, D, C]


def _init(conf: ModelConfig, x):
    model = SwinUnetR(conf)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, deterministic=True)
    return model, variables


def test_downstream_forward_shape():
    conf = ModelConfig(training_mode="downstream", use_encoder_prompting=True,
                       use_decoder_prompting=True, **TINY)
    x = jnp.zeros(X_SHAPE)
    model, variables = _init(conf, x)
    out = model.apply(variables, x, deterministic=True,
                      mutable=["batch_stats"])[0]
    assert set(out.keys()) == {"downstream"}
    assert out["downstream"].shape == (2, 32, 32, 8, 2)


def test_ssl_encoder_forward_heads():
    conf = ModelConfig(training_mode="self_supervised_learning_encoder",
                       use_encoder_prompting=True, **TINY)
    x = jnp.zeros(X_SHAPE)
    model, variables = _init(conf, x)
    out = model.apply(variables, x, deterministic=True,
                      mutable=["batch_stats"])[0]
    assert out["reconstruction"].shape == X_SHAPE
    assert out["rotation_prediction"].shape == (2, 4)
    assert out["contrastive_coding"].shape == (2, 16)
    # out_vit: depth+2 feature maps, deepest first, raw input last.
    assert len(out["out_vit"]) == 4
    assert out["out_vit"][-1].shape == X_SHAPE


def test_ssl_decoder_latent_full_resolution():
    conf = ModelConfig(training_mode="self_supervised_learning_all",
                       use_decoder_prompting=True, **TINY)
    x = jnp.zeros(X_SHAPE)
    model, variables = _init(conf, x)
    out = model.apply(variables, x, deterministic=True,
                      mutable=["batch_stats"])[0]
    assert out["latent_outputs"].shape == (2, 32, 32, 8, 8)


def test_supervised_decoder_seg_pred():
    conf = ModelConfig(training_mode="supervised_learning_decoder", **TINY)
    x = jnp.zeros(X_SHAPE)
    model, variables = _init(conf, x)
    out = model.apply(variables, x, deterministic=True,
                      mutable=["batch_stats"])[0]
    assert out["seg_pred"].shape == (2, 32, 32, 8, 3)


def test_res_block_simple_with_swin_output_layer():
    kw = dict(TINY)
    kw["unetr_res_block"] = "simple"
    conf = ModelConfig(training_mode="downstream", use_decoder_prompting=True,
                       **kw)
    x = jnp.zeros(X_SHAPE)
    model, variables = _init(conf, x)
    out = model.apply(variables, x, deterministic=True,
                      mutable=["batch_stats"])[0]
    assert out["downstream"].shape == (2, 32, 32, 8, 2)
    # 'out' prompt tokens exist in this configuration (ref :423-431).
    assert "prompt_tokens_out_0" in variables["params"]


def test_partition_labels_cover_all_params():
    conf = ModelConfig(training_mode="downstream", use_encoder_prompting=True,
                       use_decoder_prompting=True, **TINY)
    x = jnp.zeros(X_SHAPE)
    _, variables = _init(conf, x)
    labels = partition.param_labels(variables["params"])
    flat = traverse_util.flatten_dict(labels)
    assert set(flat.values()) <= {
        "encoder_body", "encoder_bias_content", "encoder_prompt",
        "decoder_body", "decoder_bias_content", "decoder_prompt",
        "head_ssl", "head_segmentation", "head_downstream"}
    # Downstream-trainable set: prompts + head only (ref :433-441).
    train = partition.trainable_labels(conf)
    assert train == {"encoder_prompt", "decoder_prompt", "head_downstream"}
    trainable, frozen = partition.split_params(variables["params"], train)
    n_train = sum(np.size(v) for v in jax.tree_util.tree_leaves(trainable))
    n_total = sum(np.size(v) for v in jax.tree_util.tree_leaves(
        variables["params"]))
    assert 0 < n_train < n_total
    merged = partition.merge_params(trainable, frozen)
    assert jax.tree_util.tree_structure(merged) == \
        jax.tree_util.tree_structure(variables["params"])


def test_prompt_tokens_affect_output_only_when_enabled():
    x = jnp.asarray(np.random.default_rng(0).normal(size=X_SHAPE),
                    dtype=jnp.float32)
    conf = ModelConfig(training_mode="downstream", use_encoder_prompting=True,
                       use_decoder_prompting=True, **TINY)
    model, variables = _init(conf, x)
    out1 = model.apply(variables, x, deterministic=True,
                       mutable=["batch_stats"])[0]["downstream"]
    # Perturb one encoder prompt token: output must change.
    v2 = jax.tree_util.tree_map(lambda v: v, variables)
    p = v2["params"]["prompt_tokens_enc_0"]
    v2["params"]["prompt_tokens_enc_0"] = p + 1.0
    out2 = model.apply(v2, x, deterministic=True,
                       mutable=["batch_stats"])[0]["downstream"]
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_grad_flows_only_to_trainable_in_downstream():
    conf = ModelConfig(training_mode="downstream", use_encoder_prompting=True,
                       use_decoder_prompting=True, **TINY)
    x = jnp.asarray(np.random.default_rng(0).normal(size=X_SHAPE),
                    dtype=jnp.float32)
    model, variables = _init(conf, x)
    train_labels = partition.trainable_labels(conf)
    trainable, frozen = partition.split_params(variables["params"],
                                               train_labels)

    def loss_fn(tr):
        params = partition.merge_params(tr, frozen)
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, deterministic=True, mutable=["batch_stats"])
        return jnp.sum(out["downstream"] ** 2)

    grads = jax.grad(loss_fn)(trainable)
    total = sum(float(jnp.abs(g).sum())
                for g in jax.tree_util.tree_leaves(grads))
    assert total > 0


def test_bfloat16_compute_close_to_fp32():
    kw = dict(TINY)
    conf32 = ModelConfig(training_mode="downstream",
                         use_encoder_prompting=True,
                         use_decoder_prompting=True, **kw)
    kw16 = dict(kw)
    kw16["compute_dtype"] = "bfloat16"
    conf16 = ModelConfig(training_mode="downstream",
                         use_encoder_prompting=True,
                         use_decoder_prompting=True, **kw16)
    x = jnp.asarray(np.random.default_rng(0).normal(size=X_SHAPE),
                    dtype=jnp.float32)
    m32, v32 = _init(conf32, x)
    m16 = SwinUnetR(conf16)
    out32 = m32.apply(v32, x, deterministic=True,
                      mutable=["batch_stats"])[0]["downstream"]
    out16 = m16.apply(v32, x, deterministic=True,
                      mutable=["batch_stats"])[0]["downstream"]
    assert out16.dtype == jnp.float32  # heads upcast for losses
    # bf16 trunk: logits agree to bf16-level tolerance; argmax mostly equal.
    err = np.abs(np.asarray(out32) - np.asarray(out16))
    scale = np.abs(np.asarray(out32)).mean() + 1e-6
    assert err.mean() / scale < 0.1
    agree = (np.argmax(np.asarray(out32), -1)
             == np.argmax(np.asarray(out16), -1)).mean()
    assert agree > 0.95


def test_full_res_block_unetr_up_path():
    # unetr_res_block='full' + unetr_up_block='unetr' exercises the MONAI-
    # equivalent UnetrBasicBlock / UnetrUpBlock decoder (ref :248-289,
    # :338-348).
    kw = dict(TINY)
    kw["unetr_res_block"] = "full"
    kw["unetr_up_block"] = "unetr"
    conf = ModelConfig(training_mode="downstream", **kw)
    x = jnp.zeros((1,) + X_SHAPE[1:])
    model, variables = _init(conf, x)
    out = model.apply(variables, x, deterministic=True,
                      mutable=["batch_stats"])[0]
    assert out["downstream"].shape == (1, 32, 32, 8, 2)


def test_patch_embed_folded_matches_conv_bn():
    """TPU-inference folded patch embed (space-to-depth matmul with BN
    running stats folded in) == input conv + BatchNorm(inference)."""
    conf = ModelConfig(training_mode="downstream", **TINY)
    x = jax.random.normal(jax.random.PRNGKey(3), X_SHAPE, jnp.float32)
    model, variables = _init(conf, x)
    # Perturb BN running stats so the folding is non-trivial.
    stats = variables["batch_stats"]["input_layer_norm"]
    key_m, key_v = jax.random.split(jax.random.PRNGKey(4))
    stats["mean"] = 0.3 * jax.random.normal(key_m, stats["mean"].shape)
    stats["var"] = jnp.exp(jax.random.normal(key_v, stats["var"].shape))

    bound = model.bind(variables)
    want = bound.input_layer_norm(
        bound.input_layer_conv(x), use_running_average=True)
    got = bound._patch_embed_folded(x)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
