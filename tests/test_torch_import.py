"""Reference-checkpoint importer tests.

A synthetic torch ``state_dict`` is built with the reference's EXACT key
names (swin_unetr.py:146-431, relative_positional_encoding.py:21-97) by
inverting the importer's own rules, then imported and checked for full
coverage and correct layout conversion (numerics verified against torch
ops for the conv/linear layouts).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from medical_image_segmentation_with_visual_prompts_tpu.models import (
    ModelConfig, SwinUnetR)
from medical_image_segmentation_with_visual_prompts_tpu.utils.torch_import \
    import build_key_rules, import_state_dict, load_torch

TINY = dict(
    training_mode="downstream", input_channels=1, depth_unet=2,
    hidden_channels=(8, 16, 32), input_patch_size=(2, 2, 2),
    num_heads_encoder=2, num_heads_decoder=2, attn_window_size=(4, 4, 2),
    pos_bias_embed_dim=8, tokens_per_prompt_encoder=4,
    tokens_per_prompt_decoder=4, use_encoder_prompting=True,
    use_decoder_prompting=True, output_channels_downstream=2,
    attn_impl="xla", max_prompts=1)


def _init_vars(conf):
    model = SwinUnetR(conf)
    x = jnp.zeros((1, 16, 16, 8, 1))
    return model, model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, deterministic=True)


def _synthetic_state_dict(conf, variables, rng):
    """Invert the importer rules to fabricate a torch-named state_dict
    whose (transformed) shapes match our tree."""
    from flax import traverse_util
    flat = {c: dict(traverse_util.flatten_dict(variables.get(c, {})))
            for c in ("params", "batch_stats")}
    sd = {}
    for key, rule in build_key_rules(conf).items():
        if rule is None:
            sd[key] = np.zeros((1,), np.int64)  # buffer, skipped
            continue
        coll, path, tf = rule
        ours = flat[coll][tuple(path.split("/"))]
        shape = tuple(ours.shape)
        if isinstance(tf, tuple) and tf[0] == "stack":
            val = rng.normal(size=shape[1:]).astype(np.float32)
        elif tf.__name__ == "_conv_w":
            val = rng.normal(size=(shape[4], shape[3], shape[0], shape[1],
                                   shape[2])).astype(np.float32)
        elif tf.__name__ == "_convT_w":
            val = rng.normal(size=(shape[3], shape[4], shape[0], shape[1],
                                   shape[2])).astype(np.float32)
        elif tf.__name__ == "_lin_w":
            val = rng.normal(size=(shape[1], shape[0])).astype(np.float32)
        else:
            val = rng.normal(size=shape).astype(np.float32)
        if key.endswith("running_var"):
            val = np.abs(val) + 0.5  # variances must be positive
        sd[key] = val
    return sd


def test_full_coverage_and_roundtrip():
    conf = ModelConfig(**TINY)
    model, variables = _init_vars(conf)
    rng = np.random.default_rng(0)
    sd = _synthetic_state_dict(conf, variables, rng)
    new_vars, report = import_state_dict(sd, variables, conf)
    assert not report["unmatched_torch_keys"]
    assert not report["unfilled_ours"], report["unfilled_ours"][:10]
    # Spot-check transforms: linear weights transposed, conv weights to
    # HWDIO, prompt tokens direct.
    got = new_vars["params"]["encoder_blocks_0"]["swin_blocks_0"]["attn"][
        "to_q_kernel"]
    want = sd["encoder_blocks.0.swin_blocks.0.attn.to_q.weight"].T
    np.testing.assert_array_equal(np.asarray(got), want)
    got = new_vars["params"]["input_layer_conv"]["Conv_0"]["kernel"]
    want = np.transpose(sd["input_layer.0.weight"], (2, 3, 4, 1, 0))
    np.testing.assert_array_equal(np.asarray(got), want)
    np.testing.assert_array_equal(
        np.asarray(new_vars["params"]["prompt_tokens_enc_1"]),
        sd["prompt_tokens.enc.1"])
    np.testing.assert_array_equal(
        np.asarray(new_vars["params"]["encoder_blocks_0"]["swin_blocks_0"]
                   ["pe"]["enc_token"])[0],
        sd["encoder_blocks.0.swin_blocks.0.pe.enc_token.0"])
    # BatchNorm stats landed in batch_stats.
    np.testing.assert_array_equal(
        np.asarray(new_vars["batch_stats"]["input_layer_norm"]["mean"]),
        sd["input_layer.1.running_mean"])
    # The imported model runs.
    out = model.apply(new_vars, jnp.zeros((1, 16, 16, 8, 1)),
                      deterministic=True)
    assert np.isfinite(np.asarray(out["downstream"])).all()


def test_conv_layout_matches_torch():
    """Imported conv weights reproduce torch's conv numerics."""
    rng = np.random.default_rng(1)
    w_t = rng.normal(size=(8, 3, 3, 3, 3)).astype(np.float32)  # [Co,Ci,k..]
    b_t = rng.normal(size=(8,)).astype(np.float32)
    x = rng.normal(size=(2, 3, 10, 10, 6)).astype(np.float32)  # NCHWD
    want = torch.nn.functional.conv3d(
        torch.from_numpy(x), torch.from_numpy(w_t), torch.from_numpy(b_t),
        padding=1).numpy()
    # Ours: channels-last HWDIO.
    w_j = np.transpose(w_t, (2, 3, 4, 1, 0))
    x_j = np.transpose(x, (0, 2, 3, 4, 1))
    got = jax.lax.conv_general_dilated(
        jnp.asarray(x_j), jnp.asarray(w_j), (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC")) + b_t
    got = np.transpose(np.asarray(got), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_linear_layout_matches_torch():
    rng = np.random.default_rng(2)
    w_t = rng.normal(size=(5, 7)).astype(np.float32)
    x = rng.normal(size=(4, 7)).astype(np.float32)
    want = torch.nn.functional.linear(
        torch.from_numpy(x), torch.from_numpy(w_t)).numpy()
    got = np.asarray(jnp.asarray(x) @ jnp.asarray(w_t.T))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_torch_pt_roundtrip(tmp_path):
    """load_torch reads a real torch-saved checkpoint dict."""
    conf = ModelConfig(**TINY)
    _, variables = _init_vars(conf)
    sd = _synthetic_state_dict(conf, variables, np.random.default_rng(3))
    pt = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    torch.save({"model_state_dict": pt, "current_epoch": 7},
               tmp_path / "ref.pt")
    loaded = load_torch(tmp_path / "ref.pt")
    assert set(loaded) == set(sd)
    new_vars, report = import_state_dict(loaded, variables, conf)
    assert not report["unmatched_torch_keys"]


def test_importer_rejects_shape_mismatch():
    conf = ModelConfig(**TINY)
    _, variables = _init_vars(conf)
    sd = {"input_layer.0.weight": np.zeros((3, 3, 3, 3, 3), np.float32)}
    with pytest.raises(ValueError):
        import_state_dict(sd, variables, conf)


def test_ssl_encoder_mode_rules():
    conf = ModelConfig(**{**TINY,
                          "training_mode": "self_supervised_learning_encoder",
                          "use_decoder_prompting": False})
    model = SwinUnetR(conf)
    x = jnp.zeros((1, 16, 16, 8, 1))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, deterministic=True)
    sd = _synthetic_state_dict(conf, variables, np.random.default_rng(4))
    assert any(k.startswith("extra_heads.reconstruction") for k in sd)
    assert "extra_heads.rotation_prediction.weight" in sd
    new_vars, report = import_state_dict(sd, variables, conf)
    assert not report["unmatched_torch_keys"]
    assert not report["unfilled_ours"], report["unfilled_ours"][:10]


def test_conv_transpose_layout_matches_torch():
    """flax ConvTranspose needs the spatially flipped torch kernel."""
    import flax.linen as nn
    from medical_image_segmentation_with_visual_prompts_tpu.utils.\
        torch_import import _convT_w
    rng = np.random.default_rng(5)
    ci, co = 3, 5
    w_t = rng.normal(size=(ci, co, 2, 2, 2)).astype(np.float32)
    x = rng.normal(size=(1, ci, 4, 4, 4)).astype(np.float32)
    want = torch.nn.functional.conv_transpose3d(
        torch.from_numpy(x), torch.from_numpy(w_t), stride=2).numpy()
    x_j = jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1)))

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.ConvTranspose(co, (2, 2, 2), (2, 2, 2),
                                    padding="VALID")(x)

    m = M()
    v = {"params": {"ConvTranspose_0": {"kernel": jnp.asarray(_convT_w(w_t)),
                                        "bias": jnp.zeros((co,))}}}
    got = np.transpose(np.asarray(m.apply(v, x_j)), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
