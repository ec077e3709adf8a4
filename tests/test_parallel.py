"""Data-parallel mesh training and device-side sliding-window tests."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from medical_image_segmentation_with_visual_prompts_tpu.models import (
    ModelConfig, SwinUnetR, partition)
from medical_image_segmentation_with_visual_prompts_tpu.parallel import (
    make_dp_serving_step, make_dp_train_step, make_mesh,
    make_sliding_window_fn, pad_starts, replicate, shard_batch,
    window_starts)
from medical_image_segmentation_with_visual_prompts_tpu.train.common import \
    adamw

TINY = dict(
    training_mode="downstream", input_channels=1, depth_unet=2,
    hidden_channels=(8, 16, 32), input_patch_size=(2, 2, 2),
    num_heads_encoder=2, num_heads_decoder=2, attn_window_size=(4, 4, 2),
    pos_bias_embed_dim=8, tokens_per_prompt_encoder=4,
    tokens_per_prompt_decoder=4, use_encoder_prompting=True,
    use_decoder_prompting=True, output_channels_downstream=2,
    attn_impl="xla", attn_drop=0.0, proj_drop=0.0)


def _model_and_vars(batch=1, size=(16, 16, 8)):
    conf = ModelConfig(**TINY)
    model = SwinUnetR(conf)
    x = jnp.zeros((batch, *size, 1))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, deterministic=True)
    return conf, model, variables


def test_dp_train_step_runs_on_8_device_mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    conf, model, variables = _model_and_vars()
    mesh = make_mesh(8)
    labels = partition.trainable_labels(conf)
    trainable, frozen = partition.split_params(variables["params"], labels)
    batch_stats = variables.get("batch_stats", {})
    tx = adamw(1e-3, 0.0)
    opt_state = tx.init(trainable)
    step = make_dp_train_step(model, tx, frozen, mesh, active_labels=(0, 1))
    trainable = replicate(mesh, trainable)
    batch_stats = replicate(mesh, batch_stats)
    opt_state = replicate(mesh, opt_state)
    rng = np.random.default_rng(0)
    batch = shard_batch(mesh, {
        "image": jnp.asarray(rng.normal(size=(8, 16, 16, 8, 1)),
                             jnp.float32),
        "mask": jnp.asarray(rng.integers(0, 2, (8, 16, 16, 8, 1)),
                            jnp.float32)})
    rng_key = jax.device_put(
        jax.random.PRNGKey(0),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))
    new_tr, new_bs, new_opt, loss = step(
        trainable, batch_stats, opt_state, batch["image"], batch["mask"],
        rng_key)
    assert np.isfinite(float(loss))
    # Parameters changed and stayed replicated.
    delta = sum(float(jnp.abs(a - b).sum()) for a, b in zip(
        jax.tree_util.tree_leaves(new_tr),
        jax.tree_util.tree_leaves(trainable)))
    assert delta > 0


def test_dp_matches_single_device_gradients():
    """DP mean loss/update over the mesh == single-device full batch."""
    conf, model, variables = _model_and_vars()
    labels = partition.trainable_labels(conf)
    trainable, frozen = partition.split_params(variables["params"], labels)
    batch_stats = variables.get("batch_stats", {})
    tx = adamw(1e-3, 0.0)
    opt_state = tx.init(trainable)
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.normal(size=(8, 16, 16, 8, 1)), jnp.float32)
    mask = jnp.asarray(rng.integers(0, 2, (8, 16, 16, 8, 1)), jnp.float32)
    rng_key = jax.random.PRNGKey(0)

    mesh = make_mesh(8)
    step = make_dp_train_step(model, tx, frozen, mesh, active_labels=(0, 1))
    sh = shard_batch(mesh, {"image": image, "mask": mask})
    rk = jax.device_put(rng_key, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec()))
    tr_dp, _, _, loss_dp = step(replicate(mesh, trainable),
                                replicate(mesh, batch_stats),
                                replicate(mesh, opt_state),
                                sh["image"], sh["mask"], rk)

    mesh1 = make_mesh(1)
    step1 = make_dp_train_step(model, tx, frozen, mesh1,
                               active_labels=(0, 1))
    sh1 = shard_batch(mesh1, {"image": image, "mask": mask})
    rk1 = jax.device_put(rng_key, jax.sharding.NamedSharding(
        mesh1, jax.sharding.PartitionSpec()))
    tr_1, _, _, loss_1 = step1(replicate(mesh1, trainable),
                               replicate(mesh1, batch_stats),
                               replicate(mesh1, opt_state),
                               sh1["image"], sh1["mask"], rk1)
    assert abs(float(loss_dp) - float(loss_1)) < 1e-4
    for a, b in zip(jax.tree_util.tree_leaves(tr_dp),
                    jax.tree_util.tree_leaves(tr_1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_dp_serving_step():
    conf, model, variables = _model_and_vars()
    mesh = make_mesh(8)
    serve = make_dp_serving_step(model, variables, mesh)
    windows = jnp.zeros((16, 16, 16, 8, 1))
    sh = shard_batch(mesh, {"w": windows})
    out = serve(sh["w"])
    assert out.shape == (16, 16, 16, 8, 2)


def test_window_starts_matches_reference_grid():
    slices, starts, grid_shape = window_starts((24, 24, 12), (16, 16, 8))
    assert grid_shape == (2, 2, 2)
    # adjusted = (24-16)//8*8+16 = 24 -> no crop; starts 0, 8 per h/w axis;
    # depth: (12-8)//4*4+8 = 12 -> starts 0, 4.
    assert slices == (slice(0, 24), slice(0, 24), slice(0, 12))
    assert starts.shape == (2 * 2 * 2, 3)
    padded, n_valid = pad_starts(starts, 10)
    assert n_valid == 8 and padded.shape[0] == 10


def test_gaussian_sliding_window_constant_volume():
    """A constant-output model stitches to that constant everywhere."""
    num_classes = 3

    def apply_fn(batch):
        # logits favoring class 2 everywhere
        base = jnp.zeros(batch.shape[:-1] + (num_classes,))
        return base.at[..., 2].set(5.0)

    roi = (8, 8, 4)
    vol_shape = (16, 16, 8)
    slices, starts, grid_shape = window_starts(vol_shape, roi)
    run = make_sliding_window_fn(apply_fn, roi, chunk=4,
                                 num_classes=num_classes, mode="gaussian",
                                 grid_shape=grid_shape)
    starts, n_valid = pad_starts(starts, 4)
    vol = jnp.zeros((*vol_shape, 1))
    probs = run(vol, jnp.asarray(starts), n_valid)
    assert probs.shape == (*vol_shape, num_classes)
    pred = np.asarray(jnp.argmax(probs, -1))
    assert (pred == 2).all()


def test_per_window_sliding_matches_direct_forward():
    conf, model, variables = _model_and_vars(size=(16, 16, 8))

    def apply_fn(batch):
        return model.apply(variables, batch, deterministic=True)["downstream"]

    roi = (16, 16, 8)
    run = make_sliding_window_fn(apply_fn, roi, chunk=2, num_classes=2,
                                 mode="per_window")
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.normal(size=(24, 24, 8, 1)), jnp.float32)
    slices, starts, _ = window_starts((24, 24, 8), roi)
    vol_c = vol[slices[0], slices[1], slices[2]]
    starts_p, n_valid = pad_starts(starts, 2)
    preds = run(vol_c, jnp.asarray(starts_p), n_valid)
    # Compare window 0 against a direct forward of the same window.
    w0 = vol_c[None, :16, :16, :8]
    direct = jnp.argmax(apply_fn(w0), -1)[0]
    np.testing.assert_array_equal(np.asarray(preds[0]), np.asarray(direct))


def test_gaussian_stitch_matches_bruteforce():
    """Coset stitching == naive numpy scatter accumulation."""
    from medical_image_segmentation_with_visual_prompts_tpu.parallel.sliding_window import (
        _gaussian_importance)
    num_classes = 2
    roi = (8, 8, 4)

    def apply_fn(batch):
        # Content-dependent logits so overlaps actually blend.
        return jnp.concatenate([batch, -batch], axis=-1) * 3.0

    vol_shape = (16, 16, 8)
    slices, starts, grid_shape = window_starts(vol_shape, roi)
    run = make_sliding_window_fn(apply_fn, roi, chunk=4,
                                 num_classes=num_classes, mode="gaussian",
                                 grid_shape=grid_shape)
    rng = np.random.default_rng(0)
    vol = rng.normal(size=(*vol_shape, 1)).astype(np.float32)
    starts_p, n_valid = pad_starts(starts, 4)
    got = np.asarray(run(jnp.asarray(vol), jnp.asarray(starts_p), n_valid))

    gauss = _gaussian_importance(roi)[..., None]
    acc = np.zeros((*vol_shape, num_classes), np.float32)
    wacc = np.zeros((*vol_shape, 1), np.float32)
    for s in starts:
        w = vol[s[0]:s[0]+8, s[1]:s[1]+8, s[2]:s[2]+4]
        logits = np.concatenate([w, -w], axis=-1) * 3.0
        e = np.exp(logits - logits.max(-1, keepdims=True))
        probs = e / e.sum(-1, keepdims=True)
        acc[s[0]:s[0]+8, s[1]:s[1]+8, s[2]:s[2]+4] += probs * gauss
        wacc[s[0]:s[0]+8, s[1]:s[1]+8, s[2]:s[2]+4] += gauss
    want = acc / np.maximum(wacc, 1e-8)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ema_update_under_dp_mesh():
    """EMA teacher blending stays correct and replicated across the mesh
    (SURVEY.md §4 'EMA under DP')."""
    from medical_image_segmentation_with_visual_prompts_tpu.train.common import \
        ema_update
    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    student = {"a": jnp.asarray(rng.normal(size=(4, 4)), jnp.float32),
               "b": jnp.asarray(rng.normal(size=(3,)), jnp.float32)}
    teacher = {"a": jnp.zeros((4, 4)), "b": jnp.ones((3,))}
    student_r = replicate(mesh, student)
    teacher_r = replicate(mesh, teacher)
    blended = jax.jit(lambda t, s: ema_update(t, s, 0.99))(teacher_r,
                                                           student_r)
    want = jax.tree_util.tree_map(lambda t, s: 0.99 * t + 0.01 * s,
                                  teacher, student)
    for k in ("a", "b"):
        np.testing.assert_allclose(np.asarray(blended[k]),
                                   np.asarray(want[k]), rtol=1e-6)
        # Fully replicated output (one shard spans all devices' data).
        assert blended[k].sharding.is_fully_replicated


def test_bucketed_inference_program_count_and_exactness():
    """5 volumes of 5 shapes -> <=2 compiled programs; results equal the
    unbucketed per-shape run (VERDICT item 6)."""
    from medical_image_segmentation_with_visual_prompts_tpu.parallel import (
        BucketedInference)
    conf, model, variables = _model_and_vars(batch=1, size=(16, 16, 8))
    roi = (16, 16, 8)

    def apply_fn(batch):
        return model.apply(variables, batch, deterministic=True)["downstream"]

    runner = BucketedInference(apply_fn, roi, chunk=4, num_classes=2)
    rng = np.random.default_rng(0)
    shapes = [(24, 24, 8), (24, 32, 8), (32, 24, 8), (24, 24, 12),
              (32, 32, 12)]
    for shape in shapes:
        _, starts, grid_shape = window_starts(shape, roi)
        vol = rng.normal(0.4, 0.2, size=(*shape, 1)).astype(np.float32)
        got = np.asarray(runner(jnp.asarray(vol)))
        # Unbucketed reference run.
        run = make_sliding_window_fn(apply_fn, roi, 4, 2, mode="gaussian",
                                     grid_shape=grid_shape)
        starts_p, n_valid = pad_starts(starts, 4)
        want = np.asarray(run(jnp.asarray(vol), jnp.asarray(starts_p),
                              n_valid))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # Buckets: dims round up to roi multiples -> (32,32,16) x ... count.
    assert runner.compiled_programs <= 2, runner.compiled_programs


def test_precomputed_weight_acc_matches_device_stitch():
    """run(..., weight_acc=host_map) == run(...) with on-device weight
    stitching, for both validity forms (leading count and 0/1 vector)."""
    from medical_image_segmentation_with_visual_prompts_tpu.parallel import (
        bucketed_starts, gaussian_weight_acc)
    roi = (8, 8, 4)

    def apply_fn(batch):
        return jnp.concatenate([batch, -batch], axis=-1) * 3.0

    rng = np.random.default_rng(1)
    # Leading-count validity (aligned grid with chunk padding).
    vol_shape = (16, 16, 8)
    _, starts, grid_shape = window_starts(vol_shape, roi)
    run = make_sliding_window_fn(apply_fn, roi, chunk=4, num_classes=2,
                                 mode="gaussian", grid_shape=grid_shape)
    vol = jnp.asarray(rng.normal(size=(*vol_shape, 1)).astype(np.float32))
    starts_p, n_valid = pad_starts(starts, 4)
    want = np.asarray(run(vol, jnp.asarray(starts_p), n_valid))
    wacc = jnp.asarray(gaussian_weight_acc(starts_p, n_valid, roi,
                                           vol_shape))
    got = np.asarray(run(vol, jnp.asarray(starts_p), n_valid, wacc))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    # Per-window validity vector (bucketed grid: some windows invalid).
    dims = (24, 20, 8)
    bucket = (24, 24, 8)
    starts, valid, grid_shape = bucketed_starts(dims, roi)
    run = make_sliding_window_fn(apply_fn, roi, chunk=4, num_classes=2,
                                 mode="gaussian", grid_shape=grid_shape)
    volb = jnp.asarray(rng.normal(size=(*bucket, 1)).astype(np.float32))
    starts_p, vvec = pad_starts(starts, 4, valid)
    want = np.asarray(run(volb, jnp.asarray(starts_p), jnp.asarray(vvec)))
    wacc = jnp.asarray(gaussian_weight_acc(starts_p, vvec, roi, bucket))
    got = np.asarray(run(volb, jnp.asarray(starts_p), jnp.asarray(vvec),
                         wacc))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_wacc_cache_is_lru_bounded():
    """The blend-weight cache must not grow past its bound over a
    heterogeneous shape stream (each entry pins a bucket-sized fp32
    device array)."""
    from medical_image_segmentation_with_visual_prompts_tpu.parallel import (
        BucketedInference)
    roi = (8, 8, 4)

    def apply_fn(batch):
        return jnp.concatenate([batch, -batch], axis=-1)

    runner = BucketedInference(apply_fn, roi, chunk=4, num_classes=2)
    runner._waccs_max = 3
    rng = np.random.default_rng(0)
    shapes = [(16 + 4 * i, 16, 8) for i in range(5)]
    for shape in shapes:
        runner(jnp.asarray(rng.normal(size=(*shape, 1)).astype(np.float32)))
    assert len(runner._waccs) <= 3
    # Most-recent keys survive.
    assert ((32, 16, 8), shapes[-1]) in runner._waccs


def test_pad_starts_validity_vector():
    from medical_image_segmentation_with_visual_prompts_tpu.parallel import (
        bucketed_starts)
    starts, valid, grid_shape = bucketed_starts((24, 24, 8), (16, 16, 8))
    # bucket (32, 32, 8): grid 3x3x1; real grid 2x2x1.
    assert grid_shape == (3, 3, 1)
    assert valid.sum() == 4
    padded, vvec = pad_starts(starts, 4, valid)
    assert padded.shape[0] % 4 == 0
    assert vvec.sum() == 4 and vvec.dtype == np.int32


def test_distributed_helpers_single_process():
    from argparse import Namespace
    from medical_image_segmentation_with_visual_prompts_tpu.parallel.\
        distributed import maybe_initialize_distributed, stage_global_batch
    # Off by default: no-op, no backend re-init.
    assert maybe_initialize_distributed(Namespace()) is False
    assert maybe_initialize_distributed(
        Namespace(distributed=False)) is False
    # Single-process staging through the multi-host assembly API.
    mesh = make_mesh(8)
    batch = {"image": np.ones((8, 4, 4, 2, 1), np.float32), "name": ["a"]}
    staged = stage_global_batch(mesh, batch)
    assert staged["image"].shape == (8, 4, 4, 2, 1)
    assert len(staged["image"].sharding.device_set) == 8
    assert staged["name"] == ["a"]
