"""Canonical-config training-step times on the TPU (trace-based).

The phase-2 students-teacher step is the north-star metric (BASELINE.md);
with the canonical attn/proj dropout 0.1 the fused Pallas block now runs
in training too (counter-hash dropout, ops/prng.py) — previously those
steps fell back to XLA attention (docs/PERF.md r1: 44.7 ms).

Usage: python tools/bench_train_step.py [--which downstream|phase2|both]
"""

import argparse
import pathlib
import sys
from argparse import Namespace

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  str(pathlib.Path(__file__).resolve().parents[1]
                      / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tools.tputime import device_ms


def _base_conf(**kw):
    conf = dict(
        training_mode="downstream", input_channels=1, depth_unet=3,
        hidden_channels=[48, 96, 192, 384], input_patch_size=[2, 2, 2],
        unetr_res_block="none", unetr_up_block="swin", basic_block_res=True,
        res_block=False, num_heads_encoder=4, num_heads_decoder=4,
        attn_window_size=[8, 8, 4], pos_bias_embed_dim=64,
        use_checkpoint=True, attn_drop=0.1, proj_drop=0.1, max_prompts=1,
        tokens_per_prompt_encoder=64, tokens_per_prompt_decoder=64,
        use_encoder_prompting=True, use_decoder_prompting=True,
        use_reconstruction=True, use_mutual_learning=False,
        use_rotation_prediction=True, use_contrastive_learning=True,
        contrastive_coding_dim=512, output_channels_pretrain=5,
        output_channels_downstream=2, attn_impl="auto",
        pad_mode="aligned", compute_dtype="bfloat16",
        # trainer knobs
        roi_size=[128, 128, 8], seg_input_size=[128, 128, 8],
        crop_size_students=[[96, 96, 8], [80, 80, 8]],
        active_labels_downstream=[0, 1], include_background=True,
        lr_downstream=5e-4, weight_decay_downstream=0.1,
        lr_students_teacher=5e-4, weight_decay_students_teacher=0.1,
        lr_prompt_tokens=5e-4, weight_decay_prompt_tokens=0.1,
        warmup_steps_students_teacher=10, t_total_students_teacher=100,
        tau=0.9, reduction_factor=4.0, k_means_iterations=3, fwhm=4.0,
        use_prototype_assignment=True, use_real_label=False,
        view=False, seed=0, mesh_data=0,
    )
    conf.update(kw)
    return Namespace(**conf)


class _Null:
    def info(self, *a, **k):
        pass

    def add_scalar(self, *a, **k):
        pass


_REMAT = True  # set by main(); canonical steps A/B remat on/off


def bench_downstream(batch=2):
    from medical_image_segmentation_with_visual_prompts_tpu.models import \
        partition
    from medical_image_segmentation_with_visual_prompts_tpu.train.segmentation \
        import SegmentationTrainer
    from medical_image_segmentation_with_visual_prompts_tpu.models import \
        SwinUnetR
    conf = _base_conf(use_checkpoint=_REMAT)
    tr = SegmentationTrainer(conf, SwinUnetR, None, None, _Null(), _Null())
    variables = tr._init_variables(conf.seg_input_size)
    labels = partition.trainable_labels(tr.model_conf)
    trainable, frozen = partition.split_params(variables["params"], labels)
    bs = variables.get("batch_stats", {})
    tx, _ = _opt()
    opt_state = tx.init(trainable)
    step, _ = tr._build_steps(frozen, tx)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(0.4, 0.2, (batch, 128, 128, 8, 1)),
                      jnp.float32)
    msk = jnp.asarray((rng.random((batch, 128, 128, 8, 1)) > 0.7),
                      jnp.float32)
    k = jax.random.PRNGKey(0)
    valid = jnp.ones((batch,), jnp.float32)
    fn = lambda *a: step(*a)[3]
    ms = device_ms(fn, trainable, bs, opt_state, img, msk, k, valid)
    mfu = _mfu_pct(fn, ms, trainable, bs, opt_state, img, msk, k, valid)
    print(f"downstream step (batch {batch}, dropout 0.1): {ms:.2f} ms"
          f"{mfu}")


def _mfu_pct(fn, ms, *args, peak_tflops: float = 197.0) -> str:
    """Train-step MFU from XLA's own flop count for the WHOLE jitted
    step (fwd + bwd + optimizer; remat recompute flops are counted by
    XLA, so the no-remat number is the honest model-flops one)."""
    try:
        cost = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        if flops <= 0:
            return ""
        mfu = flops / (ms * 1e-3) / (peak_tflops * 1e12) * 100
        return (f"  [xla_flops {flops / 1e9:.1f} G, "
                f"mfu {mfu:.1f}%]")
    except Exception:  # noqa: BLE001 - cost analysis is best-effort
        return ""


def _opt():
    import optax
    from medical_image_segmentation_with_visual_prompts_tpu.train.common \
        import adamw
    tx = optax.inject_hyperparams(adamw)(lr=5e-4, weight_decay=0.1)
    return tx, None


def bench_phase2(batch=2):
    from medical_image_segmentation_with_visual_prompts_tpu.models import \
        SwinUnetR, partition
    from medical_image_segmentation_with_visual_prompts_tpu.train.\
        students_teacher import StudentsTeacherTrainer
    conf = _base_conf(training_mode="self_supervised_learning_decoder",
                      use_checkpoint=_REMAT)
    tr = StudentsTeacherTrainer(conf, SwinUnetR, None, None, _Null(), _Null())
    x0 = jnp.zeros((1, *conf.roi_size, 1))
    k = jax.random.split(jax.random.PRNGKey(0), 4)
    sv = tr.model.init({"params": k[0], "dropout": k[1]}, x0,
                       deterministic=True)
    tv = tr.model.init({"params": k[2], "dropout": k[3]}, x0,
                       deterministic=True)
    labels = partition.trainable_labels(tr.model_conf)
    trainable, frozen = partition.split_params(sv["params"], labels)
    tx, _ = _opt()
    opt_state = tx.init(trainable)
    step = tr._build_step(frozen, tx, train=True)
    rng = np.random.default_rng(0)
    batch_d = {
        "image": jnp.asarray(rng.normal(0.4, 0.2, (batch, 128, 128, 8, 1)),
                             jnp.float32),
        "coord": jnp.asarray(rng.normal(0, 50, (batch, 128, 128, 8, 3)),
                             jnp.float32),
    }
    for i, size in enumerate(((96, 96, 8), (80, 80, 8))):
        batch_d[f"image_st_{i}"] = jnp.asarray(
            rng.normal(0.4, 0.2, (batch, *size, 1)), jnp.float32)
        batch_d[f"coord_st_{i}"] = jnp.asarray(
            rng.normal(0, 50, (batch, *size, 3)), jnp.float32)
    key = jax.random.PRNGKey(1)
    fn = lambda tr_, sbs, tp, tbs, os_, bd, kk: step(
        tr_, sbs, tp, tbs, os_, bd, kk)[5]["tot"]
    fargs = (trainable, sv.get("batch_stats", {}), tv["params"],
             tv.get("batch_stats", {}), opt_state, batch_d, key)
    ms = device_ms(fn, *fargs)
    mfu = _mfu_pct(fn, ms, *fargs)
    print(f"phase-2 step (batch {batch}, 2 students, dropout 0.1, "
          f"north-star): {ms:.2f} ms{mfu}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="both",
                    choices=["downstream", "phase2", "both"])
    ap.add_argument("--no-remat", action="store_true",
                    help="use_checkpoint=False (activations fit HBM at "
                         "the canonical batch; remat is pure recompute)")
    args = ap.parse_args()
    _REMAT = not args.no_remat
    if args.which in ("downstream", "both"):
        bench_downstream()
    if args.which in ("phase2", "both"):
        bench_phase2()
