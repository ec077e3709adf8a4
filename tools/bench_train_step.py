"""Canonical-config training-step times + honest MFU on the TPU.

The phase-2 students-teacher step is the north-star metric (BASELINE.md);
with the canonical attn/proj dropout 0.1 the fused Pallas block runs in
training too (counter-hash dropout, ops/prng.py).

MFU accounting (VERDICT r3 item 5): XLA's cost analysis of the measured
program counts the Pallas backward kernel's CostEstimate flops (a coarse
DMA-scheduling hint), not the true backward matmul work — so the MFU here
is computed from the MODEL flops of the reference-equivalent step: the
same train step lowered on the CPU backend with ``attn_impl='xla'`` and
remat OFF (no recompute counted, freezing/optimizer structure included),
read from XLA's analytic HLO cost.  That count is cached in
``.jax_cache/train_model_flops.json`` and obtained in a CPU subprocess
(the axon TPU backend exposes no HLO cost analysis).

Usage: python tools/bench_train_step.py [--which downstream|phase2|both]
       python tools/bench_train_step.py --flops-only --which both  # CPU
"""

import argparse
import json
import pathlib
import subprocess
import sys
from argparse import Namespace

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

# --flops-only must force the CPU platform BEFORE any backend init.
_FLOPS_ONLY = "--flops-only" in sys.argv

import jax  # noqa: E402

if _FLOPS_ONLY:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

FLOPS_CACHE = REPO / ".jax_cache" / "train_model_flops.json"
FLOPS_VERSION = "v1-b2-canonical"


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


def _opt():
    import optax

    from medical_image_segmentation_with_visual_prompts_tpu.train.common \
        import adamw
    tx = optax.inject_hyperparams(adamw)(lr=5e-4, weight_decay=0.1)
    return tx, None


def build_downstream(batch=2, remat=True, attn_impl="auto"):
    """Return ``(fn, fargs)`` for the canonical downstream train step."""
    from medical_image_segmentation_with_visual_prompts_tpu.models import (
        SwinUnetR, partition)
    from medical_image_segmentation_with_visual_prompts_tpu.train.\
        segmentation import SegmentationTrainer
    conf = _base_conf(use_checkpoint=remat, attn_impl=attn_impl)
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
    return fn, (trainable, bs, opt_state, img, msk, k, valid), step


def build_phase2(batch=2, remat=True, attn_impl="auto"):
    """Return ``(fn, fargs)`` for the canonical phase-2 train step."""
    from medical_image_segmentation_with_visual_prompts_tpu.models import (
        SwinUnetR, partition)
    from medical_image_segmentation_with_visual_prompts_tpu.train.\
        students_teacher import StudentsTeacherTrainer
    conf = _base_conf(training_mode="self_supervised_learning_decoder",
                      use_checkpoint=remat, attn_impl=attn_impl)
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
    return fn, fargs, step


_BUILDERS = {"downstream": build_downstream, "phase2": build_phase2}


def _count_flops(which: str, batch: int = 2) -> float:
    """Analytic model flops of the step (CPU backend, XLA attention,
    remat off — no recompute, freezing included)."""
    from medical_image_segmentation_with_visual_prompts_tpu.utils.flops \
        import lowered_flops
    _, fargs, step = _BUILDERS[which](batch=batch, remat=False,
                                      attn_impl="xla")
    # Lower the FULL step (all outputs): lowering a loss-only wrapper
    # lets XLA dead-code-eliminate the backward + optimizer and halves
    # the count.
    return lowered_flops(step, *fargs)


def model_step_flops(which: str, batch: int = 2) -> float:
    """Cached model-flop count; computed in a CPU subprocess when the
    current process runs on the TPU backend."""
    key = f"{FLOPS_VERSION}-{which}" if batch == 2 \
        else f"{FLOPS_VERSION}-{which}-b{batch}"
    cache = {}
    if FLOPS_CACHE.exists():
        cache = json.loads(FLOPS_CACHE.read_text())
    if key in cache:
        return cache[key]
    if jax.default_backend() == "cpu":
        flops = _count_flops(which, batch)
    else:
        out = subprocess.run(
            [sys.executable, __file__, "--flops-only", "--which", which,
             "--batch", str(batch)],
            capture_output=True, text=True, cwd=REPO, timeout=1800)
        if out.returncode != 0:
            raise RuntimeError(f"flops subprocess failed:\n{out.stderr[-2000:]}")
        flops = json.loads(out.stdout.strip().splitlines()[-1])[which]
    FLOPS_CACHE.parent.mkdir(exist_ok=True)
    cache[key] = flops
    FLOPS_CACHE.write_text(json.dumps(cache, indent=1))
    return flops


def bench(which: str, batch=2, remat=True, mfu=True):
    from tools.tputime import device_ms

    from medical_image_segmentation_with_visual_prompts_tpu.utils.flops \
        import chip_peak_tflops
    fn, fargs, _ = _BUILDERS[which](batch=batch, remat=remat)
    ms = device_ms(fn, *fargs)
    label = {"downstream": "downstream step",
             "phase2": "phase-2 step (2 students, north-star)"}[which]
    line = f"{label} (batch {batch}, dropout 0.1): {ms:.2f} ms"
    if mfu:
        try:
            flops = model_step_flops(which, batch)
            peak = chip_peak_tflops()
            pct = flops / (ms * 1e-3) / (peak * 1e12) * 100
            line += (f"  [model {flops / 1e9:.1f} GFLOP, "
                     f"train MFU {pct:.1f}% of {peak:.0f} TF/s]")
        except Exception as e:  # noqa: BLE001 - accounting is best-effort
            line += f"  [mfu accounting failed: {e}]"
    print(line)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="both",
                    choices=["downstream", "phase2", "both"])
    ap.add_argument("--no-remat", action="store_true",
                    help="use_checkpoint=False (activations fit HBM at "
                         "the canonical batch; remat is pure recompute)")
    ap.add_argument("--flops-only", action="store_true",
                    help="print model-flop counts as JSON (CPU backend)")
    ap.add_argument("--no-mfu", action="store_true")
    ap.add_argument("--batch", default="2",
                    help="batch size, or comma list for a scaling sweep "
                         "(e.g. 2,4,8 — VERDICT r4 item 5: if the "
                         "latency-bound explanation of the low train MFU "
                         "holds, ms/step must scale sub-linearly)")
    args = ap.parse_args()
    whats = ["downstream", "phase2"] if args.which == "both" else [args.which]
    batches = [int(b) for b in str(args.batch).split(",")]
    if args.flops_only:
        print(json.dumps({w: _count_flops(w, batches[0]) for w in whats}))
    else:
        for w in whats:
            for b in batches:
                bench(w, batch=b, remat=not args.no_remat,
                      mfu=not args.no_mfu)
