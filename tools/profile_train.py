"""Profile the canonical phase-2 (north-star) or downstream training
step on the TPU: trace one step, aggregate device op times.

Usage: python tools/profile_train.py [--which phase2|downstream] [--top 40]
"""

import argparse
import pathlib
import shutil
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  str(pathlib.Path(__file__).resolve().parents[1]
                      / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from profile_bench import aggregate_trace
from tools import bench_train_step as bts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="phase2",
                    choices=["phase2", "downstream"])
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    if args.which == "downstream":
        from medical_image_segmentation_with_visual_prompts_tpu.models \
            import SwinUnetR, partition
        from medical_image_segmentation_with_visual_prompts_tpu.train. \
            segmentation import SegmentationTrainer
        conf = bts._base_conf()
        tr = SegmentationTrainer(conf, SwinUnetR, None, None, bts._Null(),
                                 bts._Null())
        variables = tr._init_variables(conf.seg_input_size)
        labels = partition.trainable_labels(tr.model_conf)
        trainable, frozen = partition.split_params(variables["params"],
                                                   labels)
        bs = variables.get("batch_stats", {})
        tx, _ = bts._opt()
        opt_state = tx.init(trainable)
        step, _ = tr._build_steps(frozen, tx)
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.normal(0.4, 0.2, (2, 128, 128, 8, 1)),
                          jnp.float32)
        msk = jnp.asarray((rng.random((2, 128, 128, 8, 1)) > 0.7),
                          jnp.float32)
        k = jax.random.PRNGKey(0)
        fn = lambda: step(trainable, bs, opt_state, img, msk, k)[3]
    else:
        from medical_image_segmentation_with_visual_prompts_tpu.models \
            import SwinUnetR, partition
        from medical_image_segmentation_with_visual_prompts_tpu.train. \
            students_teacher import StudentsTeacherTrainer
        conf = bts._base_conf(
            training_mode="self_supervised_learning_decoder")
        tr = StudentsTeacherTrainer(conf, SwinUnetR, None, None,
                                    bts._Null(), bts._Null())
        x0 = jnp.zeros((1, *conf.roi_size, 1))
        k4 = jax.random.split(jax.random.PRNGKey(0), 4)
        sv = tr.model.init({"params": k4[0], "dropout": k4[1]}, x0,
                           deterministic=True)
        tv = tr.model.init({"params": k4[2], "dropout": k4[3]}, x0,
                           deterministic=True)
        labels = partition.trainable_labels(tr.model_conf)
        trainable, frozen = partition.split_params(sv["params"], labels)
        tx, _ = bts._opt()
        opt_state = tx.init(trainable)
        step = tr._build_step(frozen, tx, train=True)
        rng = np.random.default_rng(0)
        batch_d = {
            "image": jnp.asarray(
                rng.normal(0.4, 0.2, (2, 128, 128, 8, 1)), jnp.float32),
            "coord": jnp.asarray(
                rng.normal(0, 50, (2, 128, 128, 8, 3)), jnp.float32),
        }
        for i, size in enumerate(((96, 96, 8), (80, 80, 8))):
            batch_d[f"image_st_{i}"] = jnp.asarray(
                rng.normal(0.4, 0.2, (2, *size, 1)), jnp.float32)
            batch_d[f"coord_st_{i}"] = jnp.asarray(
                rng.normal(0, 50, (2, *size, 3)), jnp.float32)
        key = jax.random.PRNGKey(1)
        fn = lambda: step(trainable, sv.get("batch_stats", {}),
                          tv["params"], tv.get("batch_stats", {}),
                          opt_state, batch_d, key)[5]["tot"]

    out = fn()
    jax.block_until_ready(out)
    td = pathlib.Path(f"/tmp/mivp_train_trace/{args.which}")
    shutil.rmtree(td, ignore_errors=True)
    td.mkdir(parents=True)
    with jax.profiler.trace(str(td)):
        for _ in range(args.reps):
            out = fn()
        jax.block_until_ready(out)
    agg, total, path = aggregate_trace(td)
    print(f"device total: {total / 1e3 / args.reps:.2f} ms/step "
          f"(incl. nested parents)")
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:args.top]
    for name, (dur, cnt) in rows:
        print(f"{dur / 1e3 / args.reps:9.3f} ms  x{cnt:4d}  {name[:100]}")


if __name__ == "__main__":
    main()
