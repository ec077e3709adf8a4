"""Phase-2 student-teacher clustered-prototype distillation trainer.

Parity with the reference ``StudentsTeacherTrainer`` + ``MomentumModel``
(/root/reference/src/modules/students_teacher.py:11-311,
momentum_model.py:4-35):

* student and teacher are two SwinUnetR instances; the teacher starts at
  its own random init (the reference never copies at construction) and
  is EMA-blended toward the student with τ=``tau`` *before* each step's
  forward (:158-159, momentum_model.py:27-35);
* per step: N student forwards (one per crop size) + 1 teacher forward,
  ``ClusteredPrototypeLoss`` on the dense decoder outputs + coordinate
  grids (:161-171), optional supervised Dice on student 0 with
  ``map_label_indices`` remapping (:181-202);
* mode-dependent AdamW param groups: all (encoder+decoder) vs decoder
  only, with prompt-token groups at their own lr/wd (:24-79);
  WarmupCosineSchedule stepped per step (:207);
* checkpoints carry both student and teacher states every 10 epochs
  (:234-244); resume handles teacher-ful checkpoints fully and
  backbone-only checkpoints by merge + teacher copy — actually applying
  the load, fixing the reference's silent no-op (:131-136, SURVEY
  appendix bug #4).

TPU-first: EMA + all forwards + loss + backward + update run in ONE
jitted step; the teacher never participates in differentiation (JAX only
builds VJPs along the student path).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..losses import clustered_prototype_loss, dice_loss
from ..models import ModelConfig, partition
from ..ops.augment import map_label_indices
from ..utils import MeanIoU, load_checkpoint, restore_like, save_checkpoint, \
    warmup_cosine
from ..utils.metrics import seg_stats
from .common import AvgLosses, DeviceCtx, StepProfiler, adamw, \
    count_params, ema_update, make_grouped_optimizer, to_device

_SUPERVISED = ("supervised_learning_decoder", "supervised_learning_all")
_ALL_MODES = ("self_supervised_learning_all", "supervised_learning_all")


class StudentsTeacherTrainer:
    def __init__(self, hparams, backbone, train_loader, val_loader, logger,
                 writer):
        self.hparams = hparams
        self.model_conf = ModelConfig.from_namespace(hparams)
        self.model = backbone(self.model_conf)
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.logger = logger
        self.writer = writer
        self.n_students = len(hparams.crop_size_students)
        self.rng = jax.random.PRNGKey(getattr(hparams, "seed", 0))
        # Data-parallel context (config `mesh_data`; single device when
        # absent) — batches sharded on axis 0, params replicated.
        self.dctx = DeviceCtx(hparams, logger)
        self.supervised = (hparams.training_mode in _SUPERVISED
                           and hparams.use_real_label)
        self.loss_names = []
        if hparams.use_prototype_assignment:
            self.loss_names.append("prt")
        if self.supervised:
            self.loss_names.append("seg")
        if not self.loss_names:
            raise ValueError("No loss defined!")
        self.loss_names.append("tot")

    def configure_optimizers(self, params):
        conf = self.hparams
        base_sched = warmup_cosine(float(conf.lr_students_teacher),
                                   conf.warmup_steps_students_teacher,
                                   conf.t_total_students_teacher)
        prompt_sched = warmup_cosine(float(conf.lr_prompt_tokens),
                                     conf.warmup_steps_students_teacher,
                                     conf.t_total_students_teacher)
        groups = {"base": adamw(base_sched,
                                float(conf.weight_decay_students_teacher)),
                  "prompt": adamw(prompt_sched,
                                  float(conf.weight_decay_prompt_tokens))}

        def group_of(label: str) -> str:
            # Prompt tokens in their own group (ref :34-41, :54-61); in
            # 'all' modes the encoder-prompt group exists too.
            if label in ("encoder_prompt", "decoder_prompt"):
                return "prompt"
            return "base"

        tx = make_grouped_optimizer(params, group_of, groups)
        self.logger.info(f"{count_params(params)} parameters trainable.")
        self.logger.info(
            f"Size training set: {len(self.train_loader.dataset)}.")
        self.logger.info(
            f"Size validation set: {len(self.val_loader.dataset)}.")
        return tx, base_sched

    # -------------------------------------------------------------- steps
    def _build_step(self, frozen, tx, train: bool):
        conf = self.hparams
        model = self.model
        n_students = self.n_students
        supervised = self.supervised
        tau = float(conf.tau)
        active = tuple(getattr(conf, "active_labels_pretrain", ()) or ())
        nc = getattr(conf, "output_channels_pretrain", 2)

        def forward(params, batch_stats, x, rng, deterministic):
            variables = {"params": params, "batch_stats": batch_stats}
            if deterministic:
                out = model.apply(variables, x, deterministic=True)
                return out, batch_stats
            out, upd = model.apply(variables, x, deterministic=False,
                                   rngs={"dropout": rng},
                                   mutable=["batch_stats"])
            return out, upd["batch_stats"]

        def losses_of(tr, frozen_, student_bs, teacher_params, teacher_bs,
                      batch, rng, deterministic):
            params = partition.merge_params(tr, frozen_)
            keys = jax.random.split(rng, n_students + 2)
            out_sts, bs = [], student_bs
            for i in range(n_students):
                out, bs = forward(params, bs, batch[f"image_st_{i}"],
                                  keys[i], deterministic)
                out_sts.append(out)
            out_tch, new_teacher_bs = forward(
                jax.lax.stop_gradient(teacher_params), teacher_bs,
                batch["image"], keys[n_students], deterministic)
            total = jnp.zeros(())
            parts = {}
            if conf.use_prototype_assignment:
                prt = clustered_prototype_loss(
                    [o["latent_outputs"] for o in out_sts],
                    jax.lax.stop_gradient(out_tch["latent_outputs"]),
                    [batch[f"coord_st_{i}"] for i in range(n_students)],
                    batch["coord"],
                    keys[n_students + 1],
                    reduction_factor=float(conf.reduction_factor),
                    k_means_iterations=int(conf.k_means_iterations),
                    fwhm=float(conf.fwhm))
                parts["prt"] = prt
                total = total + prt
            stats = None
            if supervised:
                seg_true = map_label_indices(batch["mask_st_0"], active)
                seg_loss = dice_loss(out_sts[0]["seg_pred"], seg_true,
                                     include_background=conf.include_background)
                parts["seg"] = seg_loss
                total = total + seg_loss
                stats = seg_stats(out_sts[0]["seg_pred"], seg_true, nc)
            parts["tot"] = total
            view_data = None
            if conf.view and conf.use_prototype_assignment:
                view_data = (out_tch["latent_outputs"], batch["image"],
                             [o["latent_outputs"] for o in out_sts],
                             [batch[f"image_st_{i}"]
                              for i in range(n_students)])
            return total, (parts, bs, new_teacher_bs, stats, view_data)

        if train:
            def step(tr, student_bs, teacher_params, teacher_bs, opt_state,
                     batch, rng):
                # EMA update FIRST (ref :158-159).
                student_params = partition.merge_params(tr, frozen)
                new_teacher = ema_update(teacher_params, student_params, tau)
                (_, (parts, new_bs, new_tbs, stats, view_data)), grads = \
                    jax.value_and_grad(losses_of, has_aux=True)(
                        tr, frozen, student_bs, new_teacher, teacher_bs,
                        batch, rng, False)
                updates, new_opt = tx.update(grads, opt_state, tr)
                new_tr = optax.apply_updates(tr, updates)
                return (new_tr, new_bs, new_teacher, new_tbs, new_opt, parts,
                        stats, view_data)
            return self.dctx.jit(step, n_args=7, data_argnums=(5,))

        def val_step(tr, student_bs, teacher_params, teacher_bs, batch, rng):
            _, (parts, _, _, stats, _) = losses_of(
                tr, frozen, student_bs, teacher_params, teacher_bs, batch,
                rng, True)
            return parts, stats
        return self.dctx.jit(val_step, n_args=6, data_argnums=(4,))

    # --------------------------------------------------------------- train
    def train(self):
        conf = self.hparams
        x0 = jnp.zeros((1, *conf.roi_size, conf.input_channels))
        self.rng, k1, k2, k3, k4 = jax.random.split(self.rng, 5)
        student_vars = self.model.init({"params": k1, "dropout": k2}, x0,
                                       deterministic=True)
        # Teacher gets its own random init (reference never copies at
        # construction; EMA pulls it toward the student).
        teacher_vars = self.model.init({"params": k3, "dropout": k4}, x0,
                                       deterministic=True)
        train_labels = partition.trainable_labels(self.model_conf)
        trainable, frozen = partition.split_params(student_vars["params"],
                                                   train_labels)
        student_bs = student_vars.get("batch_stats", {})
        teacher_params = teacher_vars["params"]
        teacher_bs = teacher_vars.get("batch_stats", {})
        tx, base_sched = self.configure_optimizers(trainable)
        opt_state = tx.init(trainable)
        start_epoch = 0
        step_count = 0
        if getattr(conf, "load_ckpt_backbone", False) is True:
            ckpt = load_checkpoint(conf.load_ckpt_backbone_path)
            if "teacher_state_dict" in ckpt:
                start_epoch = int(ckpt["current_epoch"])
                state = restore_like(
                    {"params": partition.merge_params(trainable, frozen),
                     "batch_stats": student_bs}, ckpt["model_state_dict"])
                trainable, frozen = partition.split_params(
                    state["params"], train_labels)
                student_bs = state["batch_stats"]
                tstate = restore_like(
                    {"params": teacher_params, "batch_stats": teacher_bs},
                    ckpt["teacher_state_dict"])
                teacher_params = tstate["params"]
                teacher_bs = tstate["batch_stats"]
                opt_state = restore_like(opt_state,
                                         ckpt["optimizer_state_dict"])
                step_count = int(ckpt["scheduler_state_dict"]["step"])
            else:
                # Backbone-only (phase-1) checkpoint: tolerant merge into
                # the student, then copy student -> teacher.  The
                # reference's branch builds the merged dict but never
                # loads it (students_teacher.py:131-136) — fixed here.
                from ..utils import merge_state
                merged = merge_state(
                    {"params": partition.merge_params(trainable, frozen),
                     "batch_stats": student_bs}, ckpt["model_state_dict"])
                trainable, frozen = partition.split_params(
                    merged["params"], train_labels)
                student_bs = merged["batch_stats"]
                teacher_params = partition.merge_params(trainable, frozen)
                teacher_bs = jax.tree_util.tree_map(lambda x: x, student_bs)

        train_step = self._build_step(frozen, tx, train=True)
        val_step = self._build_step(frozen, tx, train=False)
        metrics = MeanIoU(getattr(conf, "output_channels_pretrain", 2)) \
            if self.supervised else None
        avg = AvgLosses(self.loss_names)
        avg_val = AvgLosses(self.loss_names)
        best_val = {n: float("inf") for n in self.loss_names}
        from ..utils.summary import model_summary
        self.logger.info(model_summary(
            partition.merge_params(trainable, frozen)))
        self.logger.info(f"Scalar summaries: {conf.summary_dir}")
        self.logger.info(f"Using device: {jax.devices()[0]}.")
        self.logger.info(f"Start training from epoch {start_epoch:04d}.")
        profiler = StepProfiler(self.logger,
                                getattr(conf, "profile_dir", None))
        global_step = 0

        batch_keys = ["image", "coord"] + \
            [f"image_st_{i}" for i in range(self.n_students)] + \
            [f"coord_st_{i}" for i in range(self.n_students)]
        if self.supervised:
            batch_keys += ["mask_st_0"]

        for epoch in range(start_epoch,
                           conf.max_epochs_students_teacher + 1):
            for step, batch in enumerate(self.train_loader):
                batch = self.dctx.stage(batch)
                dev_batch = {k: batch[k] for k in batch_keys}
                self.rng, k = jax.random.split(self.rng)
                profiler.step_begin(global_step)
                (trainable, student_bs, teacher_params, teacher_bs,
                 opt_state, parts, stats, view_data) = train_step(
                    trainable, student_bs, teacher_params, teacher_bs,
                    opt_state, dev_batch, k)
                if conf.view and step % 5 == 0 and view_data is not None:
                    from ..utils.visualization import \
                        view_prototype_students_teacher
                    view_prototype_students_teacher(
                        name=batch["name"], n_slices=4,
                        chs=conf.hidden_channels[0],
                        prt_tch=view_data[0], img_tch=view_data[1],
                        prt_sts=view_data[2], img_sts=view_data[3],
                        epoch=epoch, step=step)
                for name in self.loss_names:
                    if name in parts:
                        avg.append(name, parts[name])
                profiler.step_end(global_step)
                global_step += 1
                if metrics is not None and stats is not None:
                    metrics.update_stats(*map(np.asarray, stats))
                step_count += 1
                if step % 5 == 0:
                    self.logger.info(
                        f"Learning rate in step {step} epoch {epoch}: "
                        f"{base_sched(step_count):.5f}.")
                    if "prt" in parts:
                        self.logger.info(
                            f"Contrastive training loss in step {step} epoch "
                            f"{epoch}: {avg.last('prt'):.4f}.")
                    if "seg" in parts:
                        self.logger.info(
                            f"Segmentation training loss in step {step} "
                            f"epoch {epoch}: {avg.last('seg'):.4f}.")
            self.logger.info(
                f"Mean train step time epoch {epoch}: "
                f"{profiler.mean_ms():.1f} ms.")
            self.writer.add_scalar("perf/step_ms", profiler.mean_ms(), epoch)
            for name, val in avg.mean_and_clear().items():
                self.writer.add_scalar(f"train_loss/{name}", val, epoch)
            if metrics is not None:
                self.writer.add_scalar("train_metric/seg", metrics.compute(),
                                       epoch)
                metrics.reset()
            if getattr(conf, "save_ckpt_backbone", False) \
                    and epoch % 10 == 0:
                save_checkpoint(
                    conf.save_ckpt_backbone_path, epoch + 1,
                    {"params": partition.merge_params(trainable, frozen),
                     "batch_stats": student_bs},
                    opt_state, {"step": step_count},
                    teacher_state={"params": teacher_params,
                                   "batch_stats": teacher_bs})
                self.logger.info(f"Saved checkpoint for epoch {epoch:04d}.")
            # Validation (ref :246-311).
            for step, batch in enumerate(self.val_loader):
                batch = self.dctx.stage(batch)
                dev_batch = {k: batch[k] for k in batch_keys}
                self.rng, k = jax.random.split(self.rng)
                parts, stats = val_step(trainable, student_bs, teacher_params,
                                        teacher_bs, dev_batch, k)
                for name in self.loss_names:
                    if name in parts:
                        avg_val.append(name, parts[name])
                if metrics is not None and stats is not None:
                    metrics.update_stats(*map(np.asarray, stats))
            for name, val in avg_val.mean_and_clear().items():
                if val < best_val[name]:
                    best_val[name] = val
                    self.logger.info(
                        f"Best {name}_loss_val improved in epoch {epoch}.")
                self.writer.add_scalar(f"val_loss/{name}", val, epoch)
            if metrics is not None:
                self.writer.add_scalar("val_metric/seg", metrics.compute(),
                                       epoch)
                metrics.reset()

        profiler.close()
        self.final_state = {
            "params": partition.merge_params(trainable, frozen),
            "batch_stats": student_bs,
        }
        self.final_teacher = {"params": teacher_params,
                              "batch_stats": teacher_bs}
