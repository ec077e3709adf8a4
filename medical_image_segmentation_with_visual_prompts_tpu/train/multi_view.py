"""Phase-1 multi-view self-supervised encoder pretraining.

Parity with the reference ``MultiViewTrainer``
(/root/reference/src/modules/multi_view.py:13-327):

* two augmented views per batch via per-sample random 90° rotation +
  exact-count patch masking (:121-133) — here fully on device inside the
  jitted step (the reference loops on the host);
* losses: masked-reconstruction MSE scaled by 1/(1−mask_ratio)
  (:138-150), rotation-class CE (:159-167), SimCLR NT-Xent on pooled
  contrastive codes (:168-173), optional mutual-learning MSE between
  permuted-view reconstructions (:174-184);
* AdamW param groups: encoder body (+ SSL heads) at ``lr_multi_view``,
  encoder prompt tokens at ``lr_prompt_tokens`` (:57-77);
* ``WarmupCosineSchedule`` stepped per optimizer step (:190);
* backbone checkpoint (model/optimizer/scheduler/epoch) every 10 epochs
  (:220-229); full resume (:96-104); per-epoch scalars and ``best_val``
  tracking (:216-219, :321-326).
"""

from __future__ import annotations

import random as pyrandom

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..losses import contrastive_pair_loss
from ..models import ModelConfig, partition
from ..ops.augment import permute_inverse, random_mask, random_permute, \
    random_rotate
from ..utils import load_checkpoint, restore_like, save_checkpoint, \
    warmup_cosine
from .common import AvgLosses, DeviceCtx, StepProfiler, adamw, \
    count_params, make_grouped_optimizer, to_device


class MultiViewTrainer:
    def __init__(self, hparams, backbone, train_loader, val_loader, logger,
                 writer):
        self.hparams = hparams
        self.model_conf = ModelConfig.from_namespace(hparams)
        self.model = backbone(self.model_conf)
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.logger = logger
        self.writer = writer
        self.rng = jax.random.PRNGKey(getattr(hparams, "seed", 0))
        # Data-parallel context (config `mesh_data`; single device when
        # absent) — batches sharded on axis 0, params replicated.
        self.dctx = DeviceCtx(hparams, logger)
        self.loss_names = [n for n, used in (
            ("rec", hparams.use_reconstruction),
            ("rot", hparams.use_rotation_prediction),
            ("con", hparams.use_contrastive_learning),
            ("mut", hparams.use_mutual_learning)) if used] + ["tot"]
        if self.loss_names == ["tot"]:
            raise ValueError("No loss defined!")

    def configure_optimizers(self, params):
        conf = self.hparams
        body_sched = warmup_cosine(float(conf.lr_multi_view),
                                   conf.warmup_steps_multi_view,
                                   conf.t_total_multi_view)
        groups = {"body": adamw(body_sched,
                                float(conf.weight_decay_multi_view))}
        if conf.use_encoder_prompting:
            prompt_sched = warmup_cosine(float(conf.lr_prompt_tokens),
                                         conf.warmup_steps_multi_view,
                                         conf.t_total_multi_view)
            groups["prompt"] = adamw(prompt_sched,
                                     float(conf.weight_decay_prompt_tokens))
        tx = make_grouped_optimizer(
            params,
            lambda label: "prompt" if label == "encoder_prompt" else "body",
            groups)
        self.logger.info(f"{count_params(params)} parameters trainable.")
        self.logger.info(
            f"Size training set: {len(self.train_loader.dataset)}.")
        self.logger.info(
            f"Size validation set: {len(self.val_loader.dataset)}.")
        return tx, body_sched

    def _build_step(self, frozen, tx, train: bool, permute_choice: int = 0):
        conf = self.hparams
        model = self.model
        roi = tuple(conf.roi_size)
        mshape = tuple(conf.masking_shape)
        ratio = conf.masking_ratio

        def losses_of(tr, batch_stats, image, rng, deterministic):
            params = partition.merge_params(tr, frozen)
            kr1, kr2, km1, km2, kd = jax.random.split(rng, 5)
            x_i, y_rot_i = random_rotate(image, kr1)
            x_j, y_rot_j = random_rotate(image, kr2)
            x_i, mask_i = random_mask(x_i, km1, roi, mshape, ratio)
            x_j, mask_j = random_mask(x_j, km2, roi, mshape, ratio)
            variables = {"params": params, "batch_stats": batch_stats}
            kwargs = dict(deterministic=deterministic)
            if not deterministic:
                kwargs["rngs"] = {"dropout": kd}
                kwargs["mutable"] = ["batch_stats"]
            new_bs = batch_stats
            if deterministic:
                out_i = model.apply(variables, x_i, **kwargs)
                out_j = model.apply(variables, x_j, **kwargs)
            else:
                out_i, upd = model.apply(variables, x_i, **kwargs)
                variables = {"params": params,
                             "batch_stats": upd["batch_stats"]}
                out_j, upd = model.apply(variables, x_j, **kwargs)
                new_bs = upd["batch_stats"]
            total = jnp.zeros(())
            parts = {}
            mi = mask_i[None, ..., None]
            mj = mask_j[None, ..., None]
            if conf.use_reconstruction:
                img = jnp.concatenate([x_i * mi, x_j * mj], axis=0)
                rec = jnp.concatenate([out_i["reconstruction"] * mi,
                                       out_j["reconstruction"] * mj], axis=0)
                rec_loss = jnp.mean((rec - img) ** 2) / (1 - ratio)
                total = total + conf.weight_rec * rec_loss
                parts["rec"] = rec_loss
            if conf.use_rotation_prediction:
                logits = jnp.concatenate([out_i["rotation_prediction"],
                                          out_j["rotation_prediction"]])
                labels = jnp.concatenate([y_rot_i, y_rot_j])
                rot_loss = jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
                    logits, labels))
                total = total + conf.weight_rot * rot_loss
                parts["rot"] = rot_loss
            if conf.use_contrastive_learning:
                con_loss = contrastive_pair_loss(out_i["contrastive_coding"],
                                                 out_j["contrastive_coding"])
                total = total + conf.weight_con * con_loss
                parts["con"] = con_loss
            if conf.use_mutual_learning:
                x_k = random_permute(x_i, permute_choice)
                if deterministic:
                    out_k = model.apply(variables, x_k, **kwargs)
                else:
                    out_k, upd = model.apply(
                        {"params": params, "batch_stats": new_bs}, x_k,
                        **kwargs)
                    new_bs = upd["batch_stats"]
                rec_perm = permute_inverse(out_k["reconstruction"],
                                           permute_choice)
                mut_loss = jnp.mean(
                    ((rec_perm - out_i["reconstruction"]) * mi) ** 2
                ) / (1 - ratio)
                total = total + mut_loss
                parts["mut"] = mut_loss
            parts["tot"] = total
            view_data = None
            if conf.view and conf.use_reconstruction:
                view_data = (x_i * mi, out_i["reconstruction"] * mi)
            return total, (parts, new_bs, view_data)

        if train:
            def step(tr, batch_stats, opt_state, image, rng):
                (_, (parts, new_bs, view_data)), grads = jax.value_and_grad(
                    losses_of, has_aux=True)(tr, batch_stats, image, rng,
                                             False)
                updates, new_opt = tx.update(grads, opt_state, tr)
                new_tr = optax.apply_updates(tr, updates)
                return new_tr, new_bs, new_opt, parts, view_data
            return self.dctx.jit(step, n_args=5, data_argnums=(3,))

        def val_step(tr, batch_stats, image, rng):
            _, (parts, _, _) = losses_of(tr, batch_stats, image, rng, True)
            return parts
        return self.dctx.jit(val_step, n_args=4, data_argnums=(2,))

    def train(self):
        self.self_supervised_learning()

    def self_supervised_learning(self):
        conf = self.hparams
        x0 = jnp.zeros((1, *conf.roi_size, conf.input_channels))
        self.rng, k1, k2 = jax.random.split(self.rng, 3)
        variables = self.model.init({"params": k1, "dropout": k2}, x0,
                                    deterministic=True)
        train_labels = partition.trainable_labels(self.model_conf)
        trainable, frozen = partition.split_params(variables["params"],
                                                   train_labels)
        batch_stats = variables.get("batch_stats", {})
        tx, body_sched = self.configure_optimizers(trainable)
        opt_state = tx.init(trainable)
        start_epoch = 0
        step_count = 0
        if getattr(conf, "load_ckpt_backbone", False) is True:
            ckpt = load_checkpoint(conf.load_ckpt_backbone_path)
            start_epoch = int(ckpt["current_epoch"])
            state = restore_like(
                {"params": partition.merge_params(trainable, frozen),
                 "batch_stats": batch_stats}, ckpt["model_state_dict"])
            trainable, frozen = partition.split_params(state["params"],
                                                       train_labels)
            batch_stats = state["batch_stats"]
            opt_state = restore_like(opt_state, ckpt["optimizer_state_dict"])
            step_count = int(ckpt["scheduler_state_dict"]["step"])
        # With mutual learning the spatial permutation is drawn per step
        # (ref :174-175); each of the three choices is its own compiled
        # program (shape-changing transpose), cached after first use.
        if conf.use_mutual_learning:
            train_variants = [self._build_step(frozen, tx, True, c)
                              for c in range(3)]
            pick_train = lambda: pyrandom.choice(train_variants)
            val_variants = [self._build_step(frozen, tx, False, c)
                            for c in range(3)]
            pick_val = lambda: pyrandom.choice(val_variants)
        else:
            _train = self._build_step(frozen, tx, train=True)
            _val = self._build_step(frozen, tx, train=False)
            pick_train = lambda: _train
            pick_val = lambda: _val
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

        for epoch in range(start_epoch, conf.max_epochs_multi_view + 1):
            for step, batch in enumerate(self.train_loader):
                batch = self.dctx.stage(batch)
                self.rng, k = jax.random.split(self.rng)
                profiler.step_begin(global_step)
                (trainable, batch_stats, opt_state, parts,
                 view_data) = pick_train()(
                    trainable, batch_stats, opt_state, batch["image"], k)
                if conf.view and step % 5 == 0 and view_data is not None:
                    from ..utils.visualization import view_reconstruction
                    view_reconstruction(
                        name=batch["name"], n_slices=4,
                        ori_img=view_data[0], rec_img=view_data[1],
                        epoch=epoch, step=step)
                for name in self.loss_names:
                    if name in parts:
                        avg.append(name, parts[name])
                profiler.step_end(global_step)
                global_step += 1
                step_count += 1
                if step % 5 == 0:
                    self.logger.info(
                        f"Learning rate in step {step} epoch {epoch}: "
                        f"{body_sched(step_count):.5f}.")
                    for name, label in (("rec", "Reconstruction"),
                                        ("rot", "Rotation prediction"),
                                        ("con", "Contrastive"),
                                        ("mut", "Mutual learning")):
                        if name in parts:
                            self.logger.info(
                                f"{label} training loss in step {step} epoch "
                                f"{epoch}: {avg.last(name):.5f}.")
            self.logger.info(
                f"Mean train step time epoch {epoch}: "
                f"{profiler.mean_ms():.1f} ms.")
            self.writer.add_scalar("perf/step_ms", profiler.mean_ms(), epoch)
            for name, val in avg.mean_and_clear().items():
                self.writer.add_scalar(f"train_loss/{name}", val, epoch)
            if getattr(conf, "save_ckpt_backbone", False) \
                    and epoch % 10 == 0:
                save_checkpoint(
                    conf.save_ckpt_backbone_path, epoch + 1,
                    {"params": partition.merge_params(trainable, frozen),
                     "batch_stats": batch_stats},
                    opt_state, {"step": step_count})
                self.logger.info(f"Saved checkpoint for epoch {epoch:04d}.")
            # Validation (ref :231-327).
            for step, batch in enumerate(self.val_loader):
                batch = self.dctx.stage(batch)
                self.rng, k = jax.random.split(self.rng)
                parts = pick_val()(trainable, batch_stats, batch["image"], k)
                for name in self.loss_names:
                    if name in parts:
                        avg_val.append(name, parts[name])
            for name, val in avg_val.mean_and_clear().items():
                if val < best_val[name]:
                    best_val[name] = val
                    self.logger.info(
                        f"Best {name}_loss_val improved in epoch {epoch}.")
                self.writer.add_scalar(f"val_loss/{name}", val, epoch)

        profiler.close()
        self.final_state = {
            "params": partition.merge_params(trainable, frozen),
            "batch_stats": batch_stats,
        }
