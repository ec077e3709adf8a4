"""Downstream few-shot trainer + sliding-window test evaluation.

Parity with the reference ``SegmentationTrainer``
(/root/reference/src/modules/segmentation.py:13-300):

* AdamW over ``named_parameters_downstream()`` only — prompt tokens (incl.
  their positional-bias params) + downstream head (:25-39), StepLR(100,
  0.8) stepped per epoch (:36, :155);
* DiceFocalLoss(gamma=4, to_onehot_y, softmax) + MeanIoU (:41-62);
* backbone checkpoint loaded by tolerant dict-merge (:69-75), prompt
  checkpoints are FULL model state saved every 20 epochs (:145-154);
* ``test()``: fixed sliding windows — center-crop the volume to a
  stride-aligned size, unfold into roi-sized windows at stride roi/2,
  forward in chunks of 10, accumulate MeanIoU/Dice per window, report
  per-volume mean ± std (:204-300).  No volume stitching — metrics are
  computed on windows directly (parity mode; the Gaussian-blended
  device-side stitcher lives in ``parallel.sliding_window`` as a new
  capability).

Documented reference bugs fixed here (SURVEY.md appendix):
  #3 prompt-token resume read a nonexistent attribute → we read
     ``load_ckpt_prompt_tokens_path``;
  #5 ``self.device`` only set under CUDA → JAX owns device placement.

TPU-first: the train step is one jitted XLA program (forward + loss +
backward + AdamW + BatchNorm stats + metric stats); eval/test steps are
jitted per window-batch shape; the last partial window chunk is padded
to the fixed chunk size (one compiled program) with padded windows
masked out of the metrics.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..losses import dice_focal_loss
from ..models import ModelConfig, partition
from ..ops.augment import map_label_indices
from ..utils import (DiceCoefficient, MeanIoU, load_checkpoint, merge_state,
                     restore_like, save_checkpoint, step_decay)
from ..utils.metrics import seg_stats
from .common import valid_of as _valid_of
from .common import AvgLosses, DeviceCtx, StepProfiler, adamw, \
    count_params, scalar, to_device

_TEST_CHUNK = 10  # hardcoded window batch size (reference :255)


class SegmentationTrainer:
    def __init__(self, hparams, backbone, train_loader, val_loader, logger,
                 writer):
        self.hparams = hparams
        self.model_conf = ModelConfig.from_namespace(hparams)
        self.model = backbone(self.model_conf)
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.logger = logger
        self.writer = writer
        self.num_classes = hparams.output_channels_downstream
        self.rng = jax.random.PRNGKey(getattr(hparams, "seed", 0))
        # Data-parallel context (config `mesh_data`; single device when
        # absent) — batches sharded on axis 0, params replicated.
        self.dctx = DeviceCtx(hparams, logger)

    # -------------------------------------------------------------- setup
    def _init_variables(self, input_size):
        x = jnp.zeros((1, *input_size, self.hparams.input_channels))
        self.rng, k1, k2 = jax.random.split(self.rng, 3)
        return self.model.init({"params": k1, "dropout": k2}, x,
                               deterministic=True)

    def configure_optimizers(self, trainable):
        n = count_params(trainable)
        self.logger.info(f"{n} parameters trainable.")
        tx = optax.inject_hyperparams(adamw)(
            lr=float(self.hparams.lr_downstream),
            weight_decay=float(self.hparams.weight_decay_downstream))
        schedule = step_decay(float(self.hparams.lr_downstream),
                              step_size=100, gamma=0.8)
        self.logger.info(
            f"Size training set: {len(self.train_loader.dataset)}.")
        if self.val_loader is not None:
            self.logger.info(
                f"Size validation set: {len(self.val_loader.dataset)}.")
        return tx, schedule

    # -------------------------------------------------------- jitted steps
    def _build_steps(self, frozen, tx):
        model = self.model
        conf = self.hparams
        num_classes = self.num_classes
        active = tuple(conf.active_labels_downstream)
        include_bg = conf.include_background

        def train_step(trainable, batch_stats, opt_state, image, mask, rng,
                       valid):
            # ``valid`` masks the wrap-around samples a DP mesh pads
            # partial batches with (DeviceCtx.stage) out of the loss,
            # gradient and metric stats.
            seg_true = map_label_indices(mask, active)

            def loss_fn(tr):
                params = partition.merge_params(tr, frozen)
                out, updates = model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    image, deterministic=False, rngs={"dropout": rng},
                    mutable=["batch_stats"])
                loss = dice_focal_loss(out["downstream"], seg_true,
                                       gamma=4.0,
                                       include_background=include_bg,
                                       sample_weights=valid)
                return loss, (out["downstream"], updates["batch_stats"])

            (loss, (pred, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(trainable)
            updates, new_opt = tx.update(grads, opt_state, trainable)
            new_tr = optax.apply_updates(trainable, updates)
            stats = seg_stats(pred, seg_true, num_classes,
                              sample_weights=valid)
            if conf.view:
                return new_tr, new_bs, new_opt, loss, stats, (pred, seg_true)
            return new_tr, new_bs, new_opt, loss, stats, None

        def eval_step(trainable, batch_stats, image, mask, valid):
            seg_true = map_label_indices(mask, active)
            params = partition.merge_params(trainable, frozen)
            out = model.apply({"params": params, "batch_stats": batch_stats},
                              image, deterministic=True)
            loss = dice_focal_loss(out["downstream"], seg_true, gamma=4.0,
                                   include_background=include_bg,
                                   sample_weights=valid)
            return loss, seg_stats(out["downstream"], seg_true, num_classes,
                                   sample_weights=valid)

        return (self.dctx.jit(train_step, n_args=7, data_argnums=(3, 4, 6)),
                self.dctx.jit(eval_step, n_args=5, data_argnums=(2, 3, 4)))

    # --------------------------------------------------------------- train
    def train(self):
        conf = self.hparams
        variables = self._init_variables(conf.seg_input_size)
        start_epoch = 0

        # Backbone transfer: tolerant dict-merge (ref :69-75).
        if getattr(conf, "load_ckpt_backbone", False) is True:
            ckpt = load_checkpoint(conf.load_ckpt_backbone_path)
            variables = merge_state(variables, ckpt["model_state_dict"])
            self.logger.info(
                f"Loaded backbone checkpoint {conf.load_ckpt_backbone_path}.")

        train_labels = partition.trainable_labels(self.model_conf)
        trainable, frozen = partition.split_params(variables["params"],
                                                   train_labels)
        batch_stats = variables.get("batch_stats", {})
        tx, schedule = self.configure_optimizers(trainable)
        opt_state = tx.init(trainable)

        # Prompt-token resume: full state (ref :76-82, attr bug #3 fixed).
        if getattr(conf, "load_ckpt_prompt_tokens", False) is True:
            ckpt = load_checkpoint(conf.load_ckpt_prompt_tokens_path)
            start_epoch = int(ckpt["current_epoch"])
            state = restore_like(
                {"params": partition.merge_params(trainable, frozen),
                 "batch_stats": batch_stats}, ckpt["model_state_dict"])
            trainable, frozen = partition.split_params(state["params"],
                                                       train_labels)
            batch_stats = state["batch_stats"]
            opt_state = restore_like(opt_state, ckpt["optimizer_state_dict"])

        train_step, eval_step = self._build_steps(frozen, tx)
        metrics = MeanIoU(self.num_classes)
        avg = AvgLosses(["seg", "tot"])
        avg_val = AvgLosses(["seg", "tot"])
        best_val = {"seg": float("inf"), "tot": float("inf")}
        from ..utils.summary import model_summary
        self.logger.info(model_summary(
            partition.merge_params(trainable, frozen)))
        self.logger.info(f"Scalar summaries: {conf.summary_dir}")
        self.logger.info(f"Using device: {jax.devices()[0]}.")
        self.logger.info(f"Start training from epoch {start_epoch:04d}.")
        profiler = StepProfiler(self.logger,
                                getattr(conf, "profile_dir", None))
        global_step = 0

        for epoch in range(start_epoch, conf.max_epochs_downstream + 1):
            lr = schedule(epoch)
            opt_state.hyperparams["lr"] = jnp.asarray(lr, jnp.float32)
            for step, batch in enumerate(self.train_loader):
                batch = self.dctx.stage(batch)
                self.rng, k = jax.random.split(self.rng)
                profiler.step_begin(global_step)
                (trainable, batch_stats, opt_state, loss, stats,
                 view_data) = train_step(
                    trainable, batch_stats, opt_state,
                    batch["image"], batch["mask"], k, _valid_of(batch))
                avg.append("seg", loss)  # blocks on the step result
                profiler.step_end(global_step)
                global_step += 1
                avg.append("tot", loss)
                metrics.update_stats(*map(np.asarray, stats))
                if conf.view and step % 5 == 0 and view_data is not None:
                    from ..utils.visualization import view_segmentation
                    view_segmentation(
                        name=batch["name"], n_slices=4,
                        seg_pred=view_data[0], seg_target=view_data[1],
                        n_classes=self.num_classes, epoch=epoch, step=step)
                if step % 5 == 0:
                    self.logger.info(
                        f"Learning rate in step {step} epoch {epoch}: "
                        f"{lr:.5f}.")
                    self.logger.info(
                        f"Segmentation training loss in step {step} epoch "
                        f"{epoch}: {avg.last('seg'):.5f}.")
                    self.logger.info(
                        f"Segmentation training score in step {step} epoch "
                        f"{epoch}: {metrics.compute():.5f}.")
            self.logger.info(
                f"Mean train step time epoch {epoch}: "
                f"{profiler.mean_ms():.1f} ms.")
            self.writer.add_scalar("perf/step_ms", profiler.mean_ms(), epoch)
            for name, val in avg.mean_and_clear().items():
                self.writer.add_scalar(f"train_loss/{name}", val, epoch)
            self.writer.add_scalar("train_metric/seg", metrics.compute(),
                                   epoch)
            metrics.reset()
            if getattr(conf, "save_ckpt_prompt_tokens", False) \
                    and epoch % 20 == 0:
                # Full model state, like the reference (:145-154).
                save_checkpoint(
                    conf.save_ckpt_prompt_tokens_path, epoch + 1,
                    {"params": partition.merge_params(trainable, frozen),
                     "batch_stats": batch_stats},
                    opt_state, {"epoch": epoch + 1})
                self.logger.info(f"Saved checkpoint for epoch {epoch:04d}.")

            # Validation (ref :157-200).
            if self.val_loader is None:
                continue
            for step, batch in enumerate(self.val_loader):
                batch = self.dctx.stage(batch)
                loss, stats = eval_step(trainable, batch_stats,
                                        batch["image"], batch["mask"],
                                        _valid_of(batch))
                avg_val.append("seg", loss)
                avg_val.append("tot", loss)
                metrics.update_stats(*map(np.asarray, stats))
                if step % 5 == 0:
                    self.logger.info(
                        f"Segmentation validation loss in step {step} epoch "
                        f"{epoch}: {avg_val.last('seg'):.5f}.")
                    self.logger.info(
                        f"Segmentation validation score in step {step} epoch "
                        f"{epoch}: {metrics.compute():.5f}.")
            for name, val in avg_val.mean_and_clear().items():
                if val < best_val[name]:
                    best_val[name] = val
                    self.logger.info(
                        f"Best {name}_loss_val improved in epoch {epoch}.")
                self.writer.add_scalar(f"val_loss/{name}", val, epoch)
            self.writer.add_scalar("val_metric/seg", metrics.compute(), epoch)
            metrics.reset()

        profiler.close()
        # Keep final state accessible (also used by tests).
        self.final_state = {
            "params": partition.merge_params(trainable, frozen),
            "batch_stats": batch_stats,
        }

    # ---------------------------------------------------------------- test
    def _window_grid(self, image_size):
        """Stride-aligned center crop + window starts (ref :229-252)."""
        window = list(self.hparams.roi_size)
        stride = [w // 2 for w in window]
        slices, starts = [], []
        for i in range(3):
            adj = (image_size[i] - window[i]) // stride[i] * stride[i] \
                + window[i]
            begin = (image_size[i] - adj) // 2
            slices.append(slice(begin, begin + adj))
            starts.append(list(range(0, adj - window[i] + 1, stride[i])))
        return slices, starts, window

    def test(self):
        conf = self.hparams
        variables = self._init_variables(conf.roi_size)
        if getattr(conf, "load_ckpt_prompt_tokens", False) is True:
            ckpt = load_checkpoint(conf.load_ckpt_prompt_tokens_path)
            variables = restore_like(variables, ckpt["model_state_dict"])
            variables = jax.tree_util.tree_map(jnp.asarray, variables)
            self.logger.info(
                f"Loaded checkpoint {conf.load_ckpt_prompt_tokens_path}.")
        model = self.model
        num_classes = self.num_classes
        active = tuple(conf.active_labels_downstream)
        # Inference-only: pre-fill the position-bias cache so per-chunk
        # forwards read the biases instead of re-deriving them.
        from ..models import prefill_bias_cache
        variables = prefill_bias_cache(model, variables,
                                       tuple(conf.roi_size),
                                       conf.input_channels)
        # Batched prompt-conditioned sliding-window serving: under a
        # `mesh_data` mesh the window chunk is sharded across devices
        # (chunk rounded up to a mesh multiple; padded windows are
        # excluded from the metrics as before).
        chunk = self.dctx.round_batch(_TEST_CHUNK)

        def window_stats(image, mask):
            """Per-window per-class (I, P, T) stats: [N, C] each."""
            seg_true = map_label_indices(mask, active)
            out = model.apply(variables, image, deterministic=True)
            pred = jnp.argmax(out["downstream"], axis=-1)
            tgt = seg_true.reshape(pred.shape).astype(jnp.int32)
            classes = jnp.arange(num_classes, dtype=jnp.int32)
            p1 = (pred[..., None] == classes).astype(jnp.float32)
            t1 = (tgt[..., None] == classes).astype(jnp.float32)
            axes = (1, 2, 3)
            return (jnp.sum(p1 * t1, axis=axes), jnp.sum(p1, axis=axes),
                    jnp.sum(t1, axis=axes))

        window_stats = self.dctx.jit(window_stats, n_args=2,
                                     data_argnums=(0, 1))

        test_metrics = {"iou": MeanIoU(num_classes),
                        "dcc": DiceCoefficient(num_classes)}
        metric_vals = {"iou": [], "dcc": []}
        if getattr(conf, "test_blending", "none") == "gaussian":
            # NEW capability (no stitching exists in the reference): fully
            # on-device Gaussian-blended sliding-window inference; metrics
            # are computed on the stitched volume prediction.
            return self._test_gaussian(variables, test_metrics, metric_vals)
        for step, batch in enumerate(self.train_loader):
            x = np.asarray(batch["image"])[0]   # [H, W, D, C]
            m = np.asarray(batch["mask"])[0]
            slc, starts, window = self._window_grid(x.shape[:3])
            x = np.ascontiguousarray(x[slc[0], slc[1], slc[2]])
            m = np.ascontiguousarray(m[slc[0], slc[1], slc[2]])
            grid = np.array([(i0, i1, i2) for i0 in starts[0]
                             for i1 in starts[1] for i2 in starts[2]],
                            dtype=np.int64)
            # Native strided gather when the C++ runtime is built.
            from ..data import native
            wins_x = native.extract_windows(x, grid, window)
            wins_m = native.extract_windows(m, grid, window)
            if wins_x is None or wins_m is None:
                wins_x = np.stack([x[s0:s0 + window[0], s1:s1 + window[1],
                                     s2:s2 + window[2]] for s0, s1, s2 in grid])
                wins_m = np.stack([m[s0:s0 + window[0], s1:s1 + window[1],
                                     s2:s2 + window[2]] for s0, s1, s2 in grid])
            n = wins_x.shape[0]
            for lo in range(0, n, chunk):
                chunk_x = wins_x[lo:lo + chunk]
                chunk_m = wins_m[lo:lo + chunk]
                valid = chunk_x.shape[0]
                if valid < chunk:  # pad to the fixed program shape
                    pad = chunk - valid
                    chunk_x = np.concatenate(
                        [chunk_x, np.zeros((pad,) + chunk_x.shape[1:],
                                           chunk_x.dtype)])
                    chunk_m = np.concatenate(
                        [chunk_m, np.zeros((pad,) + chunk_m.shape[1:],
                                           chunk_m.dtype)])
                if getattr(conf, "view", False) and lo == 0:
                    from ..utils.visualization import view_segmentation
                    logits = model.apply(variables, jnp.asarray(chunk_x),
                                         deterministic=True)["downstream"]
                    seg_true = map_label_indices(jnp.asarray(chunk_m), active)
                    view_segmentation(
                        name=batch["name"][0], n_slices=4, seg_pred=logits,
                        seg_target=seg_true, img=chunk_x,
                        n_classes=num_classes, epoch=0, step=step)
                inter, psum, tsum = map(np.asarray, window_stats(
                    jnp.asarray(chunk_x), jnp.asarray(chunk_m)))
                inter, psum, tsum = (inter[:valid].sum(0), psum[:valid].sum(0),
                                     tsum[:valid].sum(0))
                test_metrics["iou"].update_stats(inter, psum, tsum)
                test_metrics["dcc"].update_stats(inter, psum, tsum)
            for name, metric in test_metrics.items():
                metric_vals[name].append(metric.compute())
                metric.reset()
        for name, values in metric_vals.items():
            mean = sum(values) / len(values)
            std = (sum((v - mean) ** 2 for v in values) / len(values)) ** 0.5
            self.logger.info(
                f"{conf.run_name}: {name}: {mean:.4f} +/- {std:.4f}.")
        return metric_vals

    # ----------------------------------------------- gaussian-stitched test
    def _test_gaussian(self, variables, test_metrics, metric_vals):
        """Stitched-volume evaluation (``test_blending: gaussian``).

        Uses the device-side sliding-window pipeline with Gaussian-
        blended stitching (parallel/sliding_window.py); volume shapes
        are BUCKETED (rounded up to roi multiples with zero-weighted
        filler windows) so a heterogeneous test set compiles
        O(#buckets) programs, not O(#shapes).
        """
        import jax.numpy as jnp
        from ..parallel import BucketedInference, window_starts
        conf = self.hparams
        model = self.model
        num_classes = self.num_classes
        active = tuple(conf.active_labels_downstream)
        roi = tuple(conf.roi_size)

        def apply_fn(batch):
            return model.apply(variables, batch,
                               deterministic=True)["downstream"]

        # ``test_stride_factor`` (default 0.5 = reference-parity grid)
        # trades window count for border quality; ``test_coverage: pad``
        # evaluates the full volume (pad-to-grid) instead of the
        # center-cropped grid.  Measured Dice deltas: BASELINE.md
        # "Stitched-mode quality".  The window batch auto-sizes per
        # bucket (chunk=None — whole grid in one scan step when it
        # fits, mesh-rounded; the per-window protocol above keeps the
        # reference's fixed chunk).
        stride = getattr(conf, "test_stride_factor", None)
        coverage = getattr(conf, "test_coverage", "crop")
        runner = BucketedInference(apply_fn, roi, None, num_classes,
                                   mesh=self.dctx.mesh, stride=stride,
                                   coverage=coverage)
        self._bucketed_runner = runner  # exposed for tests/diagnostics
        for step, batch in enumerate(self.train_loader):
            x = np.asarray(batch["image"])[0]
            m = np.asarray(batch["mask"])[0]
            if coverage == "pad":
                pass            # full-volume evaluation, no grid crop
            else:
                slices, _, _ = window_starts(x.shape[:3], roi,
                                             runner.stride)
                x = np.ascontiguousarray(x[slices[0], slices[1],
                                           slices[2]])
                m = np.ascontiguousarray(m[slices[0], slices[1],
                                           slices[2]])
            probs = runner(x)
            pred = np.asarray(jnp.argmax(probs, axis=-1))
            seg_true = np.asarray(
                map_label_indices(jnp.asarray(m), active)).reshape(pred.shape)
            classes = np.arange(num_classes)
            p1 = (pred[..., None] == classes)
            t1 = (seg_true[..., None].astype(np.int64) == classes)
            inter = (p1 & t1).sum(axis=(0, 1, 2)).astype(np.float64)
            psum = p1.sum(axis=(0, 1, 2)).astype(np.float64)
            tsum = t1.sum(axis=(0, 1, 2)).astype(np.float64)
            for metric in test_metrics.values():
                metric.update_stats(inter, psum, tsum)
            for name, metric in test_metrics.items():
                metric_vals[name].append(metric.compute())
                metric.reset()
        for name, values in metric_vals.items():
            mean = sum(values) / len(values)
            std = (sum((v - mean) ** 2 for v in values) / len(values)) ** 0.5
            self.logger.info(
                f"{conf.run_name}: {name}: {mean:.4f} +/- {std:.4f}.")
        return metric_vals
