"""Volume inference CLI: segment NIfTI volumes with a trained checkpoint.

A serving entry the reference lacks (its ``test`` mode only reports
window metrics): loads a prompt-token checkpoint, runs device-side
Gaussian-stitched sliding-window inference and writes the label volume
back as NIfTI.

Batch serving: ``--input`` accepts multiple files or a directory; host
IO is pipelined against device compute (a loader thread decodes and
preprocesses volume i+1 and a writer thread encodes volume i-1 while
the chip runs volume i), and the shape-bucketed program cache is shared
across the whole batch.

Usage:
  python -m medical_image_segmentation_with_visual_prompts_tpu.infer \
    --configs example_configs.yml \
    --ckpt checkpoints/prompt_tokens/<run>/0300.ckpt \
    --use-encoder-prompting --use-decoder-prompting \
    --input case.nii.gz --output case_seg.nii.gz
  # batch: directory in, directory out
  ... --input scans/ --output segs/
"""

from __future__ import annotations

import queue
import threading
import time
from argparse import ArgumentParser
from pathlib import Path
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .data import save_nifti
from .data.transforms import (load_image, load_image_raw,
                              scale_intensity_range)
from .models import ModelConfig, SwinUnetR, prefill_bias_cache
from .parallel import BucketedInference, window_starts
from .utils import get_full_configs, load_checkpoint, restore_like


def device_scale_intensity(a_min: float = -1000.0, a_max: float = 1000.0,
                           b_min: float = 0.0, b_max: float = 1.0,
                           clip: bool = True):
    """On-device CT intensity windowing (``ScaleIntensityRanged``
    equivalent — reference transforms.py:15-18) for raw H2D payloads.

    From-disk serving ships the volume in its NATIVE NIfTI dtype (int16
    HU for typical CT — a lossless 2x cut of the measured link-bound
    upload, docs/PERF.md round 4) and windows it on device.  The fused
    multiply-add mirrors the native host path
    (native/miseg_native.cpp::miseg_scale_intensity) so host- and
    device-windowed pipelines agree in fp32 (tests/test_infer.py).
    """
    scale = np.float32((b_max - b_min) / (a_max - a_min))

    def fn(x):
        v = (x.astype(jnp.float32) - np.float32(a_min)) * scale \
            + np.float32(b_min)
        if clip:
            v = jnp.clip(v, np.float32(b_min), np.float32(b_max))
        return v

    return fn


def _predict_device(runner, roi, volume: np.ndarray):
    """Run bucketed Gaussian inference; argmax + narrow-int cast stay
    ON DEVICE so only ``H*W*D`` bytes ever cross the host link (the
    class-probability volume is num_classes*4x larger — at the measured
    ~23 MB/s tunnel of this environment that cast alone is most of a
    second per volume).  ``coverage='pad'`` runners (the serving
    default) segment EVERY voxel (volume padded up to the window grid
    on the host, result cropped back); ``'crop'`` runners center-crop
    to the stride-aligned grid first — the reference's evaluation
    semantics, which drop up to stride-1 border voxels per axis.
    Returns the label crop as an UNMATERIALIZED device array plus the
    crop slices."""
    if runner.coverage == "pad":
        slices = tuple(slice(0, d) for d in volume.shape[:3])
        cropped = np.ascontiguousarray(volume)
    else:
        slices, _, _ = window_starts(volume.shape[:3], roi, runner.stride)
        cropped = np.ascontiguousarray(
            volume[slices[0], slices[1], slices[2]])
    probs = runner(cropped)
    dtype = jnp.uint8 if probs.shape[-1] <= 256 else jnp.int16
    return jnp.argmax(probs, axis=-1).astype(dtype), slices


def _embed_labels(pred_crop_dev, slices, shape) -> np.ndarray:
    """Materialize the device label crop (host download happens HERE)
    and re-embed at full volume shape (border voxels stay background 0)."""
    pred = np.zeros(shape, np.int16)
    pred[slices[0], slices[1], slices[2]] = np.asarray(pred_crop_dev)
    return pred


def _stitch_labels(runner, roi, volume: np.ndarray) -> np.ndarray:
    """Crop, infer (device-side argmax), download, re-embed."""
    pred_crop, slices = _predict_device(runner, roi, volume)
    return _embed_labels(pred_crop, slices, volume.shape[:3])


def segment_volume(conf, variables, volume: np.ndarray,
                   chunk=None, stride=None) -> np.ndarray:
    """[H, W, D, 1] preprocessed volume -> [H, W, D] int labels."""
    model_conf = ModelConfig.from_namespace(conf)
    model = SwinUnetR(model_conf)
    roi = tuple(conf.roi_size)
    variables = prefill_bias_cache(model, variables, roi,
                                   conf.input_channels)

    def apply_fn(batch):
        return model.apply(variables, batch, deterministic=True)["downstream"]

    # Bucketed: heterogeneous volume shapes share O(#buckets) programs.
    # `mesh_data` shards each window chunk across the data mesh — the
    # same batched sliding-window serving as the trainer test path.
    from .train.common import DeviceCtx
    dctx = DeviceCtx(conf)
    runner = BucketedInference(apply_fn, roi, chunk,
                               conf.output_channels_downstream,
                               mesh=dctx.mesh, stride=stride)
    return _stitch_labels(runner, roi, volume)


def resolve_io(inputs: List[str], output: str) -> List[Tuple[Path, Path]]:
    """Expand --input files/directories into (src, dst) pairs."""
    srcs: List[Path] = []
    for item in inputs:
        p = Path(item)
        if p.is_dir():
            srcs.extend(sorted(q for q in p.iterdir()
                               if q.name.endswith((".nii", ".nii.gz"))))
        else:
            srcs.append(p)
    if not srcs:
        raise FileNotFoundError(f"no NIfTI volumes under {inputs}")
    out = Path(output)
    if out.suffix in (".nii", ".gz"):
        if len(srcs) == 1:
            return [(srcs[0], out)]
        raise ValueError(
            f"multiple inputs ({len(srcs)}) require a directory --output, "
            f"got file-like path {out}")
    out.mkdir(parents=True, exist_ok=True)
    pairs = []
    for s in srcs:
        stem = s.name
        for suf in (".nii.gz", ".nii"):
            if stem.endswith(suf):
                stem = stem[: -len(suf)]
                break
        pairs.append((s, out / f"{stem}_seg.nii.gz"))
    return pairs


def make_runner(conf, variables, chunk=None,
                stride=None, device_windowing: bool = True,
                coverage: str = "pad") -> BucketedInference:
    """Build the warm serving runner: model, pre-filled position-bias
    cache, and the shape-bucketed sliding-window program cache.

    `mesh_data` shards each window chunk across the data mesh (the
    stitched volume stays replicated) — multichip batch serving.
    ``stride`` (``resolve_stride`` spec) trades window count for border
    quality — 0.75 runs ~2.5-3x fewer model passes per volume.
    ``device_windowing`` (default): volumes are fed RAW (native NIfTI
    dtype, typically int16 HU) and intensity-windowed on device —
    halving the H2D payload on the link-bound from-disk path; pass
    False to feed host-preprocessed float volumes.
    ``coverage='pad'`` (default) segments every voxel (pad-to-grid,
    air-valued padding); ``'crop'`` reproduces the reference's
    center-crop grid, leaving border voxels background.
    """
    model_conf = ModelConfig.from_namespace(conf)
    model = SwinUnetR(model_conf)
    roi = tuple(conf.roi_size)
    variables = prefill_bias_cache(model, variables, roi,
                                   conf.input_channels)

    def apply_fn(batch):
        return model.apply(variables, batch, deterministic=True)["downstream"]

    from .train.common import DeviceCtx
    dctx = DeviceCtx(conf)
    return BucketedInference(apply_fn, roi, chunk,
                             conf.output_channels_downstream,
                             mesh=dctx.mesh, stride=stride,
                             preprocess=(device_scale_intensity()
                                         if device_windowing else None),
                             coverage=coverage,
                             # Air in the feed's own units: raw HU for
                             # the int16 path, windowed 0.0 for host-
                             # preprocessed floats.
                             pad_value=(-1000.0 if device_windowing
                                        else 0.0))


def serve_volumes(conf, variables, pairs: List[Tuple[Path, Path]],
                  chunk=None, runner: BucketedInference = None,
                  stride=None, device_windowing: bool = True,
                  decode_workers: int = 2,
                  coverage: str = "pad") -> Tuple[int, int]:
    """Segment a batch of volumes with pipelined host IO.

    Loader and writer run in their own threads with bounded queues, so
    NIfTI decode/encode of neighbors overlaps the chip's compute; the
    bucketed program cache is shared across volumes.  Per-volume load or
    write failures are reported and counted, never hung on.  Returns
    ``(n_done, n_failed)``.  Pass a prebuilt ``runner`` (``make_runner``)
    to keep compiled programs warm across calls (watch mode).
    """
    roi = tuple(conf.roi_size)
    if runner is None:
        runner = make_runner(conf, variables, chunk, stride=stride,
                             device_windowing=device_windowing,
                             coverage=coverage)
    loaded: "queue.Queue" = queue.Queue(maxsize=2)
    to_write: "queue.Queue" = queue.Queue(maxsize=2)
    write_errors: List[Tuple[Path, Exception]] = []
    # Device-windowing runners take the RAW narrow payload (typically
    # int16 HU — half the H2D bytes); host-windowing runners take the
    # float volume preprocessed here in the loader thread.
    raw_feed = runner.preprocess is not None

    def _decode(sd):
        src, dst = sd
        try:
            vol = load_image_raw(str(src)) if raw_feed else \
                scale_intensity_range(load_image(str(src)))
            return (src, dst, vol, None)
        except Exception as e:              # surface per-volume failures
            return (src, dst, None, e)

    def loader():
        # Bounded-parallel decode: gunzip+decode of several volumes
        # overlap each other AND the chip (order preserved; at most
        # ~queue+window volumes resident).  ``decode_workers=1``
        # restores the serial loader.
        if decode_workers <= 1:
            for sd in pairs:
                loaded.put(_decode(sd))
            loaded.put(None)
            return
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=decode_workers) as ex:
            pending = deque()
            for sd in pairs:
                pending.append(ex.submit(_decode, sd))
                if len(pending) > decode_workers:
                    loaded.put(pending.popleft().result())
            while pending:
                loaded.put(pending.popleft().result())
        loaded.put(None)

    def writer():
        # The writer also OWNS the device->host download (_embed_labels
        # materializes the label crop): volume i's download and NIfTI
        # encode overlap volume i+1's upload/compute in the main thread.
        while True:
            item = to_write.get()
            if item is None:
                return
            dst, src_name, pred_dev, slices, shape = item
            try:
                pred = _embed_labels(pred_dev, slices, shape)
                save_nifti(str(dst), pred)
                print(f"{src_name} -> {dst} "
                      f"(labels: {sorted(int(v) for v in np.unique(pred))})")
            except Exception as e:          # keep draining the queue
                write_errors.append((dst, e))

    lt = threading.Thread(target=loader, daemon=True)
    wt = threading.Thread(target=writer, daemon=True)
    lt.start()
    wt.start()
    n_done = 0
    n_failed = 0
    t0 = time.perf_counter()
    while True:
        item = loaded.get()
        if item is None:
            break
        src, dst, vol, err = item
        if err is not None:
            print(f"FAILED {src}: {err}")
            n_failed += 1
            continue
        try:
            pred_dev, slices = _predict_device(runner, roi, vol)
        except Exception as e:  # e.g. volume smaller than the roi
            print(f"FAILED inference {src}: {e}")
            n_failed += 1
            continue
        to_write.put((dst, src.name, pred_dev, slices, vol.shape[:3]))
        n_done += 1
    to_write.put(None)
    wt.join()
    lt.join()
    for dst, e in write_errors:
        print(f"FAILED write {dst}: {e}")
        n_done -= 1
        n_failed += 1
    dt = time.perf_counter() - t0
    if n_done:
        print(f"{n_done} volumes in {dt:.2f}s "
              f"({n_done / dt:.2f} vol/s, "
              f"{runner.compiled_programs} compiled buckets)")
    return n_done, n_failed


def watch_directory(conf, variables, src: Path, out: Path,
                    chunk=None, interval: float = 5.0,
                    min_age: float = 1.0, max_polls: int = None,
                    stride=None, device_windowing: bool = True,
                    coverage: str = "pad") -> Tuple[int, int]:
    """Production watch mode: poll ``src`` for new NIfTI volumes and
    segment them as they arrive, keeping the model and the bucketed
    program cache warm across polls.

    A volume is picked up once its mtime is at least ``min_age`` seconds
    old (so half-written uploads are left alone) and is never retried:
    failures are counted once and skipped thereafter.  Existing
    ``*_seg`` outputs are treated as already served (idempotent
    restart).  ``max_polls`` bounds the loop (tests); ``None`` runs
    until interrupted.  Returns cumulative ``(n_done, n_failed)``.
    """
    out.mkdir(parents=True, exist_ok=True)
    runner = make_runner(conf, variables, chunk, stride=stride,
                         device_windowing=device_windowing,
                         coverage=coverage)
    seen = set()
    n_done = 0
    n_failed = 0
    polls = 0
    print(f"watching {src} -> {out} (every {interval:.1f}s)")
    while max_polls is None or polls < max_polls:
        if polls:
            time.sleep(interval)
        polls += 1
        now = time.time()
        fresh = []
        for p in sorted(src.iterdir()):
            if not p.name.endswith((".nii", ".nii.gz")) or p in seen:
                continue
            try:
                if now - p.stat().st_mtime < min_age:
                    continue                 # possibly still uploading
            except FileNotFoundError:
                continue                     # vanished between scans
            (dst,) = [d for _, d in resolve_io([str(p)], str(out))]
            seen.add(p)
            if dst.exists():
                continue                     # served by a previous run
            fresh.append((p, dst))
        if fresh:
            d, f = serve_volumes(conf, variables, fresh, chunk,
                                 runner=runner)
            n_done += d
            n_failed += f
    return n_done, n_failed


def main():
    from .utils.backend import configure_backend
    configure_backend()
    parser = ArgumentParser()
    parser.add_argument("--configs", default="example_configs.yml")
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--input", required=True, nargs="+",
                        help="NIfTI file(s) or director(ies)")
    parser.add_argument("--output", required=True,
                        help="output file (single input) or directory")
    parser.add_argument("--use-encoder-prompting", action="store_true")
    parser.add_argument("--use-decoder-prompting", action="store_true")
    parser.add_argument("--chunk", type=int, default=None,
                        help="window batch per forward; default auto (whole grid\n"
                             "when <=32 windows — one scan step, no padding slots)")
    parser.add_argument("--stride-factor", type=float, default=0.5,
                        help="sliding-window stride as a fraction of the "
                             "roi (0.5 = reference parity; 0.75 runs "
                             "~2.5-3x fewer windows per volume at a small "
                             "border-quality cost — see BASELINE.md)")
    parser.add_argument("--coverage", choices=["pad", "crop"],
                        default="pad",
                        help="'pad' (default) segments every voxel by "
                             "padding up to the window grid; 'crop' "
                             "center-crops to the grid (reference "
                             "evaluation semantics — border voxels come "
                             "back as background)")
    parser.add_argument("--host-windowing", action="store_true",
                        help="preprocess (intensity-window) volumes on the "
                             "host and upload float32, instead of the "
                             "default raw int16 upload + on-device "
                             "windowing")
    parser.add_argument("--watch", action="store_true",
                        help="poll the --input directory and segment new "
                             "volumes as they arrive (model stays warm)")
    parser.add_argument("--watch-interval", type=float, default=5.0)
    parser.add_argument("--mode", default="fit")
    parser.add_argument("--training-mode", default="downstream")
    parser.add_argument("--backbone", default="swin_unetr")
    parser.add_argument("--run-name", default="infer")
    args = parser.parse_args()
    for flag in ("load_ckpt_backbone", "save_ckpt_backbone",
                 "load_ckpt_prompt_tokens", "save_ckpt_prompt_tokens"):
        setattr(args, flag, False)
        setattr(args, flag + "_path", "")
    conf = get_full_configs(args)
    conf.training_mode = "downstream"

    model_conf = ModelConfig.from_namespace(conf)
    model = SwinUnetR(model_conf)
    x0 = jnp.zeros((1, *conf.roi_size, conf.input_channels))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x0, deterministic=True)
    ckpt = load_checkpoint(Path(args.ckpt))
    variables = restore_like(variables, ckpt["model_state_dict"])
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    if args.watch:
        if len(args.input) != 1 or not Path(args.input[0]).is_dir():
            raise SystemExit("--watch requires a single --input directory")
        watch_directory(conf, variables, Path(args.input[0]),
                        Path(args.output), chunk=args.chunk,
                        interval=args.watch_interval,
                        stride=args.stride_factor,
                        device_windowing=not args.host_windowing,
                        coverage=args.coverage)
        return
    pairs = resolve_io(args.input, args.output)
    n_done, n_failed = serve_volumes(conf, variables, pairs,
                                     chunk=args.chunk,
                                     stride=args.stride_factor,
                                     device_windowing=not args.host_windowing,
                                     coverage=args.coverage)
    if n_failed or not n_done:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
