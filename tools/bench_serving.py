"""End-to-end SERVING throughput: NIfTI decode → bucketed Gaussian
sliding-window inference → NIfTI encode, with pipelined host IO
(infer.serve_volumes).  Complements bench.py (device-only stitched
inference of one resident volume) by measuring the full serving path a
deployment sees, including mixed volume shapes sharing bucketed
programs.

Usage: python tools/bench_serving.py [--n 12] [--chunk 16]
Prints one summary line: volumes/sec end-to-end + compiled buckets.
"""

import argparse
import pathlib
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from medical_image_segmentation_with_visual_prompts_tpu.utils.backend \
    import configure_backend

configure_backend()

import jax
import numpy as np

from __graft_entry__ import _flagship_conf


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=12)
    ap.add_argument("--chunk", type=int, default=None,
                    help="window batch per forward (default: auto)")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny CPU-runnable geometry for smoke tests")
    ap.add_argument("--host-windowing", action="store_true",
                    help="A/B arm: host fp32 preprocessing + fp32 H2D "
                         "instead of raw int16 H2D + device windowing")
    ap.add_argument("--stride", type=float, default=0.5,
                    help="sliding-window stride factor")
    ap.add_argument("--decode-workers", type=int, default=2,
                    help="parallel NIfTI decode threads (1 = serial)")
    args = ap.parse_args()

    from medical_image_segmentation_with_visual_prompts_tpu.data.nifti \
        import save_nifti
    from medical_image_segmentation_with_visual_prompts_tpu.infer import \
        serve_volumes
    from medical_image_segmentation_with_visual_prompts_tpu.models import \
        SwinUnetR

    if args.tiny:
        conf = _flagship_conf(
            depth_unet=2, hidden_channels=(8, 16, 32), num_heads_encoder=2,
            num_heads_decoder=2, attn_window_size=(4, 4, 2),
            pos_bias_embed_dim=8, tokens_per_prompt_encoder=4,
            tokens_per_prompt_decoder=4, compute_dtype="float32")
        roi = (16, 16, 8)
        shapes = [(40, 40, 12), (32, 32, 16), (48, 40, 12)]
    else:
        conf = _flagship_conf(compute_dtype="bfloat16")
        roi = (128, 128, 8)
        # Mixed shapes: two shapes per bucket class exercises the
        # bucket-shared program cache the way a real test set does.
        shapes = [(320, 320, 24), (300, 310, 20), (256, 256, 16),
                  (320, 320, 24)]

    # serve_volumes drives the CLI config namespace, not ModelConfig.
    ns = argparse.Namespace(
        **{k: getattr(conf, k) for k in (
            "input_channels", "depth_unet", "input_patch_size",
            "unetr_res_block", "unetr_up_block", "num_heads_encoder",
            "num_heads_decoder", "attn_window_size", "pos_bias_embed_dim",
            "use_checkpoint", "attn_drop", "proj_drop", "max_prompts",
            "tokens_per_prompt_encoder", "tokens_per_prompt_decoder",
            "use_encoder_prompting", "use_decoder_prompting",
            "output_channels_downstream", "attn_impl", "pad_mode",
            "fold_head_hw", "fold_head_depth")},
        hidden_channels=list(conf.hidden_channels),
        compute_dtype=conf.compute_dtype, training_mode="downstream",
        roi_size=list(roi), test_blending="gaussian")

    model = SwinUnetR(conf)
    x0 = np.zeros((1, *roi, 1), np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x0, deterministic=True)

    rng = np.random.default_rng(0)
    tmp = pathlib.Path(tempfile.mkdtemp(prefix="bench_serving_"))
    pairs = []
    for k in range(args.n):
        shp = shapes[k % len(shapes)]
        # int16 HU payloads, the native CT encoding: the default serving
        # path ships these RAW to the device (half the fp32 bytes) and
        # windows there; --host-windowing is the fp32-upload A/B arm.
        vol = np.clip(rng.normal(0.0, 400.0, size=shp), -1000,
                      1000).astype(np.int16)
        src = tmp / f"case{k}.nii.gz"
        save_nifti(str(src), vol)
        pairs.append((src, tmp / f"seg{k}.nii.gz"))

    from medical_image_segmentation_with_visual_prompts_tpu.infer import \
        make_runner

    # Host-link bandwidth probe: serving is transfer-bound in this
    # environment (the TPU sits behind a stdio relay), so record the
    # measured link rate next to the vol/s number.
    probe = np.random.rand(1 << 20).astype(np.float32)   # 4 MB
    dev = jax.devices()[0]
    t0 = time.perf_counter()
    pd = jax.device_put(probe, dev)
    pd.block_until_ready()
    h2d = probe.nbytes / 1e6 / (time.perf_counter() - t0)
    t0 = time.perf_counter()
    np.asarray(pd)
    d2h = probe.nbytes / 1e6 / (time.perf_counter() - t0)
    print(f"LINK: H2D {h2d:.1f} MB/s, D2H {d2h:.1f} MB/s")

    # Warmup: one volume per distinct bucket (compiles / loads the
    # program cache), then the timed warm batch on a shared runner.
    runner = make_runner(ns, variables, chunk=args.chunk,
                         stride=args.stride,
                         device_windowing=not args.host_windowing)
    print(f"ARM: {'host fp32' if args.host_windowing else 'device int16'} "
          f"windowing, stride {args.stride}")
    n_shapes = len(set(shapes[: args.n]))
    t0 = time.perf_counter()
    serve_volumes(ns, variables, pairs[:n_shapes], chunk=args.chunk,
                  runner=runner, decode_workers=args.decode_workers)
    print(f"WARMUP: {n_shapes} volumes in "
          f"{time.perf_counter() - t0:.1f}s "
          f"({runner.compiled_programs} compiled buckets)")

    # Timed warm batches: serial decode first, then the parallel
    # loader — both on the same compiled programs, so the delta is
    # pure host-pipeline effect.
    for workers in sorted({1, args.decode_workers}):
        t0 = time.perf_counter()
        n_done, n_failed = serve_volumes(
            ns, variables, pairs, chunk=args.chunk, runner=runner,
            decode_workers=workers)
        dt = time.perf_counter() - t0
        print(f"SERVING[decode_workers={workers}]: "
              f"{n_done} ok / {n_failed} failed, "
              f"{n_done / dt:.3f} vol/s end-to-end warm "
              f"({n_shapes} shapes)")


if __name__ == "__main__":
    main()
