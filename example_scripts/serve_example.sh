#!/bin/bash
# Batch segmentation serving: NIfTI volumes in, label volumes out.
# A serving surface the reference does not have (its test mode only
# logs window metrics); host IO is pipelined against device compute
# and heterogeneous volume shapes share a bucketed program cache.

PY=python3
ckpt="SET_PROMPT_CKPT_DIR/0300.ckpt"   # full-state prompt-token ckpt
scans_dir="/path/to/scans"             # .nii / .nii.gz files
output_dir="/path/to/segmentations"

# Single chip.
$PY -m medical_image_segmentation_with_visual_prompts_tpu.infer \
  --configs example_configs.yml \
  --ckpt "$ckpt" \
  --use-encoder-prompting --use-decoder-prompting \
  --input "$scans_dir" --output "$output_dir"

# Production watch mode: poll the scans directory and segment new
# volumes as they arrive — the model and every compiled shape bucket
# stay warm across polls; restarts are idempotent (existing *_seg
# outputs are skipped) and half-written uploads are left alone.
$PY -m medical_image_segmentation_with_visual_prompts_tpu.infer \
  --configs example_configs.yml \
  --ckpt "$ckpt" \
  --use-encoder-prompting --use-decoder-prompting \
  --input "$scans_dir" --output "$output_dir" \
  --watch --watch-interval 5

# Data-parallel serving on a v5e-8: set `mesh_data: 8` in the YAML (or
# a copy of it) — each sliding-window chunk is sharded across the mesh,
# the stitched volume stays replicated, outputs are bit-identical to
# the single-chip run.  The same key data-parallelizes `--mode fit`
# training via main.py, and `distributed: true` (+ coordinator_address/
# num_processes/process_id) extends it past one host.
$PY -m medical_image_segmentation_with_visual_prompts_tpu.infer \
  --configs dp_serving_configs.yml \
  --ckpt "$ckpt" \
  --use-encoder-prompting --use-decoder-prompting \
  --input "$scans_dir" --output "$output_dir"
