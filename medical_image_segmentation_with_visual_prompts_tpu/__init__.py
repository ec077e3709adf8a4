"""TPU-native promptable medical image segmentation framework.

A brand-new JAX/XLA/Pallas implementation with the capabilities of
``liamliaw/medical-image-segmentation-with-visual-prompts``: a promptable
3D Swin-UNETR segmentation stack with

* phase-1 self-supervised encoder pretraining (masked reconstruction,
  rotation prediction, SimCLR contrastive coding),
* phase-2 student-teacher clustered-prototype distillation,
* downstream few-shot adaptation training only prompt tokens + a small
  segmentation head on a frozen backbone,

re-architected TPU-first: channels-last layouts, trace-time constant
attention masks, fused Pallas window attention, functional train steps
under ``jit``, data-parallel execution over a ``jax.sharding.Mesh`` and
device-side batched sliding-window inference.

Import alias: ``import medical_image_segmentation_with_visual_prompts_tpu as mivp``.
"""

__version__ = "0.1.0"
