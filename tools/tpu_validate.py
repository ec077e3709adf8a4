"""On-device numerics validation of the kernel paths vs XLA.

Runs ONE flagship 16-window chunk forward twice on the real TPU — the
full kernel configuration (`attn_impl auto`, fold head on) and the
plain-XLA path (`attn_impl xla`, folds off) — at the SAME bf16 compute
dtype, and compares.  The CPU suite pins kernel-vs-XLA parity in
interpret mode; this catches what interpret cannot: silent Mosaic
MIS-compiles on the actual hardware.  Exit code 0 on PASS.

Usage: python tools/tpu_validate.py [--tol 0.08]
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from medical_image_segmentation_with_visual_prompts_tpu.utils.backend \
    import configure_backend

configure_backend()

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _flagship_conf


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tol", type=float, default=0.08,
                    help="max abs logit deviation (bf16 reassociation "
                         "class; CPU interpret measures ~0.04)")
    args = ap.parse_args()
    from medical_image_segmentation_with_visual_prompts_tpu.models import \
        SwinUnetR

    roi = (128, 128, 8)
    kern_conf = _flagship_conf(attn_impl="auto", compute_dtype="bfloat16",
                               fold_head_hw=True)
    xla_conf = _flagship_conf(attn_impl="xla", compute_dtype="bfloat16",
                              fold_head_hw=False, fold_head_depth=False)
    model = SwinUnetR(kern_conf)
    x0 = jnp.zeros((16, *roi, 1), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x0[:1], deterministic=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0.3, 0.2, x0.shape), jnp.float32)

    def run(conf):
        m = SwinUnetR(conf)
        out = jax.jit(lambda v, xx: m.apply(v, xx, deterministic=True)
                      ["downstream"])(variables, x)
        return np.asarray(out.astype(jnp.float32))

    got = run(kern_conf)
    want = run(xla_conf)
    err = float(np.max(np.abs(got - want)))
    scale = float(np.max(np.abs(want)))
    # Argmax (label) agreement matters more than raw logit deviation —
    # but at RANDOM weights two-class logits crowd the decision
    # boundary, so flips within the bf16 reassociation band are
    # expected rounding, not miscompiles.  A miscompile (e.g. a wrong
    # token roll displacing whole windows) flips CONFIDENT voxels:
    # gate on flips whose XLA-path logit margin exceeds twice the
    # measured deviation band.
    flip = np.argmax(got, -1) != np.argmax(want, -1)
    lab_diff = float(np.mean(flip))
    sorted_logits = np.sort(want, axis=-1)
    margin = sorted_logits[..., -1] - sorted_logits[..., -2]
    confident = float(np.mean(flip & (margin > 2.0 * max(err, 1e-6))))
    status = "PASS" if (err < args.tol and confident == 0.0) else "FAIL"
    print(f"tpu_validate: {status} max_abs_err={err:.4f} "
          f"(logit scale {scale:.2f}) label_mismatch={lab_diff:.2e} "
          f"confident_flips={confident:.2e} (tol {args.tol})")
    return 0 if status == "PASS" else 1


if __name__ == "__main__":
    sys.exit(main())
