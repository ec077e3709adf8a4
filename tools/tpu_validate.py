"""On-device numerics validation of the kernel paths vs XLA.

Runs ONE flagship 16-window chunk forward on the real TPU for each
kernel arm and compares against the plain-XLA path (`attn_impl xla`,
folds off) at the SAME bf16 compute dtype.  Arms:

* ``default`` — exactly what bench tier 0 serves (fused block +
  in-kernel window shift, mask-DMA label masks, pair off, fold off);
* ``max-kernel`` — every optional kernel on (pair kernel, in-kernel
  int32 label masks, parity H/W head fold), so the opt-in paths cannot
  rot unvalidated.

The CPU suite pins kernel-vs-XLA parity in interpret mode; this
catches what interpret cannot: silent Mosaic MIS-compiles on the
actual hardware.  Exit code 0 iff every arm PASSes.

Usage: python tools/tpu_validate.py [--tol 0.08] [--arm default|max-kernel]
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
    ap.add_argument("--arm", choices=["default", "max-kernel",
                                      "kernel-bwd"],
                    default=None, help="validate one arm only")
    args = ap.parse_args()
    from medical_image_segmentation_with_visual_prompts_tpu.models import \
        SwinUnetR

    roi = (128, 128, 8)
    xla_conf = _flagship_conf(attn_impl="xla", compute_dtype="bfloat16",
                              fold_head_hw=False, fold_head_depth=False)
    model = SwinUnetR(xla_conf)
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

    if args.arm == "kernel-bwd":
        return 0 if _validate_kernel_bwd(SwinUnetR, variables, x,
                                         args.tol) else 1
    want = run(xla_conf)
    scale = float(np.max(np.abs(want)))
    arms = {
        "default": ({}, dict(attn_impl="auto", compute_dtype="bfloat16")),
        "max-kernel": ({"MIVP_PAIR_KERNEL": "1", "MIVP_MASK_DMA": "0"},
                       dict(attn_impl="auto", compute_dtype="bfloat16",
                            fold_head_hw=True)),
    }
    if args.arm:
        arms = {args.arm: arms[args.arm]}
    import os
    ok = True
    for arm, (env, conf_kw) in arms.items():
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            got = run(_flagship_conf(**conf_kw))
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
        ok = _judge(arm, got, want, scale, args.tol) and ok
    ok = _validate_kernel_bwd(SwinUnetR, variables, x, args.tol) and ok
    return 0 if ok else 1


def _validate_kernel_bwd(SwinUnetR, variables, x, tol):
    """Gradient arm: the fused BACKWARD kernel (ops/fused_block_bwd.py,
    ``MIVP_KERNEL_BWD``) vs the jnp-reference vjp, both through the
    flagship kernel forward on device, at the canonical training
    dropout 0.1 (the backward kernel's dropout-recompute path).
    Relative-L2 judgement per gradient leaf: backward miscompiles show
    up as O(1) relative errors, bf16 reassociation as <=the forward
    tolerance band."""
    import os

    import jax

    conf = _flagship_conf(attn_impl="auto", compute_dtype="bfloat16",
                          attn_drop=0.1, proj_drop=0.1)
    model = SwinUnetR(conf)
    x = x[:4]  # backward keeps conv/LN activations alive; bound HBM

    def loss(v, xx):
        out, _ = model.apply(v, xx, deterministic=False,
                             rngs={"dropout": jax.random.PRNGKey(7)},
                             mutable=["batch_stats"])
        return jnp.sum(out["downstream"].astype(jnp.float32) ** 2) \
            / xx.size

    def run_arm(flag):
        saved = os.environ.get("MIVP_KERNEL_BWD")
        os.environ["MIVP_KERNEL_BWD"] = flag
        try:
            # Fresh jit wrapper per arm: the env gate is read at TRACE
            # time, so reusing one jitted callable across arms silently
            # reuses the first arm's executable (vacuous PASS).
            g = jax.jit(jax.grad(loss, argnums=(0, 1)))(variables, x)
            return jax.tree_util.tree_map(
                lambda a: np.asarray(a, np.float64), g)
        finally:
            if saved is None:
                os.environ.pop("MIVP_KERNEL_BWD", None)
            else:
                os.environ["MIVP_KERNEL_BWD"] = saved

    want = run_arm("0")
    got = run_arm("1")
    gp, _ = jax.tree_util.tree_flatten_with_path(got)
    wp, _ = jax.tree_util.tree_flatten_with_path(want)
    # Global gradient scale: near-zero-norm leaves (e.g. barely-touched
    # params) make RELATIVE error meaningless under bf16 noise; judge
    # those on ABSOLUTE error against the global RMS element instead.
    g_rms = float(np.sqrt(np.mean(
        [float(np.mean(b ** 2)) for _, b in wp])))
    rows = []
    for (path, a), (_, b) in zip(gp, wp):
        bn = np.linalg.norm(b)
        rel = np.linalg.norm(a - b) / (bn + 1e-12)
        mabs = float(np.max(np.abs(a - b))) if a.size else 0.0
        key = jax.tree_util.keystr(path)
        rows.append((rel, mabs, bn, key))
    sig = [r for r in rows if r[1] > tol * g_rms]  # significant deviation
    worst = max((r[0] for r in sig), default=0.0)
    any_dev = max((r[0] for r in rows), default=0.0)
    for r in sorted(rows, reverse=True)[:5]:
        print(f"  leaf rel={r[0]:.4f} max_abs={r[1]:.2e} "
              f"norm={r[2]:.2e} {r[3][-70:]}")
    # any_dev == 0 exactly means both arms ran the SAME backward (the
    # kernel never engaged, or one executable served both) — vacuous.
    status = "PASS" if (any_dev > 0.0 and worst < tol) else "FAIL"
    print(f"tpu_validate[kernel-bwd]: {status} "
          f"worst_significant_rel_l2={worst:.6f} "
          f"(grad rms {g_rms:.2e}, tol {tol}"
          f"{'; exact-zero deviation is vacuous' if any_dev == 0 else ''})")
    return status == "PASS"


def _judge(arm, got, want, scale, tol):
    err = float(np.max(np.abs(got - want)))
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
    status = "PASS" if (err < tol and confident == 0.0) else "FAIL"
    print(f"tpu_validate[{arm}]: {status} max_abs_err={err:.4f} "
          f"(logit scale {scale:.2f}) label_mismatch={lab_diff:.2e} "
          f"confident_flips={confident:.2e} (tol {tol})")
    return status == "PASS"


if __name__ == "__main__":
    sys.exit(main())
