"""Device sweep of the fused-block (window group g, head block hb)
tiling TOGETHER with the compiler's scoped-VMEM budget.

Round-3 left the flagship attention kernels 20-30% above their own
pass-count floor (docs/PERF.md roofline): at g=8/hb=1 each grid step
issues 4 (heads) x 8 (batched windows) SHORT MXU score/PV sequences of
m=256 rows, so per-sequence pipeline fill is a first-order cost.
Deeper head blocks quarter the sequence count but their fp32 score tile
([g, hb*m, n]) blows the default ~16M scoped-VMEM limit — this sweep
raises the limit per kernel via ``MIVP_VMEM_SAFE_MB`` (the repo's picker
budget, which also sets Mosaic ``vmem_limit_bytes`` — see
window_attention_pallas.mosaic_params; one subprocess per config since
the knobs are read at trace time), and times BOTH flagship stage-0
kernels (unshifted, and shifted+masked with the fused in-kernel window
shift) by trace aggregation (wall timing through the axon async
dispatch is unreliable — PERF.md round-2 note).

Usage:
  python tools/sweep_ghb.py                 # parent: run the sweep
  python tools/sweep_ghb.py --child --g 8 --hb 2   # one config (internal)

Reference hot loop being optimized: window_attention.py:49-60.
"""

import argparse
import json
import os
import pathlib
import shutil
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

# Flagship stage-0 geometry (PERF.md roofline: the 4 dominant kernels).
# Round 4: the window is the REAL stage-0 (8,8,4) — the earlier
# (16,16,1) stand-in had the same m/n/c but its 33-component bias
# decomposition exceeds the free K-tile lanes, so the bias fold
# (ops/bias_fold.py, MIVP_BIAS_FOLD) could never engage in the sweep.
BP, M, C, HEADS, TOKENS = 1024, 256, 48, 4, 64
GRID, WC, SHIFT = (4, 4, 1), (8, 8, 4), (4, 4, 0)


def child(g: int, hb: int, reps: int) -> None:
    from medical_image_segmentation_with_visual_prompts_tpu.utils.backend \
        import configure_backend
    configure_backend()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from profile_bench import aggregate_trace
    from medical_image_segmentation_with_visual_prompts_tpu.ops. \
        fused_block import fused_swin_block
    from medical_image_segmentation_with_visual_prompts_tpu.ops.windows \
        import get_attn_labels

    n = M + TOKENS
    b = BP // int(np.prod(GRID))
    rng = np.random.default_rng(0)
    f = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    params = {k: f(C, C) for k in ("wq", "wk", "wv", "wproj", "wmlp")}
    params.update({k: f(C) for k in ("ln1_scale", "ln1_bias", "bproj",
                                     "ln2_scale", "ln2_bias", "bmlp")})
    x = f(b, int(np.prod(GRID)), M, C).astype(jnp.bfloat16)
    tok = f(TOKENS, C).astype(jnp.bfloat16)
    bias = f(1, 1, HEADS, M, n)
    scale = (C // HEADS) ** -0.5
    shape_x = tuple(gr * w for gr, w in zip(GRID, WC))
    labels = get_attn_labels(shape_x, WC, SHIFT, (0,) * 6)
    labels = np.concatenate(
        [labels, np.full((labels.shape[0], TOKENS), -1, np.int32)], axis=-1)

    def timed(name, fn, *args):
        out = fn(*args)
        out.block_until_ready()
        td = pathlib.Path(f"/tmp/mivp_ghb/{name}_{g}_{hb}")
        shutil.rmtree(td, ignore_errors=True)
        td.mkdir(parents=True)
        with jax.profiler.trace(str(td)):
            for _ in range(reps):
                out = fn(*args)
            out.block_until_ready()
        agg, _, _ = aggregate_trace(td)
        us = sum(dur for nm, (dur, cnt) in agg.items()
                 if "custom-call" in nm or "pallas" in nm or "fused" in nm)
        if us == 0 and agg:
            us = max(dur for nm, (dur, cnt) in agg.items())
        return us / reps / 1e3

    res = {"g": g, "hb": hb,
           "vmem_mb": os.environ.get("MIVP_VMEM_SAFE_MB", "14"),
           "fold": os.environ.get("MIVP_BIAS_FOLD", "0")}
    if os.environ.get("MIVP_PAIR_KERNEL", "0") not in ("0", ""):
        # Pair kernel: both blocks (unshifted + shifted/masked) in ONE
        # kernel — compare pair_ms against plain_ms + shift_ms.
        from medical_image_segmentation_with_visual_prompts_tpu.ops. \
            fused_block import fused_swin_pair
        fn_pair = jax.jit(lambda xx, tt, bb: fused_swin_pair(
            xx, tt, tt, params, params, bb, bb, labels, scale, HEADS,
            shift_geom=(GRID, WC, SHIFT), fold_meta=(WC, None)))
        res["pair_ms"] = round(timed("pair", fn_pair, x, tok, bias), 4)
    else:
        fn_plain = jax.jit(lambda xx, tt, bb: fused_swin_block(
            xx, tt, params, bb, None, scale, HEADS,
            fold_meta=(WC, None)))
        fn_shift = jax.jit(lambda xx, tt, bb: fused_swin_block(
            xx, tt, params, bb, labels, scale, HEADS,
            shift_geom=(GRID, WC, SHIFT), fold_meta=(WC, None)))
        res["plain_ms"] = round(timed("plain", fn_plain, x, tok, bias), 4)
        res["shift_ms"] = round(timed("shift", fn_shift, x, tok, bias), 4)
    print("RESULT " + json.dumps(res), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--g", type=int, default=8)
    ap.add_argument("--hb", type=int, default=1)
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--configs", default=None,
                    help="comma list g:hb:vmem_mb (vmem_mb sets both the "
                         "picker budget and the XLA scoped limit)")
    args = ap.parse_args()
    if args.child:
        child(args.g, args.hb, args.reps)
        return

    configs = []
    if args.configs:
        for tok in args.configs.split(","):
            parts = tok.split(":")
            g, hb, mb = int(parts[0]), int(parts[1]), float(parts[2])
            pair = "pair" in parts[3:]
            fold = "fold" in parts[3:]
            configs.append((g, hb, mb, pair, fold))
    else:
        configs = [
            (8, 1, 14, False, False),  # round-3 production pick (baseline)
            (8, 1, 14, False, True),   # bias fold, kernel-level A/B
            (8, 2, 52, False, False),  # halve sequence count
            (8, 2, 52, False, True),
            (4, 4, 52, False, True),   # quarter sequence count
            (8, 1, 52, True, False),   # pair kernel at full g
            (8, 1, 52, True, True),
        ]
    for g, hb, mb, pair, fold in configs:
        env = dict(os.environ)
        env["MIVP_FORCE_G"] = str(g)
        env["MIVP_FORCE_HB"] = str(hb)
        env["MIVP_VMEM_SAFE_MB"] = str(mb)
        env["MIVP_PAIR_KERNEL"] = "1" if pair else "0"
        env["MIVP_BIAS_FOLD"] = "1" if fold else "0"
        # MIVP_VMEM_SAFE_MB > 14 also raises Mosaic's per-kernel VMEM
        # limit (window_attention_pallas.mosaic_params) — the portable
        # replacement for --xla_tpu_scoped_vmem_limit_kib, which this
        # environment's local process cannot even parse.
        print(f"--- g={g} hb={hb} vmem={mb}M"
              f"{' pair' if pair else ''}{' fold' if fold else ''}",
              flush=True)
        try:
            r = subprocess.run(
                [sys.executable, __file__, "--child", "--g", str(g),
                 "--hb", str(hb), "--reps", str(args.reps)],
                env=env, capture_output=True, text=True, timeout=2400)
        except subprocess.TimeoutExpired:
            print("TIMEOUT (2400s) — skipping config", flush=True)
            continue
        for line in r.stdout.splitlines():
            if line.startswith("RESULT"):
                print(line, flush=True)
                break
        else:
            tail = (r.stdout + r.stderr).strip().splitlines()[-6:]
            print("FAILED:\n  " + "\n  ".join(tail), flush=True)


if __name__ == "__main__":
    main()
