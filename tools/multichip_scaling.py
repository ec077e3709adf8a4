"""Multi-chip scaling evidence without multi-chip hardware.

VERDICT r4 item 4: `mesh_data` DP is correctness-proven (dryrun, DP==
single-device trajectory tests) but had no SCALING analysis.  This tool
compiles the DP train and serving steps over 1/2/4/8-device CPU meshes
(``xla_force_host_platform_device_count``) at fixed PER-DEVICE batch
and extracts, from the compiled (post-SPMD-partitioning) HLO:

1. **Program invariance** — the per-device program must not change
   with mesh size (weak scaling: each chip runs the same kernels on
   the same shapes; only the collective's replica set grows).  The
   compiled HLO is normalized (replica_groups / num_partitions /
   device-assignment strings masked) and hashed per mesh size.
2. **Collective accounting** — every ``all-reduce``/``all-gather``/
   ``reduce-scatter`` op's payload bytes are summed per step.  For DP
   the expectation is exactly one gradient all-reduce epsilon-close to
   the trainable-parameter bytes (plus scalar loss/metric reductions);
   serving must carry ZERO collective bytes besides the final logits
   all-gather (windows are independent).

The JSON report feeds docs/ARCHITECTURE.md "Projected multi-chip
scaling"; tests/test_multichip_scaling.py pins both properties on the
2- vs 4-device meshes.

Usage: python tools/multichip_scaling.py [--out report.json]
"""

import argparse
import hashlib
import json
import os
import re
import sys
from pathlib import Path

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


_NORMALIZERS = [
    # Collective replica sets and device assignments grow with the mesh.
    (re.compile(r"replica_groups=\{[^}]*\}"), "replica_groups={N}"),
    (re.compile(r"replica_groups=\[[^\]]*\]"
                r"(?:<=\[[0-9,]*\])?"), "replica_groups=[N]"),
    (re.compile(r"num_partitions=\d+"), "num_partitions=N"),
    (re.compile(r"device_assignment=\{[^}]*\}"), "device_assignment={N}"),
    (re.compile(r'"device_assignment":\s*\[[^\]]*\]'),
     '"device_assignment":[N]'),
    # Channel/computation ids may renumber between lowerings.
    (re.compile(r"channel_id=\d+"), "channel_id=N"),
    (re.compile(r"sharding=\{[^}]*\}"), "sharding={N}"),
    # Source-location metadata attributes (table ids renumber freely).
    (re.compile(r"metadata=\{[^}]*\}"), ""),
    # SCALAR float constants: global-batch mean normalizations (loss /
    # metric means divide by batch*N) are the ONE mathematically
    # mesh-dependent piece of the per-device program.  Masking scalar
    # literals keeps every op kind, every tensor shape and every layout
    # in the hash — the invariance claim is "same kernels on same
    # shapes; only collective replica sets and batch-mean scalars
    # scale with the mesh".
    (re.compile(r"constant\(-?[0-9][0-9.eE+-]*\)"), "constant(S)"),
    # SSA value-number suffixes (%mul.2425, %param_13.57) renumber when
    # an unrelated constant shifts the counter; ops/shapes are what the
    # hash must pin.
    (re.compile(r"\.\d+\b"), ".N"),
    # Value NAMES themselves alias freely (%broadcast.N vs %neg.N for
    # the same broadcast op between lowerings).  Canonicalizing every
    # %name keeps the per-line op kind, result/operand shapes, operand
    # count and attributes — the hash pins that stream.
    (re.compile(r"%[\w.\-]+"), "%v"),
]
# Line-level filters: numbered source-location index tables
# (``NNN {file_name_id=...}`` etc.) renumber wholesale between
# lowerings and carry no program semantics.
_TABLE_LINE = re.compile(r"\s*\d+ \{[a-z_]+_id=")


def normalized_hlo_hash(text: str) -> str:
    for pat, repl in _NORMALIZERS:
        text = pat.sub(repl, text)
    lines = [l for l in text.splitlines() if not _TABLE_LINE.match(l)]
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


_SHAPE_BYTES = {
    "f32": 4, "f64": 8, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
    "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1, "s64": 8, "u64": 8,
}


def _shape_bytes(shape_str: str) -> int:
    """Bytes of one HLO shape string like ``f32[8,16,32]{2,1,0}``."""
    m = re.match(r"(\w+)\[([0-9,]*)\]", shape_str.strip())
    if not m:
        return 0
    dt, dims = m.groups()
    if dt not in _SHAPE_BYTES:
        return 0
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _SHAPE_BYTES[dt]


def collective_bytes(text: str):
    """Per-kind payload bytes + op counts of collectives in compiled HLO."""
    out = {}
    for line in text.splitlines():
        s = line.strip()
        m = re.match(r"(?:ROOT\s+)?%?[\w.\-]+\s*=\s*(\([^)]*\)|[^ ]+)\s+"
                     r"(all-reduce|all-gather|reduce-scatter|"
                     r"collective-permute|all-to-all)", s)
        if not m:
            continue
        shape_str, kind = m.groups()
        if shape_str.startswith("("):
            # Tuple shapes: extract each dtype[dims] token whole (dims
            # contain commas, so a split-on-comma would mangle them).
            nbytes = sum(_shape_bytes(p) for p in
                         re.findall(r"\w+\[[0-9,]*\]", shape_str))
        else:
            nbytes = _shape_bytes(shape_str)
        ent = out.setdefault(kind, {"count": 0, "bytes": 0})
        ent["count"] += 1
        ent["bytes"] += nbytes
    return out


def _build(mesh_n: int, per_device_batch: int = 2):
    """Compile DP train + serving steps on an ``mesh_n``-device mesh at
    fixed per-device batch; returns (train_hlo, serve_hlo, param_bytes)."""
    import optax
    from __graft_entry__ import _flagship_conf
    from medical_image_segmentation_with_visual_prompts_tpu.models import (
        ModelConfig, SwinUnetR, partition)
    from medical_image_segmentation_with_visual_prompts_tpu.parallel import (
        make_dp_serving_step, make_dp_train_step, make_mesh)

    conf = _flagship_conf(
        depth_unet=2, hidden_channels=(8, 16, 32), num_heads_encoder=2,
        num_heads_decoder=2, attn_window_size=(4, 4, 2),
        pos_bias_embed_dim=8, tokens_per_prompt_encoder=4,
        tokens_per_prompt_decoder=4, compute_dtype="float32",
        attn_impl="xla")
    model = SwinUnetR(conf)
    size = (16, 16, 8)
    x0 = jnp.zeros((1, *size, 1))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x0, deterministic=True)
    labels = partition.trainable_labels(conf)
    trainable, frozen = partition.split_params(variables["params"], labels)
    batch_stats = variables.get("batch_stats", {})
    tx = optax.adamw(1e-3)
    opt_state = tx.init(trainable)
    mesh = make_mesh(mesh_n)

    b = per_device_batch * mesh_n
    img = jnp.zeros((b, *size, 1))
    msk = jnp.zeros((b, *size, 1))
    rng = jax.random.PRNGKey(0)

    step = make_dp_train_step(model, tx, frozen, mesh, (0, 2))
    train_hlo = step.lower(trainable, batch_stats, opt_state, img, msk,
                           rng).compile().as_text()
    serve = make_dp_serving_step(model, variables, mesh)
    serve_hlo = serve.lower(img).compile().as_text()

    param_bytes = sum(
        np.prod(l.shape) * l.dtype.itemsize
        for l in jax.tree_util.tree_leaves(trainable))
    return train_hlo, serve_hlo, int(param_bytes)


def run(mesh_sizes=(1, 2, 4, 8), per_device_batch: int = 2):
    report = {"per_device_batch": per_device_batch, "meshes": {}}
    for n in mesh_sizes:
        train_hlo, serve_hlo, param_bytes = _build(n, per_device_batch)
        report["trainable_param_bytes"] = param_bytes
        report["meshes"][str(n)] = {
            "train_hlo_hash": normalized_hlo_hash(train_hlo),
            "serve_hlo_hash": normalized_hlo_hash(serve_hlo),
            "train_collectives": collective_bytes(train_hlo),
            "serve_collectives": collective_bytes(serve_hlo),
        }
    hashes = {m["train_hlo_hash"] for m in report["meshes"].values()
              if m is not report["meshes"]["1"]}
    report["train_program_invariant_2_to_8"] = len(
        {report["meshes"][str(n)]["train_hlo_hash"]
         for n in (2, 4, 8) if str(n) in report["meshes"]}) <= 1
    ar = {n: m["train_collectives"].get("all-reduce", {"bytes": 0})["bytes"]
          for n, m in report["meshes"].items()}
    report["grad_allreduce_bytes"] = ar
    report["grad_allreduce_vs_param_bytes"] = {
        n: round(v / max(report["trainable_param_bytes"], 1), 3)
        for n, v in ar.items()}
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    rep = run()
    text = json.dumps(rep, indent=2)
    print(text)
    if args.out:
        Path(args.out).write_text(text)


if __name__ == "__main__":
    main()
