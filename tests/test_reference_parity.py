"""Full-model forward parity against the LIVE reference implementation.

Runs the actual reference PyTorch ``SwinUnetR`` (/root/reference/src,
executed read-only with a minimal MONAI stub), imports its state_dict
through utils/torch_import.py, and asserts our forward matches —
the end-to-end evidence for BASELINE.md's Dice-parity target (the
per-window eval protocol of reference segmentation.py:204-300 reduces
to this forward agreement).
"""

import pathlib
import sys

import numpy as np
import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT / "tools"))

pytestmark = pytest.mark.skipif(
    not pathlib.Path("/root/reference/src").is_dir(),
    reason="reference checkout not mounted")


def _run(mode, size=(16, 16, 8), batch=2):
    import parity_vs_reference as pvr
    hparams = pvr.build_hparams(
        str(ROOT / "configurations" / "tiny_cpu.yml"), mode, size)
    rng = np.random.default_rng(0)
    x_np = rng.normal(0.3, 0.2, size=(batch, *size, 1)).astype(np.float32)
    sd, ref_out = pvr.reference_forward(hparams, x_np)
    our_out, report = pvr.ours_forward(hparams, sd, x_np)
    assert not report["unmatched_torch_keys"], \
        report["unmatched_torch_keys"]
    return list(pvr.compare(ref_out, our_out, mode))


def test_downstream_forward_matches_reference():
    pairs = _run("downstream")
    for name, r, o in pairs:
        assert r.shape == o.shape, name
        scale = max(np.abs(r).max(), 1e-6)
        np.testing.assert_array_less(
            np.abs(r - o).max() / scale, 1e-4, err_msg=name)
    # The evaluation protocol's label agreement is exact.
    (_, r, o), = [p for p in pairs if p[0] == "downstream"]
    import parity_vs_reference as pvr
    assert pvr.dice_of_argmax(r, o) == 1.0


def test_ssl_decoder_forward_matches_reference():
    for name, r, o in _run("self_supervised_learning_decoder"):
        scale = max(np.abs(r).max(), 1e-6)
        assert np.abs(r - o).max() / scale < 1e-4, name


def test_pad_quirk_geometry_matches_reference():
    """A geometry that triggers the reference's pad-ALL-axes quirk
    (stage feature depth < window while H/W are aligned — the canonical
    config hits this at stages 1-2).  pad_mode='reference' (default)
    must match the live reference exactly; this failed at rel 0.45
    before the quirk was replicated."""
    import parity_vs_reference as pvr
    import numpy as np
    hparams = pvr.build_hparams(
        str(ROOT / "configurations" / "tiny_cpu.yml"), "downstream",
        (32, 32, 8))
    # Window (4,4,4): feature dims (16,16,4) at stage 0 (aligned), then
    # (8,8,2) at stage 1 -> depth misaligned -> reference pads H/W too.
    hparams.attn_window_size = [4, 4, 4]
    rng = np.random.default_rng(0)
    x_np = rng.normal(0.3, 0.2, size=(1, 32, 32, 8, 1)).astype(np.float32)
    sd, ref_out = pvr.reference_forward(hparams, x_np)
    our_out, report = pvr.ours_forward(hparams, sd, x_np)
    assert not report["unmatched_torch_keys"]
    (_, r, o), = list(pvr.compare(ref_out, our_out, "downstream"))
    scale = max(np.abs(r).max(), 1e-6)
    assert np.abs(r - o).max() / scale < 1e-4


def test_export_direction_matches_reference():
    """EXPORT direction: a random-init framework model exported via
    utils/torch_export.py and loaded into the LIVE reference model
    (strict=False) produces the same forward."""
    import parity_vs_reference as pvr
    from argparse import Namespace
    from medical_image_segmentation_with_visual_prompts_tpu.models import \
        ModelConfig
    from medical_image_segmentation_with_visual_prompts_tpu.utils. \
        torch_export import export_state_dict

    for mode in ("downstream", "self_supervised_learning_decoder"):
        hparams = pvr.build_hparams(
            str(ROOT / "configurations" / "tiny_cpu.yml"), mode, (16, 16, 8))
        rng = np.random.default_rng(0)
        x_np = rng.normal(0.3, 0.2, size=(2, 16, 16, 8, 1)).astype(
            np.float32)
        our_out, variables = pvr.ours_forward(hparams, None, x_np)
        sd = export_state_dict(variables,
                               ModelConfig.from_namespace(hparams))
        ref_out = pvr.reference_forward_from_sd(hparams, sd, x_np)
        for name, r, o in pvr.compare(ref_out, our_out, mode):
            assert r.shape == o.shape, (mode, name)
            scale = max(np.abs(r).max(), 1e-6)
            assert np.abs(r - o).max() / scale < 1e-4, (mode, name)


def test_training_dynamics_parity(tmp_path):
    """N optimizer steps of the downstream few-shot fit agree with the
    live reference: loss trajectory, trained parameters (prompt tokens +
    PE token bias + downstream head), and frozen-backbone invariance —
    pins the AdamW-over-downstream-params + StepLR + freezing semantics
    combination (reference segmentation.py:25-39, :155) that forward
    parity cannot (VERDICT r2 missing #1)."""
    import train_parity_vs_reference as tpvr
    from medical_image_segmentation_with_visual_prompts_tpu.models import \
        ModelConfig
    from medical_image_segmentation_with_visual_prompts_tpu.utils. \
        torch_export import export_state_dict

    epochs = 4
    hparams = tpvr.build_hparams(
        str(ROOT / "configurations" / "tiny_cpu.yml"), "downstream",
        tpvr.SIZE)
    batches = tpvr.make_batches()
    sd0, ref_losses, sd1 = tpvr.reference_train(hparams, batches, epochs)
    our_losses, final_state, _ = tpvr.ours_train(
        hparams, sd0, batches, epochs, tmp_path)

    assert len(our_losses) == len(ref_losses) == epochs + 1
    for r, o in zip(ref_losses, our_losses):
        assert abs(r - o) / max(abs(r), 1e-8) < 1e-4, (r, o)

    conf = ModelConfig.from_namespace(hparams)
    our_sd1 = export_state_dict(
        {"params": final_state["params"],
         "batch_stats": final_state["batch_stats"]}, conf)
    bookkeeping = lambda k: "running_" in k or "batches_tracked" in k
    trained = [k for k in sd1 if not bookkeeping(k)
               and not np.allclose(sd1[k], sd0[k], atol=0.0)]
    assert trained, "reference trained nothing — harness is broken"
    for k in sd1:
        if k not in our_sd1 or bookkeeping(k):
            continue
        err = float(np.max(np.abs(
            np.asarray(our_sd1[k], np.float64)
            - np.asarray(sd1[k], np.float64))))
        if k in trained:
            assert err < 1e-4, (k, err)
        else:
            assert err == 0.0, f"frozen param {k} drifted by {err}"


def test_forward_parity_odd_pad_geometry():
    """Forward parity at a geometry with ODD pad totals (token grid
    6x6x4, window 4x4x2 -> stage-1 dims (3,3,2) pad (0,1) per axis).

    Pins two reversed()-induced reference quirks (round-4 findings):
    ``F.pad(tuple(reversed(paddings)))`` flips each axis's lo/hi, so the
    reference pads (ceil, floor) but crops/masks with (floor, ceil) —
    shifting every misaligned block output by one voxel
    (ops/windows.py::unpad_paddings) — and PatchMerging pads odd dims at
    the FRONT (down.py:26-28).  Canonical geometries have only even
    totals, so only odd-pad shapes exercise these paths."""
    for mode in ("downstream", "self_supervised_learning_decoder"):
        pairs = _run(mode, size=(12, 12, 8))
        for name, r, o in pairs:
            assert r.shape == o.shape, (mode, name)
            scale = max(np.abs(r).max(), 1e-6)
            assert np.abs(r - o).max() / scale < 1e-4, (mode, name)


def test_training_dynamics_parity_phase1(tmp_path):
    """N optimizer steps of phase-1 MultiView agree with the live
    reference on fixed views: per-loss trajectories (rec/rot/con), the
    trained encoder+prompt parameters, and the per-STEP
    WarmupCosineSchedule (reference multi_view.py:57-88, :190) —
    VERDICT r3 missing #1."""
    import train_parity_phases as tpp

    epochs = 3
    hparams = tpp.build_hparams(
        str(ROOT / "configurations" / "tiny_cpu.yml"),
        "self_supervised_learning_encoder", tpp.SIZE)
    hparams.roi_size = list(tpp.SIZE)
    hparams.batch_size_multi_view = tpp.BATCH
    hparams.num_samples_multi_view = 1
    masks = tpp.make_masks(hparams.masking_ratio)
    batches = tpp.make_phase1_batches()
    sd0, ref_losses, sd1 = tpp.reference_phase1(hparams, batches, epochs,
                                                masks)
    our_losses, final_state, _ = tpp.ours_phase1(
        hparams, sd0, batches, epochs, masks, tmp_path)
    for name in ("rec", "rot", "con", "tot"):
        assert len(our_losses[name]) == len(ref_losses[name]) == epochs + 1
        for r, o in zip(ref_losses[name], our_losses[name]):
            assert abs(r - o) / max(abs(r), 1e-8) < 1e-4, (name, r, o)
    # Warmup quirk is pinned: the first optimizer step runs at lr 0
    # (LambdaLR applies lambda(0)=0), so steps 0 and 1 see equal params.
    assert ref_losses["tot"][0] == ref_losses["tot"][1]

    from medical_image_segmentation_with_visual_prompts_tpu.models import \
        ModelConfig
    from medical_image_segmentation_with_visual_prompts_tpu.utils. \
        torch_export import export_state_dict
    conf = ModelConfig.from_namespace(hparams)
    our_sd1 = export_state_dict(
        {"params": final_state["params"],
         "batch_stats": final_state["batch_stats"]}, conf)
    bookkeeping = lambda k: "running_" in k or "batches_tracked" in k
    trained = [k for k in sd1 if not bookkeeping(k)
               and not np.allclose(sd1[k], sd0[k], atol=0.0)]
    assert trained, "reference trained nothing — harness is broken"
    for k in sd1:
        if k not in our_sd1 or bookkeeping(k):
            continue
        err = float(np.max(np.abs(
            np.asarray(our_sd1[k], np.float64)
            - np.asarray(sd1[k], np.float64))))
        assert err < 5e-3, (k, err)


def test_training_dynamics_parity_phase2(tmp_path):
    """N steps of phase-2 StudentsTeacher agree with the live reference:
    loss trajectory, trained decoder(+prompt) params, frozen-encoder
    invariance, and the final TEACHER state — pinning tau and the
    EMA-teacher-FIRST ordering (reference students_teacher.py:24-79,
    :158-159, momentum_model.py:27-35) — VERDICT r3 missing #1.
    reduction_factor=1 makes the loss's student jitter exactly 0 on
    both sides (the only phase-2 stochasticity)."""
    import train_parity_phases as tpp

    epochs = 3
    hparams = tpp.build_hparams(
        str(ROOT / "configurations" / "tiny_cpu.yml"),
        "self_supervised_learning_decoder", tpp.SIZE)
    hparams.roi_size = list(tpp.SIZE)
    hparams.reduction_factor = 1.0
    batches = tpp.make_phase2_batches(hparams.crop_size_students)
    (sd0_s, sd0_t), ref_losses, (sd1_s, sd1_t) = tpp.reference_phase2(
        hparams, batches, epochs)
    our_losses, final_state, final_teacher, _ = tpp.ours_phase2(
        hparams, sd0_s, sd0_t, batches, epochs, tmp_path)
    assert len(our_losses) == len(ref_losses) == epochs + 1
    for r, o in zip(ref_losses, our_losses):
        assert abs(r - o) / max(abs(r), 1e-8) < 1e-4, (r, o)

    from medical_image_segmentation_with_visual_prompts_tpu.models import \
        ModelConfig
    from medical_image_segmentation_with_visual_prompts_tpu.utils. \
        torch_export import export_state_dict
    conf = ModelConfig.from_namespace(hparams)
    bookkeeping = lambda k: "running_" in k or "batches_tracked" in k

    our_sd1 = export_state_dict(
        {"params": final_state["params"],
         "batch_stats": final_state["batch_stats"]}, conf)
    trained = [k for k in sd1_s if not bookkeeping(k)
               and not np.allclose(sd1_s[k], sd0_s[k], atol=0.0)]
    assert trained, "reference trained nothing — harness is broken"
    for k in sd1_s:
        if k not in our_sd1 or bookkeeping(k):
            continue
        err = float(np.max(np.abs(
            np.asarray(our_sd1[k], np.float64)
            - np.asarray(sd1_s[k], np.float64))))
        if k in trained:
            assert err < 5e-3, (k, err)
        else:
            assert err == 0.0, f"frozen student param {k} drifted by {err}"

    # Teacher: EMA blend of two random inits — every non-BN tensor pins
    # tau and the EMA-first ordering.
    our_tch = export_state_dict(
        {"params": final_teacher["params"],
         "batch_stats": final_teacher.get("batch_stats", {})}, conf)
    for k in sd1_t:
        if k not in our_tch or bookkeeping(k):
            continue
        err = float(np.max(np.abs(
            np.asarray(our_tch[k], np.float64)
            - np.asarray(sd1_t[k], np.float64))))
        assert err < 5e-3, (k, err)
