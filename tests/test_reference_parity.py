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
