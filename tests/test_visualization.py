"""PNG visualization dumpers and similarity/pseudo-mask ops."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_view_dumpers_write_pngs(tmp_path, monkeypatch):
    import medical_image_segmentation_with_visual_prompts_tpu.utils.visualization as V
    if not V._HAVE_PIL:
        pytest.skip("PIL unavailable")
    monkeypatch.setattr(V, "_OUT_ROOT", tmp_path)
    rng = np.random.default_rng(0)
    img = rng.random((2, 16, 16, 8, 1)).astype(np.float32)
    rec = rng.random((2, 16, 16, 8, 1)).astype(np.float32)
    p1 = V.view_reconstruction(["case0"], 4, 0, 0, ori_img=img, rec_img=rec)
    assert p1.exists() and p1.suffix == ".png"
    logits = rng.random((2, 16, 16, 8, 3)).astype(np.float32)
    tgt = rng.integers(0, 3, (2, 16, 16, 8, 1)).astype(np.float32)
    p2 = V.view_segmentation("case0", 4, 0, 1, seg_pred=logits,
                             seg_target=tgt, img=img, n_classes=3)
    assert p2.exists()
    lat = rng.random((1, 16, 16, 8, 4)).astype(np.float32)
    p3 = V.view_prototype_students_teacher(
        ["case0"], 4, 0, 2, chs=4, prt_tch=lat, img_tch=img[:1],
        prt_sts=[lat], img_sts=[img[:1]])
    assert p3.exists()


def test_similarity_aggregation_and_pseudo_mask():
    from medical_image_segmentation_with_visual_prompts_tpu.ops.similarity import (
        generate_pseudo_mask_from_multi_view, similarity_aggregation,
        sinkhorn_knopp)
    rng = np.random.default_rng(0)
    latent = jnp.asarray(rng.normal(size=(2, 10, 6)).astype(np.float32))
    prompt = jnp.asarray(rng.normal(size=(2, 1, 4, 6)).astype(np.float32))
    sim = similarity_aggregation(latent, prompt)
    assert sim.shape == (2, 1, 10)
    assert float(sim.min()) >= 0.0 and float(sim.max()) <= 1.0
    sim_mean = similarity_aggregation(latent, prompt, mean_aggregation=True)
    assert sim_mean.shape == (2, 1, 10)

    lat5 = jnp.asarray(rng.normal(size=(2, 4, 4, 2, 6)).astype(np.float32))
    prm = jnp.asarray(rng.normal(size=(2, 4, 6)).astype(np.float32))
    pse = generate_pseudo_mask_from_multi_view(lat5, prm, n_tokens=4)
    assert pse.shape == (2, 4, 4, 2, 1)

    q = jnp.asarray(rng.random((2, 4, 4, 2, 3)).astype(np.float32))
    out = sinkhorn_knopp(q, num_iters=3)
    assert out.shape == q.shape
    assert np.isfinite(np.asarray(out)).all()
