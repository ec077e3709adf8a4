"""Golden-value tests for the loss implementations."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from medical_image_segmentation_with_visual_prompts_tpu.losses import (
    clustered_prototype_loss, contrastive_pair_loss, dice_focal_loss,
    dice_loss, focal_loss, sample_embedding)
from medical_image_segmentation_with_visual_prompts_tpu.losses.clustered_prototype import (
    _closest, _pos_weights, cluster_prototype)


# ----------------------------------------------------------- NT-Xent

def _ntxent_np(x_i, x_j, temp=0.5):
    """Direct float64 transcription of reference contrastive_pair_loss.py:19-31."""
    bs = x_i.shape[0]
    z = np.concatenate([
        x_i / np.linalg.norm(x_i, axis=1, keepdims=True),
        x_j / np.linalg.norm(x_j, axis=1, keepdims=True)])
    sim = z @ z.T
    sim_ij = np.diagonal(sim, offset=bs)
    sim_ji = np.diagonal(sim, offset=-bs)
    pos = np.exp(np.concatenate([sim_ij, sim_ji]) / temp)
    neg = (1 - np.eye(2 * bs)) * np.exp(sim / temp)
    return np.sum(-np.log(pos / np.sum(neg, axis=1))) / (2 * bs)


def test_contrastive_pair_loss_golden():
    rng = np.random.default_rng(0)
    x_i = rng.normal(size=(4, 8)).astype(np.float32)
    x_j = rng.normal(size=(4, 8)).astype(np.float32)
    got = float(contrastive_pair_loss(jnp.asarray(x_i), jnp.asarray(x_j)))
    want = _ntxent_np(x_i.astype(np.float64), x_j.astype(np.float64))
    assert abs(got - want) < 1e-4


def test_contrastive_identical_views_lower_than_random():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 8)).astype(np.float32)
    y = rng.normal(size=(4, 8)).astype(np.float32)
    same = float(contrastive_pair_loss(jnp.asarray(x), jnp.asarray(x)))
    diff = float(contrastive_pair_loss(jnp.asarray(x), jnp.asarray(y)))
    assert same < diff


# ----------------------------------------------------------- Dice/Focal

def test_dice_perfect_prediction_near_zero():
    # Logits strongly favoring the true class -> dice loss ~ 0.
    target = jnp.asarray(np.random.default_rng(0).integers(0, 2, (2, 4, 4, 2, 1)))
    logits = jax.nn.one_hot(target[..., 0], 2) * 100.0
    assert float(dice_loss(logits, target)) < 1e-3
    assert float(focal_loss(logits, target, gamma=4.0)) < 1e-6


def test_dice_golden_small_case():
    # Hand-computed: B=1, 2 voxels, 2 classes, softmax probs known.
    logits = jnp.asarray([[[[[0.0, 0.0]]], [[[0.0, 0.0]]]]])  # [1,2,1,1,2]
    target = jnp.asarray([[[[[0]]], [[[1]]]]])  # [1,2,1,1,1]
    # p = 0.5 everywhere. Per class: inter=0.5, denom=1+1=2
    # dice = 1 - (2*0.5 + 1e-5)/(2 + 1e-5)
    want = 1 - (1 + 1e-5) / (2 + 1e-5)
    got = float(dice_loss(logits, target))
    assert abs(got - want) < 1e-6
    # focal gamma=0 reduces to plain CE on softmax probs at true class,
    # averaged over ALL B,C,spatial elements (zeros elsewhere).
    got_f = float(focal_loss(logits, target, gamma=0.0))
    want_f = -math.log(0.5) / 2  # one nonzero element of two per voxel
    assert abs(got_f - want_f) < 1e-6
    got_df = float(dice_focal_loss(logits, target, gamma=0.0))
    assert abs(got_df - (want + want_f)) < 1e-6


def test_dice_exclude_background():
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(1, 4, 4, 2, 3)),
                         dtype=jnp.float32)
    target = jnp.zeros((1, 4, 4, 2, 1), dtype=jnp.int32)  # all background
    with_bg = float(dice_loss(logits, target, include_background=True))
    no_bg = float(dice_loss(logits, target, include_background=False))
    assert with_bg != no_bg


# ----------------------------------------------------------- prototype

def test_sample_embedding_identity_when_factor_one():
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.normal(size=(1, 4, 4, 2, 3)).astype(np.float32))
    coord = jnp.asarray(rng.normal(size=(1, 4, 4, 2, 3)).astype(np.float32))
    es, cs = sample_embedding(emb, coord, 1.0)
    # reduction factor 1 with half-pixel centers == identity sampling
    np.testing.assert_allclose(np.asarray(es),
                               np.asarray(emb).reshape(1, -1, 3), atol=1e-6)
    np.testing.assert_allclose(np.asarray(cs),
                               np.asarray(coord).reshape(1, -1, 3), atol=1e-6)


def test_sample_embedding_reduction_shape():
    emb = jnp.zeros((2, 8, 8, 4, 5))
    coord = jnp.zeros((2, 8, 8, 4, 3))
    es, cs = sample_embedding(emb, coord, 2.0)
    assert es.shape == (2, 4 * 4 * 2, 5)
    assert cs.shape == (2, 4 * 4 * 2, 3)


def test_pos_weights_and_closest():
    # Two points at distance 0 and 10: weight exp(0)=1 and tiny.
    cx = jnp.asarray([[[0.0, 0, 0]]])          # [1,1,3]
    cy = jnp.asarray([[[0.0, 0, 0], [10.0, 0, 0]]])  # [1,2,3]
    w = _pos_weights(cx, cy, fwhm=2.355 * 2)  # sigma = 2
    np.testing.assert_allclose(np.asarray(w[0, 0]),
                               [1.0, math.exp(-100 / 8)], rtol=1e-5)
    idx, mask = _closest(cx, cy, max_dist=4.0)
    assert int(idx[0, 0]) == 0 and bool(mask[0, 0])
    idx2, mask2 = _closest(cx + 100.0, cy, max_dist=4.0)
    assert not bool(mask2[0, 0])  # beyond max_dist -> masked out


def test_cluster_prototype_converges_to_two_clusters():
    # Teacher embeddings in two well-separated groups; prototypes must
    # move onto the group means (up to normalization).
    g1 = np.array([1.0, 0.0, 0.0])
    g2 = np.array([0.0, 1.0, 0.0])
    emb_t = jnp.asarray(np.stack([g1, g1, g2, g2])[None].astype(np.float32))
    coord_t = jnp.asarray(
        np.array([[0, 0, 0], [1, 0, 0], [50, 0, 0], [51, 0, 0]])[None]
        .astype(np.float32))
    emb_p = emb_t[:, [0, 2]]
    coord_p = coord_t[:, [0, 2]]
    emb_p2, coord_p2, sim = cluster_prototype(
        emb_p, coord_p, emb_t, coord_t, n_iter=3, temp=0.033, fwhm=16.0)
    p = np.asarray(emb_p2[0])
    np.testing.assert_allclose(p[0], g1, atol=1e-3)
    np.testing.assert_allclose(p[1], g2, atol=1e-3)
    # Teacher->prototype assignment: first two rows prefer prototype 0.
    s = np.asarray(sim[0])
    assert s[0, 0] > s[0, 1] and s[2, 1] > s[2, 0]


def test_clustered_prototype_loss_runs_and_identical_student_is_low():
    rng = np.random.default_rng(0)
    emb_t = jnp.asarray(rng.normal(size=(2, 8, 8, 2, 6)).astype(np.float32))
    coord = np.stack(np.meshgrid(np.arange(8), np.arange(8), np.arange(2),
                                 indexing="ij"), axis=-1).astype(np.float32)
    coord = jnp.asarray(np.broadcast_to(coord[None], (2, 8, 8, 2, 3)).copy())
    key = jax.random.PRNGKey(0)
    # Student identical to teacher (same crop): loss should be finite and
    # lower than a random student.
    loss_same = float(clustered_prototype_loss(
        [emb_t], emb_t, [coord], coord, key,
        reduction_factor=2.0, k_means_iterations=2, fwhm=16.0))
    emb_rand = jnp.asarray(rng.normal(size=(2, 8, 8, 2, 6)).astype(np.float32))
    loss_rand = float(clustered_prototype_loss(
        [emb_rand], emb_t, [coord], coord, key,
        reduction_factor=2.0, k_means_iterations=2, fwhm=16.0))
    assert np.isfinite(loss_same) and np.isfinite(loss_rand)
    assert loss_same < loss_rand


def test_clustered_prototype_loss_differentiable_wrt_student():
    rng = np.random.default_rng(0)
    emb_t = jnp.asarray(rng.normal(size=(1, 4, 4, 2, 4)).astype(np.float32))
    emb_s = jnp.asarray(rng.normal(size=(1, 4, 4, 2, 4)).astype(np.float32))
    coord = np.stack(np.meshgrid(np.arange(4), np.arange(4), np.arange(2),
                                 indexing="ij"), axis=-1).astype(np.float32)
    coord = jnp.asarray(coord[None])
    key = jax.random.PRNGKey(1)

    def f(e):
        return clustered_prototype_loss(
            [e], emb_t, [coord], coord, key,
            reduction_factor=1.0, k_means_iterations=1, fwhm=8.0)

    g = jax.grad(f)(emb_s)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
