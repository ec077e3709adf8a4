"""NIfTI codec, transforms, dataset/loader and augment-op tests."""

from argparse import Namespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_segmentation_with_visual_prompts_tpu.data import (
    DataLoader, Dataset, load_nifti, save_nifti)
from medical_image_segmentation_with_visual_prompts_tpu.data import transforms as T
from medical_image_segmentation_with_visual_prompts_tpu.data.datasets import (
    get_fit_loader_downstream, get_test_loader_downstream)
from medical_image_segmentation_with_visual_prompts_tpu.ops.augment import (
    map_label_indices, random_mask, random_permute, random_rotate)


# ---------------------------------------------------------------- NIfTI

def test_nifti_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    vol = rng.normal(size=(12, 10, 6)).astype(np.float32)
    p = save_nifti(tmp_path / "a.nii", vol)
    data, affine = load_nifti(p)
    np.testing.assert_array_equal(data, vol)
    np.testing.assert_array_equal(affine, np.eye(4))


def test_nifti_gzip_and_int_dtype(tmp_path):
    vol = np.arange(2 * 3 * 4, dtype=np.int16).reshape(2, 3, 4)
    p = save_nifti(tmp_path / "b.nii.gz", vol)
    data, _ = load_nifti(p)
    np.testing.assert_array_equal(data, vol)
    assert data.dtype == np.int16


def test_orient_ras_flip_and_permute():
    vol = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    # Affine flipping axis 0: RAS orientation must flip it back.
    aff = np.diag([-1.0, 1.0, 1.0, 1.0])
    out = T.orient_ras(vol, aff)
    np.testing.assert_array_equal(out, vol[::-1])
    # Affine swapping axes 0 and 1.
    aff2 = np.eye(4)
    aff2[:3, :3] = np.array([[0, 1, 0], [1, 0, 0], [0, 0, 1]], float)
    out2 = T.orient_ras(vol, aff2)
    np.testing.assert_array_equal(out2, np.transpose(vol, (1, 0, 2)))


# ----------------------------------------------------------- transforms

def test_scale_intensity_range():
    x = np.array([-2000.0, -1000.0, 0.0, 1000.0, 2000.0])
    y = T.scale_intensity_range(x)
    np.testing.assert_allclose(y, [0.0, 0.0, 0.5, 1.0, 1.0])


def test_crop_pad_and_coord_grid():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(10, 8, 4, 1)).astype(np.float32)
    crop, start = T.rand_spatial_crop(x, (4, 4, 2), rng)
    assert crop.shape == (4, 4, 2, 1)
    crop2, _ = T.rand_spatial_crop(x, (4, 4, 2), rng, start=start)
    np.testing.assert_array_equal(crop, crop2)  # start reuse aligns keys
    padded = T.spatial_pad(crop, (6, 6, 4))
    assert padded.shape == (6, 6, 4, 1)
    g = T.get_coord_grid((4, 4, 2))
    assert g.shape == (4, 4, 2, 3)
    np.testing.assert_allclose(g.mean(axis=(0, 1, 2)), [0, 0, 0], atol=1e-6)
    assert g[0, 0, 0, 0] == -1.5  # (4-1)/2 centered


def test_resize_modes():
    x = np.arange(8, dtype=np.float32).reshape(2, 2, 2, 1)
    up = T.resize(x, (4, 4, 4), "trilinear")
    assert up.shape == (4, 4, 4, 1)
    nn = T.resize(x, (4, 4, 4), "nearest")
    assert set(np.unique(nn)) == set(np.unique(x))


def test_intensity_augs_preserve_shape():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(8, 8, 4, 1)).astype(np.float32)
    for fn in (T.rand_bias_field, T.rand_adjust_contrast,
               T.rand_histogram_shift):
        assert fn(x, rng).shape == x.shape
    assert T.rand_std_shift(x, rng).shape == x.shape
    assert T.rand_scale_intensity(x, rng).shape == x.shape
    d = T.rand_coarse_dropout(x, rng, holes=2, spatial_size=2,
                              max_holes=3, max_spatial_size=4)
    assert d.shape == x.shape and (d == 0).sum() >= 0
    s = T.rand_coarse_shuffle(x, rng, holes=1, spatial_size=2,
                              max_holes=2, max_spatial_size=4)
    assert s.shape == x.shape
    # Shuffle preserves the multiset of values.
    np.testing.assert_allclose(np.sort(s.ravel()), np.sort(x.ravel()),
                               rtol=1e-6)


# ------------------------------------------------------------- pipeline

def _make_dataset(tmp_path, n=3, shape=(24, 24, 6)):
    rng = np.random.default_rng(0)
    (tmp_path / "img").mkdir()
    (tmp_path / "msk").mkdir()
    for i in range(n):
        vol = rng.normal(0, 500, size=shape).astype(np.float32)
        msk = rng.integers(0, 6, size=shape).astype(np.float32)
        save_nifti(tmp_path / "img" / f"case{i}.nii.gz", vol)
        save_nifti(tmp_path / "msk" / f"case{i}.nii.gz", msk)
    return tmp_path / "img", tmp_path / "msk"


def _conf(img, msk, **kw):
    base = dict(
        training_mode="downstream", image_dict_key="image",
        mask_dict_key="mask", coord_dict_key="coord",
        image_dir_downstream=str(img), mask_dir_downstream=str(msk),
        image_dir_test=str(img), mask_dir_test=str(msk),
        image_dir_pretrain=str(img), mask_dir_supervised=str(msk),
        image_dir_supervised=str(img),
        num_selected_data_downstream=-1, num_selected_data_pretrain=-1,
        num_selected_data_supervised=-1,
        split_ratio=0.8, num_workers=1, pin_memory=False,
        random_orientation=False, random_transforms=True,
        orientation="axial", resize_content=False,
        resize_spatial_size=(32, 32, 8),
        seg_input_size=(16, 16, 4), roi_size=(16, 16, 4),
        crop_size_students=[(12, 12, 4), (8, 8, 4)],
        num_samples_downstream=2, num_samples_multi_view=2,
        num_samples_students_teacher=2,
        batch_size_downstream=2, batch_size_multi_view=2,
        batch_size_students_teacher=2,
        use_prototype_assignment=True,
    )
    base.update(kw)
    return Namespace(**base)


def test_downstream_loader_batches(tmp_path):
    img, msk = _make_dataset(tmp_path)
    conf = _conf(img, msk)
    train, val = get_fit_loader_downstream(conf)
    batch = next(iter(train))
    assert batch["image"].shape == (2, 16, 16, 4, 1)
    assert batch["mask"].shape == (2, 16, 16, 4, 1)
    assert isinstance(batch["name"], list)
    assert batch["image"].min() >= 0.0 and batch["image"].max() <= 1.0


def test_test_loader_full_volumes(tmp_path):
    img, msk = _make_dataset(tmp_path)
    conf = _conf(img, msk)
    loader = get_test_loader_downstream(conf)
    batches = list(iter(loader))
    assert len(batches) == 3  # bs=1, all volumes, unshuffled
    assert batches[0]["image"].shape == (1, 24, 24, 6, 1)


def test_pretrain_loader_student_views(tmp_path):
    img, msk = _make_dataset(tmp_path)
    conf = _conf(img, msk, training_mode="self_supervised_learning_all")
    from medical_image_segmentation_with_visual_prompts_tpu.data.datasets import \
        get_fit_loader_self_supervised_learning
    train, val = get_fit_loader_self_supervised_learning(conf)
    batch = next(iter(train))
    assert batch["image"].shape == (2, 16, 16, 4, 1)
    assert batch["coord"].shape == (2, 16, 16, 4, 3)
    assert batch["image_st_0"].shape == (2, 12, 12, 4, 1)
    assert batch["coord_st_0"].shape == (2, 12, 12, 4, 3)
    assert batch["image_st_1"].shape == (2, 8, 8, 4, 1)
    # Teacher/student coord grids share the volume-centered frame: every
    # student coordinate must appear within the teacher's coord range.
    assert batch["coord_st_0"].min() >= batch["coord"].min() - 1e-5
    assert batch["coord_st_0"].max() <= batch["coord"].max() + 1e-5


# ----------------------------------------------------------- augment ops

def test_random_rotate_labels_match():
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(4, 6, 6, 2, 1)).astype(np.float32))
    out, ks = random_rotate(x, key)
    assert out.shape == x.shape
    for b in range(4):
        expect = np.rot90(np.asarray(x[b]), k=int(ks[b]), axes=(0, 1))
        np.testing.assert_allclose(np.asarray(out[b]), expect, atol=1e-6)


def test_random_mask_exact_ratio():
    key = jax.random.PRNGKey(0)
    x = jnp.ones((2, 8, 8, 4, 1))
    xm, keep = random_mask(x, key, (8, 8, 4), (2, 2, 2), 0.25)
    n_patches = 4 * 4 * 2
    kept_patches = int(np.asarray(keep).sum()) // 8  # 2*2*2 voxels/patch
    assert kept_patches == round(n_patches * 0.75)
    # Masked voxels are zeroed.
    assert float(jnp.abs(xm[:, ~np.asarray(keep)]).sum()) == 0.0
    with pytest.raises(ValueError):
        random_mask(x, key, (8, 8, 4), (3, 3, 3), 0.25)


def test_random_permute_involution():
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 4, 4, 4, 1)).astype(np.float32))
    for c in range(3):
        y = random_permute(x, c)
        z = random_permute(y, c)
        np.testing.assert_array_equal(np.asarray(z), np.asarray(x))


def test_map_label_indices():
    m = jnp.asarray([[0.0, 5.0, 3.0, 2.0, 5.0, 7.0]])
    out = map_label_indices(m, [0, 5])
    np.testing.assert_array_equal(np.asarray(out), [[0, 1, 0, 0, 1, 0]])
    out2 = map_label_indices(m, [0, 2, 3, 5])
    np.testing.assert_array_equal(np.asarray(out2), [[0, 3, 2, 1, 3, 0]])


def test_load_pseudo_bg_mask():
    x = np.array([[0.0, 0.001, 0.5]], dtype=np.float32)
    out = T.load_pseudo_bg_mask({"image": x})
    np.testing.assert_array_equal(out["pseudo_bg"], [[False, False, True]])
    assert "image" in out


def test_resize_content_and_random_orientation(tmp_path):
    img, msk = _make_dataset(tmp_path, n=3)
    conf = _conf(img, msk, resize_content=True,
                 resize_spatial_size=(20, 20, 8), random_orientation=True,
                 seg_input_size=(16, 16, 4))
    train, _ = get_fit_loader_downstream(conf)
    batch = next(iter(train))
    assert batch["image"].shape == (2, 16, 16, 4, 1)


def test_loader_len_is_true_batch_count(tmp_path):
    img, msk = _make_dataset(tmp_path, n=3)
    # 3 volumes x 2 samples = 6 samples; bs 2, no drop -> 3 batches.
    conf = _conf(img, msk)
    train, val = get_fit_loader_downstream(conf)
    # split 0.8 + downstream special case: train has 2 volumes, val 1.
    assert len(train) == 2 * 2 // 2
    assert len(train) == len(list(iter(train)))
    assert len(val) == len(list(iter(val)))
    # drop_last floors the count.
    d = Dataset([{"x": i} for i in range(3)],
                lambda item, rng: [{"v": np.zeros(1)}] * 2)
    dl = DataLoader(d, batch_size=4, shuffle=False, drop_last=True,
                    samples_per_item=2)
    assert len(dl) == 1
    assert len(list(iter(dl))) == 1


def test_seeded_selection_is_deterministic(tmp_path):
    img, msk = _make_dataset(tmp_path, n=6)
    conf_a = _conf(img, msk, seed=7, num_selected_data_downstream=4)
    conf_b = _conf(img, msk, seed=7, num_selected_data_downstream=4)
    ta, _ = get_fit_loader_downstream(conf_a)
    tb, _ = get_fit_loader_downstream(conf_b)
    names_a = [d["name"] for d in ta.dataset.data]
    names_b = [d["name"] for d in tb.dataset.data]
    assert names_a == names_b
    # Repeated construction with the same seed must not drift (the RNG
    # is re-created per factory call, not shared global state).
    tb2, _ = get_fit_loader_downstream(_conf(img, msk, seed=7,
                                             num_selected_data_downstream=4))
    assert [d["name"] for d in tb2.dataset.data] == names_a
