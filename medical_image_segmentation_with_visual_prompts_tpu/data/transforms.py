"""Host-side volume transforms: the MONAI-pipeline equivalents.

From-scratch numpy implementations of the transform stack the reference
composes from MONAI (/root/reference/src/datasets/transforms.py):

* intensity windowing ``ScaleIntensityRanged(-1000..1000 → 0..1, clip)``
  (:15-18, :41-44, :142-147);
* RAS reorientation from the NIfTI affine (:20-26, :60-67);
* random 90° orientation — one of three axis-plane rotations (:47-58,
  :186-197);
* trilinear / nearest resize (:69-82, :165-180);
* random spatial crop samples + symmetric zero pad (:84-97, :199-212);
* random intensity augmentations: bias field, std-shift, contrast
  (gamma), scale, histogram shift (:222-243);
* student-view generation: per-student coarse dropout / coarse shuffle +
  intensity augs + random crop to ``crop_size_students[i]`` (:244-313);
* centered voxel coordinate grids shared between teacher and student
  crops (:323-344).

All outputs are channels-last ``[H, W, D, C]`` float32 numpy arrays (the
TPU framework's native layout); batching adds the leading batch axis.
Randomness comes from an explicit ``np.random.Generator`` so loader
workers are reproducible and independent.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .nifti import load_nifti

# --------------------------------------------------------------- basics


def scale_intensity_range(x: np.ndarray, a_min: float = -1000.0,
                          a_max: float = 1000.0, b_min: float = 0.0,
                          b_max: float = 1.0, clip: bool = True) -> np.ndarray:
    from . import native
    x = np.array(x, dtype=np.float32, order="C", copy=True)
    if native.scale_intensity(x, a_min, a_max, b_min, b_max, clip):
        return x  # single-pass native windowing (in place on our copy)
    x = (x - a_min) / (a_max - a_min)
    x = x * (b_max - b_min) + b_min
    if clip:
        x = np.clip(x, b_min, b_max)
    return x


def orient_ras(data: np.ndarray, affine: np.ndarray) -> np.ndarray:
    """Reorient a [H, W, D, C] (or [H, W, D]) volume to RAS axes.

    Equivalent of MONAI ``Orientationd(axcodes='RAS')``: permute/flip the
    voxel axes so the affine's rotation part becomes closest to the
    identity (positive diagonal).
    """
    r = affine[:3, :3]
    spatial = data.ndim if data.ndim == 3 else 3
    # For each input axis, the world axis it most influences and the sign.
    world_axis = np.argmax(np.abs(r), axis=0)  # column j -> world axis
    if len(set(world_axis.tolist())) != 3:
        return data  # degenerate affine; leave as-is
    perm = [int(np.where(world_axis == k)[0][0]) for k in range(3)]
    flips = [r[k, perm[k]] < 0 for k in range(3)]
    axes = list(range(data.ndim))
    axes[:spatial] = perm
    out = np.transpose(data, axes)
    for k in range(3):
        if flips[k]:
            out = np.flip(out, axis=k)
    return np.ascontiguousarray(out)


def load_image_raw(path, ensure_channel: bool = True) -> np.ndarray:
    """RAS-oriented volume in its NATIVE dtype (int16 for typical CT —
    load_nifti only promotes to float32 when the header carries a
    nontrivial scl_slope/inter).  Serving ships this narrow payload to
    the device and runs the intensity windowing there
    (infer.device_scale_intensity): a lossless 2x H2D cut on the
    measured link-bound from-disk path."""
    data, affine = load_nifti(path)
    data = orient_ras(data, affine)
    if ensure_channel and data.ndim == 3:
        data = data[..., None]
    return np.ascontiguousarray(data)


def load_image(path, ensure_channel: bool = True) -> np.ndarray:
    return np.ascontiguousarray(
        load_image_raw(path, ensure_channel).astype(np.float32))


def resize(x: np.ndarray, out_size: Sequence[int],
           mode: str = "trilinear") -> np.ndarray:
    """Separable trilinear / nearest resize of [H, W, D, C]."""
    from ..ops.resize import interp_matrix
    x = x.astype(np.float32)
    for ax in range(3):
        in_s, out_s = x.shape[ax], out_size[ax]
        if in_s == out_s:
            continue
        if mode == "nearest":
            idx = np.floor((np.arange(out_s) + 0.5) * in_s / out_s).astype(int)
            idx = np.clip(idx, 0, in_s - 1)
            x = np.take(x, idx, axis=ax)
        else:
            m = interp_matrix(in_s, out_s, align_corners=False)
            x = np.moveaxis(np.tensordot(m, np.moveaxis(x, ax, 0),
                                         axes=(1, 0)), 0, ax)
    return x


def rotate90(x: np.ndarray, k: int, spatial_axes: Tuple[int, int]) -> np.ndarray:
    return np.ascontiguousarray(np.rot90(x, k=k, axes=spatial_axes))


def spatial_pad(x: np.ndarray, size: Sequence[int],
                value: float = 0.0) -> np.ndarray:
    """Symmetric pad of the spatial dims up to ``size`` (MONAI SpatialPadd)."""
    pads = []
    for ax in range(3):
        extra = max(size[ax] - x.shape[ax], 0)
        pads.append((extra // 2, extra - extra // 2))
    pads.append((0, 0))
    if any(p != (0, 0) for p in pads):
        x = np.pad(x, pads, constant_values=value)
    return x


def rand_spatial_crop(x: np.ndarray, roi: Sequence[int],
                      rng: np.random.Generator,
                      start: Optional[Sequence[int]] = None
                      ) -> Tuple[np.ndarray, Tuple[int, int, int]]:
    """Random crop (random center, fixed size). Returns (crop, start)."""
    starts = []
    for ax in range(3):
        max_start = max(x.shape[ax] - roi[ax], 0)
        if start is not None:
            s = min(start[ax], max_start)
        else:
            s = int(rng.integers(0, max_start + 1)) if max_start > 0 else 0
        starts.append(s)
    crop = x[starts[0]: starts[0] + roi[0],
             starts[1]: starts[1] + roi[1],
             starts[2]: starts[2] + roi[2]]
    return crop, tuple(starts)


def get_coord_grid(shape: Sequence[int]) -> np.ndarray:
    """Centered voxel coordinate grid [H, W, D, 3] (ref transforms.py:337-344)."""
    h, w, d = shape[:3]
    grid = np.stack(np.meshgrid(np.arange(h), np.arange(w), np.arange(d),
                                indexing="ij"), axis=-1).astype(np.float32)
    grid -= np.array([(h - 1) / 2.0, (w - 1) / 2.0, (d - 1) / 2.0],
                     dtype=np.float32)
    return grid


# ------------------------------------------------- intensity augmentations


def rand_bias_field(x: np.ndarray, rng: np.random.Generator,
                    degree: int = 3, coeff_range=(0.0, 0.1)) -> np.ndarray:
    """Multiplicative smooth polynomial bias field (MONAI RandBiasFieldd)."""
    h, w, d = x.shape[:3]
    coords = [np.linspace(-1, 1, s, dtype=np.float32) for s in (h, w, d)]
    field = np.zeros((h, w, d), dtype=np.float32)
    for i in range(degree + 1):
        for j in range(degree + 1 - i):
            for k in range(degree + 1 - i - j):
                c = rng.uniform(*coeff_range)
                field += c * np.multiply.outer(
                    np.multiply.outer(coords[0] ** i, coords[1] ** j),
                    coords[2] ** k)
    return x * np.exp(field)[..., None]


def rand_std_shift(x: np.ndarray, rng: np.random.Generator,
                   factors=(0.0, 0.1)) -> np.ndarray:
    factor = rng.uniform(factors[0], factors[1])
    return x + factor * float(np.std(x))


def rand_adjust_contrast(x: np.ndarray, rng: np.random.Generator,
                         gamma=(0.5, 4.5)) -> np.ndarray:
    g = rng.uniform(gamma[0], gamma[1])
    mn, mx = float(x.min()), float(x.max())
    rng_ = mx - mn + 1e-7
    return ((x - mn) / rng_) ** g * rng_ + mn


def rand_scale_intensity(x: np.ndarray, rng: np.random.Generator,
                         factors: float = -2.0) -> np.ndarray:
    lo, hi = (factors, abs(factors)) if np.isscalar(factors) else factors
    f = rng.uniform(min(lo, hi), max(lo, hi))
    return x * (1.0 + f)


def rand_histogram_shift(x: np.ndarray, rng: np.random.Generator,
                         num_control_points=(8, 12)) -> np.ndarray:
    n = int(rng.integers(num_control_points[0], num_control_points[1] + 1))
    mn, mx = float(x.min()), float(x.max())
    if mx - mn < 1e-7:
        return x
    ref = np.linspace(mn, mx, n)
    target = np.sort(rng.uniform(mn, mx, n))
    target[0], target[-1] = mn, mx
    return np.interp(x, ref, target).astype(np.float32)


def rand_coarse_dropout(x: np.ndarray, rng: np.random.Generator,
                        holes: int, spatial_size: int,
                        max_holes: Optional[int] = None,
                        max_spatial_size: Optional[int] = None,
                        dropout_holes: bool = True,
                        fill: float = 0.0) -> np.ndarray:
    """MONAI RandCoarseDropoutd: zero inside holes (True) or keep only
    holes and fill everything else (False)."""
    n = holes if max_holes is None else int(rng.integers(holes, max_holes + 1))
    out = x.copy() if dropout_holes else np.full_like(x, fill)
    for _ in range(n):
        size = [spatial_size if max_spatial_size is None
                else int(rng.integers(spatial_size, max_spatial_size + 1))
                for _ in range(3)]
        start = [int(rng.integers(0, max(x.shape[ax] - size[ax], 0) + 1))
                 for ax in range(3)]
        sl = tuple(slice(start[ax], start[ax] + size[ax]) for ax in range(3))
        if dropout_holes:
            out[sl] = fill
        else:
            out[sl] = x[sl]
    return out


def rand_coarse_shuffle(x: np.ndarray, rng: np.random.Generator,
                        holes: int, spatial_size: int,
                        max_holes: Optional[int] = None,
                        max_spatial_size: Optional[int] = None) -> np.ndarray:
    n = holes if max_holes is None else int(rng.integers(holes, max_holes + 1))
    out = x.copy()
    for _ in range(n):
        size = [spatial_size if max_spatial_size is None
                else int(rng.integers(spatial_size, max_spatial_size + 1))
                for _ in range(3)]
        start = [int(rng.integers(0, max(x.shape[ax] - size[ax], 0) + 1))
                 for ax in range(3)]
        sl = tuple(slice(start[ax], start[ax] + size[ax]) for ax in range(3))
        block = out[sl]
        flat = block.reshape(-1, block.shape[-1])
        out[sl] = flat[rng.permutation(flat.shape[0])].reshape(block.shape)
    return out


def _basic_intensity_augs(x: np.ndarray, rng: np.random.Generator,
                          prob: float, std_shift_factors,
                          ) -> np.ndarray:
    """The shared random-intensity chain (ref transforms.py:223-243)."""
    if rng.uniform() < prob:
        x = rand_bias_field(x, rng)
    if rng.uniform() < prob:
        x = rand_std_shift(x, rng, std_shift_factors)
    if rng.uniform() < prob:
        x = rand_adjust_contrast(x, rng)
    if rng.uniform() < prob:
        x = rand_scale_intensity(x, rng, -2.0)
    if rng.uniform() < prob:
        x = rand_histogram_shift(x, rng)
    return x


# --------------------------------------------------------- pipelines

def _maybe_random_orientation(sample: Dict[str, np.ndarray], keys,
                              rng: np.random.Generator) -> None:
    """OneOf three 90° rotations, uniform (ref :47-58, :186-197)."""
    choice = int(rng.integers(0, 3))
    planes = [(0, 1), (0, 2), (1, 2)]
    for k in keys:
        sample[k] = rotate90(sample[k], 1, planes[choice])


def transform_downstream_fit(item: Dict, conf,
                             rng: np.random.Generator) -> List[Dict]:
    """Fit transform for downstream few-shot training (ref :35-99)."""
    image = scale_intensity_range(load_image(item["image"]))
    mask = load_image(item["mask"])
    sample = {"image": image, "mask": mask}
    if getattr(conf, "random_orientation", False):
        _maybe_random_orientation(sample, ("image", "mask"), rng)
    # (orientation == 'axial' RAS reorientation happens at load time)
    if getattr(conf, "resize_content", False):
        sample["image"] = resize(sample["image"], conf.resize_spatial_size,
                                 "trilinear")
        sample["mask"] = resize(sample["mask"], conf.resize_spatial_size,
                                "nearest")
    out = []
    num_samples = conf.num_samples_downstream
    for _ in range(num_samples):
        img_c, start = rand_spatial_crop(sample["image"],
                                         conf.seg_input_size, rng)
        msk_c, _ = rand_spatial_crop(sample["mask"], conf.seg_input_size,
                                     rng, start=start)
        out.append({
            "image": spatial_pad(img_c, conf.seg_input_size),
            "mask": spatial_pad(msk_c, conf.seg_input_size),
            "name": item["name"],
        })
    return out


def transform_downstream_test(item: Dict, conf) -> Dict:
    """Test transform: full RAS volume, no crop (ref :10-31)."""
    return {
        "image": scale_intensity_range(load_image(item["image"])),
        "mask": load_image(item["mask"]),
        "name": item["name"],
    }


def transform_pretrain_fit(item: Dict, conf,
                           rng: np.random.Generator) -> List[Dict]:
    """Pretrain transform incl. student views + coord grids (ref :102-320)."""
    mode = conf.training_mode
    load_mask = mode in ("supervised_learning_decoder",
                         "supervised_learning_all")
    students_view = (mode in ("self_supervised_learning_decoder",
                              "self_supervised_learning_all",
                              "supervised_learning_decoder",
                              "supervised_learning_all")
                     and conf.use_prototype_assignment)
    load_coord = students_view

    image = scale_intensity_range(load_image(item["image"]))
    sample = {"image": image}
    if load_mask:
        sample["mask"] = load_image(item["mask"])
    if getattr(conf, "resize_content", False):
        sample["image"] = resize(sample["image"], conf.resize_spatial_size,
                                 "trilinear")
        if load_mask:
            sample["mask"] = resize(sample["mask"], conf.resize_spatial_size,
                                    "nearest")
    if load_coord:
        sample["coord"] = get_coord_grid(sample["image"].shape)
    keys = [k for k in ("image", "mask", "coord") if k in sample]
    if getattr(conf, "random_orientation", False):
        _maybe_random_orientation(sample, keys, rng)

    random_transforms = getattr(conf, "random_transforms", False)
    num_students = len(conf.crop_size_students) if students_view else 0
    out = []
    from .datasets import num_samples_of  # late import to avoid cycle
    for _ in range(num_samples_of(conf)):
        crops = {}
        img_c, start = rand_spatial_crop(sample["image"], conf.roi_size, rng)
        crops["image"] = spatial_pad(img_c, conf.roi_size)
        for k in keys[1:]:
            c, _ = rand_spatial_crop(sample[k], conf.roi_size, rng,
                                     start=start)
            crops[k] = spatial_pad(c, conf.roi_size)
        # Copy teacher crop per student BEFORE further augs (ref :213-220).
        students = {}
        for i in range(num_students):
            for k in keys:
                students[f"{k}_st_{i}"] = crops[k].copy()
        if random_transforms:
            crops["image"] = _basic_intensity_augs(
                crops["image"], rng, prob=0.05, std_shift_factors=(0.0, 0.1))
            for i in range(num_students):
                key = f"image_st_{i}"
                x = students[key]
                # OneOf {identity, dropout-in, dropout-out, shuffle} with
                # weights (0.7, 0.1, 0.1, 0.1) (ref :250-271).
                choice = rng.choice(4, p=(0.7, 0.1, 0.1, 0.1))
                if choice == 1:
                    x = rand_coarse_dropout(x, rng, holes=1, spatial_size=4,
                                            max_holes=3, max_spatial_size=16,
                                            dropout_holes=True)
                elif choice == 2:
                    x = rand_coarse_dropout(x, rng, holes=5, spatial_size=32,
                                            max_spatial_size=48,
                                            dropout_holes=False)
                elif choice == 3:
                    x = rand_coarse_shuffle(x, rng, holes=1, spatial_size=4,
                                            max_holes=3, max_spatial_size=16)
                x = _basic_intensity_augs(x, rng, prob=0.1,
                                          std_shift_factors=(0.0, 0.2))
                students[key] = x
        # Crop each student to its size (ref :299-313).
        for i in range(num_students):
            size = conf.crop_size_students[i]
            st_start = None  # first key picks the crop, others reuse it
            for k in keys:
                key = f"{k}_st_{i}"
                c, st_start = rand_spatial_crop(students[key], size, rng,
                                                start=st_start)
                students[key] = spatial_pad(c, size)
        rec = {**crops, **students, "name": item["name"]}
        out.append(rec)
    return out


def load_pseudo_bg_mask(sample: Dict[str, np.ndarray],
                        image_key: str = "image",
                        name: str = "pseudo_bg",
                        threshold: float = 0.0025) -> Dict[str, np.ndarray]:
    """Pseudo background mask by intensity threshold.

    Equivalent of the reference's ``LoadPseudoBgMaskd``
    (transforms.py:363-373) — defined but unused by any reference
    pipeline; provided for API completeness.
    """
    out = dict(sample)
    for key in list(sample.keys()):
        if image_key in key:
            out[key.replace(image_key, name)] = sample[key] > threshold
    return out
