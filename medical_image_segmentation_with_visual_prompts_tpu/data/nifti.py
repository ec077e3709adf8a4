"""Minimal pure-numpy NIfTI-1 reader/writer (.nii / .nii.gz).

The reference loads volumes through MONAI's ``LoadImaged`` (nibabel
backend, transforms.py:13,:140).  Neither MONAI nor nibabel exists in
this environment, and the format is simple, so the framework carries its
own codec: NIfTI-1 (348-byte header, optional gzip), the subset medical
segmentation datasets (ACDC, TCIA CT) actually use — scalar 3D/4D
volumes, sform/qform affines, scl_slope/inter scaling.

Returns channels-last numpy arrays plus the 4x4 voxel-to-world affine
needed for RAS reorientation (transforms.orient_ras).
"""

from __future__ import annotations

import gzip
import struct
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_DTYPES = {
    2: np.uint8, 4: np.int16, 8: np.int32, 16: np.float32, 64: np.float64,
    256: np.int8, 512: np.uint16, 768: np.uint32, 1024: np.int64,
    1280: np.uint64,
}
_DTYPE_CODES = {np.dtype(v): k for k, v in _DTYPES.items()}


def _quaternion_affine(hdr) -> np.ndarray:
    b, c, d = hdr["quatern_b"], hdr["quatern_c"], hdr["quatern_d"]
    a = np.sqrt(max(0.0, 1.0 - (b * b + c * c + d * d)))
    r = np.array([
        [a * a + b * b - c * c - d * d, 2 * (b * c - a * d), 2 * (b * d + a * c)],
        [2 * (b * c + a * d), a * a + c * c - b * b - d * d, 2 * (c * d - a * b)],
        [2 * (b * d - a * c), 2 * (c * d + a * b), a * a + d * d - b * b - c * c],
    ])
    qfac = -1.0 if hdr["pixdim"][0] < 0 else 1.0
    scales = np.array([hdr["pixdim"][1], hdr["pixdim"][2],
                       qfac * hdr["pixdim"][3]])
    affine = np.eye(4)
    affine[:3, :3] = r * scales
    affine[:3, 3] = [hdr["qoffset_x"], hdr["qoffset_y"], hdr["qoffset_z"]]
    return affine


def _parse_header(raw: bytes) -> dict:
    if len(raw) < 348:
        raise ValueError("Not a NIfTI-1 file: header too short")
    endian = "<"
    (sizeof_hdr,) = struct.unpack_from(endian + "i", raw, 0)
    if sizeof_hdr != 348:
        endian = ">"
        (sizeof_hdr,) = struct.unpack_from(endian + "i", raw, 0)
        if sizeof_hdr != 348:
            raise ValueError("Not a NIfTI-1 file: bad sizeof_hdr")
    hdr = {"endian": endian}
    hdr["dim"] = struct.unpack_from(endian + "8h", raw, 40)
    (hdr["datatype"], hdr["bitpix"]) = struct.unpack_from(endian + "2h", raw, 70)
    hdr["pixdim"] = struct.unpack_from(endian + "8f", raw, 76)
    (hdr["vox_offset"],) = struct.unpack_from(endian + "f", raw, 108)
    (hdr["scl_slope"], hdr["scl_inter"]) = struct.unpack_from(endian + "2f", raw, 112)
    (hdr["qform_code"], hdr["sform_code"]) = struct.unpack_from(endian + "2h", raw, 252)
    (hdr["quatern_b"], hdr["quatern_c"], hdr["quatern_d"],
     hdr["qoffset_x"], hdr["qoffset_y"], hdr["qoffset_z"]) = \
        struct.unpack_from(endian + "6f", raw, 256)
    hdr["srow_x"] = struct.unpack_from(endian + "4f", raw, 280)
    hdr["srow_y"] = struct.unpack_from(endian + "4f", raw, 296)
    hdr["srow_z"] = struct.unpack_from(endian + "4f", raw, 312)
    hdr["magic"] = bytes(raw[344:348])
    return hdr


def _affine_of(hdr) -> np.ndarray:
    if hdr["sform_code"] > 0:
        affine = np.eye(4)
        affine[0] = hdr["srow_x"]
        affine[1] = hdr["srow_y"]
        affine[2] = hdr["srow_z"]
        return affine
    if hdr["qform_code"] > 0:
        return _quaternion_affine(hdr)
    affine = np.diag([hdr["pixdim"][1] or 1.0, hdr["pixdim"][2] or 1.0,
                      hdr["pixdim"][3] or 1.0, 1.0])
    return affine


def load_nifti(path) -> Tuple[np.ndarray, np.ndarray]:
    """Read a .nii/.nii.gz volume.

    Returns (data, affine): data fortran-order-decoded ndarray with the
    header's spatial shape (3D; trailing singleton dims squeezed), affine
    the 4x4 voxel→world transform.
    """
    from . import native

    path = Path(path)
    if path.name.endswith(".gz"):
        raw = None
        if native.available():
            raw = native.gunzip(path.read_bytes())
        if raw is None:
            raw = gzip.open(path, "rb").read()
    else:
        raw = path.read_bytes()
    hdr = _parse_header(raw)
    ndim = hdr["dim"][0]
    shape = tuple(int(s) for s in hdr["dim"][1:1 + ndim])
    dtype = _DTYPES.get(hdr["datatype"])
    if dtype is None:
        raise ValueError(f"Unsupported NIfTI datatype {hdr['datatype']}")
    dtype = np.dtype(dtype).newbyteorder(hdr["endian"])
    offset = int(hdr["vox_offset"]) if hdr["magic"].startswith(b"n+1") else 0
    if offset == 0:
        offset = 352
    count = int(np.prod(shape))
    slope, inter = hdr["scl_slope"], hdr["scl_inter"]
    # Native fast path: 3D little-endian float32 volumes -> C-order with
    # slope/inter applied in one pass.  Integer payloads (label masks)
    # take the numpy path so their dtype is preserved for the caller.
    if (len(shape) == 3 and hdr["endian"] == "<"
            and hdr["datatype"] == 16 and native.available()):
        payload = raw[offset: offset + count * dtype.itemsize]
        data = native.decode_f32(payload, hdr["datatype"], shape,
                                 slope if slope != 0.0 else 1.0, inter)
        if data is not None:
            return data, _affine_of(hdr)
    data = np.frombuffer(raw, dtype=dtype, count=count, offset=offset)
    data = data.reshape(shape, order="F")
    if slope not in (0.0, 1.0) or inter != 0.0:
        if slope == 0.0:
            slope = 1.0
        data = data.astype(np.float32) * slope + inter
    # Squeeze trailing singleton (e.g. [H,W,D,1] time axis).
    while data.ndim > 3 and data.shape[-1] == 1:
        data = data[..., 0]
    return np.ascontiguousarray(data), _affine_of(hdr)


def save_nifti(path, data: np.ndarray, affine: Optional[np.ndarray] = None) -> Path:
    """Write a minimal NIfTI-1 single file (.nii, or .nii.gz by suffix)."""
    path = Path(path)
    data = np.asarray(data)
    if affine is None:
        affine = np.eye(4)
    dt = data.dtype
    if np.dtype(dt) not in _DTYPE_CODES:
        data = data.astype(np.float32)
        dt = data.dtype
    hdr = bytearray(348)
    struct.pack_into("<i", hdr, 0, 348)
    dims = [data.ndim] + list(data.shape) + [1] * (7 - data.ndim)
    struct.pack_into("<8h", hdr, 40, *dims)
    struct.pack_into("<2h", hdr, 70, _DTYPE_CODES[np.dtype(dt)],
                     data.dtype.itemsize * 8)
    struct.pack_into("<8f", hdr, 76, 1.0, 1.0, 1.0, 1.0, 1.0, 0, 0, 0)
    struct.pack_into("<f", hdr, 108, 352.0)  # vox_offset
    struct.pack_into("<2f", hdr, 112, 1.0, 0.0)  # scl slope/inter
    struct.pack_into("<2h", hdr, 252, 0, 1)  # qform 0, sform 1
    struct.pack_into("<4f", hdr, 280, *affine[0])
    struct.pack_into("<4f", hdr, 296, *affine[1])
    struct.pack_into("<4f", hdr, 312, *affine[2])
    hdr[344:348] = b"n+1\x00"
    payload = bytes(hdr) + b"\x00" * 4 + data.tobytes(order="F")
    if path.name.endswith(".gz"):
        with gzip.open(path, "wb") as f:
            f.write(payload)
    else:
        path.write_bytes(payload)
    return path
