"""ctypes bindings for the native (C++) data-path runtime.

Loads ``native/libmiseg_native.so`` (build with ``make -C native``) and
exposes the NIfTI decode, intensity windowing and window extraction hot
loops.  Every entry point has a numpy fallback, so the framework works
identically without the shared object — the native path just makes host
preprocessing cheaper relative to TPU step time.
"""

from __future__ import annotations

import ctypes
from pathlib import Path
from typing import Optional

import numpy as np

_LIB_PATH = Path(__file__).resolve().parent.parent.parent / "native" / \
    "libmiseg_native.so"
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.miseg_gunzip.restype = ctypes.c_longlong
    lib.miseg_gunzip.argtypes = [ctypes.c_char_p, ctypes.c_longlong,
                                 ctypes.c_void_p, ctypes.c_longlong]
    lib.miseg_decode_f32.restype = ctypes.c_int
    lib.miseg_decode_f32.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                     ctypes.POINTER(ctypes.c_longlong),
                                     ctypes.c_float, ctypes.c_float,
                                     ctypes.c_void_p]
    lib.miseg_scale_intensity.restype = None
    lib.miseg_scale_intensity.argtypes = [ctypes.c_void_p,
                                          ctypes.c_longlong,
                                          ctypes.c_float, ctypes.c_float,
                                          ctypes.c_float, ctypes.c_float,
                                          ctypes.c_int]
    lib.miseg_extract_windows.restype = None
    lib.miseg_extract_windows.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_longlong),
        ctypes.POINTER(ctypes.c_longlong), ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_longlong), ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def gunzip(data: bytes, expected_size: Optional[int] = None) -> Optional[np.ndarray]:
    """Inflate a gzip buffer natively; None if the library is absent.

    Returns a uint8 ndarray (zero-copy into downstream np.frombuffer).
    The exact output size comes from the gzip ISIZE trailer (mod 2^32 —
    exact for volumes < 4 GB), so there is a single allocation and no
    zero-fill or copy-out.
    """
    lib = _load()
    if lib is None or len(data) < 18:
        return None
    isize = int.from_bytes(data[-4:], "little")
    cap = expected_size or isize or max(len(data) * 4, 1 << 20)
    for _ in range(4):  # grow on (rare) >4GB wraparound
        out = np.empty(cap, dtype=np.uint8)
        n = lib.miseg_gunzip(data, len(data),
                             out.ctypes.data_as(ctypes.c_void_p), cap)
        if 0 <= n <= cap:
            return out[:n]
        cap *= 4
    return None


def decode_f32(payload: bytes, dtype_code: int, shape, slope: float,
               inter: float) -> Optional[np.ndarray]:
    """NIfTI Fortran payload -> C-order float32 [H, W, D]."""
    lib = _load()
    if lib is None:
        return None
    h, w, d = (int(s) for s in shape)
    out = np.empty((h, w, d), dtype=np.float32)
    dims = (ctypes.c_longlong * 3)(h, w, d)
    if isinstance(payload, np.ndarray):
        src = payload.ctypes.data_as(ctypes.c_void_p)
    else:
        src = ctypes.cast(ctypes.c_char_p(payload), ctypes.c_void_p)
    rc = lib.miseg_decode_f32(src, dtype_code, dims,
                              float(slope), float(inter),
                              out.ctypes.data_as(ctypes.c_void_p))
    return out if rc == 0 else None


def scale_intensity(data: np.ndarray, a_min: float, a_max: float,
                    b_min: float, b_max: float, clip: bool) -> bool:
    """In-place windowing of a contiguous float32 array; False = no lib."""
    lib = _load()
    if lib is None or data.dtype != np.float32 \
            or not data.flags["C_CONTIGUOUS"]:
        return False
    lib.miseg_scale_intensity(data.ctypes.data_as(ctypes.c_void_p),
                              data.size, a_min, a_max, b_min, b_max,
                              int(clip))
    return True


def extract_windows(vol: np.ndarray, starts: np.ndarray,
                    window) -> Optional[np.ndarray]:
    """[H, W, D, C] + [N, 3] starts -> [N, wh, ww, wd, C]."""
    lib = _load()
    if lib is None:
        return None
    vol = np.ascontiguousarray(vol, dtype=np.float32)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    wh, ww, wd = (int(x) for x in window)
    n = starts.shape[0]
    out = np.empty((n, wh, ww, wd, vol.shape[3]), dtype=np.float32)
    shape = (ctypes.c_longlong * 4)(*[int(s) for s in vol.shape])
    win = (ctypes.c_longlong * 3)(wh, ww, wd)
    lib.miseg_extract_windows(
        vol.ctypes.data_as(ctypes.c_void_p), shape,
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)), n, win,
        out.ctypes.data_as(ctypes.c_void_p))
    return out
