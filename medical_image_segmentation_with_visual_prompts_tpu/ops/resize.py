"""Trilinear resizing as per-axis interpolation matrix products.

TPU-first replacement for the reference's ``nn.Upsample(mode='trilinear')``
(used by the decoder up path, unet_blocks.py:31-35 align_corners=False;
the ``unetr_res_block=='none'`` output layer, swin_unetr.py:350-355
align_corners=False; and the reconstruction head, swin_unetr.py:200-202
align_corners=True).

Instead of gather-based interpolation, each spatial axis is resized by a
dense ``[out, in]`` interpolation matrix built *at trace time* in numpy
(shapes are static under jit) and applied with an einsum — three small
matmuls that XLA maps straight onto the MXU and fuses with neighbours.
The matrices implement torch's exact source-index conventions:

* align_corners=True:  ``src = i * (in-1) / (out-1)``
* align_corners=False: ``src = (i+0.5) * in/out - 0.5`` clamped at 0
  (torch ``area_pixel_compute_source_index``).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Sequence

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def interp_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """Dense linear-interpolation matrix ``[out_size, in_size]`` (float32)."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1:
        m[:, 0] = 1.0
        return m
    for i in range(out_size):
        if align_corners:
            src = i * (in_size - 1) / max(out_size - 1, 1)
        else:
            src = (i + 0.5) * in_size / out_size - 0.5
            src = max(src, 0.0)
        lo = min(int(np.floor(src)), in_size - 1)
        hi = min(lo + 1, in_size - 1)
        w = src - lo
        m[i, lo] += 1.0 - w
        m[i, hi] += w
    return m


def resize_trilinear(x: jnp.ndarray, out_size: Sequence[int],
                     align_corners: bool = False) -> jnp.ndarray:
    """Resize channels-last ``[B, H, W, D, C]`` to ``[B, *out_size, C]``."""
    b, h, w, d, c = x.shape
    oh, ow, od = out_size
    mat = lambda i, o: jnp.asarray(interp_matrix(i, o, align_corners),
                                   dtype=x.dtype)
    if h != oh:
        x = jnp.einsum("oh,bhwdc->bowdc", mat(h, oh), x)
    if w != ow:
        x = jnp.einsum("ow,bhwdc->bhodc", mat(w, ow), x)
    if d != od:
        x = jnp.einsum("od,bhwdc->bhwoc", mat(d, od), x)
    return x


def upsample_trilinear(x: jnp.ndarray, scale: Sequence[int],
                       align_corners: bool = False) -> jnp.ndarray:
    """torch ``nn.Upsample(scale_factor=scale)`` semantics: out = floor(in*s)."""
    b, h, w, d, c = x.shape
    out = (int(np.floor(h * scale[0])), int(np.floor(w * scale[1])),
           int(np.floor(d * scale[2])))
    return resize_trilinear(x, out, align_corners=align_corners)
