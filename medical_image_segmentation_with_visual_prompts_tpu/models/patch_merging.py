"""Patch merging (downsampling) layer.

Parity with the reference ``PatchMerging``
(/root/reference/src/modules/swin_transformer/down.py:6-59): odd spatial
dims are zero-padded, 2x2x2 (8C) or 2x2x1 (4C) neighborhoods are gathered
by strided slicing *in the reference's exact channel-concat order*, then
LayerNorm(eps 1e-6) + bias-free Linear reduce to ``out_channels``.

Channels-last layout: the gather is pure strided slicing + concat on the
last (lane) axis, and the norm+reduction is a single fused LN+matmul on
``[B*H'*W'*D', 8C]`` — an MXU-shaped op with no transposes.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

_xavier = nn.initializers.xavier_uniform()


class PatchMerging(nn.Module):
    in_channels: int
    out_channels: int
    merge_last_dim: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, d, c = x.shape
        # Depth is padded when odd even if it is not merged — reference
        # down.py:25-28 pads all three axes unconditionally.  The pad
        # lands at the FRONT of each axis: the reference builds
        # ``paddings = (0, pad_h, 0, pad_w, 0, pad_d)`` but
        # ``tuple(reversed(paddings))`` in F.pad flips each axis's
        # lo/hi, so the applied padding is (pad, 0) per axis.
        pad_h, pad_w, pad_d = h % 2, w % 2, d % 2
        if pad_h or pad_w or pad_d:
            x = jnp.pad(x, ((0, 0), (pad_h, 0), (pad_w, 0), (pad_d, 0), (0, 0)))
        h, w, d = x.shape[1:4]
        if self.merge_last_dim:
            # Concat order matches reference down.py:31-39 (x0..x7).
            parts = [
                x[:, 0::2, 0::2, 0::2],
                x[:, 1::2, 0::2, 0::2],
                x[:, 0::2, 1::2, 0::2],
                x[:, 0::2, 0::2, 1::2],
                x[:, 1::2, 1::2, 0::2],
                x[:, 1::2, 0::2, 1::2],
                x[:, 0::2, 1::2, 1::2],
                x[:, 1::2, 1::2, 1::2],
            ]
        else:
            # Reference down.py:41-45 (x0..x3), depth axis untouched.
            parts = [
                x[:, 0::2, 0::2, :],
                x[:, 1::2, 0::2, :],
                x[:, 0::2, 1::2, :],
                x[:, 1::2, 1::2, :],
            ]
        x = jnp.concatenate(parts, axis=-1)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(self.out_channels, use_bias=False, kernel_init=_xavier,
                     dtype=self.dtype, name="reduction")(x)
        return x
