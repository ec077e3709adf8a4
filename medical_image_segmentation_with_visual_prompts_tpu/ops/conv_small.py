"""Shift-decomposed 3D convolution for tiny output channel counts.

The downstream/supervised segmentation heads end in a 3x3x3 conv with
2-5 output channels at FULL volume resolution (reference
swin_unetr.py:226-237).  A direct conv pads those 2-5 channels to the
TPU's 128-lane tile — >25x MXU waste; traced at ~6.4 ms of a 37 ms
forward.

Decomposition: a KxKxK conv equals one dense 1x1 matmul to
``K³·C_out`` columns (full MXU lane width) followed by K³ statically
shifted slice-adds of the per-tap outputs:

    z = x @ W_flat            # [V, C_in] @ [C_in, K³·C_out]
    y = Σ_k shift_k(z[..., k*C_out:(k+1)*C_out])

Bit-equivalent to ``lax.conv`` with SAME-style padding (zero edges).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def conv3d_small_cout(x: jnp.ndarray, kernel: jnp.ndarray,
                      bias: jnp.ndarray = None,
                      compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """x: [B, H, W, D, Cin]; kernel: [kh, kw, kd, Cin, Cout] (odd kernel,
    'same' zero padding, stride 1). Returns [B, H, W, D, Cout] float32.

    The tap matmul and shifted adds run in ``compute_dtype`` (the final
    27-term accumulation promotes to float32)."""
    kh, kw, kd, cin, cout = kernel.shape
    b, h, w, d, _ = x.shape
    taps = kh * kw * kd
    # One matmul to all taps' outputs: [B,H,W,D, taps*Cout].
    wall = kernel.transpose(3, 0, 1, 2, 4).reshape(cin, taps * cout)
    z = jnp.einsum("bhwdc,co->bhwdo", x.astype(compute_dtype),
                   wall.astype(compute_dtype))
    y = jnp.zeros((b, h, w, d, cout), jnp.float32)
    idx = 0
    for ih in range(kh):
        for iw in range(kw):
            for id_ in range(kd):
                tap = z[..., idx * cout:(idx + 1) * cout]
                # Output voxel (p) takes input voxel (p + offset), with
                # offset = tap index - center; realize as pad+slice.
                oh, ow, od = ih - kh // 2, iw - kw // 2, id_ - kd // 2
                pads = [(0, 0),
                        (max(-oh, 0), max(oh, 0)),
                        (max(-ow, 0), max(ow, 0)),
                        (max(-od, 0), max(od, 0)),
                        (0, 0)]
                shifted = jnp.pad(tap, pads)[
                    :,
                    max(oh, 0): max(oh, 0) + h,
                    max(ow, 0): max(ow, 0) + w,
                    max(od, 0): max(od, 0) + d,
                    :]
                y = y + shifted
                idx += 1
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
