"""Decoder building blocks: SwinUpBlock and UNETR conv blocks.

* ``SwinUpBlock`` — parity with /root/reference/src/modules/swin_unetr/
  unet_blocks.py:11-92: trilinear upsample (align_corners=False), crop to
  the skip's spatial size, channel concat, BatchNorm → LeakyReLU → Conv3d
  fuse, then a no-down ``ConsecutiveSwinBlocks`` with decoder prompts.
* ``UnetBasicBlock`` / ``UnetResBlock`` / ``UnetrUpBlock`` — from-scratch
  equivalents of the MONAI blocks the reference imports
  (swin_unetr.py:1, :248-289, :338-348): conv-instancenorm-leakyrelu
  stacks with optional residual shortcut, and a transposed-conv up block.
  (MONAI defaults: InstanceNorm3d affine=False, LeakyReLU slope 0.01.)

Convolutions are channels-last ``lax.conv_general_dilated`` (NHWDC /
HWDIO) — XLA's native TPU conv layout.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.resize import upsample_trilinear
from .swin_block import ConsecutiveSwinBlocks

_CONV_DN = ("NHWDC", "HWDIO", "NHWDC")


def bn_fold(norm: nn.BatchNorm):
    """(scale, shift) folding an inference-mode BatchNorm into a
    per-channel affine: ``y = x * scale + shift`` with the module's own
    epsilon and running stats.  Shared by every Pallas conv prologue."""
    v = norm.variables
    scale = v["params"]["scale"] * jax.lax.rsqrt(
        v["batch_stats"]["var"] + norm.epsilon)
    shift = v["params"]["bias"] - v["batch_stats"]["mean"] * scale
    return scale, shift


class Conv3d(nn.Module):
    """3D conv, channels-last, torch-style 'same' padding for odd kernels.

    On TPU, shallow-depth 'same' 3x3x3 convs take a depth-folded fast
    path (ops/conv_fold.py) — same math (up to fp reassociation), far
    better MXU tiling.  The param tree is unchanged (``Conv_0``)."""

    features: int
    kernel_size: Sequence[int] = (3, 3, 3)
    strides: Sequence[int] = (1, 1, 1)
    padding: Optional[Sequence[int]] = None  # per-axis symmetric; None = k//2
    use_bias: bool = True
    dtype: Any = None  # compute dtype (params stay fp32)

    def setup(self):
        k = tuple(self.kernel_size)
        self._pad = tuple(p for p in (self.padding if self.padding is not None
                                      else [kk // 2 for kk in k]))
        self.conv = nn.Conv(self.features, kernel_size=k,
                            strides=tuple(self.strides),
                            padding=[(p, p) for p in self._pad],
                            use_bias=self.use_bias, dtype=self.dtype,
                            name="Conv_0")

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops import window_attention_pallas as _wap
        from ..ops.conv_fold import (conv3d_depth_folded, conv3d_tap_matmul,
                                     fold_plan)
        on_tpu = _wap.on_tpu_path() or _wap.force_interpret()
        plan = fold_plan(x.shape, self.kernel_size, self.strides, self._pad,
                         self.features) if on_tpu else None
        if plan is not None and not self.is_initializing():
            p = self.conv.variables["params"]
            bias = p.get("bias") if self.use_bias else None
            fn = conv3d_depth_folded if plan == "fold2d" else \
                conv3d_tap_matmul
            return fn(x, p["kernel"], bias, dtype=self.dtype)
        return self.conv(x)


class ConvTranspose3d(nn.Module):
    """3D transposed conv with torch semantics: out = in*stride (k==stride)."""

    features: int
    kernel_size: Sequence[int] = (2, 2, 2)
    strides: Sequence[int] = (2, 2, 2)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.ConvTranspose(self.features, kernel_size=tuple(self.kernel_size),
                                strides=tuple(self.strides), padding="VALID")(x)


class UnetBasicBlock(nn.Module):
    """conv-norm-lrelu x2 (MONAI UnetBasicBlock semantics)."""

    out_channels: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        for i in range(2):
            x = Conv3d(self.out_channels, (self.kernel_size,) * 3,
                       name=f"conv{i + 1}")(x)
            x = nn.InstanceNorm(use_bias=False, use_scale=False,
                                epsilon=1e-5, name=f"norm{i + 1}")(x)
            x = nn.leaky_relu(x, negative_slope=0.01)
        return x


class UnetResBlock(nn.Module):
    """conv-norm-lrelu-conv-norm + (projected) residual, lrelu (MONAI)."""

    out_channels: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        residual = x
        y = Conv3d(self.out_channels, (self.kernel_size,) * 3, name="conv1")(x)
        y = nn.InstanceNorm(use_bias=False, use_scale=False, epsilon=1e-5,
                            name="norm1")(y)
        y = nn.leaky_relu(y, negative_slope=0.01)
        y = Conv3d(self.out_channels, (self.kernel_size,) * 3, name="conv2")(y)
        y = nn.InstanceNorm(use_bias=False, use_scale=False, epsilon=1e-5,
                            name="norm2")(y)
        if x.shape[-1] != self.out_channels:
            residual = Conv3d(self.out_channels, (1, 1, 1), name="conv3")(x)
            residual = nn.InstanceNorm(use_bias=False, use_scale=False,
                                       epsilon=1e-5, name="norm3")(residual)
        return nn.leaky_relu(y + residual, negative_slope=0.01)


class UnetrBasicBlock(nn.Module):
    """MONAI UnetrBasicBlock: res or basic block by flag (swin_unetr.py:249-257)."""

    out_channels: int
    kernel_size: int = 3
    res_block: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        block = UnetResBlock if self.res_block else UnetBasicBlock
        return block(self.out_channels, self.kernel_size, name="layer")(
            x, deterministic=deterministic)


class UnetrUpBlock(nn.Module):
    """MONAI UnetrUpBlock: transp-conv up, concat skip, conv block (:338-348)."""

    out_channels: int
    kernel_size: int = 3
    upsample_kernel_size: int = 2
    res_block: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray,
                 p=(None, None), deterministic: bool = True) -> jnp.ndarray:
        x = ConvTranspose3d(self.out_channels,
                            (self.upsample_kernel_size,) * 3,
                            (self.upsample_kernel_size,) * 3,
                            name="transp_conv")(x)
        x = x[:, :skip.shape[1], :skip.shape[2], :skip.shape[3], :]
        x = jnp.concatenate([x, skip], axis=-1)
        block = UnetResBlock if self.res_block else UnetBasicBlock
        return block(self.out_channels, self.kernel_size, name="conv_block")(
            x, deterministic=deterministic)


class SwinUpBlock(nn.Module):
    """Reference unet_blocks.py:11-92, channels-last."""

    in_channels: int
    out_channels: int
    strides: Sequence[int]
    kernel_size: Sequence[int]
    pos_bias_embed_dim: int
    num_heads: int
    window_size: Sequence[int]
    max_prompts: int
    tokens_per_prompt: int
    use_token_params: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    use_checkpoint: bool = False
    hidden_channels: Optional[int] = None
    attn_impl: str = "auto"
    pad_mode: str = "reference"
    dtype: Any = None

    def setup(self):
        hidden = (self.in_channels + self.in_channels // 2
                  if self.hidden_channels is None else self.hidden_channels)
        self._hidden = hidden
        self.norm_concat = nn.BatchNorm(momentum=0.9, epsilon=1e-5,
                                        use_running_average=None)
        self.conv_concat = Conv3d(self.out_channels,
                                  kernel_size=tuple(self.kernel_size),
                                  dtype=self.dtype)
        self.swin_layer = ConsecutiveSwinBlocks(
            hidden_channels=self.out_channels,
            pos_bias_embed_dim=self.pos_bias_embed_dim,
            num_heads=self.num_heads,
            window_size=tuple(self.window_size),
            max_prompts=self.max_prompts,
            tokens_per_prompt=self.tokens_per_prompt,
            use_token_params=self.use_token_params,
            down=False,
            attn_drop=self.attn_drop,
            proj_drop=self.proj_drop,
            use_checkpoint=self.use_checkpoint,
            attn_impl=self.attn_impl,
            pad_mode=self.pad_mode,
            dtype=self.dtype,
        )

    def __call__(self, x: jnp.ndarray, c: jnp.ndarray, p=(None, None),
                 deterministic: bool = True) -> jnp.ndarray:
        from ..ops import window_attention_pallas as _wap
        x = upsample_trilinear(x, tuple(self.strides), align_corners=False)
        x = x[:, :c.shape[1], :c.shape[2], :c.shape[3], :]
        # Reference order (unet_blocks.py:74): conv(act(norm(cat(x, c)))).
        # Inference on TPU folds BN (running stats) + LeakyReLU into the
        # Pallas halo-tiled conv prologue AND consumes the two concat
        # inputs separately (ops/conv_pallas.py::conv3x3_fused_pair):
        # the concatenated tensor, its depth-fold reshape and lane pad
        # never reach HBM (traced ~4 ms/volume of data formatting).
        on_tpu = _wap.on_tpu_path() or _wap.force_interpret()
        if (on_tpu and deterministic and not self.is_initializing()
                and tuple(self.kernel_size) == (3, 3, 3)):
            from ..ops.conv_pallas import conv3x3_fused_pair
            scale, shift = bn_fold(self.norm_concat)
            cp = self.conv_concat.conv.variables["params"]
            x = conv3x3_fused_pair(x, c.astype(x.dtype), cp["kernel"],
                                   cp["bias"], scale, shift, leaky=True,
                                   out_dtype=self.dtype or jnp.float32)
        else:
            x = jnp.concatenate([x, c], axis=-1)
            x = self.norm_concat(x, use_running_average=deterministic)
            x = nn.leaky_relu(x, negative_slope=0.01)
            x = self.conv_concat(x)
        x = self.swin_layer(x, p, deterministic=deterministic)
        return x
