"""SwinUnetR: the promptable Swin-UNETR backbone.

Functional parity with the reference ``SwinUnetR``
(/root/reference/src/modules/swin_unetr/swin_unetr.py:8-527):

* patch-embed Conv(stride=input_patch_size) + BatchNorm (:146-158);
* ``depth_unet`` encoder stages of ``ConsecutiveSwinBlocks`` with heads
  doubling per stage and depth-merging only at stage 0 (:159-178);
* U-shaped decoder: bottleneck conv + residual add (:87), per-level skip
  residual blocks selected by ``unetr_res_block`` (:248-313),
  ``SwinUpBlock``/``UnetrUpBlock`` up path (:318-348), output layer =
  trilinear upsample when ``unetr_res_block=='none'`` else a final
  up block (:350-380);
* proxy-task heads (reconstruction pyramid, rotation, contrastive,
  :185-222), supervised-pretrain and downstream seg heads (:226-237,
  :382-394);
* prompt tokens: xavier-init ``[tokens_per_prompt, C]`` arrays, two per
  stage (window + shifted block) for encoder and decoder plus two for a
  Swin output layer (:400-431), broadcast per batch and fed into each
  block pair (:52-61, :90-111).

The reference's ``named_parameters_*`` accessors (:433-527) — the central
freezing/checkpointing mechanism — are realized JAX-idiomatically as
path-based pytree partitioning in ``models/partition.py``; the module
itself is mode-agnostic about gradients.

Layout: channels-last ``[B, H, W, D, C]`` (TPU lane dim = channels).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.resize import upsample_trilinear
from .swin_block import ConsecutiveSwinBlocks
from .unet_blocks import Conv3d, SwinUpBlock, UnetrBasicBlock, UnetrUpBlock

_xavier = nn.initializers.xavier_uniform()

TRAINING_MODES = (
    "self_supervised_learning_encoder",
    "self_supervised_learning_decoder",
    "self_supervised_learning_all",
    "supervised_learning_decoder",
    "supervised_learning_all",
    "downstream",
)

_DECODER_MODES = TRAINING_MODES[1:]  # everything but ssl_encoder
_SUPERVISED_MODES = ("supervised_learning_decoder", "supervised_learning_all")


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Frozen, hashable model hyperparameters (flax Module field)."""

    training_mode: str = "downstream"
    input_channels: int = 1
    depth_unet: int = 3
    hidden_channels: Tuple[int, ...] = (48, 96, 192, 384)
    input_patch_size: Tuple[int, ...] = (2, 2, 2)
    unetr_res_block: str = "none"      # none | simple | full
    unetr_up_block: str = "swin"       # swin | unetr
    basic_block_res: bool = True
    res_block: bool = False            # only read by the unetr up path
    num_heads_encoder: int = 4
    num_heads_decoder: int = 4
    attn_window_size: Tuple[int, ...] = (8, 8, 4)
    pos_bias_embed_dim: int = 64
    use_checkpoint: bool = False
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    max_prompts: int = 1
    tokens_per_prompt_encoder: int = 64
    tokens_per_prompt_decoder: int = 64
    use_encoder_prompting: bool = False
    use_decoder_prompting: bool = False
    use_reconstruction: bool = True
    use_mutual_learning: bool = False
    use_rotation_prediction: bool = True
    use_contrastive_learning: bool = True
    contrastive_coding_dim: int = 512
    output_channels_pretrain: int = 5
    output_channels_downstream: int = 2
    attn_impl: str = "auto"
    # "reference" replicates the reference's pad-ALL-axes-when-any-
    # misaligned quirk exactly (ops/windows.py::compute_paddings) —
    # required for output parity with reference checkpoints;
    # "aligned" pads only misaligned axes (faster, self-consistent for
    # models trained in this framework).
    pad_mode: str = "reference"
    compute_dtype: str = "float32"  # float32 | bfloat16 activations/matmuls
    # TPU inference: fold the output upsample's depth axis into the seg
    # head's lane matrix (exact composition; False forces the plain
    # upsample-then-head chain, used by parity tests/ablations).
    fold_head_depth: bool = True
    # TPU inference: additionally fold the x2 H/W output upsample into
    # the head as a parity/subpixel decomposition (exact incl. borders;
    # ops/conv_fold.py::conv3d_parity_upsampled) — the tap einsum runs
    # at low H/W resolution and the full-resolution upsample einsums
    # never materialize.  Requires fold_head_depth.  Default OFF since
    # round 3: device A/B measured the parity fold a ~10 ms/volume
    # REGRESSION on the real chip (12.94 vs 11.50 vol/s at otherwise-
    # equal gates) — the 4-way subpixel tap einsums lower to worse
    # layouts than the plain upsample-then-head chain XLA fuses itself.
    # Kept for ablations and smaller-head geometries.
    fold_head_hw: bool = False

    @property
    def dtype(self):
        import jax.numpy as _jnp
        return _jnp.bfloat16 if self.compute_dtype == "bfloat16" \
            else _jnp.float32

    @classmethod
    def from_namespace(cls, conf) -> "ModelConfig":
        kwargs = {}
        for f in dataclasses.fields(cls):
            if hasattr(conf, f.name):
                v = getattr(conf, f.name)
                if isinstance(v, list):
                    v = tuple(v)
                kwargs[f.name] = v
        mc = cls(**kwargs)
        if mc.training_mode not in TRAINING_MODES:
            raise ValueError(
                f"Training mode {mc.training_mode} not available!")
        return mc


class _ReconstructionHead(nn.Module):
    """Conv pyramid decoder for masked reconstruction (ref :185-212)."""

    conf: ModelConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        depth = self.conf.depth_unet
        top = self.conf.hidden_channels[-1]
        rec_chs = [top // (2 ** i) for i in range(depth + 1)] \
            + [top // (2 ** depth)]
        scale_depth = [1 if i < depth - 1 else 2 for i in range(depth + 1)]
        for i in range(depth + 1):
            x = Conv3d(rec_chs[i + 1], (3, 3, 3), name=f"conv_{i}")(x)
            x = nn.InstanceNorm(use_bias=False, use_scale=False,
                                epsilon=1e-5, name=f"norm_{i}")(x)
            x = nn.leaky_relu(x, negative_slope=0.01)
            x = upsample_trilinear(x, (2, 2, scale_depth[i]),
                                   align_corners=True)
        x = Conv3d(self.conf.input_channels, (1, 1, 1), name="conv_out")(x)
        return x


class _SegHead(nn.Module):
    """BatchNorm + 3x3x3 Conv head (ref :226-237 and :382-394).

    Inference on TPU runs the Pallas halo-tiled conv with the BatchNorm
    folded in as a per-channel affine prologue (ops/conv_pallas.py): one
    HBM read, no tap tensor round-trip.  With 2-5 output channels at
    full volume resolution a direct conv wastes >25x of the MXU lane
    width — this was the single hottest op in the traced forward (6.4 ms
    of 37 ms).  Training keeps the flax BatchNorm (batch statistics) and
    the tap/shift-decomposed conv paths.
    """

    out_channels: int
    compute_dtype: Any = jnp.bfloat16

    def setup(self):
        self.norm = nn.BatchNorm(momentum=0.9, epsilon=1e-5,
                                 use_running_average=None)

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True,
                 depth_up: int = 1, hw_up: bool = False) -> jnp.ndarray:
        from ..ops import window_attention_pallas as _wap
        from ..ops.conv_fold import (conv3d_depth_lanes,
                                     conv3d_depth_lanes_upsampled,
                                     conv3d_parity_upsampled,
                                     conv3d_tap_matmul)
        from ..ops.conv_small import conv3d_small_cout
        kernel = self.param("conv_kernel", nn.initializers.lecun_normal(),
                            (3, 3, 3, x.shape[-1], self.out_channels))
        bias = self.param("conv_bias", nn.initializers.zeros,
                          (self.out_channels,))
        on_tpu = _wap.on_tpu_path() or _wap.force_interpret()
        # TPU inference: BN (running stats) folded into the depth-lanes
        # tap einsum — 1.21 ms vs 2.33 for BN + the 27-tap shift
        # decomposition at [16,128,128,8] (tools/bench_head_variants.py;
        # the Pallas halo kernel loses here, 2.92 ms, to its 2.67x
        # folded-band FLOP overhead at D=8 with tiny Cout).
        if on_tpu and deterministic and not self.is_initializing():
            from .unet_blocks import bn_fold
            scale, shift = bn_fold(self.norm)
            if depth_up > 1:
                # Head over a depth-LOW latent with the trilinear depth
                # upsample folded into the lane matrix (exact; see
                # conv3d_depth_lanes_upsampled).
                from ..ops.resize import interp_matrix
                d_hi = x.shape[3] * depth_up
                up = jnp.asarray(interp_matrix(x.shape[3], d_hi,
                                               align_corners=False))
                if hw_up:
                    # ... and the x2 H/W upsample folded in as parity
                    # stencils: the head consumes the raw decoder
                    # output and emits the full-resolution prediction.
                    return conv3d_parity_upsampled(
                        x, kernel, bias, scale, shift, d_hi=d_hi,
                        up_matrix=up)
                return conv3d_depth_lanes_upsampled(
                    x, kernel, bias, scale, shift, d_hi=d_hi,
                    up_matrix=up)
            return conv3d_depth_lanes(x, kernel, bias, scale, shift)
        if depth_up > 1:
            raise ValueError(
                "depth_up requires the TPU inference path "
                "(deterministic, non-initializing)")
        x = self.norm(x, use_running_average=deterministic)
        if x.shape[3] <= 4:
            # Depth-folded tap matmul (27 taps -> 9) wins only at
            # shallow depth; at D=8 full volume resolution the folded
            # tap fusions regressed in-model (traced 4.97 ms vs 2.05 for
            # the 27-tap shift decomposition) — keep conv_small there.
            out = conv3d_tap_matmul(x, kernel, bias,
                                    dtype=self.compute_dtype)
        else:
            out = conv3d_small_cout(x, kernel, bias,
                                    compute_dtype=self.compute_dtype)
        return out.astype(jnp.float32)


class SwinUnetR(nn.Module):
    conf: ModelConfig

    # ------------------------------------------------------------- setup
    def setup(self):
        conf = self.conf
        mode = conf.training_mode
        self._needs_decoder = mode in _DECODER_MODES

        # Patch embedding (ref :146-158).
        self.input_layer_conv = Conv3d(
            conf.hidden_channels[0],
            kernel_size=tuple(conf.input_patch_size),
            strides=tuple(conf.input_patch_size),
            padding=(0, 0, 0),
            dtype=conf.dtype,
            name="input_layer_conv")
        self.input_layer_norm = nn.BatchNorm(
            momentum=0.9, epsilon=1e-6, use_running_average=None,
            name="input_layer_norm")

        # Encoder stages (ref :159-178); depth merged only at stage 0.
        merge_last_dim = [i < 1 for i in range(conf.depth_unet)]
        in_chs = [conf.hidden_channels[i] for i in range(conf.depth_unet)]
        self.encoder_blocks = [
            ConsecutiveSwinBlocks(
                hidden_channels=in_chs[i],
                pos_bias_embed_dim=conf.pos_bias_embed_dim,
                num_heads=conf.num_heads_encoder * (2 ** i),
                window_size=tuple(conf.attn_window_size),
                max_prompts=conf.max_prompts,
                tokens_per_prompt=conf.tokens_per_prompt_encoder,
                use_token_params=conf.use_encoder_prompting,
                down=True,
                merge_last_dim=merge_last_dim[i],
                attn_drop=conf.attn_drop,
                proj_drop=conf.proj_drop,
                use_checkpoint=conf.use_checkpoint,
                attn_impl=conf.attn_impl,
                pad_mode=conf.pad_mode,
                dtype=conf.dtype,
                name=f"encoder_blocks_{i}",
            ) for i in range(conf.depth_unet)
        ]

        # Prompt tokens (ref :400-431).
        if conf.use_encoder_prompting:
            self.prompt_tokens_enc = [
                self.param(f"prompt_tokens_enc_{i}", _xavier,
                           (conf.tokens_per_prompt_encoder,
                            conf.hidden_channels[i // 2]))
                for i in range(2 * conf.depth_unet)
            ]
        if self._needs_decoder and conf.use_decoder_prompting:
            self.prompt_tokens_dec = [
                self.param(f"prompt_tokens_dec_{i}", _xavier,
                           (conf.tokens_per_prompt_decoder,
                            conf.hidden_channels[-(i + 1) // 2 - 1]))
                for i in range(2 * conf.depth_unet)
            ]
            if conf.unetr_res_block != "none" and conf.unetr_up_block == "swin":
                self.prompt_tokens_out = [
                    self.param(f"prompt_tokens_out_{i}", _xavier,
                               (conf.tokens_per_prompt_decoder,
                                conf.hidden_channels[0]))
                    for i in range(2)
                ]

        # Proxy-task heads (ref :180-224), only in encoder-pretrain mode.
        if mode == "self_supervised_learning_encoder":
            if conf.use_reconstruction or conf.use_mutual_learning:
                self.head_reconstruction = _ReconstructionHead(
                    conf, name="head_reconstruction")
            if conf.use_rotation_prediction:
                self.head_rotation = nn.Dense(4, name="head_rotation")
            if conf.use_contrastive_learning:
                self.head_contrastive = nn.Dense(
                    conf.contrastive_coding_dim, name="head_contrastive")

        # Decoder (ref :239-398).
        if self._needs_decoder:
            self._setup_decoder()
            if mode in _SUPERVISED_MODES:
                self.head_segmentation = _SegHead(
                    conf.output_channels_pretrain, conf.dtype,
                    name="head_segmentation")
        if mode == "downstream":
            self.head_downstream = _SegHead(
                conf.output_channels_downstream, conf.dtype,
                name="head_downstream")

    def _setup_decoder(self):
        conf = self.conf
        depth = conf.depth_unet
        in_chs = [conf.hidden_channels[i] for i in range(depth)]
        out_chs = [conf.hidden_channels[i + 1] for i in range(depth)]
        in_chs, out_chs = in_chs[::-1], out_chs[::-1]
        self._dec_in_chs = tuple(in_chs)

        # Bottleneck (ref :248-266).
        if conf.unetr_res_block == "full":
            self.bottleneck = UnetrBasicBlock(
                out_chs[0], kernel_size=3, res_block=conf.basic_block_res,
                name="bottleneck")
        else:
            self.bottleneck = Conv3d(out_chs[0], (3, 3, 3), dtype=conf.dtype,
                                     name="bottleneck")

        # Skip residual blocks (ref :267-313), depth+1 of them (last takes
        # the raw input).
        if conf.unetr_res_block == "full":
            self.residual_blocks = [
                UnetrBasicBlock(in_chs[i], kernel_size=3,
                                res_block=conf.basic_block_res,
                                name=f"residual_blocks_{i}")
                for i in range(depth)
            ] + [UnetrBasicBlock(in_chs[-1], kernel_size=3,
                                 res_block=conf.basic_block_res,
                                 name=f"residual_blocks_{depth}")]
        elif conf.unetr_res_block == "simple":
            self.residual_blocks = [
                Conv3d(in_chs[i], (3, 3, 3), dtype=conf.dtype,
                       name=f"residual_blocks_{i}")
                for i in range(depth)
            ] + [Conv3d(in_chs[-1], (3, 3, 3), dtype=conf.dtype,
                        name=f"residual_blocks_{depth}")]
        else:
            self.residual_blocks = [None] * (depth + 1)  # identity

        # Up blocks (ref :314-348). Depth is only re-expanded at the last
        # level, mirroring stage-0's depth merge.
        scale_depth = [1 if i < depth - 1 else 2 for i in range(depth)]
        if conf.unetr_up_block == "swin":
            self.decoder_blocks = [
                SwinUpBlock(
                    in_channels=out_chs[i],
                    out_channels=in_chs[i],
                    strides=(2, 2, scale_depth[i]),
                    kernel_size=(3, 3, 3),
                    pos_bias_embed_dim=conf.pos_bias_embed_dim,
                    num_heads=conf.num_heads_decoder,
                    window_size=tuple(conf.attn_window_size),
                    max_prompts=conf.max_prompts,
                    tokens_per_prompt=conf.tokens_per_prompt_decoder,
                    use_token_params=conf.use_decoder_prompting,
                    attn_drop=conf.attn_drop,
                    proj_drop=conf.proj_drop,
                    use_checkpoint=conf.use_checkpoint,
                    attn_impl=conf.attn_impl,
                    pad_mode=conf.pad_mode,
                    dtype=conf.dtype,
                    name=f"decoder_blocks_{i}",
                ) for i in range(depth)
            ]
        else:
            self.decoder_blocks = [
                UnetrUpBlock(in_chs[i], kernel_size=3, upsample_kernel_size=2,
                             res_block=conf.res_block,
                             name=f"decoder_blocks_{i}")
                for i in range(depth)
            ]

        # Output layer (ref :349-380).
        if conf.unetr_res_block == "none":
            self.output_layer = None  # plain trilinear upsample (2, 2, 2)
        elif conf.unetr_up_block == "swin":
            self.output_layer = SwinUpBlock(
                in_channels=in_chs[-1],
                out_channels=in_chs[-1],
                hidden_channels=2 * in_chs[-1],
                strides=(2, 2, 2),
                kernel_size=(3, 3, 3),
                pos_bias_embed_dim=conf.pos_bias_embed_dim,
                num_heads=conf.num_heads_decoder,
                window_size=tuple(conf.attn_window_size),
                max_prompts=conf.max_prompts,
                tokens_per_prompt=conf.tokens_per_prompt_decoder,
                use_token_params=conf.use_decoder_prompting,
                attn_drop=conf.attn_drop,
                proj_drop=conf.proj_drop,
                use_checkpoint=conf.use_checkpoint,
                attn_impl=conf.attn_impl,
                pad_mode=conf.pad_mode,
                dtype=conf.dtype,
                name="output_layer",
            )
        else:
            self.output_layer = UnetrUpBlock(
                in_chs[-1], kernel_size=3, upsample_kernel_size=2,
                res_block=conf.res_block, name="output_layer")

    # ----------------------------------------------------------- forward
    def _patch_embed_folded(self, x: jnp.ndarray) -> jnp.ndarray:
        """TPU-inference patch embed: one space-to-depth + one matmul.

        With kernel == stride (ref :148-158 always constructs it so),
        the patch conv is exactly a non-overlapping tap matmul; at
        inference the BatchNorm (running stats) is a per-channel affine
        foldable into the matmul weights — same folding the seg head
        and decoder convs already use.  Replaces XLA's conv lowering +
        two layout copies (~2.1 ms/chunk traced) with a reshape and a
        single MXU matmul.  Training and initialization keep the
        conv+BN modules so the param tree and batch-stats updates are
        identical across platforms.
        """
        conf = self.conf
        k = tuple(conf.input_patch_size)
        cw = self.input_layer_conv.conv.variables["params"]
        bn_p = self.input_layer_norm.variables["params"]
        bn_s = self.input_layer_norm.variables["batch_stats"]
        cout = conf.hidden_channels[0]
        scale = bn_p["scale"] * jax.lax.rsqrt(bn_s["var"] + 1e-6)
        eff_w = cw["kernel"].reshape(-1, cout) * scale[None, :]
        eff_b = (cw.get("bias", 0.0) - bn_s["mean"]) * scale + bn_p["bias"]
        b, h, w, d, cin = x.shape
        taps = x.reshape(b, h // k[0], k[0], w // k[1], k[1],
                         d // k[2], k[2], cin)
        taps = taps.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
            b, h // k[0], w // k[1], d // k[2], k[0] * k[1] * k[2] * cin)
        return (taps.astype(conf.dtype) @ eff_w.astype(conf.dtype)
                + eff_b.astype(conf.dtype))

    def forward_swin_transformer(self, x: jnp.ndarray,
                                 deterministic: bool = True):
        """Ref :46-63: returns feature list deepest-first, raw input last."""
        from ..ops import window_attention_pallas as _wap
        conf = self.conf
        out_list = [x]
        on_tpu = _wap.on_tpu_path() or _wap.force_interpret()
        if deterministic and on_tpu and not self.is_initializing():
            enc = self._patch_embed_folded(x)
        else:
            enc = self.input_layer_conv(x.astype(conf.dtype))
            # BatchNorm statistics stay fp32; trunk activations in the
            # compute dtype.
            enc = self.input_layer_norm(
                enc, use_running_average=deterministic).astype(conf.dtype)
        out_list.insert(0, enc)
        for j in range(conf.depth_unet):
            if not conf.use_encoder_prompting:
                p_w, p_sw = None, None
            else:
                b = enc.shape[0]
                p_w = jnp.broadcast_to(
                    self.prompt_tokens_enc[2 * j][None],
                    (b,) + self.prompt_tokens_enc[2 * j].shape)
                p_sw = jnp.broadcast_to(
                    self.prompt_tokens_enc[2 * j + 1][None],
                    (b,) + self.prompt_tokens_enc[2 * j + 1].shape)
            enc = self.encoder_blocks[j](enc, [p_w, p_sw],
                                         deterministic=deterministic)
            out_list.insert(0, enc)
        return {"out_vit": out_list}

    def forward_ssl_encoder(self, x: jnp.ndarray, deterministic: bool = True):
        """Ref :65-84: backbone + proxy heads in encoder-pretrain mode."""
        conf = self.conf
        output = {}
        out_vit = self.forward_swin_transformer(x, deterministic)["out_vit"]
        if conf.training_mode == "self_supervised_learning_encoder":
            if conf.use_reconstruction or conf.use_mutual_learning:
                output["reconstruction"] = self.head_reconstruction(
                    out_vit[0]).astype(jnp.float32)
            pooled = jnp.mean(out_vit[0].astype(jnp.float32), axis=(1, 2, 3))
            if conf.use_rotation_prediction:
                output["rotation_prediction"] = self.head_rotation(pooled)
            if conf.use_contrastive_learning:
                output["contrastive_coding"] = self.head_contrastive(pooled)
        output["out_vit"] = out_vit
        return output

    def _dec_prompts(self, tokens, idx: int, batch: int):
        t = tokens[idx]
        return jnp.broadcast_to(t[None], (batch,) + t.shape)

    def forward_decoder(self, c, deterministic: bool = True,
                        up_scale=(2, 2, 2)):
        """Ref :86-112: bottleneck + residual add, prompted up path.

        ``up_scale`` only affects the ``unetr_res_block == 'none'``
        plain-upsample output layer; ``forward_downstream`` passes
        (2, 2, 1) on the TPU inference path to defer the depth axis into
        the seg head's lane matrix (exact composition).
        """
        conf = self.conf
        b = self.bottleneck(c[0]) + c[0]
        dec = b
        batch = dec.shape[0]
        for j in range(conf.depth_unet):
            if not conf.use_decoder_prompting:
                p_w, p_sw = None, None
            else:
                p_w = self._dec_prompts(self.prompt_tokens_dec, 2 * j, batch)
                p_sw = self._dec_prompts(self.prompt_tokens_dec, 2 * j + 1, batch)
            res = c[j + 1] if self.residual_blocks[j] is None \
                else self.residual_blocks[j](c[j + 1])
            dec = self.decoder_blocks[j](dec, res, [p_w, p_sw],
                                         deterministic=deterministic)
        if conf.unetr_res_block == "none":
            out = upsample_trilinear(dec, up_scale, align_corners=False)
            out = out.astype(jnp.float32)
        else:
            if not conf.use_decoder_prompting:
                p_w, p_sw = None, None
            elif conf.unetr_up_block == "swin":
                p_w = self._dec_prompts(self.prompt_tokens_out, 0, batch)
                p_sw = self._dec_prompts(self.prompt_tokens_out, 1, batch)
            else:
                p_w, p_sw = None, None
            res_last = c[-1] if self.residual_blocks[-1] is None \
                else self.residual_blocks[-1](c[-1])
            out = self.output_layer(dec, res_last, [p_w, p_sw],
                                    deterministic=deterministic)
            out = out.astype(jnp.float32)
        return {"latent_outputs": out}

    def forward_ssl_decoder(self, x: jnp.ndarray, deterministic: bool = True):
        """Ref :114-121."""
        out_enc = self.forward_ssl_encoder(x, deterministic)
        out_dec = self.forward_decoder(out_enc["out_vit"], deterministic)
        if self.conf.training_mode in _SUPERVISED_MODES:
            out_dec["seg_pred"] = self.head_segmentation(
                out_dec["latent_outputs"], deterministic=deterministic)
        return out_dec

    def forward_downstream(self, x: jnp.ndarray, deterministic: bool = True):
        """Ref :123-127."""
        from ..ops import window_attention_pallas as _wap
        on_tpu = _wap.on_tpu_path() or _wap.force_interpret()
        if (self.conf.unetr_res_block == "none" and deterministic
                and self.conf.fold_head_depth
                and on_tpu and not self.is_initializing()):
            # TPU inference: the output layer is a plain trilinear x2
            # upsample and the head contracts (depth x channel) lanes,
            # so the depth axis of the upsample folds exactly into the
            # head matmul — skip it here (H/W upsample only) and let the
            # head emit depth-high lanes.  Removes the largest einsum of
            # the output chain (full-resolution depth interp) and halves
            # the head contraction.
            out_enc = self.forward_ssl_encoder(x, deterministic)
            hw = self.conf.fold_head_hw
            out_dec = self.forward_decoder(out_enc["out_vit"],
                                           deterministic,
                                           up_scale=(1, 1, 1) if hw
                                           else (2, 2, 1))
            seg = self.head_downstream(out_dec["latent_outputs"],
                                       deterministic=deterministic,
                                       depth_up=2, hw_up=hw)
            return {"downstream": seg.astype(jnp.float32)}
        out_dec = self.forward_ssl_decoder(x, deterministic)
        seg = self.head_downstream(out_dec["latent_outputs"],
                                   deterministic=deterministic)
        return {"downstream": seg.astype(jnp.float32)}

    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        """Mode dispatch (ref :129-144). x: [B, H, W, D, C] channels-last."""
        mode = self.conf.training_mode
        if mode == "self_supervised_learning_encoder":
            return self.forward_ssl_encoder(x, deterministic)
        if mode in _DECODER_MODES and mode != "downstream":
            return self.forward_ssl_decoder(x, deterministic)
        if mode == "downstream":
            return self.forward_downstream(x, deterministic)
        raise ValueError(f"Training mode {mode} not available!")


def prefill_bias_cache(model: SwinUnetR, variables: dict,
                       input_size, input_channels: int = 1) -> dict:
    """Fill the ``bias_cache`` collection with one tiny forward pass.

    The relative-position biases (and the fused path's assembled fold
    biases) are pure functions of the params and static window geometry,
    but a jitted scan over chunks re-derives them every iteration
    (~1.7 ms/volume at the flagship config).  This runs ONE batch-1
    forward at ``input_size`` with ``mutable=['bias_cache']`` and
    returns ``variables`` with the filled collection merged in — pass
    the result to inference ``apply`` calls so every bias becomes a
    loop-invariant program constant.

    Only for inference: the cache snapshots the current params, so it
    must never be threaded through a training step, and it never enters
    checkpoints (the trainers save params/batch_stats only).  The
    spatial ``input_size`` must match the real per-window apply shape —
    cache keys carry the window/fold geometry, and entries for other
    geometries simply miss (falling back to recompute, correct but not
    faster).  Costs one extra small (batch-1) compile per geometry.
    """
    x = jnp.zeros((1, *tuple(input_size), input_channels), jnp.float32)
    _, mut = model.apply(variables, x, deterministic=True,
                         mutable=["bias_cache"])
    return {**variables, "bias_cache": mut["bias_cache"]}
