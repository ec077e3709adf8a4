from .patch_merging import PatchMerging
from .relative_pe import RelativePE
from .swin_block import ConsecutiveSwinBlocks, SwinTransformerBlock
from .swin_unetr import (ModelConfig, SwinUnetR, TRAINING_MODES,
                         prefill_bias_cache)
from .unet_blocks import (Conv3d, SwinUpBlock, UnetBasicBlock, UnetResBlock,
                          UnetrBasicBlock, UnetrUpBlock)
from .window_attention import WindowAttention
from . import partition

__all__ = [
    "PatchMerging", "RelativePE", "ConsecutiveSwinBlocks",
    "SwinTransformerBlock", "ModelConfig", "SwinUnetR", "TRAINING_MODES",
    "prefill_bias_cache",
    "Conv3d", "SwinUpBlock", "UnetBasicBlock", "UnetResBlock",
    "UnetrBasicBlock", "UnetrUpBlock", "WindowAttention", "partition",
]
