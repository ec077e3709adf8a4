from .resize import interp_matrix, resize_trilinear, upsample_trilinear
from .windows import (compute_paddings, get_attn_mask, window_partition,
                      window_reverse)

__all__ = [
    "interp_matrix", "resize_trilinear", "upsample_trilinear",
    "compute_paddings", "get_attn_mask", "window_partition", "window_reverse",
]
