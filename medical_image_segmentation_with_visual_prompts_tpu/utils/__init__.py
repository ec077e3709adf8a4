from .configs import (DEFAULT_CKPT_DIR, DEFAULT_CONFIG_DIR,
                      DEFAULT_ROOT_LOG_DIR, get_full_configs)
from .loggers import SummaryWriter, get_logger, get_summary_writer
from .metrics import DiceCoefficient, MeanIoU, seg_stats
from .schedules import step_decay, warmup_cosine
from .checkpoint import (load_checkpoint, merge_state, restore_like,
                         save_checkpoint)

__all__ = [
    "DEFAULT_CKPT_DIR", "DEFAULT_CONFIG_DIR", "DEFAULT_ROOT_LOG_DIR",
    "get_full_configs", "SummaryWriter", "get_logger", "get_summary_writer",
    "DiceCoefficient", "MeanIoU", "seg_stats", "step_decay", "warmup_cosine",
    "load_checkpoint", "merge_state", "restore_like", "save_checkpoint",
]
