from .contrastive_pair import contrastive_pair_loss
from .dice import dice_focal_loss, dice_loss, focal_loss
from .clustered_prototype import (assign_prototype, cluster_prototype,
                                  clustered_prototype_loss, sample_embedding)

__all__ = [
    "contrastive_pair_loss", "dice_focal_loss", "dice_loss", "focal_loss",
    "assign_prototype", "cluster_prototype", "clustered_prototype_loss",
    "sample_embedding",
]
