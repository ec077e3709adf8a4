from .mesh import (batch_sharding, make_mesh, replicate, replicated,
                   shard_batch)
from .sliding_window import (BucketedInference, bucket_shape,
                             bucketed_starts, gaussian_weight_acc,
                             make_sliding_window_fn, pad_starts,
                             resolve_stride, window_starts)
from .train_parallel import make_dp_serving_step, make_dp_train_step

__all__ = [
    "batch_sharding", "make_mesh", "replicate", "replicated", "shard_batch",
    "BucketedInference", "bucket_shape", "bucketed_starts",
    "gaussian_weight_acc", "make_sliding_window_fn", "pad_starts",
    "resolve_stride", "window_starts",
    "make_dp_serving_step", "make_dp_train_step",
]
