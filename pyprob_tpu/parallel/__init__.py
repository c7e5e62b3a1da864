from .mesh import get_mesh, data_parallel_mesh, pad_to_multiple
from .collectives import (
    pooled_log_weight_stats,
    sharded_effective_sample_size,
    systematic_resample_indices,
)

__all__ = [
    "get_mesh",
    "data_parallel_mesh",
    "pad_to_multiple",
    "pooled_log_weight_stats",
    "sharded_effective_sample_size",
    "systematic_resample_indices",
]
