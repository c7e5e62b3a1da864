from .mesh import get_mesh, data_parallel_mesh, pad_to_multiple
from .introspect import capture_jit, JitRecord
from .collectives import (
    pooled_log_weight_stats,
    sharded_effective_sample_size,
    systematic_resample_indices,
    stratified_resample_indices,
    residual_resample_indices,
    multinomial_resample_indices,
    resample_indices,
    RESAMPLING_SCHEMES,
)

__all__ = [
    "get_mesh",
    "data_parallel_mesh",
    "pad_to_multiple",
    "capture_jit",
    "JitRecord",
    "pooled_log_weight_stats",
    "sharded_effective_sample_size",
    "systematic_resample_indices",
    "stratified_resample_indices",
    "residual_resample_indices",
    "multinomial_resample_indices",
    "resample_indices",
    "RESAMPLING_SCHEMES",
]
