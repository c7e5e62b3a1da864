from .kernels import (
    mixture_normal_log_prob,
    mixture_truncated_normal_log_prob,
    log_weight_stats,
    use_pallas,
    set_use_pallas,
)

__all__ = [
    "mixture_normal_log_prob",
    "mixture_truncated_normal_log_prob",
    "log_weight_stats",
    "use_pallas",
    "set_use_pallas",
]
