"""Alias package: the substrate helpers live in ``pyprob_tpu.util``; this
package re-exports them under the ``pyprob_tpu.utils`` layout."""

from ..util import *  # noqa: F401,F403
from ..util import (  # noqa: F401
    to_array,
    to_device_array,
    to_scalar,
    has_nan_or_inf,
    safe_log,
    clamp_probs,
    replace_negative_inf,
    effective_sample_size,
    log_weights_to_probs,
    empirical_to_categorical,
    days_hours_mins_secs_str,
    get_time_stamp,
    truncate_str,
    init_distributed_print,
)
