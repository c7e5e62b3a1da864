"""Substrate: enums, global configuration, RNG management, small math helpers.

TPU-native counterpart of the reference's L0 layer (reference:
pyprob/util.py).  Differences by design:

* RNG is explicit: a single ``seed()`` installs both a host ``numpy``
  Generator (interpreter tier) and a root ``jax.random`` key that is consumed
  by splitting (compiled tier).  There is no global torch/cuda RNG to mutate.
* Tensors are jnp/numpy arrays; ``to_array`` coerces to the configured host
  dtype, ``to_device_array`` to a jnp array.
"""

from __future__ import annotations

import enum
import math
import random
import sys
import time
import datetime

import numpy as np

import jax
import jax.numpy as jnp


__version__ = "0.1.0"


class TraceMode(enum.Enum):
    NONE = 0
    PRIOR = 1
    PRIOR_FOR_INFERENCE_NETWORK = 2
    POSTERIOR = 3


class PriorInflation(enum.Enum):
    DISABLED = 0
    ENABLED = 1


class InferenceEngine(enum.Enum):
    IMPORTANCE_SAMPLING = 0
    IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK = 1
    LIGHTWEIGHT_METROPOLIS_HASTINGS = 2
    RANDOM_WALK_METROPOLIS_HASTINGS = 3
    # Beyond parity (no reference counterpart): fully-compiled particle
    # filter over the observe sequence (pyprob_tpu.inference.smc); the
    # _WITH_INFERENCE_NETWORK variant proposes from a trained IC network
    # inside every stage (amortized SMC)
    SEQUENTIAL_MONTE_CARLO = 4
    SEQUENTIAL_MONTE_CARLO_WITH_INFERENCE_NETWORK = 5
    # Beyond parity: gradient-based MCMC over the program's continuous
    # latents (jax.grad through the replayed forward);
    # pyprob_tpu.inference.hmc
    HAMILTONIAN_MONTE_CARLO = 6
    # Beyond parity: ADVI — Gaussian guide (meanfield/fullrank) fitted by
    # reparameterized ELBO gradients in one compiled scan, posterior =
    # importance-reweighted guide draws; pyprob_tpu.inference.vi
    VARIATIONAL_INFERENCE = 7
    # Beyond parity: NUTS (arXiv:1111.4246) — HMC with dynamic trajectory
    # lengths (iterative doubling + multinomial leaf sampling), Stan-style
    # warmup; pyprob_tpu.inference.nuts
    NO_U_TURN_SAMPLER = 8
    # Beyond parity: replica exchange — K tempered replicas per ensemble
    # (likelihood^beta ladder) with alternating adjacent swaps; mixes
    # between separated posterior modes; pyprob_tpu.inference.pt
    PARALLEL_TEMPERING = 9
    # Beyond parity: SMC sampler (Del Moral et al. 2006) — particles
    # annealed prior->posterior along an ADAPTIVE likelihood-temperature
    # ladder with systematic resampling + HMC rejuvenation; unbiased
    # log-evidence; pyprob_tpu.inference.tempered_smc
    TEMPERED_SMC = 10
    # Beyond parity: SVGD (arXiv:1608.04471) — a deterministic particle
    # ensemble transported along the Stein variational direction (RBF
    # kernel attraction + repulsion, all [N,N]@[N,D] matmuls on the MXU);
    # captures correlated/non-Gaussian posteriors without a guide
    # density; pyprob_tpu.inference.svgd
    STEIN_VARIATIONAL_GRADIENT_DESCENT = 11


class InferenceNetwork(enum.Enum):
    FEEDFORWARD = 0
    LSTM = 1


class ObserveEmbedding(enum.Enum):
    FEEDFORWARD = 0
    CNN2D5C = 1
    CNN3D5C = 2


class Optimizer(enum.Enum):
    ADAM = 0
    SGD = 1
    ADAM_LARC = 2
    SGD_LARC = 3


class LearningRateScheduler(enum.Enum):
    NONE = 0
    POLY1 = 1
    POLY2 = 2


# ---------------------------------------------------------------------------
# Global configuration
# ---------------------------------------------------------------------------

_verbosity = 2
_dtype = np.float32
_print_refresh_rate = 0.25  # seconds


def set_verbosity(v=2):
    global _verbosity
    _verbosity = v


def verbosity():
    return _verbosity


def set_platform(platform):
    """Select the JAX platform (counterpart of reference ``set_device``,
    pyprob/util.py:103).  Must run before the first backend use; an
    env-var ``JAX_PLATFORMS`` can be overridden by eagerly-registered
    plugins, so this goes through jax.config."""
    jax.config.update("jax_platforms", platform)


def set_device(device):
    """Reference-compatible alias of ``set_platform``
    (reference: pyprob/util.py:103).  Accepts JAX platform names ('tpu',
    'cpu', 'gpu'); the reference's 'cuda[:n]' spellings map to 'gpu'."""
    device = str(device)
    if device.startswith("cuda"):
        device = "gpu"
    set_platform(device)


def set_dtype(dtype):
    global _dtype
    _dtype = np.dtype(dtype).type


def dtype():
    return _dtype


# Optional matmul compute dtype for the neural layers (None = full
# precision).  bfloat16 maps matmuls onto the TPU MXU's high-throughput
# path with float32 accumulation; distribution/log-prob math stays float32.
_compute_dtype = None


def set_compute_dtype(dt):
    global _compute_dtype
    _compute_dtype = None if dt is None else np.dtype(dt).name


def compute_dtype():
    return _compute_dtype


# ---------------------------------------------------------------------------
# RNG management
# ---------------------------------------------------------------------------

_rng: np.random.Generator = np.random.default_rng(0)
# The JAX root key is created lazily so that importing the package (and the
# full interpreter tier) works even when no device backend can initialize.
_key = None
_key_seed = 0


def seed(s=None):
    """Seed all RNG sources: python `random`, numpy host generator, JAX key."""
    global _rng, _key, _key_seed
    if s is None:
        s = int(time.time() * 1e6) % (2**31)
    random.seed(s)
    _rng = np.random.default_rng(s)
    _key_seed = s
    _key = None  # re-created lazily from the new seed
    return s


def get_rng() -> np.random.Generator:
    """Host RNG for the interpreter tier."""
    return _rng


def _root_key():
    global _key
    if _key is None:
        _key = jax.random.PRNGKey(_key_seed)
    return _key


def next_key():
    """Split and return a fresh JAX PRNG key from the global root key."""
    global _key
    _key, sub = jax.random.split(_root_key())
    return sub


def next_keys(n):
    global _key
    keys = jax.random.split(_root_key(), n + 1)
    _key = keys[0]
    return keys[1:]


# ---------------------------------------------------------------------------
# Array helpers
# ---------------------------------------------------------------------------


def to_array(value, dtype=None):
    """Coerce to a host numpy array of the configured float dtype.

    Counterpart of reference ``util.to_tensor`` (pyprob/util.py:133) but
    host-side; integers are kept integral only if ``dtype`` says so.
    """
    if dtype is None:
        dtype = _dtype
    if isinstance(value, jax.Array):
        return np.asarray(value, dtype=dtype)
    return np.asarray(value, dtype=dtype)


def to_device_array(value, dtype=None):
    if dtype is None:
        dtype = _dtype
    return jnp.asarray(value, dtype=dtype)


def to_scalar(value):
    a = np.asarray(value)
    return a.reshape(-1)[0].item() if a.size else float("nan")


def has_nan_or_inf(value):
    a = np.asarray(value, dtype=np.float64)
    return bool(np.isnan(a).any() or np.isinf(a).any())


def safe_log(value):
    ns = np.asarray(value, dtype=np.float64)
    with np.errstate(divide="ignore"):
        return np.log(ns)


def clamp_probs(probs, eps=None):
    a = np.asarray(probs)
    if eps is None:
        eps = np.finfo(a.dtype if a.dtype.kind == "f" else np.float32).eps
    return np.clip(a, eps, 1.0 - eps)


def replace_negative_inf(value, replacement=-1e38):
    a = np.asarray(value, dtype=np.float64).copy()
    a[np.isneginf(a)] = replacement
    return a


def effective_sample_size(log_weights):
    """ESS = (Σw)²/Σw² of normalized importance weights.

    Equivalent to reference ``util.effective_sample_size``
    (pyprob/util.py:398) which computes 1/Σp² on normalized categorical
    probs; computed here in float64 log-space for stability.
    """
    lw = np.asarray(log_weights, dtype=np.float64).reshape(-1)
    lw = lw[~np.isnan(lw)]
    if lw.size == 0:
        return 0.0
    m = lw.max()
    if np.isinf(m) and m < 0:
        return 0.0
    w = np.exp(lw - m)
    s = w.sum()
    return float(s * s / (w * w).sum())


def log_weights_to_probs(log_weights):
    lw = np.asarray(log_weights, dtype=np.float64).reshape(-1)
    lw = np.nan_to_num(lw, nan=-np.inf)
    m = lw.max() if lw.size else 0.0
    if np.isinf(m) and m < 0:
        return np.full_like(lw, 1.0 / max(len(lw), 1))
    w = np.exp(lw - m)
    return w / w.sum()


# ---------------------------------------------------------------------------
# Progress / printing
# ---------------------------------------------------------------------------

_print_prefix = ""
_print_muted = False


def init_distributed_print(rank, world_size, mute_others=True):
    """Label or mute stdout per rank (reference: pyprob/util.py:402-423)."""
    global _print_prefix, _print_muted
    if world_size <= 1:
        return
    if rank == 0:
        return
    if mute_others:
        _print_muted = True
    else:
        _print_prefix = f"[rank {rank}] "


def log_print(*args, **kwargs):
    if _verbosity >= 2 and not _print_muted:
        if _print_prefix:
            print(_print_prefix, end="")
        print(*args, **kwargs)


def log_error(*args, **kwargs):
    if _verbosity >= 1 and not _print_muted:
        print(*args, file=sys.stderr, **kwargs)


def progress_update(message):
    if _verbosity >= 2 and not _print_muted:
        sys.stdout.write("\r" + message + "\033[K")
        sys.stdout.flush()


def progress_end():
    if _verbosity >= 2 and not _print_muted:
        sys.stdout.write("\n")
        sys.stdout.flush()


class profile:
    """Optional JAX profiler hook (SURVEY.md §5): wrap any inference or
    training call to capture a device trace viewable in TensorBoard /
    Perfetto.

        with pyprob_tpu.util.profile('/tmp/trace'):
            model.posterior_results(100000, observe=..., vectorized=True)
    """

    def __init__(self, log_dir):
        self._log_dir = log_dir

    def __enter__(self):
        jax.profiler.start_trace(self._log_dir)
        return self

    def __exit__(self, *exc):
        jax.profiler.stop_trace()
        log_print(f"JAX profiler trace written to {self._log_dir}")


def days_hours_mins_secs_str(total_seconds):
    d, r = divmod(int(total_seconds), 86400)
    h, r = divmod(r, 3600)
    m, s = divmod(r, 60)
    return f"{d}d:{h:02}:{m:02}:{s:02}"


def get_time_stamp():
    return datetime.datetime.now().strftime("%Y%m%d_%H%M%S")


def truncate_str(s, length=80):
    return (s[: length - 3] + "...") if len(s) > length else s


def empirical_to_categorical(empirical, max_items=None):
    """Convert an Empirical over hashable values to a Categorical
    (reference: pyprob/util.py:326-335)."""
    from .distributions import Categorical

    emp = empirical.combine_duplicates()
    values = emp.get_values()
    probs = np.exp(np.asarray(emp._log_weights_normalized(), dtype=np.float64))
    if max_items is not None and len(values) > max_items:
        order = np.argsort(-probs)[:max_items]
        values = [values[i] for i in order]
        probs = probs[order]
        probs = probs / probs.sum()
    return Categorical(probs=probs), values
