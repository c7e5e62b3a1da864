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


def _init_compilation_cache():
    """Persistent XLA compilation cache, on by default: every compiled
    program (per shape bucket / trace type / engine) is paid once per
    machine, not once per process — the production answer to
    variable-structure compile cost (a cold Marsaglia IC-LSTM training
    run spends ~10 s in XLA; warm-cache runs spend ~0).  Opt out with
    ``PYPROB_TPU_COMPILE_CACHE=0`` or point elsewhere with
    ``PYPROB_TPU_COMPILE_CACHE_DIR``."""
    import os

    if os.environ.get("PYPROB_TPU_COMPILE_CACHE", "1") == "0":
        return
    path = os.environ.get(
        "PYPROB_TPU_COMPILE_CACHE_DIR",
        os.path.join(
            os.path.expanduser("~"), ".cache", "pyprob_tpu", "xla"
        ),
    )
    # XLA:CPU's AOT loader logs a scary (cosmetic, same-machine) feature
    # -mismatch ERROR per cached-executable load: the serialized feature
    # string carries pseudo-features (+prefer-no-gather) the loader does
    # not recognize as host features.  Silence C++ ERROR logs unless the
    # user asked for them; real failures still raise Python exceptions.
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache every program XLA spends real time on (default threshold
        # misses the ~1 s per-trace-type programs this library mints)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # unsupported backend/config: run uncached
        pass


_init_compilation_cache()


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
    # Beyond parity: multi-start MAP optimization + Gaussian curvature
    # approximation at the mode, returned as importance-reweighted draws
    # (asymptotically exact); also Model.map_estimate;
    # pyprob_tpu.inference.laplace
    LAPLACE = 12


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
    # scalar fast path: this guard runs per site per trace on the
    # interpreter tier, and np.asarray+isnan+isinf costs ~16us vs <1us
    if type(value) is float:
        return value != value or value == math.inf or value == -math.inf
    a = np.asarray(value, dtype=np.float64)
    return bool(np.isnan(a).any() or np.isinf(a).any())


def safe_log(value):
    if type(value) is float or np.ndim(value) == 0:
        v = float(value)
        if v > 0.0:
            return np.float64(math.log(v))
        return np.float64(-math.inf) if v == 0.0 else np.float64(math.nan)
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


def compile_pressure():
    """Current memory-map count of this process (0 where /proc is
    unavailable).  XLA:CPU's LLVM JIT leaks several mmaps per compiled
    executable against the kernel's per-process cap
    (vm.max_map_count, 65530 default); a long-lived process that
    compiles thousands of distinct programs — e.g. per-trace-type IC
    losses on a variable-structure model — eventually makes mmap fail
    inside LLVM and SEGFAULTS.  ``jax.clear_caches()`` releases the
    executables (measured: 1091 -> 490 maps after 200 compiles)."""
    try:
        with open("/proc/self/maps", "rb") as f:
            return sum(1 for _ in f)
    except OSError:
        return 0


def relieve_compile_pressure(threshold=None):
    """Drop every cached compiled program when the process's memory-map
    count crosses ``threshold`` (default env PYPROB_TPU_MMAP_GUARD or
    45000; <=0 disables).  Returns True when caches were cleared.
    Call sites are jit-cache misses — the only moments map count grows —
    so the check costs one /proc read per *new* program, not per step.
    Cleared programs recompile on their next use."""
    if threshold is None:
        import os

        threshold = int(os.environ.get("PYPROB_TPU_MMAP_GUARD", "45000"))
    if threshold <= 0:
        return False
    n = compile_pressure()
    if n < threshold:
        return False
    import warnings

    warnings.warn(
        f"process holds {n} memory maps (cap "
        f"{threshold}; kernel limit is vm.max_map_count): clearing JAX "
        "compilation caches to avoid the XLA:CPU LLVM mmap-exhaustion "
        "segfault; subsequent calls recompile"
    )
    jax.clear_caches()
    return True


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


# ---------------------------------------------------------------------------
# Reference-surface helpers (reference: pyprob/util.py:80-455) — small
# conveniences kept name-compatible for code written against the reference.
# "tensor" here means a device jnp array; host math uses to_numpy.
# ---------------------------------------------------------------------------


def temp_file_name():
    import os
    import tempfile
    import uuid

    return os.path.join(tempfile.mkdtemp(), str(uuid.uuid4()))


def time_seed():
    return int((time.time() * 1e6) % 1e8)


def to_tensor(value, dtype=None):
    """Device array coercion — the JAX counterpart of the reference's
    torch-tensor coercion (reference: util.py:133)."""
    return None if value is None else to_device_array(value, dtype)


def to_numpy(value):
    return np.asarray(value)


def to_size(value):
    if isinstance(value, tuple):
        return value
    if isinstance(value, int):
        return (value,)
    if isinstance(value, list):
        return tuple(value)
    raise TypeError("Expecting a tuple, int, or list of ints.")


def fast_np_random_choice(values, probs_cumsum):
    u = get_rng().random()
    return values[min(int(np.searchsorted(probs_cumsum, u)), len(values) - 1)]


def eval_print(*expressions):
    """Print each expression and its value evaluated in the caller's frame."""
    frame = sys._getframe(1)
    width = max((len(e) for e in expressions), default=0)
    for expression in expressions:
        value = eval(expression, frame.f_globals, frame.f_locals)  # noqa: S307
        print(f"{expression.ljust(width)} = {value}")


def replace_inf(value, replace_message=None):
    value = np.asarray(value)
    if np.any(value == np.inf):
        value = value.copy()
        value[value == np.inf] = 0.0
        if replace_message is not None:
            print(replace_message)
    return value


def rgb_to_hex(rgb):
    return "#{:02x}{:02x}{:02x}".format(
        *(int(max(0.0, min(c, 1.0)) * 255) for c in rgb[:3])
    )


def is_sorted(lst):
    return all(lst[i] <= lst[i + 1] for i in range(len(lst) - 1))


def prod(iterable):
    return math.prod(iterable)


def get_time_str():
    return datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S")


def one_hot(dim, i):
    out = np.zeros(dim, dtype=dtype())
    out[i] = 1.0
    return jnp.asarray(out)


def is_hashable(v):
    try:
        hash(v)
    except TypeError:
        return False
    return True


def check_gnu_dbm():
    """Report whether dbm.gnu is importable.  Informational only here:
    persistence uses stdlib sqlite3 (pyprob_tpu.concurrency), not shelve."""
    try:
        import dbm.gnu  # noqa: F401
    except (ModuleNotFoundError, ImportError):
        return False
    return True


def set_compression(level=-1):
    """zlib level for shelf blobs (reference: util.py:128)."""
    from . import concurrency

    concurrency._zlib_level = int(level)


def sqlite_encode(obj):
    from . import concurrency

    return concurrency.encode(obj)


def sqlite_decode(blob):
    from . import concurrency

    return concurrency.decode(blob)


def open_shelf(file_name):
    from .concurrency import Shelf

    return Shelf(file_name)


def tile_rows_cols(num_items):
    cols = math.ceil(math.sqrt(num_items))
    rows = 0
    while num_items > 0:
        rows += 1
        num_items -= cols
    return rows, cols


def create_path(path, directory=False):
    import os

    d = path if directory else os.path.dirname(path)
    if d and not os.path.exists(d):
        os.makedirs(d, exist_ok=True)


def address_id_to_int(address_id):
    """Numeric part of a dictionary address id ('__A42' / 'A42__...' -> 42)."""
    head = address_id.lstrip("_")
    if "__" in head:
        head = head[: head.find("__")]
    digits = "".join(ch for ch in head if ch.isdigit())
    return int(digits) if digits else 0


def chunks(l, n):
    """Yield successive n-sized chunks from l."""
    for i in range(0, len(l), n):
        yield l[i : i + n]


def drop_items(l, num_items_to_drop):
    if num_items_to_drop > len(l):
        raise ValueError("Cannot drop more items than the list length")
    out = list(l)
    rng = get_rng()
    for _ in range(num_items_to_drop):
        del out[int(rng.integers(len(out)))]
    return out


def get_source(obj):
    import inspect

    try:
        return inspect.getsource(obj)
    except Exception:
        return getattr(obj, "__name__", repr(obj))


def distribution_short_name(dist_name):
    short = {
        "Bernoulli": "Ber",
        "Beta": "Beta",
        "Binomial": "Bin",
        "Categorical": "Cat",
        "Empirical": "Emp",
        "Exponential": "Exp",
        "Gamma": "Gam",
        "LogNormal": "LogN",
        "Mixture": "Mix",
        "Normal": "N",
        "Poisson": "Poi",
        "TruncatedNormal": "TruN",
        "Uniform": "U",
        "VonMises": "VonM",
        "Weibull": "Wei",
    }
    return short.get(dist_name, dist_name)


def float_to_string(number):
    out = "{:,.3g}".format(number)
    if out == "1" and abs(number - 1) > 1e-9:
        out = "{:,.6g}".format(number)
    return out


# simple text progress bar trio (reference: util.py:189-240); the richer
# live lines elsewhere use progress_update/progress_end directly
_progress_bar_state = {}


def progress_bar(i, length):
    bar_len = 20
    filled = int(round(bar_len * i / max(1, length)))
    return "#" * filled + "-" * (bar_len - filled)


def progress_bar_init(message, num_iters, iter_name="Items"):
    if verbosity() == 0:
        return
    if num_iters < 0:
        raise ValueError("num_iters must be a non-negative integer")
    _progress_bar_state.update(
        num_iters=num_iters, iter_name=iter_name, start=time.time()
    )
    log_print(message)


def progress_bar_update(iter):
    if verbosity() == 0 or not _progress_bar_state:
        return
    n = _progress_bar_state["num_iters"]
    progress_update(
        f"{progress_bar(iter, n)} | {iter}/{n} "
        f"{_progress_bar_state['iter_name']}"
    )


def progress_bar_end(message=None):
    if verbosity() == 0 or not _progress_bar_state:
        return
    progress_bar_update(_progress_bar_state["num_iters"])
    progress_end()
    if message is not None:
        log_print(message)
