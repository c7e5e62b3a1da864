"""pyprob_tpu — a TPU-native, trace-based universal probabilistic
programming framework with the capabilities of pyprob (see SURVEY.md).

Models are ordinary Python programs calling ``sample`` / ``observe`` /
``factor`` / ``tag``.  Inference engines: importance sampling, inference
compilation (amortized IS with feedforward/LSTM proposal networks trained
data-parallel over a TPU mesh), and single-site MCMC (LMH/RMH).  Model
programs additionally compile under ``jax.vmap``/``jax.jit`` to run
thousands of particles per TPU chip (the "compiled tier"); arbitrary
non-traceable programs and remote PPX simulators run on the interpreter
tier with identical semantics.
"""

from .util import (
    __version__,
    TraceMode,
    PriorInflation,
    InferenceEngine,
    InferenceNetwork,
    ObserveEmbedding,
    Optimizer,
    LearningRateScheduler,
    seed,
    set_verbosity,
    set_dtype,
    set_platform,
    set_device,
)
from .state import sample, observe, factor, tag, rejection_sample
from .address import AddressDictionary
from .model import Model, RemoteModel, RemoteModelPool, ConditionalModel, ParallelModel
from .markov import MarkovModel
from .inference import ChainState


def __getattr__(name):
    # lazy: remote / ppx pull in pyzmq at module level; purely local use
    # must not require it (RemoteModel likewise defers via model.py).
    # Lazy submodule access keeps reference-layout attribute parity
    # (pyprob.remote / pyprob.ppx / pyprob.address_dictionary) without the
    # import-time dependency.
    if name == "LockstepRemoteModel":
        from .remote_lockstep import LockstepRemoteModel

        return LockstepRemoteModel
    if name in ("remote", "ppx", "address_dictionary", "serving"):
        import importlib

        return importlib.import_module(f".{name}", __name__)
    if name in ("PosteriorService", "PosteriorServer", "PosteriorClient"):
        from . import serving as _serving

        return getattr(_serving, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
from . import distributions
from . import util
from . import diagnostics

__all__ = [
    "__version__",
    "TraceMode",
    "PriorInflation",
    "InferenceEngine",
    "InferenceNetwork",
    "ObserveEmbedding",
    "Optimizer",
    "LearningRateScheduler",
    "seed",
    "set_verbosity",
    "set_platform",
    "set_device",
    "set_dtype",
    "sample",
    "observe",
    "factor",
    "tag",
    "rejection_sample",
    "AddressDictionary",
    "Model",
    "MarkovModel",
    "RemoteModel",
    "RemoteModelPool",
    "LockstepRemoteModel",
    "ChainState",
    "ConditionalModel",
    "ParallelModel",
    "distributions",
    "util",
]
