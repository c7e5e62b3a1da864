"""Distribution base class.

TPU-native counterpart of the reference base (reference:
pyprob/distributions/distribution.py:9-102).  Key differences:

* No torch: every distribution implements its own math against the
  dual-backend namespace (``pyprob_tpu.backend``) so the same code runs as
  fast host numpy in the interpreter tier and as jnp/XLA ops under
  ``jit``/``vmap`` in the compiled tier.
* Sampling takes an explicit RNG — either a ``numpy.random.Generator`` or a
  ``jax.random`` key.  With ``rng=None`` the global host generator installed
  by ``pyprob_tpu.seed`` is used, mirroring the reference's implicitly
  seeded global torch RNG.
* Distributions are registered as JAX pytrees so they can cross ``jit``
  boundaries and be built from traced parameters inside a compiled model.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .. import util, backend


def _is_jax_key(rng):
    if not isinstance(rng, jax.Array):
        return False
    return jnp.issubdtype(rng.dtype, jax.dtypes.prng_key) or (
        rng.dtype == jnp.uint32 and rng.shape == (2,)
    )


class Distribution:
    """Base class for all distributions.

    Subclasses must set ``_param_names`` (pytree leaves) and implement
    ``_sample_np(rng, shape)``, ``_sample_jax(key, shape)``, ``log_prob``.
    """

    _param_names: tuple = ()

    def __init__(self, name, address_suffix="", batch_shape=()):
        self._name = name
        self._address_suffix = address_suffix
        self._batch_shape = tuple(batch_shape)

    @property
    def name(self):
        return self._name

    @property
    def address_suffix(self):
        return self._address_suffix

    @property
    def batch_shape(self):
        return self._batch_shape

    @property
    def event_shape(self):
        return ()

    # -- sampling -----------------------------------------------------------
    def sample(self, rng=None, sample_shape=()):
        sample_shape = tuple(sample_shape)
        if rng is None:
            rng = util.get_rng()
        if isinstance(rng, np.random.Generator):
            return self._sample_np(rng, sample_shape)
        if _is_jax_key(rng):
            return self._sample_jax(rng, sample_shape)
        raise TypeError(f"Unsupported rng type: {type(rng)}")

    def _sample_np(self, rng, shape):
        raise NotImplementedError()

    def _sample_jax(self, key, shape):
        raise NotImplementedError()

    # -- scoring ------------------------------------------------------------
    def log_prob(self, value, sum=False):
        raise NotImplementedError()

    def prob(self, value, sum=False):
        B = backend.of(value, *self._leaves())
        return B.exp(self.log_prob(value, sum=sum))

    def cdf(self, value):
        raise NotImplementedError(f"cdf not implemented for {self._name}")

    def icdf(self, value):
        raise NotImplementedError(f"icdf not implemented for {self._name}")

    # -- moments ------------------------------------------------------------
    @property
    def mean(self):
        raise NotImplementedError(f"mean not implemented for {self._name}")

    @property
    def variance(self):
        raise NotImplementedError(f"variance not implemented for {self._name}")

    @property
    def stddev(self):
        B = backend.of(*self._leaves())
        return B.sqrt(self.variance)

    def to(self, device=None, *args, **kwargs):
        """Migration no-op (reference parity: torch's ``Distribution.to(device)``,
        used throughout reference pyprob to move parameters between
        cpu/cuda).  JAX arrays are placed by the backend / sharding layer,
        so there is nothing to move; returns ``self`` unchanged."""
        return self

    def expectation(self, func):
        raise NotImplementedError()

    # -- misc ---------------------------------------------------------------
    def _leaves(self):
        return [getattr(self, "_" + n) for n in self._param_names]

    def to_numpy(self):
        """Return a copy with host-numpy parameters (interpreter tier)."""
        cls = type(self)
        children = [np.asarray(x) for x in self._leaves()]
        return jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(self), children
        )

    def __repr__(self):
        ps = ", ".join(
            f"{n}={np.asarray(v) if not isinstance(v, jax.core.Tracer) else v}"
            for n, v in zip(self._param_names, self._leaves())
        )
        return f"{type(self).__name__}({ps})"

    def plot(
        self,
        min_val=-10,
        max_val=10,
        resolution=1000,
        figsize=(10, 5),
        xlabel=None,
        ylabel="Probability",
        log_xscale=False,
        log_yscale=False,
        file_name=None,
        show=False,
        **kwargs,
    ):
        """Density plot over [min_val, max_val]
        (reference: distribution.py:48-74)."""
        if not show:
            import matplotlib

            matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=figsize)
        xvals = np.linspace(min_val, max_val, resolution)
        ax.plot(xvals, np.exp(np.asarray(self.log_prob(xvals))), **kwargs)
        if log_xscale:
            ax.set_xscale("log")
        if log_yscale:
            ax.set_yscale("log")
        if xlabel:
            ax.set_xlabel(xlabel)
        ax.set_ylabel(ylabel)
        if file_name is not None:
            fig.savefig(file_name, bbox_inches="tight")
        if show:
            plt.show()
        else:
            plt.close(fig)
        return fig

    @staticmethod
    def kl_divergence(d1, d2):
        """Analytic KL(d1 || d2) for supported pairs
        (reference: pyprob/distributions/distribution.py:98-102)."""
        from .normal import Normal
        from .categorical import Categorical
        from .bernoulli import Bernoulli
        from .exponential import Exponential
        from .uniform import Uniform

        B = backend.of(*d1._leaves(), *d2._leaves())
        if isinstance(d1, Normal) and isinstance(d2, Normal):
            var1 = d1.variance
            var2 = d2.variance
            return (
                B.log(d2.stddev / d1.stddev)
                + (var1 + (d1.mean - d2.mean) ** 2) / (2.0 * var2)
                - 0.5
            )
        if isinstance(d1, Categorical) and isinstance(d2, Categorical):
            p = B.exp(d1._logits)
            return B.sum(
                B.where(p > 0, p * (d1._logits - d2._logits), B.zeros_like(p)),
                -1,
            )
        if isinstance(d1, Bernoulli) and isinstance(d2, Bernoulli):
            p1, p2 = d1.mean, d2.mean
            p1 = B.clip(p1, 1e-12, 1 - 1e-12)
            p2 = B.clip(p2, 1e-12, 1 - 1e-12)
            return p1 * (B.log(p1) - B.log(p2)) + (1 - p1) * (
                B.log(1 - p1) - B.log(1 - p2)
            )
        if isinstance(d1, Exponential) and isinstance(d2, Exponential):
            r = d2._rate / d1._rate
            return B.log(1.0 / r) + r - 1.0
        if isinstance(d1, Uniform) and isinstance(d2, Uniform):
            return B.log((d2._high - d2._low) / (d1._high - d1._low))
        raise NotImplementedError(
            f"kl_divergence not implemented for {type(d1).__name__} || {type(d2).__name__}"
        )


def register_distribution(cls):
    """Register a Distribution subclass as a JAX pytree whose leaves are its
    parameters; aux data is everything needed to rebuild it structurally.

    Also generates a read-only accessor property for every ``_param_names``
    entry that the class does not already define (reference parity: the
    reference's torch distributions expose constructor parameters as
    attributes, e.g. ``Normal(0,1).loc`` — reference
    pyprob/distributions/normal.py:24-30)."""

    for _n in cls._param_names:
        if not hasattr(cls, _n):
            setattr(
                cls,
                _n,
                property(
                    lambda self, _a="_" + _n: getattr(self, _a),
                    doc=f"Constructor parameter ``{_n}`` (read-only).",
                ),
            )

    def flatten(d):
        children = tuple(getattr(d, "_" + n) for n in cls._param_names)
        aux = d._tree_aux() if hasattr(d, "_tree_aux") else None
        return children, aux

    def unflatten(aux, children):
        d = cls.__new__(cls)
        if hasattr(cls, "_tree_build"):
            cls._tree_build(d, aux, children)
        else:
            for n, c in zip(cls._param_names, children):
                setattr(d, "_" + n, c)
            d._finish_init()
        return d

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls
