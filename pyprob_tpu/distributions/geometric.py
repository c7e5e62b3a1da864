"""Geometric distribution (number of failures before the first success,
support {0, 1, 2, ...} — torch's convention).

Beyond-parity addition (reference set: pyprob/distributions/__init__.py).
The JAX sampler inverts the CDF in closed form: with U ~ Uniform(0,1),
floor(log U / log(1-p)) is exactly Geometric(p) — one uniform draw, no
rejection, vmap/jit-friendly.
"""

from __future__ import annotations

import numpy as np

from .. import util, backend
from .distribution import Distribution, register_distribution


@register_distribution
class Geometric(Distribution):
    _param_names = ("probs",)

    def __init__(self, probs=None, logits=None):
        if (probs is None) == (logits is None):
            raise ValueError("Provide exactly one of probs, logits")
        if logits is not None:
            B = backend.of(logits)
            probs = B.sigmoid(B.asarray(logits, util.dtype()))
        else:
            B = backend.of(probs)
            probs = B.asarray(probs, util.dtype())
        self._probs = probs
        self._finish_init()

    def _finish_init(self):
        super().__init__(
            name="Geometric",
            address_suffix="Geometric",
            batch_shape=np.shape(self._probs),
        )

    @property
    def probs(self):
        return self._probs

    def _sample_np(self, rng, shape):
        p = np.broadcast_to(
            np.asarray(self._probs, dtype=np.float64),
            shape + self._batch_shape,
        )
        # numpy's geometric counts trials {1, 2, ...}; shift to failures
        return np.asarray(
            rng.geometric(p, size=shape + self._batch_shape) - 1
        ).astype(util.dtype())

    def _sample_jax(self, key, shape):
        import jax
        import jax.numpy as jnp

        u = jax.random.uniform(
            key,
            shape=shape + self._batch_shape,
            dtype=util.dtype(),
            minval=jnp.finfo(util.dtype()).tiny,
        )
        p = jnp.clip(self._probs, 1e-12, 1.0)
        return jnp.floor(jnp.log(u) / jnp.log1p(-p))

    def log_prob(self, value, sum=False):
        B = backend.of(value, self._probs)
        k = B.asarray(value, util.dtype())
        p = B.clip(self._probs, 1e-12, 1.0 - 1e-12)
        lp = B.xlog1py(k, -p) + B.log(p)
        lp = B.where(k >= 0, lp, B.full_like(lp, -B.inf))
        return B.sum(lp) if sum else lp

    def cdf(self, value):
        B = backend.of(value, self._probs)
        k = B.floor(B.asarray(value, util.dtype()))
        p = B.clip(self._probs, 1e-12, 1.0 - 1e-12)
        c = 1.0 - B.exp(B.log1p(-p) * (k + 1.0))
        return B.where(k >= 0, c, B.zeros_like(c))

    @property
    def mean(self):
        return (1.0 - self._probs) / self._probs

    @property
    def variance(self):
        return (1.0 - self._probs) / self._probs ** 2
