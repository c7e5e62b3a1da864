"""Binomial distribution (reference: pyprob/distributions/binomial.py)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .. import util, backend
from .distribution import Distribution, register_distribution


@register_distribution
class Binomial(Distribution):
    _param_names = ("total_count", "probs")

    def __init__(self, total_count=1, probs=None, logits=None):
        if (probs is None) == (logits is None):
            raise ValueError("Provide exactly one of probs, logits")
        if logits is not None:
            B = backend.of(logits)
            probs = B.sigmoid(B.asarray(logits, util.dtype()))
        else:
            B = backend.of(probs)
            probs = B.asarray(probs, util.dtype())
        self._total_count = B.asarray(total_count, util.dtype())
        self._probs = probs
        self._finish_init()

    def _finish_init(self):
        batch_shape = np.broadcast_shapes(
            np.shape(self._total_count), np.shape(self._probs)
        )
        super().__init__(
            name="Binomial", address_suffix="Binomial", batch_shape=batch_shape
        )

    @property
    def probs(self):
        return self._probs

    @property
    def total_count(self):
        return self._total_count

    @property
    def logits(self):
        """Log-odds accessor (reference parity: torch Binomial.logits)."""
        B = backend.of(self._probs)
        p = B.clip(self._probs, 1e-12, 1.0 - 1e-12)
        return B.log(p) - B.log1p(-p)

    def _sample_np(self, rng, shape):
        n = np.broadcast_to(
            np.asarray(self._total_count, dtype=np.int64), self._batch_shape
        )
        p = np.broadcast_to(np.asarray(self._probs), self._batch_shape)
        return rng.binomial(n, p, size=shape + self._batch_shape).astype(util.dtype())

    def _sample_jax(self, key, shape):
        return jax.random.binomial(
            key,
            self._total_count,
            self._probs,
            shape=shape + self._batch_shape,
            dtype=util.dtype(),
        )

    def log_prob(self, value, sum=False):
        B = backend.of(value, self._probs, self._total_count)
        k = B.asarray(value, util.dtype())
        n = self._total_count
        p = B.clip(self._probs, 1e-12, 1.0 - 1e-12)
        log_binom = (
            B.gammaln(n + 1.0) - B.gammaln(k + 1.0) - B.gammaln(n - k + 1.0)
        )
        lp = log_binom + B.xlogy(k, p) + B.xlog1py(n - k, -p)
        return B.sum(lp) if sum else lp

    @property
    def mean(self):
        return self._total_count * self._probs

    @property
    def variance(self):
        return self._total_count * self._probs * (1.0 - self._probs)
