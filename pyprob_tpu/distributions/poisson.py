"""Poisson distribution (reference: pyprob/distributions/poisson.py)."""

from __future__ import annotations

import numpy as np
import jax

from .. import util, backend
from .distribution import Distribution, register_distribution


@register_distribution
class Poisson(Distribution):
    _param_names = ("rate",)

    def __init__(self, rate):
        B = backend.of(rate)
        self._rate = B.asarray(rate, util.dtype())
        self._finish_init()

    def _finish_init(self):
        super().__init__(
            name="Poisson",
            address_suffix="Poisson",
            batch_shape=np.shape(self._rate),
        )

    @property
    def rate(self):
        return self._rate

    def _sample_np(self, rng, shape):
        return rng.poisson(
            np.asarray(self._rate, dtype=np.float64),
            size=shape + self._batch_shape,
        ).astype(util.dtype())

    def _sample_jax(self, key, shape):
        return jax.random.poisson(
            key, self._rate, shape=shape + self._batch_shape
        ).astype(util.dtype())

    def log_prob(self, value, sum=False):
        B = backend.of(value, self._rate)
        k = B.asarray(value, util.dtype())
        lp = B.xlogy(k, self._rate) - self._rate - B.gammaln(k + 1.0)
        return B.sum(lp) if sum else lp

    @property
    def mean(self):
        return self._rate

    @property
    def variance(self):
        return self._rate
