"""Exponential distribution (reference: pyprob/distributions/exponential.py)."""

from __future__ import annotations

import numpy as np
import jax

from .. import util, backend
from .distribution import Distribution, register_distribution


@register_distribution
class Exponential(Distribution):
    _param_names = ("rate",)

    def __init__(self, rate=1.0):
        B = backend.of(rate)
        self._rate = B.asarray(rate, util.dtype())
        self._finish_init()

    def _finish_init(self):
        super().__init__(
            name="Exponential",
            address_suffix="Exponential",
            batch_shape=np.shape(self._rate),
        )

    @property
    def rate(self):
        return self._rate

    def _sample_np(self, rng, shape):
        return rng.exponential(
            1.0 / np.asarray(self._rate, dtype=np.float64),
            size=shape + self._batch_shape,
        ).astype(util.dtype())

    def _sample_jax(self, key, shape):
        e = jax.random.exponential(
            key, shape + self._batch_shape, dtype=util.dtype()
        )
        return e / self._rate

    def log_prob(self, value, sum=False):
        B = backend.of(value, self._rate)
        value = B.asarray(value, util.dtype())
        lp = B.where(
            value >= 0,
            B.log(self._rate) - self._rate * value,
            B.full_like(value, -B.inf),
        )
        return B.sum(lp) if sum else lp

    def cdf(self, value):
        B = backend.of(value, self._rate)
        value = B.asarray(value, util.dtype())
        return -B.expm1(-self._rate * value)

    def icdf(self, value):
        B = backend.of(value, self._rate)
        return -B.log1p(-B.asarray(value, util.dtype())) / self._rate

    @property
    def mean(self):
        return 1.0 / self._rate

    @property
    def variance(self):
        return 1.0 / self._rate ** 2
