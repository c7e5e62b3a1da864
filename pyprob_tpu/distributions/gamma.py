"""Gamma distribution (reference: pyprob/distributions/gamma.py)."""

from __future__ import annotations

import numpy as np
import jax

from .. import util, backend
from .distribution import Distribution, register_distribution


@register_distribution
class Gamma(Distribution):
    _param_names = ("concentration", "rate")

    def __init__(self, concentration, rate=1.0):
        B = backend.of(concentration, rate)
        self._concentration = B.asarray(concentration, util.dtype())
        self._rate = B.asarray(rate, util.dtype())
        self._finish_init()

    def _finish_init(self):
        batch_shape = np.broadcast_shapes(
            np.shape(self._concentration), np.shape(self._rate)
        )
        super().__init__(
            name="Gamma", address_suffix="Gamma", batch_shape=batch_shape
        )

    def _sample_np(self, rng, shape):
        return rng.gamma(
            np.asarray(self._concentration, dtype=np.float64),
            1.0 / np.asarray(self._rate, dtype=np.float64),
            size=shape + self._batch_shape,
        ).astype(util.dtype())

    def _sample_jax(self, key, shape):
        g = jax.random.gamma(
            key,
            self._concentration,
            shape=shape + self._batch_shape,
            dtype=util.dtype(),
        )
        return g / self._rate

    def log_prob(self, value, sum=False):
        B = backend.of(value, self._concentration, self._rate)
        x = B.asarray(value, util.dtype())
        a, r = self._concentration, self._rate
        lp = B.where(
            x > 0,
            B.xlogy(a, r) + B.xlogy(a - 1.0, x) - r * x - B.gammaln(a),
            B.full_like(x, -B.inf),
        )
        return B.sum(lp) if sum else lp

    def cdf(self, value):
        B = backend.of(value, self._concentration, self._rate)
        x = B.asarray(value, util.dtype())
        return B.gammainc(self._concentration, self._rate * x)

    @property
    def mean(self):
        return self._concentration / self._rate

    @property
    def variance(self):
        return self._concentration / self._rate ** 2
