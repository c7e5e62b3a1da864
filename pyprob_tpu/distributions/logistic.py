"""Logistic distribution.

Beyond-parity addition (reference set: pyprob/distributions/__init__.py);
unbounded support.  The log-density uses the softplus-of-|z| form so both
tails are overflow-free.
"""

from __future__ import annotations

import numpy as np

from .. import util, backend
from .distribution import Distribution, register_distribution


@register_distribution
class Logistic(Distribution):
    _param_names = ("loc", "scale")

    def __init__(self, loc, scale):
        B = backend.of(loc, scale)
        self._loc = B.asarray(loc, util.dtype())
        self._scale = B.asarray(scale, util.dtype())
        self._finish_init()

    def _finish_init(self):
        batch_shape = np.broadcast_shapes(
            np.shape(self._loc), np.shape(self._scale)
        )
        super().__init__(
            name="Logistic", address_suffix="Logistic", batch_shape=batch_shape
        )

    @property
    def loc(self):
        return self._loc

    @property
    def scale(self):
        return self._scale

    def _sample_np(self, rng, shape):
        return rng.logistic(
            np.asarray(self._loc, dtype=np.float64),
            np.asarray(self._scale, dtype=np.float64),
            size=shape + self._batch_shape,
        ).astype(util.dtype())

    def _sample_jax(self, key, shape):
        import jax

        z = jax.random.logistic(
            key, shape=shape + self._batch_shape, dtype=util.dtype()
        )
        return self._loc + self._scale * z

    def log_prob(self, value, sum=False):
        B = backend.of(value, self._loc, self._scale)
        x = B.asarray(value, util.dtype())
        z = B.abs(x - self._loc) / self._scale
        # symmetric: log pdf = -|z| - 2 log(1 + e^{-|z|}) - log s
        lp = -z - 2.0 * B.log1p(B.exp(-z)) - B.log(self._scale)
        return B.sum(lp) if sum else lp

    def cdf(self, value):
        B = backend.of(value, self._loc, self._scale)
        x = B.asarray(value, util.dtype())
        z = (x - self._loc) / self._scale
        return 1.0 / (1.0 + B.exp(-z))

    def icdf(self, value):
        B = backend.of(value, self._loc, self._scale)
        u = B.asarray(value, util.dtype())
        return self._loc + self._scale * (B.log(u) - B.log1p(-u))

    @property
    def mean(self):
        return self._loc

    @property
    def variance(self):
        return (np.pi ** 2 / 3.0) * self._scale ** 2
