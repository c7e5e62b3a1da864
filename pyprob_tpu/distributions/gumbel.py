"""Gumbel (extreme-value type I) distribution.

Beyond-parity addition (reference set: pyprob/distributions/__init__.py);
unbounded support, so the gradient engines treat it like Normal.
"""

from __future__ import annotations

import numpy as np

from .. import util, backend
from .distribution import Distribution, register_distribution

_EULER_GAMMA = 0.5772156649015329


@register_distribution
class Gumbel(Distribution):
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
            name="Gumbel", address_suffix="Gumbel", batch_shape=batch_shape
        )

    @property
    def loc(self):
        return self._loc

    @property
    def scale(self):
        return self._scale

    def _sample_np(self, rng, shape):
        return rng.gumbel(
            np.asarray(self._loc, dtype=np.float64),
            np.asarray(self._scale, dtype=np.float64),
            size=shape + self._batch_shape,
        ).astype(util.dtype())

    def _sample_jax(self, key, shape):
        import jax

        z = jax.random.gumbel(
            key, shape=shape + self._batch_shape, dtype=util.dtype()
        )
        return self._loc + self._scale * z

    def log_prob(self, value, sum=False):
        B = backend.of(value, self._loc, self._scale)
        x = B.asarray(value, util.dtype())
        z = (x - self._loc) / self._scale
        lp = -z - B.exp(-z) - B.log(self._scale)
        return B.sum(lp) if sum else lp

    def cdf(self, value):
        B = backend.of(value, self._loc, self._scale)
        x = B.asarray(value, util.dtype())
        return B.exp(-B.exp(-(x - self._loc) / self._scale))

    def icdf(self, value):
        B = backend.of(value, self._loc, self._scale)
        u = B.asarray(value, util.dtype())
        return self._loc - self._scale * B.log(-B.log(u))

    @property
    def mean(self):
        return self._loc + self._scale * _EULER_GAMMA

    @property
    def variance(self):
        return (np.pi ** 2 / 6.0) * self._scale ** 2
