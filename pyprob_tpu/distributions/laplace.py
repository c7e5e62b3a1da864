"""Laplace distribution.

No reference counterpart — the reference exposes 13 concrete wrappers
(reference: pyprob/distributions/__init__.py); Laplace is a beyond-parity
addition following the same thin-wrapper pattern (cf.
pyprob/distributions/normal.py:8-30), useful as a heavy-tailed prior and
as an RMH random-walk kernel alternative.
"""

from __future__ import annotations

import numpy as np

from .. import util, backend
from .distribution import Distribution, register_distribution


@register_distribution
class Laplace(Distribution):
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
            name="Laplace", address_suffix="Laplace", batch_shape=batch_shape
        )

    @property
    def loc(self):
        return self._loc

    @property
    def scale(self):
        return self._scale

    def _sample_np(self, rng, shape):
        return rng.laplace(
            np.asarray(self._loc, dtype=np.float64),
            np.asarray(self._scale, dtype=np.float64),
            size=shape + self._batch_shape,
        ).astype(util.dtype())

    def _sample_jax(self, key, shape):
        import jax

        z = jax.random.laplace(
            key, shape=shape + self._batch_shape, dtype=util.dtype()
        )
        return self._loc + self._scale * z

    def log_prob(self, value, sum=False):
        B = backend.of(value, self._loc, self._scale)
        x = B.asarray(value, util.dtype())
        lp = -B.abs(x - self._loc) / self._scale - B.log(2.0 * self._scale)
        return B.sum(lp) if sum else lp

    def cdf(self, value):
        B = backend.of(value, self._loc, self._scale)
        x = B.asarray(value, util.dtype())
        z = (x - self._loc) / self._scale
        return B.where(z <= 0, 0.5 * B.exp(z), 1.0 - 0.5 * B.exp(-z))

    def icdf(self, value):
        B = backend.of(value, self._loc, self._scale)
        u = B.asarray(value, util.dtype())
        return self._loc - self._scale * B.sign(u - 0.5) * B.log1p(
            -2.0 * B.abs(u - 0.5)
        )

    @property
    def mean(self):
        return self._loc

    @property
    def variance(self):
        return 2.0 * self._scale ** 2
