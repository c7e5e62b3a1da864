"""Cauchy distribution.

Beyond-parity addition (the reference's concrete set is listed at
pyprob/distributions/__init__.py); follows the thin-wrapper pattern of
pyprob/distributions/normal.py:8-30.  Heavy-tailed prior with undefined
moments — ``mean``/``variance`` return nan like torch's Cauchy.
"""

from __future__ import annotations

import numpy as np

from .. import util, backend
from .distribution import Distribution, register_distribution


@register_distribution
class Cauchy(Distribution):
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
            name="Cauchy", address_suffix="Cauchy", batch_shape=batch_shape
        )

    @property
    def loc(self):
        return self._loc

    @property
    def scale(self):
        return self._scale

    def _sample_np(self, rng, shape):
        z = rng.standard_cauchy(size=shape + self._batch_shape)
        return (
            np.asarray(self._loc, dtype=np.float64)
            + np.asarray(self._scale, dtype=np.float64) * z
        ).astype(util.dtype())

    def _sample_jax(self, key, shape):
        import jax

        z = jax.random.cauchy(
            key, shape=shape + self._batch_shape, dtype=util.dtype()
        )
        return self._loc + self._scale * z

    def log_prob(self, value, sum=False):
        B = backend.of(value, self._loc, self._scale)
        x = B.asarray(value, util.dtype())
        z = (x - self._loc) / self._scale
        lp = -B.log(B.pi * self._scale) - B.log1p(z * z)
        return B.sum(lp) if sum else lp

    def cdf(self, value):
        B = backend.of(value, self._loc, self._scale)
        x = B.asarray(value, util.dtype())
        return B.arctan((x - self._loc) / self._scale) / B.pi + 0.5

    def icdf(self, value):
        B = backend.of(value, self._loc, self._scale)
        u = B.asarray(value, util.dtype())
        return self._loc + self._scale * B.tan(B.pi * (u - 0.5))

    @property
    def mean(self):
        B = backend.of(self._loc, self._scale)
        return B.full_like(B.asarray(self._loc), B.nan)

    @property
    def variance(self):
        B = backend.of(self._loc, self._scale)
        return B.full_like(B.asarray(self._scale), B.nan)
