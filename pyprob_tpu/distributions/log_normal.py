"""LogNormal distribution (reference: pyprob/distributions/log_normal.py)."""

from __future__ import annotations

import math

import numpy as np
import jax

from .. import util, backend
from .distribution import Distribution, register_distribution

_LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)


@register_distribution
class LogNormal(Distribution):
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
            name="LogNormal", address_suffix="LogNormal", batch_shape=batch_shape
        )

    def _sample_np(self, rng, shape):
        return np.exp(
            rng.normal(self._loc, self._scale, size=shape + self._batch_shape)
        ).astype(util.dtype())

    def _sample_jax(self, key, shape):
        eps = jax.random.normal(key, shape + self._batch_shape, dtype=util.dtype())
        return backend.JAX.exp(self._loc + self._scale * eps)

    def log_prob(self, value, sum=False):
        B = backend.of(value, self._loc, self._scale)
        x = B.asarray(value, util.dtype())
        x_in = B.clip(x, 1e-38, None)
        z = (B.log(x_in) - self._loc) / self._scale
        lp = -0.5 * z * z - B.log(self._scale) - _LOG_SQRT_2PI - B.log(x_in)
        lp = B.where(x > 0, lp, B.full_like(x, -B.inf))
        return B.sum(lp) if sum else lp

    @property
    def mean(self):
        B = backend.of(self._loc, self._scale)
        return B.exp(self._loc + 0.5 * self._scale ** 2)

    @property
    def variance(self):
        B = backend.of(self._loc, self._scale)
        s2 = self._scale ** 2
        return (B.exp(s2) - 1.0) * B.exp(2.0 * self._loc + s2)
