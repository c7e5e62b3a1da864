"""Normal distribution (reference: pyprob/distributions/normal.py:8-30)."""

from __future__ import annotations

import math

import numpy as np
import jax

from .. import util, backend
from .distribution import Distribution, register_distribution

_LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)


@register_distribution
class Normal(Distribution):
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
            name="Normal", address_suffix="Normal", batch_shape=batch_shape
        )

    def _sample_np(self, rng, shape):
        return rng.normal(self._loc, self._scale, size=shape + self._batch_shape).astype(
            util.dtype()
        )

    def _sample_jax(self, key, shape):
        eps = jax.random.normal(
            key, shape + self._batch_shape, dtype=util.dtype()
        )
        return self._loc + self._scale * eps

    def log_prob(self, value, sum=False):
        # scalar host fast path: per-site log-pdfs run once per trace on
        # the interpreter tier, where the generic backend path's ~8 numpy
        # dispatches cost ~30us vs ~2us here
        loc, scale = self._loc, self._scale
        if (
            isinstance(loc, np.ndarray)
            and loc.ndim == 0
            and isinstance(scale, np.ndarray)
            and scale.ndim == 0
            and (
                type(value) is float
                or (isinstance(value, np.ndarray) and value.ndim == 0)
            )
        ):
            z = (float(value) - float(loc)) / float(scale)
            return np.float64(
                -0.5 * z * z - math.log(float(scale)) - _LOG_SQRT_2PI
            )
        B = backend.of(value, self._loc, self._scale)
        value = B.asarray(value, util.dtype())
        z = (value - self._loc) / self._scale
        lp = -0.5 * z * z - B.log(self._scale) - _LOG_SQRT_2PI
        return B.sum(lp) if sum else lp

    def cdf(self, value):
        B = backend.of(value, self._loc, self._scale)
        value = B.asarray(value, util.dtype())
        return 0.5 * (1.0 + B.erf((value - self._loc) / (self._scale * math.sqrt(2.0))))

    def icdf(self, value):
        B = backend.of(value, self._loc, self._scale)
        value = B.asarray(value, util.dtype())
        return self._loc + self._scale * math.sqrt(2.0) * B.erfinv(2.0 * value - 1.0)

    @property
    def mean(self):
        return self._loc

    @property
    def variance(self):
        return self._scale ** 2

    @property
    def stddev(self):
        return self._scale
