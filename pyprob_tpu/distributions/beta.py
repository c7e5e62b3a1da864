"""Beta distribution with optional affine support rescaling to [low, high]
(reference: pyprob/distributions/beta.py:37-47)."""

from __future__ import annotations

import numpy as np
import jax

from .. import util, backend
from .distribution import Distribution, register_distribution


@register_distribution
class Beta(Distribution):
    _param_names = ("concentration1", "concentration0", "low", "high")

    def __init__(self, concentration1, concentration0, low=0.0, high=1.0):
        B = backend.of(concentration1, concentration0, low, high)
        self._concentration1 = B.asarray(concentration1, util.dtype())
        self._concentration0 = B.asarray(concentration0, util.dtype())
        self._low = B.asarray(low, util.dtype())
        self._high = B.asarray(high, util.dtype())
        self._finish_init()

    def _finish_init(self):
        batch_shape = np.broadcast_shapes(
            np.shape(self._concentration1),
            np.shape(self._concentration0),
            np.shape(self._low),
            np.shape(self._high),
        )
        super().__init__(
            name="Beta", address_suffix="Beta", batch_shape=batch_shape
        )

    @property
    def low(self):
        return self._low

    @property
    def high(self):
        return self._high

    @property
    def concentration1(self):
        return self._concentration1

    @property
    def concentration0(self):
        return self._concentration0

    def _range(self, B):
        return self._high - self._low

    def _sample_np(self, rng, shape):
        x = rng.beta(
            np.asarray(self._concentration1, dtype=np.float64),
            np.asarray(self._concentration0, dtype=np.float64),
            size=shape + self._batch_shape,
        )
        return (np.asarray(self._low) + x * np.asarray(self._high - self._low)).astype(
            util.dtype()
        )

    def _sample_jax(self, key, shape):
        x = jax.random.beta(
            key,
            self._concentration1,
            self._concentration0,
            shape=shape + self._batch_shape,
            dtype=util.dtype(),
        )
        return self._low + x * (self._high - self._low)

    def log_prob(self, value, sum=False):
        B = backend.of(value, *self._leaves())
        v = B.asarray(value, util.dtype())
        rng_ = self._high - self._low
        x = (v - self._low) / rng_
        a, b = self._concentration1, self._concentration0
        x_in = B.clip(x, 1e-12, 1.0 - 1e-12)
        lp = (
            B.xlogy(a - 1.0, x_in)
            + B.xlog1py(b - 1.0, -x_in)
            - B.betaln(a, b)
            - B.log(rng_)
        )
        lp = B.where((x >= 0) & (x <= 1), lp, B.full_like(v, -B.inf))
        return B.sum(lp) if sum else lp

    @property
    def mean(self):
        a, b = self._concentration1, self._concentration0
        return self._low + (self._high - self._low) * a / (a + b)

    @property
    def variance(self):
        a, b = self._concentration1, self._concentration0
        v = a * b / ((a + b) ** 2 * (a + b + 1.0))
        return v * (self._high - self._low) ** 2
