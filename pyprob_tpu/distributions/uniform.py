"""Uniform distribution (reference: pyprob/distributions/uniform.py:8-25)."""

from __future__ import annotations

import math

import numpy as np
import jax

from .. import util, backend
from .distribution import Distribution, register_distribution


@register_distribution
class Uniform(Distribution):
    _param_names = ("low", "high")

    def __init__(self, low, high):
        B = backend.of(low, high)
        self._low = B.asarray(low, util.dtype())
        self._high = B.asarray(high, util.dtype())
        self._finish_init()

    def _finish_init(self):
        batch_shape = np.broadcast_shapes(
            np.shape(self._low), np.shape(self._high)
        )
        super().__init__(
            name="Uniform", address_suffix="Uniform", batch_shape=batch_shape
        )

    def _sample_np(self, rng, shape):
        return rng.uniform(
            self._low, self._high, size=shape + self._batch_shape
        ).astype(util.dtype())

    def _sample_jax(self, key, shape):
        u = jax.random.uniform(key, shape + self._batch_shape, dtype=util.dtype())
        return self._low + u * (self._high - self._low)

    def log_prob(self, value, sum=False):
        # scalar host fast path (interpreter-tier per-site hot spot)
        low, high = self._low, self._high
        if (
            isinstance(low, np.ndarray)
            and low.ndim == 0
            and isinstance(high, np.ndarray)
            and high.ndim == 0
            and (
                type(value) is float
                or (isinstance(value, np.ndarray) and value.ndim == 0)
            )
        ):
            v, lo, hi = float(value), float(low), float(high)
            if lo <= v <= hi:
                return np.float64(-math.log(hi - lo))
            return np.float64(-np.inf)
        B = backend.of(value, self._low, self._high)
        value = B.asarray(value, util.dtype())
        inside = (value >= self._low) & (value <= self._high)
        lp = B.where(
            inside,
            -B.log(self._high - self._low) * B.ones_like(value),
            B.full_like(B.asarray(value, util.dtype()), -B.inf),
        )
        return B.sum(lp) if sum else lp

    def cdf(self, value):
        B = backend.of(value, self._low, self._high)
        value = B.asarray(value, util.dtype())
        return B.clip((value - self._low) / (self._high - self._low), 0.0, 1.0)

    def icdf(self, value):
        B = backend.of(value, self._low, self._high)
        return self._low + B.asarray(value, util.dtype()) * (self._high - self._low)

    @property
    def low(self):
        return self._low

    @property
    def high(self):
        return self._high

    @property
    def mean(self):
        return 0.5 * (self._low + self._high)

    @property
    def variance(self):
        return (self._high - self._low) ** 2 / 12.0
