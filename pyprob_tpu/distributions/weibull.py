"""Weibull distribution (reference: pyprob/distributions/weibull.py)."""

from __future__ import annotations

import numpy as np
import jax

from .. import util, backend
from .distribution import Distribution, register_distribution


@register_distribution
class Weibull(Distribution):
    _param_names = ("scale", "concentration")

    def __init__(self, scale, concentration):
        B = backend.of(scale, concentration)
        self._scale = B.asarray(scale, util.dtype())
        self._concentration = B.asarray(concentration, util.dtype())
        self._finish_init()

    def _finish_init(self):
        batch_shape = np.broadcast_shapes(
            np.shape(self._scale), np.shape(self._concentration)
        )
        super().__init__(
            name="Weibull", address_suffix="Weibull", batch_shape=batch_shape
        )

    def _sample_np(self, rng, shape):
        u = rng.random(size=shape + self._batch_shape)
        k = np.asarray(self._concentration, dtype=np.float64)
        lam = np.asarray(self._scale, dtype=np.float64)
        return (lam * (-np.log1p(-u)) ** (1.0 / k)).astype(util.dtype())

    def _sample_jax(self, key, shape):
        e = jax.random.exponential(key, shape + self._batch_shape, dtype=util.dtype())
        return self._scale * e ** (1.0 / self._concentration)

    def log_prob(self, value, sum=False):
        B = backend.of(value, self._scale, self._concentration)
        x = B.asarray(value, util.dtype())
        k, lam = self._concentration, self._scale
        x_in = B.clip(x, 1e-38, None)
        z = x_in / lam
        lp = B.log(k / lam) + B.xlogy(k - 1.0, z) - z ** k
        lp = B.where(x >= 0, lp, B.full_like(x, -B.inf))
        return B.sum(lp) if sum else lp

    @property
    def mean(self):
        B = backend.of(self._scale, self._concentration)
        return self._scale * B.exp(B.gammaln(1.0 + 1.0 / self._concentration))

    @property
    def variance(self):
        B = backend.of(self._scale, self._concentration)
        g1 = B.exp(B.gammaln(1.0 + 1.0 / self._concentration))
        g2 = B.exp(B.gammaln(1.0 + 2.0 / self._concentration))
        return self._scale ** 2 * (g2 - g1 ** 2)
