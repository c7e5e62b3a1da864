"""Pareto (Type I) distribution (beyond-parity addition; reference set:
pyprob/distributions/__init__.py).  pdf α·m^α / x^(α+1) on x >= m
(``scale`` m > 0, shape ``alpha`` > 0); the canonical power-law /
heavy-tail prior.  Closed-form icdf, so both samplers are one uniform
draw (vmap/jit-friendly)."""

from __future__ import annotations

import numpy as np
import jax

from .. import util, backend
from .distribution import Distribution, register_distribution


@register_distribution
class Pareto(Distribution):
    _param_names = ("scale", "alpha")

    def __init__(self, scale, alpha):
        B = backend.of(scale, alpha)
        self._scale = B.asarray(scale, util.dtype())
        self._alpha = B.asarray(alpha, util.dtype())
        self._finish_init()

    def _finish_init(self):
        batch_shape = np.broadcast_shapes(
            np.shape(self._scale), np.shape(self._alpha)
        )
        super().__init__(
            name="Pareto", address_suffix="Pareto", batch_shape=batch_shape
        )

    @property
    def scale(self):
        return self._scale

    @property
    def alpha(self):
        return self._alpha

    def _sample_np(self, rng, shape):
        u = rng.random(size=shape + self._batch_shape)
        return (
            np.asarray(self._scale, np.float64)
            * (1.0 - u) ** (-1.0 / np.asarray(self._alpha, np.float64))
        ).astype(util.dtype())

    def _sample_jax(self, key, shape):
        u = jax.random.uniform(
            key, shape + self._batch_shape, dtype=util.dtype()
        )
        return self.icdf(u)

    def log_prob(self, value, sum=False):
        B = backend.of(value, self._scale, self._alpha)
        x = B.asarray(value, util.dtype())
        m, a = self._scale, self._alpha
        safe = B.where(x >= m, x, m)
        lp = B.where(
            x >= m,
            B.log(a) + a * B.log(m) - (a + 1.0) * B.log(safe),
            B.full_like(x, -B.inf),
        )
        return B.sum(lp) if sum else lp

    def cdf(self, value):
        B = backend.of(value, self._scale, self._alpha)
        x = B.asarray(value, util.dtype())
        safe = B.where(x >= self._scale, x, self._scale)
        return B.where(
            x >= self._scale,
            1.0 - (self._scale / safe) ** self._alpha,
            B.zeros_like(x),
        )

    def icdf(self, value):
        B = backend.of(value, self._scale, self._alpha)
        u = B.asarray(value, util.dtype())
        # clamp away from 1 so the power stays finite
        u = B.clip(u, 0.0, 1.0 - 1e-7)
        return self._scale * (1.0 - u) ** (-1.0 / self._alpha)

    @property
    def mean(self):
        # defined for alpha > 1
        B = backend.of(self._scale, self._alpha)
        a = self._alpha
        safe = B.where(a > 1.0, a, B.full_like(a, 2.0))
        return B.where(
            a > 1.0, safe * self._scale / (safe - 1.0), B.full_like(a, B.nan)
        )

    @property
    def variance(self):
        # defined for alpha > 2
        B = backend.of(self._scale, self._alpha)
        a = self._alpha
        safe = B.where(a > 2.0, a, B.full_like(a, 3.0))
        return B.where(
            a > 2.0,
            self._scale ** 2
            * safe
            / ((safe - 1.0) ** 2 * (safe - 2.0)),
            B.full_like(a, B.nan),
        )
