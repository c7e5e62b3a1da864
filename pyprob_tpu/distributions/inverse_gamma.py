"""InverseGamma distribution (beyond-parity addition; reference set:
pyprob/distributions/__init__.py).  The standard conjugate prior for
Gaussian variances: X ~ InverseGamma(α, β) iff 1/X ~ Gamma(α, rate=β),
pdf β^α/Γ(α) · x^(−α−1) · e^(−β/x) on x > 0."""

from __future__ import annotations

import numpy as np
import jax

from .. import util, backend
from .distribution import Distribution, register_distribution


@register_distribution
class InverseGamma(Distribution):
    _param_names = ("concentration", "rate")

    def __init__(self, concentration, rate=1.0):
        B = backend.of(concentration, rate)
        self._concentration = B.asarray(concentration, util.dtype())
        self._rate = B.asarray(rate, util.dtype())
        self._finish_init()

    def _finish_init(self):
        batch_shape = np.broadcast_shapes(
            np.shape(self._concentration), np.shape(self._rate)
        )
        super().__init__(
            name="InverseGamma",
            address_suffix="InverseGamma",
            batch_shape=batch_shape,
        )

    @property
    def concentration(self):
        return self._concentration

    @property
    def rate(self):
        return self._rate

    def _sample_np(self, rng, shape):
        g = rng.gamma(
            np.asarray(self._concentration, dtype=np.float64),
            1.0,
            size=shape + self._batch_shape,
        )
        return (np.asarray(self._rate, np.float64) / g).astype(util.dtype())

    def _sample_jax(self, key, shape):
        g = jax.random.gamma(
            key,
            self._concentration,
            shape=shape + self._batch_shape,
            dtype=util.dtype(),
        )
        return self._rate / g

    def log_prob(self, value, sum=False):
        B = backend.of(value, self._concentration, self._rate)
        x = B.asarray(value, util.dtype())
        a, r = self._concentration, self._rate
        safe = B.where(x > 0, x, B.ones_like(x))
        lp = B.where(
            x > 0,
            B.xlogy(a, r)
            - B.gammaln(a)
            - (a + 1.0) * B.log(safe)
            - r / safe,
            B.full_like(x, -B.inf),
        )
        return B.sum(lp) if sum else lp

    def cdf(self, value):
        # P(X <= x) = P(1/X >= 1/x) = Q(a, r/x) (regularized upper gamma)
        B = backend.of(value, self._concentration, self._rate)
        x = B.asarray(value, util.dtype())
        safe = B.where(x > 0, x, B.ones_like(x))
        return B.where(
            x > 0,
            1.0 - B.gammainc(self._concentration, self._rate / safe),
            B.zeros_like(x),
        )

    @property
    def mean(self):
        # defined for concentration > 1
        B = backend.of(self._concentration, self._rate)
        a = self._concentration
        return B.where(
            a > 1.0, self._rate / (a - 1.0), B.full_like(a, B.nan)
        )

    @property
    def variance(self):
        # defined for concentration > 2
        B = backend.of(self._concentration, self._rate)
        a = self._concentration
        safe = B.where(a > 2.0, a, B.full_like(a, 3.0))
        return B.where(
            a > 2.0,
            self._rate ** 2 / ((safe - 1.0) ** 2 * (safe - 2.0)),
            B.full_like(a, B.nan),
        )
