"""Truncated normal distribution.

Reference hand-implements this (pyprob/distributions/truncated_normal.py:12-115)
with a rejection-retry sampler; here sampling is the exact inverse-CDF
transform (u uniform on [Phi(alpha), Phi(beta)] pushed through Phi^{-1}),
which is branch-free, exact, and maps cleanly onto TPU vector units under
vmap — no retry loop needed.
"""

from __future__ import annotations

import math

import numpy as np
import jax

from .. import util, backend
from .distribution import Distribution, register_distribution
from .normal import Normal

_LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)


@register_distribution
class TruncatedNormal(Distribution):
    _param_names = ("mean_non_truncated", "stddev_non_truncated", "low", "high")

    def __init__(
        self,
        mean_non_truncated,
        stddev_non_truncated,
        low,
        high,
        clamp_mean_between_low_high=False,
    ):
        B = backend.of(mean_non_truncated, stddev_non_truncated, low, high)
        m = B.asarray(mean_non_truncated, util.dtype())
        low = B.asarray(low, util.dtype())
        high = B.asarray(high, util.dtype())
        if clamp_mean_between_low_high:
            m = B.minimum(B.maximum(m, low), high)
        self._mean_non_truncated = m
        self._stddev_non_truncated = B.asarray(stddev_non_truncated, util.dtype())
        self._low = low
        self._high = high
        self._clamp = clamp_mean_between_low_high
        self._finish_init()

    def _tree_aux(self):
        return self._clamp

    def _tree_build(self, aux, children):
        (
            self._mean_non_truncated,
            self._stddev_non_truncated,
            self._low,
            self._high,
        ) = children
        self._clamp = aux
        self._finish_init()

    def _finish_init(self):
        batch_shape = np.broadcast_shapes(
            np.shape(self._mean_non_truncated),
            np.shape(self._stddev_non_truncated),
            np.shape(self._low),
            np.shape(self._high),
        )
        super().__init__(
            name="TruncatedNormal",
            address_suffix="TruncatedNormal",
            batch_shape=batch_shape,
        )

    @property
    def mean_non_truncated(self):
        return self._mean_non_truncated

    @property
    def stddev_non_truncated(self):
        return self._stddev_non_truncated

    @property
    def variance_non_truncated(self):
        return self._stddev_non_truncated ** 2

    @property
    def low(self):
        return self._low

    @property
    def high(self):
        return self._high

    def _alpha_beta_z(self, B):
        mu, sigma = self._mean_non_truncated, self._stddev_non_truncated
        alpha = (self._low - mu) / sigma
        beta = (self._high - mu) / sigma
        big_phi_a = B.ndtr(alpha)
        big_phi_b = B.ndtr(beta)
        z = B.clip(big_phi_b - big_phi_a, 1e-12, None)
        return alpha, beta, big_phi_a, big_phi_b, z

    def _icdf_sample(self, B, u):
        _, _, big_phi_a, big_phi_b, _ = self._alpha_beta_z(B)
        p = big_phi_a + u * (big_phi_b - big_phi_a)
        p = B.clip(p, 1e-7, 1.0 - 1e-7)
        x = self._mean_non_truncated + self._stddev_non_truncated * B.ndtri(p)
        return B.clip(x, self._low, self._high)

    def _sample_np(self, rng, shape):
        u = rng.random(size=shape + self._batch_shape)
        return self._icdf_sample(backend.NUMPY, u).astype(util.dtype())

    def _sample_jax(self, key, shape):
        u = jax.random.uniform(key, shape + self._batch_shape, dtype=util.dtype())
        return self._icdf_sample(backend.JAX, u)

    def log_prob(self, value, sum=False):
        """Z-normalized truncated log-pdf
        (reference: truncated_normal.py:43-59)."""
        B = backend.of(value, *self._leaves())
        x = B.asarray(value, util.dtype())
        mu, sigma = self._mean_non_truncated, self._stddev_non_truncated
        _, _, _, _, z = self._alpha_beta_z(B)
        xi = (x - mu) / sigma
        lp = -0.5 * xi * xi - _LOG_SQRT_2PI - B.log(sigma) - B.log(z)
        inside = (x >= self._low) & (x <= self._high)
        lp = B.where(inside, lp, B.full_like(x, -B.inf))
        return B.sum(lp) if sum else lp

    @staticmethod
    def _phi(B, x):
        return B.exp(-0.5 * x * x) / math.sqrt(2.0 * math.pi)

    @property
    def mean(self):
        """Analytic truncated mean (reference: truncated_normal.py:78-96)."""
        B = backend.of(*self._leaves())
        alpha, beta, _, _, z = self._alpha_beta_z(B)
        return self._mean_non_truncated + self._stddev_non_truncated * (
            self._phi(B, alpha) - self._phi(B, beta)
        ) / z

    @property
    def variance(self):
        B = backend.of(*self._leaves())
        alpha, beta, _, _, z = self._alpha_beta_z(B)
        pa, pb = self._phi(B, alpha), self._phi(B, beta)
        t1 = (alpha * pa - beta * pb) / z
        t2 = (pa - pb) / z
        return self.variance_non_truncated * (1.0 + t1 - t2 ** 2)
