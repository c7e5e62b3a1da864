"""NegativeBinomial distribution (beyond-parity addition; reference set:
pyprob/distributions/__init__.py).  Number of FAILURES before the
``total_count``-th success with per-trial success probability ``probs``
(scipy's ``nbinom(n, p)`` convention):
pmf C(k+r−1, k) · p^r · (1−p)^k, mean r(1−p)/p.  The overdispersed count
likelihood.  The JAX sampler uses the exact Gamma–Poisson mixture:
λ ~ Gamma(r, p/(1−p)), K | λ ~ Poisson(λ)."""

from __future__ import annotations

import numpy as np
import jax

from .. import util, backend
from .distribution import Distribution, register_distribution


@register_distribution
class NegativeBinomial(Distribution):
    _param_names = ("total_count", "probs")

    def __init__(self, total_count, probs=None, logits=None):
        if (probs is None) == (logits is None):
            raise ValueError("Provide exactly one of probs, logits")
        if logits is not None:
            B = backend.of(total_count, logits)
            probs = B.sigmoid(B.asarray(logits, util.dtype()))
        else:
            B = backend.of(total_count, probs)
            probs = B.asarray(probs, util.dtype())
        self._total_count = B.asarray(total_count, util.dtype())
        self._probs = probs
        self._finish_init()

    def _finish_init(self):
        batch_shape = np.broadcast_shapes(
            np.shape(self._total_count), np.shape(self._probs)
        )
        super().__init__(
            name="NegativeBinomial",
            address_suffix="NegativeBinomial",
            batch_shape=batch_shape,
        )

    @property
    def total_count(self):
        return self._total_count

    @property
    def probs(self):
        return self._probs

    def _sample_np(self, rng, shape):
        # exact Gamma-Poisson mixture (supports non-integer total_count,
        # unlike rng.negative_binomial)
        r = np.broadcast_to(
            np.asarray(self._total_count, np.float64),
            shape + self._batch_shape,
        )
        p = np.broadcast_to(
            np.asarray(self._probs, np.float64), shape + self._batch_shape
        )
        lam = rng.gamma(r, (1.0 - p) / p)
        return rng.poisson(lam).astype(util.dtype())

    def _sample_jax(self, key, shape):
        k1, k2 = jax.random.split(key)
        g = jax.random.gamma(
            k1,
            self._total_count,
            shape=shape + self._batch_shape,
            dtype=util.dtype(),
        )
        lam = g * (1.0 - self._probs) / self._probs
        return jax.random.poisson(k2, lam).astype(util.dtype())

    def log_prob(self, value, sum=False):
        B = backend.of(value, self._total_count, self._probs)
        k = B.asarray(value, util.dtype())
        r, p = self._total_count, self._probs
        valid = (k >= 0) & (B.abs(k - B.round(k)) < 1e-6)
        safe_k = B.where(valid, k, B.zeros_like(k))
        lp = (
            B.gammaln(safe_k + r)
            - B.gammaln(r)
            - B.gammaln(safe_k + 1.0)
            + B.xlogy(r, p)
            + B.xlogy(safe_k, 1.0 - p)
        )
        lp = B.where(valid, lp, B.full_like(k, -B.inf))
        return B.sum(lp) if sum else lp

    @property
    def mean(self):
        return self._total_count * (1.0 - self._probs) / self._probs

    @property
    def variance(self):
        return (
            self._total_count * (1.0 - self._probs) / self._probs ** 2
        )
