"""Bernoulli distribution (reference: pyprob/distributions/bernoulli.py)."""

from __future__ import annotations

import numpy as np
import jax

from .. import util, backend
from .distribution import Distribution, register_distribution


@register_distribution
class Bernoulli(Distribution):
    _param_names = ("probs",)

    def __init__(self, probs=None, logits=None):
        if (probs is None) == (logits is None):
            raise ValueError("Provide exactly one of probs, logits")
        if logits is not None:
            B = backend.of(logits)
            probs = B.sigmoid(B.asarray(logits, util.dtype()))
        else:
            B = backend.of(probs)
            probs = B.asarray(probs, util.dtype())
        self._probs = probs
        self._finish_init()

    def _finish_init(self):
        super().__init__(
            name="Bernoulli",
            address_suffix="Bernoulli",
            batch_shape=np.shape(self._probs),
        )

    @property
    def probs(self):
        return self._probs

    @property
    def logits(self):
        """Log-odds accessor (reference parity: torch Bernoulli.logits)."""
        B = backend.of(self._probs)
        p = B.clip(self._probs, 1e-12, 1.0 - 1e-12)
        return B.log(p) - B.log1p(-p)

    def _sample_np(self, rng, shape):
        u = rng.random(size=shape + self._batch_shape)
        return (u < np.asarray(self._probs)).astype(util.dtype())

    def _sample_jax(self, key, shape):
        return jax.random.bernoulli(
            key, self._probs, shape=shape + self._batch_shape
        ).astype(util.dtype())

    def log_prob(self, value, sum=False):
        B = backend.of(value, self._probs)
        value = B.asarray(value, util.dtype())
        p = B.clip(self._probs, 1e-12, 1.0 - 1e-12)
        lp = B.xlogy(value, p) + B.xlog1py(1.0 - value, -p)
        return B.sum(lp) if sum else lp

    @property
    def mean(self):
        return self._probs

    @property
    def variance(self):
        return self._probs * (1.0 - self._probs)
