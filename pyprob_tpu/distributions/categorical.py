"""Categorical distribution (reference: pyprob/distributions/categorical.py:8-39).

The address suffix encodes the number of categories so that traces with
different category counts at the same call site map to distinct addresses,
mirroring the reference's ``len_probs:{n}`` scheme.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .. import util, backend
from .distribution import Distribution, register_distribution


@register_distribution
class Categorical(Distribution):
    _param_names = ("logits",)

    def __init__(self, probs=None, logits=None):
        if (probs is None) == (logits is None):
            raise ValueError("Provide exactly one of probs, logits")
        if probs is not None:
            B = backend.of(probs)
            probs = B.asarray(probs, util.dtype())
            probs = probs / B.sum(probs, axis=-1, keepdims=True)
            self._logits = B.log(B.clip(probs, 1e-38, None))
        else:
            B = backend.of(logits)
            logits = B.asarray(logits, util.dtype())
            self._logits = B.log_softmax(logits, axis=-1)
        self._finish_init()

    def _finish_init(self):
        shape = np.shape(self._logits)
        self._num_categories = int(shape[-1])
        super().__init__(
            name="Categorical",
            address_suffix=f"Categorical(len_probs:{self._num_categories})",
            batch_shape=shape[:-1],
        )

    @property
    def num_categories(self):
        return self._num_categories

    @property
    def logits(self):
        return self._logits

    @property
    def probs(self):
        B = backend.of(self._logits)
        return B.exp(self._logits)

    def _sample_np(self, rng, shape):
        probs = np.exp(np.asarray(self._logits, dtype=np.float64))
        cdf = np.cumsum(probs, axis=-1)
        cdf /= cdf[..., -1:]
        u = rng.random(size=shape + self._batch_shape + (1,))
        return (u > cdf).sum(axis=-1).astype(np.int64)

    def _sample_jax(self, key, shape):
        return jax.random.categorical(
            key, self._logits, shape=shape + self._batch_shape
        )

    def log_prob(self, value, sum=False):
        B = backend.of(value, self._logits)
        idx = B.asarray(value)
        if B.np.issubdtype(idx.dtype, B.np.floating):
            idx = B.np.round(idx)
        idx = B.asarray(idx, "int32")
        common = np.broadcast_shapes(B.np.shape(idx), self._batch_shape)
        idx = B.broadcast_to(idx, common)
        logits = B.broadcast_to(
            self._logits, common + (self._num_categories,)
        )
        lp = B.take_along_axis(logits, idx[..., None], axis=-1)[..., 0]
        return B.sum(lp) if sum else lp

    @property
    def mean(self):
        B = backend.of(self._logits)
        k = B.arange(self._num_categories)
        return B.sum(B.exp(self._logits) * k, -1)

    @property
    def variance(self):
        B = backend.of(self._logits)
        k = B.arange(self._num_categories)
        p = B.exp(self._logits)
        m = B.sum(p * k, -1)
        return B.sum(p * k * k, -1) - m ** 2

    @property
    def mode(self):
        B = backend.of(self._logits)
        return B.argmax(self._logits, -1)
