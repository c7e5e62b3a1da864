"""Multinomial distribution (event shape (k,): counts over k categories
summing to total_count).

Beyond-parity addition (reference set: pyprob/distributions/__init__.py).
Event-shaped like Dirichlet: ``log_prob`` reduces over the trailing
category dimension.  The JAX sampler uses the conditional-binomial chain
(x_i ~ Binomial(remaining, p_i / tail_i)) under ``lax.scan`` — exact, no
host loop, and total_count may be a traced array.
"""

from __future__ import annotations

import numpy as np

from .. import util, backend
from .distribution import Distribution, register_distribution


@register_distribution
class Multinomial(Distribution):
    _param_names = ("total_count", "probs")

    def __init__(self, total_count=1, probs=None, logits=None):
        if (probs is None) == (logits is None):
            raise ValueError("Provide exactly one of probs, logits")
        if logits is not None:
            B = backend.of(logits)
            probs = B.softmax(B.asarray(logits, util.dtype()), axis=-1)
        else:
            B = backend.of(probs)
            probs = B.asarray(probs, util.dtype())
            probs = probs / B.sum(probs, -1, keepdims=True)
        if np.ndim(probs) < 1:
            raise ValueError("Multinomial probs must be at least 1-D")
        self._total_count = B.asarray(total_count, util.dtype())
        self._probs = probs
        self._finish_init()

    def _finish_init(self):
        shape = np.shape(self._probs)
        self._event_size = int(shape[-1])
        batch_shape = np.broadcast_shapes(
            np.shape(self._total_count), shape[:-1]
        )
        super().__init__(
            name="Multinomial",
            address_suffix=f"Multinomial(len:{self._event_size})",
            batch_shape=batch_shape,
        )

    @property
    def event_shape(self):
        return (self._event_size,)

    @property
    def probs(self):
        return self._probs

    @property
    def total_count(self):
        return self._total_count

    def _sample_np(self, rng, shape):
        out_shape = shape + self._batch_shape
        n = np.broadcast_to(
            np.asarray(self._total_count, dtype=np.int64), out_shape
        )
        p = np.broadcast_to(
            np.asarray(self._probs, dtype=np.float64),
            out_shape + (self._event_size,),
        )
        flat_n = n.reshape(-1)
        flat_p = p.reshape(-1, self._event_size)
        out = np.stack(
            [rng.multinomial(ni, pi) for ni, pi in zip(flat_n, flat_p)]
        )
        return out.reshape(out_shape + (self._event_size,)).astype(util.dtype())

    def _sample_jax(self, key, shape):
        import jax
        import jax.numpy as jnp

        k = self._event_size
        out_shape = shape + self._batch_shape
        p = jnp.broadcast_to(self._probs, out_shape + (k,))
        # tail_i = sum_{j >= i} p_j; conditional ratio of category i
        tail = jnp.flip(jnp.cumsum(jnp.flip(p, -1), -1), -1)
        ratios = jnp.clip(p / jnp.maximum(tail, 1e-30), 0.0, 1.0)
        ratios = jnp.moveaxis(ratios, -1, 0)  # [k, *out_shape]
        n0 = jnp.broadcast_to(
            jnp.asarray(self._total_count, util.dtype()), out_shape
        )
        keys = jax.random.split(key, k)

        def step(remaining, inp):
            ki, ri = inp
            x = jax.random.binomial(ki, remaining, ri, dtype=util.dtype())
            return remaining - x, x

        _, xs = jax.lax.scan(step, n0, (keys, ratios))
        return jnp.moveaxis(xs, 0, -1)

    def log_prob(self, value, sum=False):
        B = backend.of(value, self._probs, self._total_count)
        x = B.asarray(value, util.dtype())
        n = self._total_count
        p = B.clip(self._probs, 1e-12, 1.0)
        lp = (
            B.gammaln(n + 1.0)
            - B.sum(B.gammaln(x + 1.0), -1)
            + B.sum(B.xlogy(x, p), -1)
        )
        return B.sum(lp) if sum else lp

    @property
    def mean(self):
        B = backend.of(self._probs, self._total_count)
        n = self._total_count
        return B.asarray(n, util.dtype())[..., None] * self._probs \
            if np.ndim(n) else n * self._probs

    @property
    def variance(self):
        m = self.mean
        return m * (1.0 - self._probs)
