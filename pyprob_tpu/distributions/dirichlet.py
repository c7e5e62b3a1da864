"""Dirichlet distribution (event shape (k,)).

Beyond-parity addition (the reference's concrete set is listed at
pyprob/distributions/__init__.py).  First event-shaped distribution in the
set: values carry a trailing simplex dimension and ``log_prob`` reduces
over it, so batch semantics match the scalar distributions.
"""

from __future__ import annotations

import numpy as np

from .. import util, backend
from .distribution import Distribution, register_distribution


@register_distribution
class Dirichlet(Distribution):
    _param_names = ("concentration",)

    def __init__(self, concentration):
        B = backend.of(concentration)
        self._concentration = B.asarray(concentration, util.dtype())
        if np.ndim(self._concentration) < 1:
            raise ValueError("Dirichlet concentration must be at least 1-D")
        self._finish_init()

    def _finish_init(self):
        shape = np.shape(self._concentration)
        self._event_size = int(shape[-1])
        super().__init__(
            name="Dirichlet",
            address_suffix=f"Dirichlet(len:{self._event_size})",
            batch_shape=shape[:-1],
        )

    @property
    def event_shape(self):
        return (self._event_size,)

    @property
    def concentration(self):
        return self._concentration

    def _sample_np(self, rng, shape):
        a = np.broadcast_to(
            np.asarray(self._concentration, dtype=np.float64),
            shape + self._batch_shape + (self._event_size,),
        )
        g = rng.gamma(a)
        return (g / g.sum(-1, keepdims=True)).astype(util.dtype())

    def _sample_jax(self, key, shape):
        import jax

        return jax.random.dirichlet(
            key,
            self._concentration,
            shape=shape + self._batch_shape,
            dtype=util.dtype(),
        )

    def log_prob(self, value, sum=False):
        B = backend.of(value, self._concentration)
        x = B.asarray(value, util.dtype())
        a = self._concentration
        lp = (
            B.sum(B.xlogy(a - 1.0, x), -1)
            + B.gammaln(B.sum(a, -1))
            - B.sum(B.gammaln(a), -1)
        )
        return B.sum(lp) if sum else lp

    @property
    def mean(self):
        B = backend.of(self._concentration)
        a = self._concentration
        return a / B.sum(a, -1, keepdims=True)

    @property
    def variance(self):
        B = backend.of(self._concentration)
        a = self._concentration
        a0 = B.sum(a, -1, keepdims=True)
        m = a / a0
        return m * (1.0 - m) / (a0 + 1.0)
