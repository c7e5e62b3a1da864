"""HalfCauchy distribution (|Cauchy(0, scale)|, support x >= 0).

Beyond-parity addition (reference set: pyprob/distributions/__init__.py);
the canonical heavy-tailed prior for variance/scale hyperparameters
(Gelman 2006).  Positive support -> exp transform in the gradient engines.
Mean and variance are undefined (inf), matching torch's HalfCauchy.
"""

from __future__ import annotations

import numpy as np

from .. import util, backend
from .distribution import Distribution, register_distribution


@register_distribution
class HalfCauchy(Distribution):
    _param_names = ("scale",)

    def __init__(self, scale):
        B = backend.of(scale)
        self._scale = B.asarray(scale, util.dtype())
        self._finish_init()

    def _finish_init(self):
        super().__init__(
            name="HalfCauchy",
            address_suffix="HalfCauchy",
            batch_shape=np.shape(self._scale),
        )

    @property
    def scale(self):
        return self._scale

    def _sample_np(self, rng, shape):
        z = rng.standard_cauchy(size=shape + self._batch_shape)
        return (
            np.abs(z) * np.asarray(self._scale, dtype=np.float64)
        ).astype(util.dtype())

    def _sample_jax(self, key, shape):
        import jax
        import jax.numpy as jnp

        z = jax.random.cauchy(
            key, shape=shape + self._batch_shape, dtype=util.dtype()
        )
        return jnp.abs(z) * self._scale

    def log_prob(self, value, sum=False):
        B = backend.of(value, self._scale)
        x = B.asarray(value, util.dtype())
        z = x / self._scale
        lp = B.log(B.asarray(2.0 / B.pi, util.dtype())) - B.log(
            self._scale
        ) - B.log1p(z * z)
        lp = B.where(x >= 0, lp, B.full_like(lp, -B.inf))
        return B.sum(lp) if sum else lp

    def cdf(self, value):
        B = backend.of(value, self._scale)
        x = B.asarray(value, util.dtype())
        return B.clip(2.0 / B.pi * B.arctan(x / self._scale), 0.0, 1.0)

    def icdf(self, value):
        B = backend.of(value, self._scale)
        u = B.asarray(value, util.dtype())
        return self._scale * B.tan(B.pi * u / 2.0)

    @property
    def mean(self):
        B = backend.of(self._scale)
        return B.full_like(B.asarray(self._scale), B.inf)

    @property
    def variance(self):
        B = backend.of(self._scale)
        return B.full_like(B.asarray(self._scale), B.inf)
