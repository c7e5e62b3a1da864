"""HalfNormal distribution (|N(0, scale^2)|, support x >= 0).

Beyond-parity addition (reference set: pyprob/distributions/__init__.py);
the standard weakly-informative prior for scale parameters.  Positive
support, so the gradient engines (HMC/NUTS/PT/VI/SVGD) transform it
through exp (pyprob_tpu/inference/hmc.py:_POSITIVE).
"""

from __future__ import annotations

import numpy as np

from .. import util, backend
from .distribution import Distribution, register_distribution

_SQRT_2 = float(np.sqrt(2.0))
_SQRT_2_OVER_PI = float(np.sqrt(2.0 / np.pi))


@register_distribution
class HalfNormal(Distribution):
    _param_names = ("scale",)

    def __init__(self, scale):
        B = backend.of(scale)
        self._scale = B.asarray(scale, util.dtype())
        self._finish_init()

    def _finish_init(self):
        super().__init__(
            name="HalfNormal",
            address_suffix="HalfNormal",
            batch_shape=np.shape(self._scale),
        )

    @property
    def scale(self):
        return self._scale

    def _sample_np(self, rng, shape):
        z = rng.standard_normal(size=shape + self._batch_shape)
        return (
            np.abs(z) * np.asarray(self._scale, dtype=np.float64)
        ).astype(util.dtype())

    def _sample_jax(self, key, shape):
        import jax
        import jax.numpy as jnp

        z = jax.random.normal(
            key, shape=shape + self._batch_shape, dtype=util.dtype()
        )
        return jnp.abs(z) * self._scale

    def log_prob(self, value, sum=False):
        B = backend.of(value, self._scale)
        x = B.asarray(value, util.dtype())
        z = x / self._scale
        lp = (
            0.5 * B.log(B.asarray(2.0 / B.pi, util.dtype()))
            - B.log(self._scale)
            - 0.5 * z * z
        )
        lp = B.where(x >= 0, lp, B.full_like(lp, -B.inf))
        return B.sum(lp) if sum else lp

    def cdf(self, value):
        B = backend.of(value, self._scale)
        x = B.asarray(value, util.dtype())
        return B.clip(B.erf(x / (self._scale * _SQRT_2)), 0.0, 1.0)

    def icdf(self, value):
        B = backend.of(value, self._scale)
        u = B.asarray(value, util.dtype())
        return self._scale * _SQRT_2 * B.erfinv(u)

    @property
    def mean(self):
        return self._scale * _SQRT_2_OVER_PI

    @property
    def variance(self):
        return self._scale ** 2 * (1.0 - 2.0 / np.pi)
