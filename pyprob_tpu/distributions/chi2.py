"""Chi-squared distribution (df degrees of freedom, support x > 0).

Beyond-parity addition (reference set: pyprob/distributions/__init__.py).
Positive support -> exp transform in the gradient engines.  The JAX
sampler draws Gamma(df/2) and scales by 2 (exact, and avoids a dependence
on newer ``jax.random.chisquare``).
"""

from __future__ import annotations

import numpy as np

from .. import util, backend
from .distribution import Distribution, register_distribution

_LOG_2 = float(np.log(2.0))


@register_distribution
class Chi2(Distribution):
    _param_names = ("df",)

    def __init__(self, df):
        B = backend.of(df)
        self._df = B.asarray(df, util.dtype())
        self._finish_init()

    def _finish_init(self):
        super().__init__(
            name="Chi2",
            address_suffix="Chi2",
            batch_shape=np.shape(self._df),
        )

    @property
    def df(self):
        return self._df

    def _sample_np(self, rng, shape):
        df = np.broadcast_to(
            np.asarray(self._df, dtype=np.float64),
            shape + self._batch_shape,
        )
        return rng.chisquare(df).astype(util.dtype())

    def _sample_jax(self, key, shape):
        import jax

        g = jax.random.gamma(
            key,
            self._df / 2.0,
            shape=shape + self._batch_shape,
            dtype=util.dtype(),
        )
        return 2.0 * g

    def log_prob(self, value, sum=False):
        B = backend.of(value, self._df)
        x = B.asarray(value, util.dtype())
        half_df = self._df / 2.0
        lp = (
            B.xlogy(half_df - 1.0, x)
            - x / 2.0
            - half_df * _LOG_2
            - B.gammaln(half_df)
        )
        lp = B.where(x > 0, lp, B.full_like(lp, -B.inf))
        return B.sum(lp) if sum else lp

    def cdf(self, value):
        B = backend.of(value, self._df)
        x = B.asarray(value, util.dtype())
        return B.gammainc(self._df / 2.0, B.maximum(x, 0.0) / 2.0)

    @property
    def mean(self):
        return self._df

    @property
    def variance(self):
        return 2.0 * self._df
