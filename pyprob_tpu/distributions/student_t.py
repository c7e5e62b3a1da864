"""Student's t distribution.

Beyond-parity addition (the reference's concrete set is listed at
pyprob/distributions/__init__.py); follows the same thin-wrapper pattern
as the reference's Normal (pyprob/distributions/normal.py:8-30).
"""

from __future__ import annotations

import numpy as np

from .. import util, backend
from .distribution import Distribution, register_distribution


@register_distribution
class StudentT(Distribution):
    _param_names = ("df", "loc", "scale")

    def __init__(self, df, loc=0.0, scale=1.0):
        B = backend.of(df, loc, scale)
        self._df = B.asarray(df, util.dtype())
        self._loc = B.asarray(loc, util.dtype())
        self._scale = B.asarray(scale, util.dtype())
        self._finish_init()

    def _finish_init(self):
        batch_shape = np.broadcast_shapes(
            np.shape(self._df), np.shape(self._loc), np.shape(self._scale)
        )
        super().__init__(
            name="StudentT", address_suffix="StudentT", batch_shape=batch_shape
        )

    @property
    def df(self):
        return self._df

    @property
    def loc(self):
        return self._loc

    @property
    def scale(self):
        return self._scale

    def _sample_np(self, rng, shape):
        z = rng.standard_t(
            np.broadcast_to(
                np.asarray(self._df, dtype=np.float64), self._batch_shape
            ),
            size=shape + self._batch_shape,
        )
        return (
            np.asarray(self._loc, dtype=np.float64)
            + np.asarray(self._scale, dtype=np.float64) * z
        ).astype(util.dtype())

    def _sample_jax(self, key, shape):
        import jax

        z = jax.random.t(
            key, self._df, shape=shape + self._batch_shape, dtype=util.dtype()
        )
        return self._loc + self._scale * z

    def log_prob(self, value, sum=False):
        B = backend.of(value, self._df, self._loc, self._scale)
        x = B.asarray(value, util.dtype())
        v = self._df
        z = (x - self._loc) / self._scale
        lp = (
            B.gammaln((v + 1.0) / 2.0)
            - B.gammaln(v / 2.0)
            - 0.5 * B.log(v * B.pi)
            - B.log(self._scale)
            - (v + 1.0) / 2.0 * B.log1p(z * z / v)
        )
        return B.sum(lp) if sum else lp

    @property
    def mean(self):
        B = backend.of(self._df, self._loc)
        return B.where(self._df > 1.0, self._loc, B.full_like(self._loc + self._df, B.nan))

    @property
    def variance(self):
        B = backend.of(self._df, self._scale)
        v = self._df
        var = self._scale ** 2 * v / (v - 2.0)
        inf_band = (v > 1.0) & (v <= 2.0)
        return B.where(
            v > 2.0,
            var,
            B.where(
                inf_band,
                B.full_like(var, B.inf),
                B.full_like(var, B.nan),
            ),
        )
