"""Censored observation wrapper (Tobit-style likelihoods).

Beyond-parity addition (reference set: pyprob/distributions/__init__.py).
Wraps any base distribution with a ``cdf``: values recorded AT ``lower``
/ ``upper`` carry the full tail mass (log cdf(lower) / log sf(upper)),
interior values the base density — the standard likelihood for sensor
saturation / detection limits.  Usable as an ``observe`` likelihood on
both execution tiers (the branch is a ``where``-select, so it compiles
under jit/vmap); as a latent-site prior it samples base draws clipped to
the bounds.
"""

from __future__ import annotations

import numpy as np

from .. import util, backend
from .distribution import Distribution, register_distribution


@register_distribution
class Censored(Distribution):
    _param_names = ("base", "lower", "upper")

    def __init__(self, base, lower=None, upper=None):
        if lower is None and upper is None:
            raise ValueError("Censored needs at least one of lower, upper")
        if not isinstance(base, Distribution):
            raise TypeError("Censored wraps a Distribution")
        B = backend.of(lower, upper, *base._leaves())
        self._base = base
        self._lower = (
            B.asarray(-B.inf, util.dtype()) if lower is None
            else B.asarray(lower, util.dtype())
        )
        self._upper = (
            B.asarray(B.inf, util.dtype()) if upper is None
            else B.asarray(upper, util.dtype())
        )
        self._finish_init()

    def _finish_init(self):
        super().__init__(
            name=f"Censored({self._base.name})",
            address_suffix=f"Censored({self._base.address_suffix})",
            batch_shape=np.broadcast_shapes(
                self._base.batch_shape,
                np.shape(self._lower),
                np.shape(self._upper),
            ),
        )

    @property
    def base(self):
        return self._base

    @property
    def lower(self):
        return self._lower

    @property
    def upper(self):
        return self._upper

    def _sample_np(self, rng, shape):
        x = self._base._sample_np(rng, shape)
        return np.clip(
            x,
            np.asarray(self._lower, x.dtype),
            np.asarray(self._upper, x.dtype),
        )

    def _sample_jax(self, key, shape):
        import jax.numpy as jnp

        x = self._base._sample_jax(key, shape)
        return jnp.clip(x, self._lower, self._upper)

    def log_prob(self, value, sum=False):
        B = backend.of(value, self._lower, self._upper, *self._base._leaves())
        x = B.asarray(value, util.dtype())
        interior = self._base.log_prob(x)
        # clamp inside the open interval at the compute dtype's resolution
        # (1 - 1e-12 rounds to 1.0 in float32 and log1p(-1) = -inf)
        eps = float(np.finfo(np.dtype(util.dtype())).eps)
        cdf_x = B.clip(self._base.cdf(x), eps, 1.0 - eps)
        lp = B.where(x <= self._lower, B.log(cdf_x), interior)
        lp = B.where(x >= self._upper, B.log1p(-cdf_x), lp)
        return B.sum(lp) if sum else lp

    def cdf(self, value):
        B = backend.of(value, self._lower, self._upper, *self._base._leaves())
        x = B.asarray(value, util.dtype())
        c = self._base.cdf(x)
        c = B.where(x < self._lower, B.zeros_like(c), c)
        return B.where(x >= self._upper, B.ones_like(c), c)
