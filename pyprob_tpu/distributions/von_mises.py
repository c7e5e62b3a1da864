"""Von Mises distribution (reference: pyprob/distributions/von_mises.py).

JAX sampling uses the Best-Fisher (1979) rejection algorithm unrolled to a
fixed number of proposal rounds with first-accept masking, so it is
`vmap`/`jit`-compatible (no data-dependent loop bounds; see
/opt/skills/guides/pallas_guide.md "Dynamic Shapes" pitfall).
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from .. import util, backend
from .distribution import Distribution, register_distribution

_MAX_REJECTION_ROUNDS = 32  # P(all rejected) < 1e-12 for any concentration


@register_distribution
class VonMises(Distribution):
    _param_names = ("loc", "concentration")

    def __init__(self, loc, concentration):
        B = backend.of(loc, concentration)
        self._loc = B.asarray(loc, util.dtype())
        self._concentration = B.asarray(concentration, util.dtype())
        self._finish_init()

    def _finish_init(self):
        batch_shape = np.broadcast_shapes(
            np.shape(self._loc), np.shape(self._concentration)
        )
        super().__init__(
            name="VonMises", address_suffix="VonMises", batch_shape=batch_shape
        )

    def _sample_np(self, rng, shape):
        return rng.vonmises(
            np.asarray(self._loc, dtype=np.float64),
            np.asarray(self._concentration, dtype=np.float64),
            size=shape + self._batch_shape,
        ).astype(util.dtype())

    def _sample_jax(self, key, shape):
        full_shape = shape + self._batch_shape
        kappa = jnp.broadcast_to(
            jnp.asarray(self._concentration, jnp.float32), full_shape
        )
        loc = jnp.broadcast_to(jnp.asarray(self._loc, jnp.float32), full_shape)

        b = 1.0 + jnp.sqrt(1.0 + 4.0 * kappa**2)
        rho = (b - jnp.sqrt(2.0 * b)) / (2.0 * kappa)
        r = (1.0 + rho**2) / (2.0 * rho)

        def round_fn(i, carry):
            key, out, accepted = carry
            key, k1 = jax.random.split(key)
            u = jax.random.uniform(k1, (3,) + full_shape, minval=1e-7, maxval=1.0 - 1e-7)
            z = jnp.cos(math.pi * u[0])
            f = (1.0 + r * z) / (r + z)
            c = kappa * (r - f)
            accept = ((c * (2.0 - c) - u[1]) > 0) | (
                (jnp.log(c / u[1]) + 1.0 - c) >= 0
            )
            x = jnp.sign(u[2] - 0.5) * jnp.arccos(jnp.clip(f, -1.0, 1.0))
            out = jnp.where(accepted, out, jnp.where(accept, x, out))
            accepted = accepted | accept
            return key, out, accepted

        init = (key, jnp.zeros(full_shape, jnp.float32), jnp.zeros(full_shape, bool))
        _, x, _ = jax.lax.fori_loop(0, _MAX_REJECTION_ROUNDS, round_fn, init)
        theta = jnp.mod(x + loc + math.pi, 2.0 * math.pi) - math.pi
        return theta.astype(util.dtype())

    def log_prob(self, value, sum=False):
        B = backend.of(value, self._loc, self._concentration)
        x = B.asarray(value, util.dtype())
        kappa = self._concentration
        # log I0(kappa) = log i0e(kappa) + kappa  (overflow-safe)
        log_i0 = B.log(B.i0e(kappa)) + kappa
        lp = kappa * B.cos(x - self._loc) - math.log(2.0 * math.pi) - log_i0
        return B.sum(lp) if sum else lp

    @property
    def mean(self):
        return self._loc

    @property
    def variance(self):
        B = backend.of(self._loc, self._concentration)
        k = self._concentration
        return 1.0 - B.i1(k) / B.i0(k)
