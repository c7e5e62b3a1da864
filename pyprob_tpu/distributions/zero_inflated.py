"""Zero-inflated count wrapper (e.g. zero-inflated Poisson).

Beyond-parity addition (reference set: pyprob/distributions/__init__.py).
With probability ``gate`` the outcome is a structural zero, otherwise a
draw from the base count distribution:

    p(0) = gate + (1-gate) p_base(0),   p(k) = (1-gate) p_base(k)

The branch is a ``where``-select so the likelihood compiles under
jit/vmap on the compiled tier.
"""

from __future__ import annotations

import numpy as np

from .. import util, backend
from .distribution import Distribution, register_distribution


@register_distribution
class ZeroInflated(Distribution):
    _param_names = ("base", "gate")

    def __init__(self, base, gate):
        if not isinstance(base, Distribution):
            raise TypeError("ZeroInflated wraps a Distribution")
        B = backend.of(gate, *base._leaves())
        self._base = base
        self._gate = B.asarray(gate, util.dtype())
        self._finish_init()

    def _finish_init(self):
        super().__init__(
            name=f"ZeroInflated({self._base.name})",
            address_suffix=f"ZeroInflated({self._base.address_suffix})",
            batch_shape=np.broadcast_shapes(
                self._base.batch_shape, np.shape(self._gate)
            ),
        )

    @property
    def base(self):
        return self._base

    @property
    def gate(self):
        return self._gate

    def _sample_np(self, rng, shape):
        x = self._base._sample_np(rng, shape)
        keep = rng.random(np.shape(x)) >= np.asarray(
            self._gate, dtype=np.float64
        )
        return np.where(keep, x, np.zeros_like(x))

    def _sample_jax(self, key, shape):
        import jax
        import jax.numpy as jnp

        k_gate, k_base = jax.random.split(key)
        x = self._base._sample_jax(k_base, shape)
        keep = jax.random.uniform(k_gate, jnp.shape(x)) >= self._gate
        return jnp.where(keep, x, jnp.zeros_like(x))

    def log_prob(self, value, sum=False):
        B = backend.of(value, self._gate, *self._base._leaves())
        x = B.asarray(value, util.dtype())
        g = B.clip(self._gate, 1e-12, 1.0 - 1e-12)
        lp_base = self._base.log_prob(x)
        lp_nonzero = B.log(1.0 - g) + lp_base
        # p(0) = gate + (1-gate) p_base(0), stably in log space
        lp_zero = B.logsumexp(
            B.stack([
            B.broadcast_to(B.log(g), B.np.shape(lp_base)),
            B.broadcast_to(lp_nonzero, B.np.shape(lp_base)),
            ]),
            axis=0,
        )
        lp = B.where(x == 0, lp_zero, lp_nonzero)
        return B.sum(lp) if sum else lp

    @property
    def mean(self):
        return (1.0 - self._gate) * self._base.mean

    @property
    def variance(self):
        g = self._gate
        m = self._base.mean
        return (1.0 - g) * (self._base.variance + g * m * m)
