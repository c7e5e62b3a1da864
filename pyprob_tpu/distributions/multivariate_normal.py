"""Multivariate normal distribution (event shape (k,)).

Beyond-parity addition (the reference's concrete set is listed at
pyprob/distributions/__init__.py).  Parameterized by ``loc`` and either a
full ``covariance_matrix`` or its lower-Cholesky factor ``scale_tril``;
only the factor is stored (one ``cholesky`` at construction), so sampling
is a matmul and ``log_prob`` a triangular solve — both MXU-friendly and
batchable under ``vmap``.
"""

from __future__ import annotations

import numpy as np

from .. import util, backend
from .distribution import Distribution, register_distribution


@register_distribution
class MultivariateNormal(Distribution):
    _param_names = ("loc", "scale_tril")

    def __init__(self, loc, covariance_matrix=None, scale_tril=None):
        if (covariance_matrix is None) == (scale_tril is None):
            raise ValueError(
                "Provide exactly one of covariance_matrix, scale_tril"
            )
        B = backend.of(loc, covariance_matrix, scale_tril)
        self._loc = B.asarray(loc, util.dtype())
        if np.ndim(self._loc) < 1:
            raise ValueError("MultivariateNormal loc must be at least 1-D")
        if scale_tril is not None:
            self._scale_tril = B.asarray(scale_tril, util.dtype())
        else:
            cov = B.asarray(covariance_matrix, util.dtype())
            self._scale_tril = B.cholesky(cov)
        self._finish_init()

    def _finish_init(self):
        k = int(np.shape(self._loc)[-1])
        self._event_size = k
        batch_shape = np.broadcast_shapes(
            np.shape(self._loc)[:-1], np.shape(self._scale_tril)[:-2]
        )
        super().__init__(
            name="MultivariateNormal",
            address_suffix=f"MultivariateNormal(len:{k})",
            batch_shape=batch_shape,
        )

    @property
    def event_shape(self):
        return (self._event_size,)

    @property
    def loc(self):
        return self._loc

    @property
    def scale_tril(self):
        return self._scale_tril

    @property
    def covariance_matrix(self):
        B = backend.of(self._scale_tril)
        L = self._scale_tril
        return B.np.matmul(L, B.np.swapaxes(L, -1, -2))

    def _z_to_x(self, B, z):
        # z: (..., k) standard normal -> loc + L @ z, batch-broadcasting L
        return self._loc + B.np.matmul(self._scale_tril, z[..., None])[..., 0]

    def _sample_np(self, rng, shape):
        z = rng.standard_normal(
            size=shape + self._batch_shape + (self._event_size,)
        ).astype(util.dtype())
        return self._z_to_x(backend.NUMPY, z)

    def _sample_jax(self, key, shape):
        import jax

        z = jax.random.normal(
            key,
            shape=shape + self._batch_shape + (self._event_size,),
            dtype=util.dtype(),
        )
        return self._z_to_x(backend.JAX, z)

    def log_prob(self, value, sum=False):
        B = backend.of(value, self._loc, self._scale_tril)
        x = B.asarray(value, util.dtype())
        diff = x - self._loc
        # broadcast L against diff's batch dims before the triangular solve
        batch = np.broadcast_shapes(
            B.np.shape(diff)[:-1], B.np.shape(self._scale_tril)[:-2]
        )
        k = self._event_size
        L = B.broadcast_to(self._scale_tril, batch + (k, k))
        diff = B.broadcast_to(diff, batch + (k,))
        z = B.tri_solve_lower(L, diff)
        half_log_det = B.sum(
            B.log(B.np.diagonal(L, axis1=-2, axis2=-1)), -1
        )
        lp = (
            -0.5 * B.sum(z * z, -1)
            - half_log_det
            - 0.5 * k * np.log(2.0 * np.pi)
        )
        return B.sum(lp) if sum else lp

    @property
    def mean(self):
        return self._loc

    @property
    def variance(self):
        B = backend.of(self._scale_tril)
        L = self._scale_tril
        return B.sum(L * L, -1)
