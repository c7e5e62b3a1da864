"""LKJ distribution over Cholesky factors of correlation matrices
(Lewandowski, Kurowicka & Joe 2009), event shape (d, d).

Beyond-parity addition (reference set: pyprob/distributions/__init__.py).
The standard prior for correlation structure: with ``W = L @ L.T`` the
implied correlation matrix has density ``det(W)^(concentration-1)``;
``concentration=1`` is uniform over correlation matrices,
``concentration>1`` concentrates toward the identity.  Combine with a
scale vector for a full covariance prior:
``MultivariateNormal(mu, scale_tril=sigma[:, None] * L)``.

Sampling uses the onion method (one Beta radius + one spherical
direction per row — vectorized over the batch, d-1 steps, no rejection).
The gradient engines sample LKJ sites through the tanh
canonical-partial-correlation transform
(pyprob_tpu/inference/hmc.py:_chol_corr_to_x), so correlation-matrix
latents work under HMC/NUTS/PT/tempered-SMC/VI/SVGD.
"""

from __future__ import annotations

import numpy as np

from .. import util, backend
from .distribution import Distribution, register_distribution

_LOG_PI = float(np.log(np.pi))


@register_distribution
class LKJCholesky(Distribution):
    _param_names = ("concentration",)

    def __init__(self, dim, concentration=1.0):
        B = backend.of(concentration)
        self._dim = int(dim)
        if self._dim < 2:
            raise ValueError("LKJCholesky needs dim >= 2")
        self._concentration = B.asarray(concentration, util.dtype())
        self._finish_init()

    def _finish_init(self):
        super().__init__(
            name="LKJCholesky",
            address_suffix=f"LKJCholesky(len:{self._dim})",
            batch_shape=np.shape(self._concentration),
        )

    def _tree_aux(self):
        return self._dim

    def _tree_build(self, aux, children):
        self._dim = aux
        (self._concentration,) = children
        self._finish_init()

    @property
    def event_shape(self):
        return (self._dim, self._dim)

    @property
    def dim(self):
        return self._dim

    @property
    def concentration(self):
        return self._concentration

    def _row_betas(self, np_mod):
        """Onion Beta parameters: row i in 1..d-1 has radius^2 ~
        Beta(i/2, eta + (d-1-i)/2)."""
        i = np_mod.arange(1, self._dim, dtype=np.float64)
        return i, np.asarray(self._concentration, np.float64) + (
            self._dim - 1.0 - i
        ) / 2.0

    def _sample_np(self, rng, shape):
        d = self._dim
        out_shape = shape + self._batch_shape
        L = np.zeros(out_shape + (d, d), dtype=np.float64)
        L[..., 0, 0] = 1.0
        eta = np.broadcast_to(
            np.asarray(self._concentration, np.float64), out_shape
        )
        for i in range(1, d):
            b = eta + (d - 1.0 - i) / 2.0
            y = rng.beta(i / 2.0, b, size=out_shape)
            u = rng.standard_normal(out_shape + (i,))
            u /= np.linalg.norm(u, axis=-1, keepdims=True)
            L[..., i, :i] = np.sqrt(y)[..., None] * u
            L[..., i, i] = np.sqrt(1.0 - y)
        return L.astype(util.dtype())

    def _sample_jax(self, key, shape):
        import jax
        import jax.numpy as jnp

        d = self._dim
        out_shape = shape + self._batch_shape
        eta = jnp.broadcast_to(
            jnp.asarray(self._concentration, util.dtype()), out_shape
        )
        rows = [
            jnp.concatenate(
                [jnp.ones(out_shape + (1,), util.dtype()),
                 jnp.zeros(out_shape + (d - 1,), util.dtype())],
                -1,
            )
        ]
        keys = jax.random.split(key, d - 1)
        for i in range(1, d):
            ky, ku = jax.random.split(keys[i - 1])
            b = eta + (d - 1.0 - i) / 2.0
            y = jax.random.beta(ky, i / 2.0, b, shape=out_shape)
            y = y.astype(util.dtype())
            u = jax.random.normal(ku, out_shape + (i,), util.dtype())
            u = u / jnp.linalg.norm(u, axis=-1, keepdims=True)
            head = jnp.sqrt(y)[..., None] * u
            diag = jnp.sqrt(1.0 - y)[..., None]
            pad = jnp.zeros(out_shape + (d - 1 - i,), util.dtype())
            rows.append(jnp.concatenate([head, diag, pad], -1))
        return jnp.stack(rows, -2)

    def log_prob(self, value, sum=False):
        """Density over the Cholesky factor L (cross-validated against
        torch.distributions.LKJCholesky in tests/test_lkj.py):
        sum_i [2(b_i - 1) log L_ii - log B(i/2, b_i) - (i/2) log pi
        + log Gamma(i/2)] with b_i the onion Beta parameters."""
        B = backend.of(value, self._concentration)
        L = B.asarray(value, util.dtype())
        d = self._dim
        diag = B.np.diagonal(L, axis1=-2, axis2=-1)
        i = B.asarray(np.arange(1.0, d), util.dtype())
        b_i = self._concentration[..., None] if self._batch_shape else (
            self._concentration
        )
        b_i = b_i + (d - 1.0 - i) / 2.0
        log_diag = B.log(B.clip(diag[..., 1:], 1e-30, None))
        lp = B.sum(
            2.0 * (b_i - 1.0) * log_diag
            - B.betaln(i / 2.0, b_i)
            - (i / 2.0) * _LOG_PI
            + B.gammaln(i / 2.0),
            -1,
        )
        return B.sum(lp) if sum else lp


def _cpc_to_chol(B, z, d):
    """Batched tanh canonical-partial-correlation chart: z [..., d(d-1)/2]
    -> (L [..., d, d], log|dL/dz| [...]).  The same unconstrained chart
    the gradient engines use (pyprob_tpu/inference/hmc.py:_chol_corr_to_x),
    written against the dual backend and batched over leading dims."""
    batch = B.np.shape(z)[:-1]
    one = B.np.ones(batch + (1,), util.dtype())
    zero = B.np.zeros(batch + (1,), util.dtype())
    rows = [
        B.np.concatenate([one] + [zero] * (d - 1), -1)
    ]
    logdet = B.np.zeros(batch, util.dtype())
    idx = 0
    for i in range(1, d):
        entries = []
        s = B.np.zeros(batch, util.dtype())
        for j in range(i):
            w = B.tanh(z[..., idx])
            rem = B.clip(1.0 - s, 1e-30, None)
            l = w * B.sqrt(rem)
            logdet = logdet + 0.5 * B.log(rem) + B.log1p(-(w * w))
            s = s + l * l
            entries.append(l)
            idx += 1
        diag = B.sqrt(B.clip(1.0 - s, 1e-30, None))
        row = B.stack(
            entries + [diag] + [B.zeros_like(diag)] * (d - 1 - i), -1
        )
        rows.append(row)
    return B.stack(rows, -2), logdet


def _chol_to_cpc(B, L, d):
    """Inverse chart: L [..., d, d] -> z [..., d(d-1)/2]."""
    out = []
    for i in range(1, d):
        s = B.np.zeros(B.np.shape(L)[:-2], util.dtype())
        for j in range(i):
            rem = B.clip(1.0 - s, 1e-30, None)
            w = B.clip(
                L[..., i, j] / B.sqrt(rem), -1.0 + 1e-6, 1.0 - 1e-6
            )
            out.append(B.arctanh(w))
            s = s + L[..., i, j] * L[..., i, j]
    return B.stack(out, -1)


@register_distribution
class LKJCholeskyCPCNormal(Distribution):
    """Proposal distribution over lower-Cholesky factors of correlation
    matrices: independent Normals on the tanh canonical-partial-
    correlation coordinates, pushed through the CPC chart.  This is the
    learned-proposal head for LKJCholesky priors (nn/proposals.py kind
    "lkj_cpc_normal"): ``loc = 0, log_scale = 0`` proposes z ~ N(0, 1) —
    a broad, full-support base over correlation matrices — and training
    moves/narrows each partial correlation independently.  Density over
    L includes the chart's log-Jacobian, so prior/proposal importance
    ratios are exact."""

    _param_names = ("loc", "log_scale")

    def __init__(self, loc, log_scale, dim):
        B = backend.of(loc, log_scale)
        self._dim = int(dim)
        self._loc = B.asarray(loc, util.dtype())
        self._log_scale = B.asarray(log_scale, util.dtype())
        self._finish_init()

    def _finish_init(self):
        d = self._dim
        k = d * (d - 1) // 2
        if np.shape(self._loc)[-1] != k:
            raise ValueError(
                f"loc must have trailing dim d(d-1)/2 = {k}, got "
                f"{np.shape(self._loc)}"
            )
        super().__init__(
            name="LKJCholeskyCPCNormal",
            address_suffix=f"LKJCholesky(len:{d})",
            batch_shape=np.shape(self._loc)[:-1],
        )

    def _tree_aux(self):
        return self._dim

    def _tree_build(self, aux, children):
        self._dim = aux
        self._loc, self._log_scale = children
        self._finish_init()

    @property
    def event_shape(self):
        return (self._dim, self._dim)

    @property
    def dim(self):
        return self._dim

    def _z_moments(self):
        B = backend.of(self._loc, self._log_scale)
        return self._loc, B.exp(self._log_scale)

    def _sample_np(self, rng, shape):
        loc, scale = np.asarray(self._loc), np.exp(
            np.asarray(self._log_scale)
        )
        z = loc + scale * rng.standard_normal(
            shape + np.shape(loc)
        ).astype(util.dtype())
        L, _ = _cpc_to_chol(backend.NUMPY, z, self._dim)
        return L

    def _sample_jax(self, key, shape):
        import jax

        loc, scale = self._loc, backend.JAX.exp(self._log_scale)
        z = loc + scale * jax.random.normal(
            key, shape + np.shape(self._loc)[-1:] if not self._batch_shape
            else shape + np.shape(self._loc), util.dtype()
        )
        L, _ = _cpc_to_chol(backend.JAX, z, self._dim)
        return L

    def log_prob(self, value, sum=False):
        B = backend.of(value, self._loc, self._log_scale)
        L = B.asarray(value, util.dtype())
        z = _chol_to_cpc(B, L, self._dim)
        loc, scale = self._loc, B.exp(self._log_scale)
        lp_z = B.sum(
            -0.5 * ((z - loc) / scale) ** 2
            - self._log_scale
            - 0.5 * np.log(2.0 * np.pi),
            -1,
        )
        _, logdet = _cpc_to_chol(B, z, self._dim)
        lp = lp_z - logdet
        return B.sum(lp) if sum else lp
