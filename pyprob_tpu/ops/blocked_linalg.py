"""Recursive blocked Cholesky / triangular solves as batched MXU GEMMs.

XLA:TPU's ``CholeskyExpander`` factors a batched [B,N,N] SPD matrix with
an *unblocked* masked column loop inside each 128-wide panel: N sequential
steps, each a full [B, N, 128] VPU pass.  At the GP family's shapes
(B=8192, N=256) that is ~68 GB of VPU traffic — the measured 82 GFLOP/s
(BASELINE.md round-1 GP study).  The Pallas fused kernel (ops/mvn_logpdf)
lifted this to 112 GFLOP/s but plateaus on the same masked-pass volume.

This module removes the masked loop instead of accelerating it: a
recursive right-looking Cholesky

    A = [[A11, .], [A21, A22]]
    L11 = chol(A11);  L21 = A21 @ L11^-T;  L22 = chol(A22 - L21 @ L21^T)

halved until the base case (default 32) where the expander's unblocked
loop touches only [B, 32, 32] tiles.  Everything else — the panel solves
and the trailing updates, i.e. ~all of the N^3/3 FLOPs — is batched
``jnp.matmul`` on the MXU.  Triangular solves recurse the same way.  No
Pallas: pure jnp, differentiable, vmappable, works on any backend
(gated to TPU+large-N in ``backend.py`` because LAPACK wins on CPU).

Precision: TPU matmuls default to one bf16 pass, far too coarse for a
factorization.  All GEMMs here run at ``Precision.HIGHEST`` (bf16x6
passes, ~f32 accuracy); measured error vs LAPACK is at f32 round-off
(tests/test_blocked_linalg.py) and the chip study records the throughput
(BASELINE.md round-2).

Reference context: the reference has no batched-linalg path at all (its
MVN comes from torch.distributions); this is beyond-parity surface for
the GP model family (models/models.py GaussianProcessRegression).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

_BASE = 32  # base-case panel factored by the stock expander


def _split(n, base):
    """Split point: smallest multiple of ``base`` >= n/2 (so the second
    half is never larger than the first and both are nonempty)."""
    h = base * ((n + 2 * base - 1) // (2 * base))
    return min(h, n - 1) if h >= n else h


def _mm(a, b, precision):
    return jnp.matmul(a, b, precision=precision)


def _mT(a):
    return jnp.swapaxes(a, -1, -2)


def blocked_cholesky(a, base=_BASE, precision=lax.Precision.HIGHEST):
    """Lower-Cholesky of a batched SPD matrix ``a`` [..., N, N].

    Recursive right-looking blocking: the trailing update and panel
    solve are batched GEMMs (MXU); only [<=base, <=base] diagonal tiles
    hit the stock expander's sequential column loop."""
    n = a.shape[-1]
    if n <= base:
        return jnp.linalg.cholesky(a)
    h = _split(n, base)
    a11 = a[..., :h, :h]
    a21 = a[..., h:, :h]
    a22 = a[..., h:, h:]
    l11 = blocked_cholesky(a11, base, precision)
    l21 = solve_right_lower_t(a21, l11, base, precision)
    l22 = blocked_cholesky(
        a22 - _mm(l21, _mT(l21), precision), base, precision
    )
    top = jnp.concatenate(
        [l11, jnp.zeros(a.shape[:-2] + (h, n - h), a.dtype)], axis=-1
    )
    bot = jnp.concatenate([l21, l22], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def solve_right_lower_t(b, l, base=_BASE, precision=lax.Precision.HIGHEST):
    """Solve ``X @ L^T = B`` for X (L lower-triangular, B [..., M, N])."""
    n = l.shape[-1]
    if n <= base:
        # X = B @ L^-T  <=>  L Y = B^T, X = Y^T
        y = lax.linalg.triangular_solve(
            l, _mT(b), left_side=True, lower=True
        )
        return _mT(y)
    h = _split(n, base)
    l11 = l[..., :h, :h]
    l21 = l[..., h:, :h]
    l22 = l[..., h:, h:]
    x1 = solve_right_lower_t(b[..., :, :h], l11, base, precision)
    x2 = solve_right_lower_t(
        b[..., :, h:] - _mm(x1, _mT(l21), precision), l22, base, precision
    )
    return jnp.concatenate([x1, x2], axis=-1)


def solve_lower_vec(l, b, base=_BASE, precision=lax.Precision.HIGHEST):
    """Solve ``L z = b`` for a single rhs vector ``b`` [..., N]."""
    n = l.shape[-1]
    if n <= base:
        return lax.linalg.triangular_solve(
            l, b[..., None], left_side=True, lower=True
        )[..., 0]
    h = _split(n, base)
    z1 = solve_lower_vec(l[..., :h, :h], b[..., :h], base, precision)
    rhs2 = b[..., h:] - _mm(l[..., h:, :h], z1[..., None], precision)[..., 0]
    z2 = solve_lower_vec(l[..., h:, h:], rhs2, base, precision)
    return jnp.concatenate([z1, z2], axis=-1)


@functools.partial(jax.jit, static_argnames=("base",))
def mvn_quad_logdet_blocked(cov, diff, base=_BASE):
    """Batched ``(quad, half_logdet)`` = ``(diff^T K^-1 diff,
    0.5 log|K|)`` via the blocked factorization — same contract as
    ops.mvn_logpdf.mvn_quad_logdet, stock-XLA-composable."""
    l = blocked_cholesky(cov, base)
    z = solve_lower_vec(l, diff, base)
    quad = jnp.sum(z * z, axis=-1)
    half_logdet = jnp.sum(
        jnp.log(jnp.diagonal(l, axis1=-2, axis2=-1)), axis=-1
    )
    return quad, half_logdet
