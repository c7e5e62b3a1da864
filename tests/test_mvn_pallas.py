"""Fused MVN log-density Pallas kernel (pyprob_tpu.ops.mvn_logpdf).

Correctness runs in interpreter mode on CPU (the compiled path is
TPU-only; it was additionally validated on the real chip — see
BASELINE.md round-2 GP study)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pyprob_tpu.ops.mvn_logpdf import (
    mvn_quad_logdet,
    _quad_logdet_reference,
)


def _spd(rng, b, n):
    a = rng.standard_normal((b, n, n)).astype(np.float32)
    return a @ np.swapaxes(a, -1, -2) + n * np.eye(n, dtype=np.float32)


@pytest.mark.parametrize("n", [4, 100, 128, 200, 256])
def test_quad_logdet_matches_reference(n):
    rng = np.random.default_rng(0)
    cov = jnp.asarray(_spd(rng, 3, n))
    diff = jnp.asarray(rng.standard_normal((3, n)).astype(np.float32))
    q, ld = mvn_quad_logdet(cov, diff, True)  # interpret mode
    qr, ldr = _quad_logdet_reference(cov, diff)
    np.testing.assert_allclose(np.asarray(q), np.asarray(qr), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(ld), np.asarray(ldr), rtol=2e-5)


def test_quad_logdet_unbatched_and_nested_batch():
    rng = np.random.default_rng(1)
    cov1 = jnp.asarray(_spd(rng, 1, 32)[0])
    diff1 = jnp.asarray(rng.standard_normal(32).astype(np.float32))
    q, ld = mvn_quad_logdet(cov1, diff1, True)
    qr, ldr = _quad_logdet_reference(cov1, diff1)
    np.testing.assert_allclose(float(q), float(qr), rtol=2e-5)
    np.testing.assert_allclose(float(ld), float(ldr), rtol=2e-5)
    cov2 = jnp.asarray(_spd(rng, 6, 16).reshape(2, 3, 16, 16))
    diff2 = jnp.asarray(rng.standard_normal((2, 3, 16)).astype(np.float32))
    q, ld = mvn_quad_logdet(cov2, diff2, True)
    assert q.shape == (2, 3)
    qr, ldr = _quad_logdet_reference(cov2, diff2)
    np.testing.assert_allclose(np.asarray(q), np.asarray(qr), rtol=2e-5)


def test_quad_logdet_gradients_match_reference():
    """The custom VJP (XLA recompute) must agree with differentiating
    the stock implementation."""
    rng = np.random.default_rng(2)
    cov = jnp.asarray(_spd(rng, 2, 8))
    diff = jnp.asarray(rng.standard_normal((2, 8)).astype(np.float32))

    def f_pallas(c, d):
        q, ld = mvn_quad_logdet(c, d, True)
        return jnp.sum(-0.5 * q - ld)

    def f_ref(c, d):
        q, ld = _quad_logdet_reference(c, d)
        return jnp.sum(-0.5 * q - ld)

    gp = jax.grad(f_pallas, argnums=(0, 1))(cov, diff)
    gr = jax.grad(f_ref, argnums=(0, 1))(cov, diff)
    # d/dcov of the reference differs by the symmetrization convention;
    # compare the symmetric parts (the only part that matters for a
    # symmetric covariance builder)
    sym = lambda m: 0.5 * (m + jnp.swapaxes(m, -1, -2))
    np.testing.assert_allclose(
        np.asarray(sym(gp[0])), np.asarray(sym(gr[0])), rtol=1e-3, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(gp[1]), np.asarray(gr[1]), rtol=1e-3, atol=1e-5
    )
