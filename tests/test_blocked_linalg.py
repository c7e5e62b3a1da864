"""Blocked batched Cholesky / triangular solves (ops/blocked_linalg).

The recursive GEMM formulation must match LAPACK to f32 round-off on
every shape class (odd N, base-case N, multi-level recursion, unbatched,
vmapped, differentiated) because backend.py swaps it in transparently
for the GP family's hot path on TPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pyprob_tpu.ops.blocked_linalg import (
    blocked_cholesky,
    mvn_quad_logdet_blocked,
    solve_lower_vec,
    solve_right_lower_t,
)


def _spd(rng, shape, n):
    a = rng.standard_normal(shape + (n, n)).astype(np.float32)
    return a @ a.swapaxes(-1, -2) + n * np.eye(n, dtype=np.float32)


# N>=256 correctness is asserted on-chip (tests/extra/chip_blocked_chol.py
# maxrelerr column); CPU keeps compile-bounded sizes
@pytest.mark.parametrize("n", [7, 32, 96, 130])
def test_blocked_cholesky_matches_lapack(n):
    rng = np.random.default_rng(0)
    cov = _spd(rng, (5,), n)
    got = np.asarray(blocked_cholesky(jnp.asarray(cov)))
    ref = np.linalg.cholesky(cov)
    assert np.max(np.abs(got - ref)) <= 2e-5 * np.max(np.abs(ref))


def test_solves_match_reference():
    rng = np.random.default_rng(1)
    n = 96
    cov = _spd(rng, (3,), n)
    l = np.linalg.cholesky(cov)
    b = rng.standard_normal((3, n)).astype(np.float32)
    z = np.asarray(solve_lower_vec(jnp.asarray(l), jnp.asarray(b)))
    zr = np.linalg.solve(l, b[..., None])[..., 0]
    np.testing.assert_allclose(z, zr, rtol=2e-4, atol=2e-4)
    m = rng.standard_normal((3, 48, n)).astype(np.float32)
    x = np.asarray(solve_right_lower_t(jnp.asarray(m), jnp.asarray(l)))
    # X @ L^T = M  <=>  L X^T = M^T
    xr = np.swapaxes(
        np.linalg.solve(l, np.swapaxes(m, -1, -2)), -1, -2
    )
    np.testing.assert_allclose(x, xr, rtol=2e-4, atol=2e-4)


def test_mvn_quad_logdet_blocked_unbatched_vmap_grad():
    rng = np.random.default_rng(2)
    n = 96
    cov = _spd(rng, (), n)
    d = rng.standard_normal(n).astype(np.float32)
    q, hld = mvn_quad_logdet_blocked(jnp.asarray(cov), jnp.asarray(d))
    l = np.linalg.cholesky(cov)
    zr = np.linalg.solve(l, d)
    np.testing.assert_allclose(float(q), float(zr @ zr), rtol=1e-4)
    np.testing.assert_allclose(
        float(hld), float(np.log(np.diag(l)).sum()), rtol=1e-4
    )
    covb = _spd(rng, (4,), n)
    db = rng.standard_normal((4, n)).astype(np.float32)
    qb, _ = jax.vmap(mvn_quad_logdet_blocked)(
        jnp.asarray(covb), jnp.asarray(db)
    )
    lrb = np.linalg.cholesky(covb)
    zrb = np.linalg.solve(lrb, db[..., None])[..., 0]
    np.testing.assert_allclose(
        np.asarray(qb), (zrb * zrb).sum(-1), rtol=2e-4
    )
    g = jax.grad(
        lambda c: mvn_quad_logdet_blocked(c, jnp.asarray(d))[0]
    )(jnp.asarray(cov))
    assert bool(jnp.all(jnp.isfinite(g)))


def test_backend_gating_env_knob(monkeypatch):
    from pyprob_tpu import backend

    monkeypatch.setenv("PYPROB_TPU_BLOCKED_CHOL", "0")
    assert not backend.JAX._use_blocked_linalg(512)
    monkeypatch.setenv("PYPROB_TPU_BLOCKED_CHOL", "1")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert backend.JAX._use_blocked_linalg(128)
    assert not backend.JAX._use_blocked_linalg(64)
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert not backend.JAX._use_blocked_linalg(512)


def test_backend_cholesky_blocked_path_numerics(monkeypatch):
    # Force the blocked path on CPU: results must still match LAPACK
    # (the gate is a perf decision, never a numerics one).
    from pyprob_tpu import backend

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    rng = np.random.default_rng(3)
    cov = _spd(rng, (2,), 130)
    b = rng.standard_normal((2, 130)).astype(np.float32)
    l = np.asarray(backend.JAX.cholesky(jnp.asarray(cov)))
    ref = np.linalg.cholesky(cov)
    assert np.max(np.abs(l - ref)) <= 2e-5 * np.max(np.abs(ref))
    z = np.asarray(
        backend.JAX.tri_solve_lower(jnp.asarray(ref), jnp.asarray(b))
    )
    zr = np.linalg.solve(ref, b[..., None])[..., 0]
    np.testing.assert_allclose(z, zr, rtol=2e-4, atol=2e-4)


def test_chol_inv_lower_joint():
    from pyprob_tpu.ops.blocked_linalg import chol_inv_lower, tri_inv_lower

    rng = np.random.default_rng(4)
    n = 40
    cov = _spd(rng, (2,), n)
    l, m = jax.jit(chol_inv_lower)(jnp.asarray(cov))
    ref = np.linalg.cholesky(cov)
    assert np.max(np.abs(np.asarray(l) - ref)) <= 2e-5 * np.max(np.abs(ref))
    eye = np.asarray(m) @ ref
    assert np.max(np.abs(eye - np.eye(n))) < 5e-5
    m2 = np.asarray(tri_inv_lower(jnp.asarray(ref)))
    assert np.max(np.abs(m2 @ ref - np.eye(n))) < 5e-5


def test_panel_path_matches_lapack():
    """v3 iterative panel factorization (round 3): strips/minvs solve and
    the assembled factor agree with LAPACK at f32 round-off, across
    panel-boundary and non-multiple sizes."""
    import numpy as np
    import jax.numpy as jnp
    from pyprob_tpu.ops.blocked_linalg import (
        chol_panels,
        assemble_panels,
        panel_cholesky,
        solve_lower_vec_panels,
        mvn_quad_logdet_panels,
    )

    rng = np.random.default_rng(11)
    for n in (16, 64, 96, 160, 256):
        b = 3
        x = rng.standard_normal((b, n, n)).astype(np.float32)
        cov = x @ np.swapaxes(x, -1, -2) + n * np.eye(n, dtype=np.float32)
        diff = rng.standard_normal((b, n)).astype(np.float32)
        l_ref = np.linalg.cholesky(cov)
        l = np.asarray(panel_cholesky(jnp.asarray(cov)))
        assert np.max(np.abs(l - l_ref) / (np.abs(l_ref) + 1e-3)) < 5e-4
        strips, minvs = chol_panels(jnp.asarray(cov))
        l2 = np.asarray(
            assemble_panels(strips, cov.shape, jnp.float32)
        )
        np.testing.assert_allclose(l2, l, rtol=0, atol=0)
        z = np.asarray(
            solve_lower_vec_panels(strips, minvs, jnp.asarray(diff))
        )
        z_ref = np.linalg.solve(l_ref, diff[..., None])[..., 0]
        assert np.max(np.abs(z - z_ref)) < 5e-3
        q, hld = mvn_quad_logdet_panels(jnp.asarray(cov), jnp.asarray(diff))
        q_ref = (z_ref * z_ref).sum(-1)
        hld_ref = np.log(np.diagonal(l_ref, axis1=-2, axis2=-1)).sum(-1)
        assert np.max(np.abs(np.asarray(q) - q_ref) / (q_ref + 1.0)) < 1e-4
        assert np.max(np.abs(np.asarray(hld) - hld_ref)) < 5e-3
