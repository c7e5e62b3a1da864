"""Pallas diagonal-tile Cholesky+inverse (ops/tile_chol.py), validated in
interpreter mode on CPU against the recursive chol_inv_lower path (itself
LAPACK-validated in tests/test_blocked_linalg.py).  The real-chip numbers
live in tests/extra/chip_blocked_chol.py / BASELINE.md."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pyprob_tpu.ops.tile_chol import chol_inv_tile
from pyprob_tpu.ops.blocked_linalg import chol_inv_lower


def _spd(rng, B, P):
    A = rng.standard_normal((B, P, P)).astype(np.float32)
    return A @ np.swapaxes(A, -1, -2) + P * np.eye(P, dtype=np.float32)


@pytest.mark.parametrize("P", [8, 64])
def test_tile_kernel_matches_recursive(P):
    rng = np.random.default_rng(0)
    spd = _spd(rng, 256, P)
    L_ref, M_ref = chol_inv_lower(jnp.asarray(spd))
    L, M = chol_inv_tile(jnp.asarray(spd), interpret=True)
    np.testing.assert_allclose(
        np.asarray(L), np.asarray(L_ref), rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(M), np.asarray(M_ref), rtol=2e-3, atol=2e-3
    )
    # L really is a Cholesky factor of the input
    rec = np.asarray(L) @ np.swapaxes(np.asarray(L), -1, -2)
    np.testing.assert_allclose(rec, spd, rtol=2e-3, atol=2e-2)


def test_tile_kernel_pads_non_multiple_batches():
    rng = np.random.default_rng(1)
    spd = _spd(rng, 100, 64)  # not a multiple of the 128-lane block
    L_ref, _ = chol_inv_lower(jnp.asarray(spd))
    L, M = chol_inv_tile(jnp.asarray(spd), interpret=True)
    assert L.shape == (100, 64, 64)
    np.testing.assert_allclose(
        np.asarray(L), np.asarray(L_ref), rtol=2e-3, atol=2e-3
    )


def test_tile_kernel_leading_batch_dims():
    rng = np.random.default_rng(2)
    spd = _spd(rng, 256, 16).reshape(4, 64, 16, 16)
    L_ref, _ = chol_inv_lower(jnp.asarray(spd))
    L, _ = chol_inv_tile(jnp.asarray(spd), interpret=True)
    assert L.shape == spd.shape
    np.testing.assert_allclose(
        np.asarray(L), np.asarray(L_ref), rtol=2e-3, atol=2e-3
    )
