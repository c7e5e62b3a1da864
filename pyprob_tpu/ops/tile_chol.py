"""Pallas diagonal-tile Cholesky+inverse for the panel factorization.

The v3 panel Cholesky (ops/blocked_linalg.py) is floor-bound at N=256 by
its DIAGONAL-TILE factorizations: the scalar-unrolled [8,8]-leaf chains
of ``chol_inv_lower`` cost ~1.3 ms per leaf *independent of batch size*
— per-op relayout/dispatch latency of ~136 tiny HLOs on lane-padded
[B, 8, 8] tiles, not compute (measured floor decomposition, BASELINE.md
r3).  At B=8192, N=256, P=64 the four tiles were ~53 ms of ~90.

This kernel removes that floor by factoring a whole [B, P, P] tile in
VMEM with the BATCH on the 128-wide lane axis: the tile is processed as
[P, P, Bb] blocks, and every step of the column-loop factorization is a
dense [P, Bb] or [P, P, Bb] vector op — no lane padding, no per-leaf
dispatch, ~10 Mosaic ops per column instead of ~136 HLOs per 8x8 leaf.
One fused pass produces BOTH the Cholesky factor L and its inverse M
(the panel solves consume inv(L_kk) as a GEMM operand):

    per column j:
      d      = rsqrt(S[j, j])                     # [Bb]
      L[:,j] = S[:, j] * d   (rows >= j)          # [P, Bb]
      S     -= Lcol (x) Lcol                      # [P, P, Bb] outer update
      M[j,:] = R[j, :] * d                        # row j of inv(L)
      R     -= Lcol_strict (x) M[j, :]            # [P, P, Bb] outer update

with R initialized to I (forward substitution of L M = I, right-looking
form).  Masks are broadcasted iotas; all shapes static; the j-loop is a
statically unrolled Python loop (P iterations, ~640 ops at P=64 — far
under compile limits).

Layout contract: the caller passes the tile TRANSPOSED, [P, P, B], and
gets (L^T-layout, M^T-layout) back in the same [P, P, B] layout; the
transposes in/out are stock XLA (fused with neighbouring ops where
possible).  Gated in blocked_linalg.chol_panels to TPU + P == 64
(``PYPROB_TPU_TILE_KERNEL=0`` opts out); every other path keeps the
recursive chol_inv_lower.

No reference counterpart (the reference has no batched linalg at all);
this is the round-4 lever for the >=1 TFLOP/s-meter N=256 target
(VERDICT r3 directive #2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


_BB = 128  # batch lanes per grid step (f32 lane width)


def _tile_kernel(a_ref, l_ref, m_ref, P):
    import jax.lax as lax

    S = a_ref[:]  # [P, P, Bb]
    Bb = S.shape[-1]
    # R = I broadcast over batch lanes
    eye = (
        lax.broadcasted_iota(jnp.int32, (P, P, 1), 0)
        == lax.broadcasted_iota(jnp.int32, (P, P, 1), 1)
    )
    R = jnp.where(eye, jnp.ones((), S.dtype), jnp.zeros((), S.dtype))
    R = jnp.broadcast_to(R, (P, P, Bb))
    row = lax.broadcasted_iota(jnp.int32, (P, 1), 0)  # [P, 1]
    for j in range(P):
        d = lax.rsqrt(S[j, j, :])  # [Bb]
        col = S[:, j, :] * d[None, :]  # [P, Bb]
        colm = jnp.where(row >= j, col, jnp.zeros((), S.dtype))
        l_ref[:, j, :] = colm
        # trailing symmetric rank-1 update (rows/cols <= j become dead)
        S = S - colm[:, None, :] * colm[None, :, :]
        # row j of M = inv(L): R currently holds I - L[:, :j] @ M[:j, :]
        mrow = R[j, :, :] * d[None, :]  # [P, Bb]
        m_ref[j, :, :] = mrow
        cols = jnp.where(row > j, col, jnp.zeros((), S.dtype))
        R = R - cols[:, None, :] * mrow[None, :, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def chol_inv_tile_T(aT, interpret=False):
    """(L, inv L) of a batched SPD tile in TRANSPOSED layout.

    aT: [P, P, B] (batch on the trailing/lane axis).  Returns
    (LT, MT) in the same layout.  B must be a multiple of 128.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P = aT.shape[0]
    B = aT.shape[-1]
    grid = (B // _BB,)
    spec = pl.BlockSpec(
        (P, P, _BB), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(_tile_kernel, P=P)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec],
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct(aT.shape, aT.dtype),
            jax.ShapeDtypeStruct(aT.shape, aT.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(100 * 1024 * 1024),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * P * P * P * B,
            bytes_accessed=3 * P * P * B * 4,
            transcendentals=P * B,
        ),
        interpret=interpret,
    )(aT)


def chol_inv_tile(tile, interpret=False):
    """(L, inv L) of a batched SPD diagonal tile [..., P, P] via the
    batch-on-lanes Pallas kernel.  Batch is flattened and padded to a
    multiple of 128 lanes; same contract as
    blocked_linalg.chol_inv_lower."""
    P = tile.shape[-1]
    bshape = tile.shape[:-2]
    flat = tile.reshape((-1, P, P))
    B = flat.shape[0]
    Bp = ((B + _BB - 1) // _BB) * _BB
    if Bp != B:
        # pad with identity tiles (factorization stays finite)
        pad = jnp.broadcast_to(jnp.eye(P, dtype=tile.dtype), (Bp - B, P, P))
        flat = jnp.concatenate([flat, pad], axis=0)
    aT = jnp.transpose(flat, (1, 2, 0))
    LT, MT = chol_inv_tile_T(aT, interpret=interpret)
    L = jnp.transpose(LT, (2, 0, 1))[:B]
    M = jnp.transpose(MT, (2, 0, 1))[:B]
    return L.reshape(bshape + (P, P)), M.reshape(bshape + (P, P))
