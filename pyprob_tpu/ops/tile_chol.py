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


_KB = 8  # column-block width for the shrinking-block formulation


def _tile_kernel(a_ref, l_ref, m_ref, P):
    """Shrinking-block column-loop factorization (v2).

    v1 kept S and R dense [P, P, Bb] through every column, so the two
    rank-1 updates cost 4*P^3*B flops/tile — 3.2x the live work.  v2
    walks 8-column blocks keeping only the LIVE rectangle of each state
    in registers: after block k, rows/cols <= 8k of S are dead (the
    trailing update never reads them), and columns > j of R are still
    exactly I (M is lower triangular, so R[:, c] = I[:, c] - L[:, :j] @
    M[:j, c] with M[:j, c] == 0 for c >= j).  S shrinks [r, r, Bb] with
    r = P - 8k; R splits into W = R[rows>=base, :base] (grown by concat
    each block) and Wd = R[rows>=base, base:base+8] (fresh identity
    block).  Same ~10 vector ops per column; ~1/3 the data touched.
    """
    import jax.lax as lax

    S = a_ref[:]  # [P, P, Bb]
    Bb = S.shape[-1]
    dtype = S.dtype
    nb = -(-P // _KB)
    W = None  # R[base:, :base] — absent while base == 0
    for kb in range(nb):
        base = kb * _KB
        r = P - base
        kw = min(_KB, r)
        # fresh identity block: R[base:, base:base+kw] before this
        # block's updates is I restricted to those rows/cols
        eye = (
            lax.broadcasted_iota(jnp.int32, (r, kw, 1), 0)
            == lax.broadcasted_iota(jnp.int32, (r, kw, 1), 1)
        )
        Wd = jnp.broadcast_to(
            jnp.where(eye, jnp.ones((), dtype), jnp.zeros((), dtype)),
            (r, kw, Bb),
        )
        lrow = lax.broadcasted_iota(jnp.int32, (r, 1), 0)  # local rows
        for j in range(kw):
            d = lax.rsqrt(S[j, j, :])  # [Bb]
            col = S[:, j, :] * d[None, :]  # [r, Bb]
            colm = jnp.where(lrow >= j, col, jnp.zeros((), dtype))
            l_ref[base:, base + j, :] = colm
            S = S - colm[:, None, :] * colm[None, :, :]
            cols = jnp.where(lrow > j, col, jnp.zeros((), dtype))
            # row base+j of M = d * R[base+j, :base+j+1]
            mrow_d = Wd[j, :, :] * d[None, :]  # [kw, Bb]
            m_ref[base + j, base : base + kw, :] = mrow_d
            Wd = Wd - cols[:, None, :] * mrow_d[None, :, :]
            if base:
                mrow_w = W[j, :, :] * d[None, :]  # [base, Bb]
                m_ref[base + j, :base, :] = mrow_w
                W = W - cols[:, None, :] * mrow_w[None, :, :]
        # dead-region fills: L above the diagonal block, M right of it
        if base:
            l_ref[:base, base : base + kw, :] = jnp.zeros(
                (base, kw, Bb), dtype
            )
        if base + kw < P:
            m_ref[base : base + kw, base + kw :, :] = jnp.zeros(
                (kw, P - base - kw, Bb), dtype
            )
        # shrink to the live rectangle for the next block
        if kb + 1 < nb:
            S = S[kw:, kw:, :]
            W = (
                jnp.concatenate([W[kw:], Wd[kw:]], axis=1)
                if base
                else Wd[kw:]
            )


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
