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

halved down to scalar-unrolled [<=8, <=8] leaves (every leaf op is on a
dense [batch] vector — no lane padding), with the panel solve a GEMM
against the recursively-inverted diagonal factor (``tri_inv_lower``,
~12% extra FLOPs, all MXU).  Everything else — the panel solves and the
trailing updates, i.e. ~all of the N^3/3 FLOPs — is batched
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
import os

import jax
import jax.numpy as jnp
from jax import lax

_BASE = 32  # leaf size for the expander-based solves
_UNROLL = 8  # scalar-unrolled tile size (ops on dense [batch] vectors)


def _split(n, base=_UNROLL):
    """Split point: smallest multiple of the unrolled tile size >= n/2
    (so the second half is never larger than the first, both are
    nonempty, and the recursion bottoms out exactly on [<=8,<=8]
    leaves)."""
    h = _UNROLL * ((n + 2 * _UNROLL - 1) // (2 * _UNROLL))
    return min(h, n - 1) if h >= n else h


def _mm(a, b, precision):
    return jnp.matmul(a, b, precision=precision)


def _mT(a):
    return jnp.swapaxes(a, -1, -2)




def _chol_unrolled(a):
    """Cholesky of ``a`` [..., m, m] for m <= _UNROLL, fully unrolled at
    the scalar level: every op is on a dense [batch] vector, so nothing
    pays the [.., m] lane padding that makes the stock expander's masked
    column loop the bottleneck at these batch sizes."""
    if a.shape[-1] == 0:
        return a
    m = a.shape[-1]
    L = [[None] * m for _ in range(m)]
    for j in range(m):
        d = jnp.sqrt(
            a[..., j, j] - sum(L[j][k] * L[j][k] for k in range(j))
        )
        L[j][j] = d
        for i in range(j + 1, m):
            s = a[..., i, j] - sum(L[i][k] * L[j][k] for k in range(j))
            L[i][j] = s / d
    zero = jnp.zeros_like(a[..., 0, 0])
    rows = [
        jnp.stack(
            [L[i][j] if j <= i else zero for j in range(m)], axis=-1
        )
        for i in range(m)
    ]
    return jnp.stack(rows, axis=-2)


def _chol_inv_unrolled_T(a):
    """Joint (L, inv L) of ``a`` [..., m, m], m <= _UNROLL, with the
    scalar chain run in TRANSPOSED layout.

    The B-major layout pays a TPU relayout for every ``a[..., i, j]``
    gather and every result stack: a [B, m, m] array is tiled with the
    tiny m on the 128-wide lane axis (16x padding at m=8), so each of
    the ~136 chain ops shuffles sublanes/lanes.  One transpose in and
    one per output move the batch onto lanes ([m, m, B]); every scalar
    of the chain is then a dense [B] lane row, and the chip A/B measures
    the pair ~1.6x faster including the transposes (BASELINE.md r3)."""
    m = a.shape[-1]
    bshape = a.shape[:-2]
    # [..., m, m] -> [m, m, ...flat batch]
    aT = jnp.reshape(
        jnp.moveaxis(a, (-2, -1), (0, 1)), (m, m, -1)
    )
    L = [[None] * m for _ in range(m)]
    for j in range(m):
        d = jnp.sqrt(
            aT[j, j] - sum(L[j][k] * L[j][k] for k in range(j))
        )
        L[j][j] = d
        for i in range(j + 1, m):
            s = aT[i, j] - sum(L[i][k] * L[j][k] for k in range(j))
            L[i][j] = s / d
    inv_d = [1.0 / L[i][i] for i in range(m)]
    M = [[None] * m for _ in range(m)]
    for j in range(m):
        for i in range(j, m):
            if i == j:
                M[i][j] = inv_d[i]
            else:
                s = sum(L[i][k] * M[k][j] for k in range(j, i))
                M[i][j] = -s * inv_d[i]
    zero = jnp.zeros_like(aT[0, 0])

    def _back(T):
        flat = jnp.stack(
            [
                jnp.stack(
                    [T[i][j] if j <= i else zero for j in range(m)]
                )
                for i in range(m)
            ]
        )  # [m, m, B]
        return jnp.reshape(
            jnp.moveaxis(flat, (0, 1), (-2, -1)), bshape + (m, m)
        )

    return _back(L), _back(M)


def _tri_inv_unrolled(l):
    """Inverse of lower-triangular ``l`` [..., m, m] for m <= _UNROLL,
    scalar-unrolled forward substitution (same layout rationale as
    :func:`_chol_unrolled`)."""
    m = l.shape[-1]
    inv_d = [1.0 / l[..., i, i] for i in range(m)]
    M = [[None] * m for _ in range(m)]
    for j in range(m):
        for i in range(j, m):
            if i == j:
                M[i][j] = inv_d[i]
            else:
                s = sum(
                    l[..., i, k] * M[k][j] for k in range(j, i)
                )
                M[i][j] = -s * inv_d[i]
    zero = jnp.zeros_like(l[..., 0, 0])
    rows = [
        jnp.stack(
            [M[i][j] if j <= i else zero for j in range(m)], axis=-1
        )
        for i in range(m)
    ]
    return jnp.stack(rows, axis=-2)


def tri_inv_lower(l, base=_UNROLL, precision=lax.Precision.HIGHEST):
    """Inverse of a batched lower-triangular ``l`` [..., N, N]:
    ``inv([[A,0],[B,C]]) = [[iA,0],[-iC B iA, iC]]`` — the off-diagonal
    blocks are batched GEMMs, the [<=8,<=8] leaves scalar-unrolled."""
    n = l.shape[-1]
    if n <= _UNROLL:
        return _tri_inv_unrolled(l)
    h = _split(n, base)
    i11 = tri_inv_lower(l[..., :h, :h], base, precision)
    i22 = tri_inv_lower(l[..., h:, h:], base, precision)
    i21 = -_mm(_mm(i22, l[..., h:, :h], precision), i11, precision)
    top = jnp.concatenate(
        [i11, jnp.zeros(l.shape[:-2] + (h, n - h), l.dtype)], axis=-1
    )
    bot = jnp.concatenate([i21, i22], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _assemble(b11, b21, b22, shape, dtype):
    h, rest = b11.shape[-1], b22.shape[-1]
    top = jnp.concatenate(
        [b11, jnp.zeros(shape[:-2] + (h, rest), dtype)], axis=-1
    )
    return jnp.concatenate(
        [top, jnp.concatenate([b21, b22], axis=-1)], axis=-2
    )


def chol_inv_lower(a, precision=lax.Precision.HIGHEST):
    """Joint ``(L, inv(L))`` of a batched SPD ``a`` [..., N, N].

    One recursion computes both: the panel solve needs exactly the
    inverse of the leading factor (``L21 = A21 @ inv(L11)^T``), so
    factor and inverse share every leaf — nothing is inverted twice,
    and callers that drop the inverse pay nothing extra (XLA DCE prunes
    the unused top-level off-diagonal inverse blocks).  All panel work
    is batched GEMM; the [<=8,<=8] leaves are scalar-unrolled
    ([batch]-vector ops, no lane padding — the stock expander's
    lane-padded masked column loop is never touched)."""
    n = a.shape[-1]
    if n <= _UNROLL:
        return _chol_inv_unrolled_T(a)
    h = _split(n)
    l11, m11 = chol_inv_lower(a[..., :h, :h], precision)
    l21 = _mm(a[..., h:, :h], _mT(m11), precision)
    l22, m22 = chol_inv_lower(
        a[..., h:, h:] - _mm(l21, _mT(l21), precision), precision
    )
    m21 = -_mm(m22, _mm(l21, m11, precision), precision)
    return (
        _assemble(l11, l21, l22, a.shape, a.dtype),
        _assemble(m11, m21, m22, a.shape, a.dtype),
    )


def blocked_cholesky(a, base=_BASE, precision=lax.Precision.HIGHEST):
    """Lower-Cholesky of a batched SPD matrix ``a`` [..., N, N] — routed
    to the v3 iterative panel path (chip table, BASELINE.md r3; ``base``
    kept for API stability)."""
    return panel_cholesky(a, precision=precision)


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


# ---------------------------------------------------------------------------
# v3: ITERATIVE panel factorization (round-3 MXU push).
#
# The recursive chol_inv_lower pays two costs the flops meter never sees:
# (1) it materializes the FULL inverse factor (the top-level
#     m21 = -m22 @ (l21 @ m11) is another ~N^3/3 of GEMM work the quad
#     path then uses only as a GEMV), and
# (2) every recursion level reassembles [B, N, N] blocks with
#     concatenates (log2(N/8) full-matrix copies of HBM traffic).
#
# The panel formulation is the classic right-looking blocked algorithm:
# fixed panel width P, per panel one small recursive chol_inv on the
# [P, P] diagonal tile, one [B, rest, P] panel-solve GEMM against
# inv(Lkk), and one rank-P trailing update GEMM — which is where ~all of
# the N^3/3 FLOPs land, in MXU-shaped [B, m, P] @ [B, P, m] products.
# Nothing is assembled unless the caller wants L itself (one concat at
# the end), and the MVN quad/logdet path never assembles at all: the
# solve forward-substitutes panel by panel reusing the [P, P] inverses.
# ---------------------------------------------------------------------------

_PANEL = 64


def _tile_kernel_active():
    """Whether the Pallas batch-on-lanes tile kernel may be used: a
    PHYSICAL TPU (Mosaic only compiles there — jax.default_backend() is
    monkeypatched by tests to force the blocked path's numerics on CPU)
    and no ``PYPROB_TPU_TILE_KERNEL=0`` opt-out."""
    try:
        platform = jax.devices()[0].platform
    except Exception:
        platform = "cpu"
    return (
        platform == "tpu"
        and os.environ.get("PYPROB_TPU_TILE_KERNEL", "1") != "0"
    )


def _tile_chol_inv(tile, precision):
    """Joint (L, inv L) of a [..., P, P] diagonal tile.  On TPU at P=64
    the batch-on-lanes Pallas kernel (ops/tile_chol.py) replaces the
    recursive scalar-leaf path — the measured ~53 ms per-op-latency
    floor of the N=256 factorization (BASELINE.md r3/r4);
    ``PYPROB_TPU_TILE_KERNEL=0`` opts out."""
    if tile.shape[-1] == 64 and _tile_kernel_active():
        from .tile_chol import chol_inv_tile

        return chol_inv_tile(tile)
    return chol_inv_lower(tile, precision)


def chol_panels(a, panel=_PANEL, precision=lax.Precision.HIGHEST):
    """Panel factorization of batched SPD ``a`` [..., N, N].

    Returns ``(strips, minvs)``: ``strips[k]`` holds columns
    ``[k*P, (k+1)*P)`` of L from the diagonal down
    ([..., N - k*P, <=P]), ``minvs[k]`` the inverse of the [<=P, <=P]
    diagonal tile (reused by the panel solves and by
    :func:`solve_lower_vec_panels`)."""
    n = a.shape[-1]
    S = a
    strips, minvs = [], []
    for k0 in range(0, n, panel):
        p = min(panel, n - k0)
        lkk, mkk = _tile_chol_inv(S[..., :p, :p], precision)
        if S.shape[-1] > p:
            l21 = _mm(S[..., p:, :p], _mT(mkk), precision)
            S = S[..., p:, p:] - _mm(l21, _mT(l21), precision)
            strips.append(jnp.concatenate([lkk, l21], axis=-2))
        else:
            strips.append(lkk)
        minvs.append(mkk)
    return strips, minvs


def assemble_panels(strips, shape, dtype, panel=_PANEL):
    """Stitch panel strips into the full lower-triangular L [..., N, N]
    (the only full-matrix assembly in the v3 path)."""
    n = shape[-1]
    cols = []
    k0 = 0
    for strip in strips:
        if k0:
            pad = jnp.zeros(shape[:-2] + (k0, strip.shape[-1]), dtype)
            strip = jnp.concatenate([pad, strip], axis=-2)
        cols.append(strip)
        k0 += strip.shape[-1]
    return jnp.concatenate(cols, axis=-1)


def _panel_for(n):
    """Measured-best panel width per event size.  With the Pallas tile
    kernel (TPU, P=64 tiles) the P=64 panels win at EVERY measured N
    (chip table r4: N=512x2048 in-program 1,439 vs 1,264 GFLOP/s-meter
    against P=128; N=256x8192 1,039); without it (CPU numerics or the
    PYPROB_TPU_TILE_KERNEL=0 opt-out) P=128's fewer scalar-leaf diagonal
    tiles win at N>=512 (chip table r3)."""
    if _tile_kernel_active():
        return _PANEL
    return 128 if n >= 512 else _PANEL


def panel_cholesky(a, panel=None, precision=lax.Precision.HIGHEST):
    """Lower-Cholesky via the iterative panel path (v3)."""
    if panel is None:
        panel = _panel_for(a.shape[-1])
    strips, _ = chol_panels(a, panel, precision)
    return assemble_panels(strips, a.shape, a.dtype, panel)


def solve_lower_vec_panels(strips, minvs, b,
                           precision=lax.Precision.HIGHEST):
    """Solve ``L z = b`` (single rhs [..., N]) from panel strips: per
    panel one [P, P] GEMV against the stored inverse + one rank-P
    residual update — no triangular-solve expander anywhere."""
    zs = []
    r = b
    for strip, mkk in zip(strips, minvs):
        p = mkk.shape[-1]
        zk = _mm(mkk, r[..., :p, None], precision)[..., 0]
        zs.append(zk)
        if r.shape[-1] > p:
            r = (
                r[..., p:]
                - _mm(strip[..., p:, :], zk[..., None], precision)[..., 0]
            )
        else:
            r = r[..., :0]
    return jnp.concatenate(zs, axis=-1)


@functools.partial(jax.jit, static_argnames=("panel",))
def mvn_quad_logdet_panels(cov, diff, panel=None):
    """Batched ``(quad, half_logdet)`` via the v3 panel path: the
    factorization's trailing updates carry ~all the FLOPs as rank-P MXU
    GEMMs, the solve reuses the per-panel diagonal inverses, and L is
    never assembled."""
    if panel is None:
        panel = _panel_for(cov.shape[-1])
    strips, minvs = chol_panels(cov, panel)
    z = solve_lower_vec_panels(strips, minvs, diff)
    quad = jnp.sum(z * z, axis=-1)
    half_logdet = sum(
        jnp.sum(
            jnp.log(
                jnp.diagonal(
                    s[..., : m.shape[-1], :], axis1=-2, axis2=-1
                )
            ),
            axis=-1,
        )
        for s, m in zip(strips, minvs)
    )
    return quad, half_logdet


@functools.partial(jax.jit, static_argnames=("base",))
def mvn_quad_logdet_blocked(cov, diff, base=_BASE):
    """Batched ``(quad, half_logdet)`` = ``(diff^T K^-1 diff,
    0.5 log|K|)`` — same contract as ops.mvn_logpdf.mvn_quad_logdet,
    stock-XLA-composable.  Routed to the v3 panel path (chip study in
    BASELINE.md r3); ``base`` kept for API stability."""
    return mvn_quad_logdet_panels(cov, diff)
