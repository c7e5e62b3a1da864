"""Fused multivariate-normal log-density Pallas kernel.

``MultivariateNormal(loc, covariance_matrix=K).log_prob(y)`` is the hot
op of the GP model family: per particle one [N,N] covariance must be
factorized and solved.  The XLA path materializes the Cholesky factor
L[B,N,N] in HBM (8 GB at 32k particles x N=256 — the round-1 OOM) and
its blocked expander streams the tile through HBM on every panel step
(measured 82-280 GFLOP/s, BASELINE.md).

This kernel keeps EVERYTHING in VMEM: each grid cell loads one
particle's K tile once, runs a 128-wide panel-blocked in-place Cholesky
(left-looking GEMM updates on the MXU, masked column recurrences on the
VPU), forward-substitutes the residual, accumulates the log-determinant,
and writes back TWO SCALARS (quadratic form, logdet).  HBM traffic per
particle is one [N,N] read — L never exists in HBM, so the 32k x 256
case needs 8 GB total instead of 16+.

Autodiff: a custom VJP recomputes the factor with stock XLA ops on the
backward pass (gradient engines price one slow backward; the
forward/IS hot loop gets the kernel).

Use via :func:`mvn_quad_logdet` (generic) — wired into
``MultivariateNormal.log_prob`` for TPU covariance-parameterized sites.
pallas guide: /opt/skills/guides/pallas_guide.md.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

_BLOCK = 128


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def _chol_solve_kernel(cov_ref, diff_ref, out_ref, l_ref, z_ref, *, n):
    """One particle: cov [N,N], diff [1,N] -> out [1,2] = (z^T z, logdet).

    Panel-blocked left-looking Cholesky, all in VMEM; ``n`` static.  The
    per-column recurrences are mask-based (no dynamic lane indexing —
    TPU lane-dim dynamic slices don't lower)."""
    nb = n // _BLOCK
    quad = jnp.zeros((), jnp.float32)
    logdet = jnp.zeros((), jnp.float32)
    # Mosaic note: every intermediate stays 2-D (1-D vectors hit layout
    # relayout errors); per-column extractions are one-hot contractions,
    # which also land on the MXU.
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _BLOCK), 1)

    def _contract(a, b):
        # a [p, K] . b [q, K] -> [p, q]
        return jax.lax.dot_general(
            a,
            b,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    for j in range(nb):
        lo = j * _BLOCK
        rows = n - lo
        # left-looking panel update (MXU): P = K[lo:, lo:lo+b]
        #                                     - L[lo:, :lo] @ L[lo:lo+b, :lo]^T
        panel = cov_ref[lo:, lo : lo + _BLOCK]
        if j > 0:
            panel = panel - _contract(
                l_ref[lo:, 0:lo], l_ref[lo : lo + _BLOCK, 0:lo]
            )
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, _BLOCK), 0)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, _BLOCK), 1)
        rows_iota = jax.lax.broadcasted_iota(jnp.int32, (1, rows), 1)

        # column recurrence: after step k, columns < k of ``panel`` hold
        # L values, columns >= k still hold the updated K
        def col_step(k, p):
            onehot = jnp.where(lane == k, 1.0, 0.0)  # [1, b]
            rowk = jax.lax.dot_general(
                onehot,
                p[:_BLOCK],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [1, b] = L[k, :] so far
            w = jnp.where(lane < k, rowk, 0.0)
            colk = _contract(p, onehot)  # [rows, 1]
            c = colk - _contract(p, w)  # [rows, 1]
            onehot_rows = jnp.where(rows_iota == k, 1.0, 0.0)  # [1, rows]
            ck = jax.lax.dot_general(
                onehot_rows,
                c,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [1, 1]
            d = jax.lax.rsqrt(ck)
            newcol = jnp.where(row_ids[:, 0:1] >= k, c * d, 0.0)
            return jnp.where(col_ids == k, newcol, p)

        panel = jax.lax.fori_loop(0, _BLOCK, col_step, panel)
        l_ref[lo:, lo : lo + _BLOCK] = panel

        # fresh [b, b] iotas: slicing the [rows, b] int iotas trips a
        # Mosaic extract_strided_slice assert (bisected on chip)
        di = jax.lax.broadcasted_iota(jnp.int32, (_BLOCK, _BLOCK), 0)
        dj = jax.lax.broadcasted_iota(jnp.int32, (_BLOCK, _BLOCK), 1)
        logdet = logdet + jnp.sum(
            jnp.where(di == dj, jnp.log(panel[:_BLOCK]), 0.0)
        )

        # fused forward substitution: solve L_jj z_j = r_j, then fold
        # L_{>j,j} z_j out of the remaining rhs
        r = z_ref[0:1, lo : lo + _BLOCK]  # [1, b]
        ljj = panel[:_BLOCK]

        def sub_step(k, z):
            onehot = jnp.where(lane == k, 1.0, 0.0)
            lrow = jax.lax.dot_general(
                onehot,
                ljj,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [1, b]
            acc = jnp.sum(
                jnp.where(lane < k, lrow * z, 0.0), axis=1, keepdims=True
            )
            rk = jnp.sum(
                jnp.where(lane == k, r, 0.0), axis=1, keepdims=True
            )
            lkk = jnp.sum(
                jnp.where(lane == k, lrow, 0.0), axis=1, keepdims=True
            )
            zk = (rk - acc) / lkk  # [1, 1]
            return jnp.where(lane == k, zk, z)

        z_j = jax.lax.fori_loop(
            0, _BLOCK, sub_step, jnp.zeros((1, _BLOCK), jnp.float32)
        )
        quad = quad + jnp.sum(z_j * z_j)
        if j + 1 < nb:
            upd = _contract(z_j, panel[_BLOCK:, :])  # [1, rows - b]
            z_ref[0:1, lo + _BLOCK :] = z_ref[0:1, lo + _BLOCK :] - upd

    out_ref[0, 0] = quad
    out_ref[0, 1] = logdet


def _chol_solve_stacked_kernel(cov_ref, diff_ref, out_ref, l_ref, z_ref,
                               *, n, p):
    """P particles per grid cell: cov [P,N,N], diff [P,N] ->
    out [P,2] = (z^T z, logdet).  The stacked variant amortizes the
    factorization's sequential chain (2x128 dependent column steps)
    across the in-cell particles — the single-particle kernel measured
    latency-bound at 33 GFLOP/s (BASELINE.md round-2 GP study)."""
    # every intermediate stays >= 2-D ([P, 1] for per-particle scalars):
    # Mosaic rejects 1-D vector layouts (bisected on chip, BASELINE.md)
    nb = n // _BLOCK
    quad = jnp.zeros((p, 1), jnp.float32)
    logdet = jnp.zeros((p, 1), jnp.float32)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (1, _BLOCK), 1)
    z_ref[:] = diff_ref[:]

    for j in range(nb):
        lo = j * _BLOCK
        rows = n - lo
        panel = cov_ref[:, lo:, lo : lo + _BLOCK]  # [P, rows, b]
        if j > 0:
            panel = panel - jax.lax.dot_general(
                l_ref[:, lo:, 0:lo],
                l_ref[:, lo : lo + _BLOCK, 0:lo],
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        row_ids = jax.lax.broadcasted_iota(
            jnp.int32, (p, rows, _BLOCK), 1
        )
        col_ids = jax.lax.broadcasted_iota(
            jnp.int32, (p, rows, _BLOCK), 2
        )

        def col_step(k, pm):
            rowk = jnp.sum(
                jnp.where(row_ids[:, :_BLOCK] == k, pm[:, :_BLOCK], 0.0),
                axis=1,
            )  # [P, b] = each particle's L[k, :] so far
            w = jnp.where(lane2 < k, rowk, 0.0)
            colk = jnp.sum(jnp.where(col_ids == k, pm, 0.0), axis=2)
            c = colk - jnp.sum(pm * w[:, None, :], axis=2)  # [P, rows]
            ck = jnp.sum(
                jnp.where(row_ids[:, :, 0] == k, c, 0.0),
                axis=1,
                keepdims=True,
            )  # [P, 1]
            d = jax.lax.rsqrt(ck)
            newcol = jnp.where(row_ids[:, :, 0] >= k, c * d, 0.0)
            return jnp.where(col_ids == k, newcol[:, :, None], pm)

        panel = jax.lax.fori_loop(0, _BLOCK, col_step, panel)
        l_ref[:, lo:, lo : lo + _BLOCK] = panel

        di = jax.lax.broadcasted_iota(jnp.int32, (p, _BLOCK, _BLOCK), 1)
        dj = jax.lax.broadcasted_iota(jnp.int32, (p, _BLOCK, _BLOCK), 2)
        logdet = logdet + jnp.sum(
            jnp.sum(
                jnp.where(di == dj, jnp.log(panel[:, :_BLOCK]), 0.0),
                axis=2,
            ),
            axis=1,
            keepdims=True,
        )

        r = z_ref[:, lo : lo + _BLOCK]  # [P, b]
        ljj = panel[:, :_BLOCK]

        def sub_step(k, z):
            lrow = jnp.sum(
                jnp.where(di[:, :, 0:1] == k, ljj, 0.0), axis=1
            )  # [P, b]
            acc = jnp.sum(
                jnp.where(lane2 < k, lrow * z, 0.0), axis=1, keepdims=True
            )
            rk = jnp.sum(
                jnp.where(lane2 == k, r, 0.0), axis=1, keepdims=True
            )
            lkk = jnp.sum(
                jnp.where(lane2 == k, lrow, 0.0), axis=1, keepdims=True
            )
            zk = (rk - acc) / lkk  # [P, 1]
            return jnp.where(lane2 == k, zk, z)

        z_j = jax.lax.fori_loop(
            0, _BLOCK, sub_step, jnp.zeros((p, _BLOCK), jnp.float32)
        )
        quad = quad + jnp.sum(z_j * z_j, axis=1, keepdims=True)
        if j + 1 < nb:
            upd = jax.lax.dot_general(
                panel[:, _BLOCK:, :],
                z_j[:, None, :],
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )[:, :, 0]  # [P, rows - b]
            z_ref[:, lo + _BLOCK :] = z_ref[:, lo + _BLOCK :] - upd

    out_ref[:, 0:1] = quad
    out_ref[:, 1:2] = logdet


@functools.partial(
    jax.jit, static_argnames=("interpret", "particles_per_cell")
)
def _quad_logdet_stacked(cov, diff, interpret=False, particles_per_cell=8):
    """cov [B,N,N] (N a multiple of 128, B a multiple of P), diff [B,N]
    -> (quad [B], logdet [B]) with P particles per grid cell."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n = cov.shape[0], cov.shape[-1]
    p = particles_per_cell

    def kernel(cov_ref, diff_ref, out_ref, l_ref, z_ref):
        _chol_solve_stacked_kernel(
            cov_ref, diff_ref, out_ref, l_ref, z_ref, n=n, p=p
        )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, 2), jnp.float32),
        grid=(b // p,),
        in_specs=[
            pl.BlockSpec(
                (p, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (p, n), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (p, 2), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((p, n, n), jnp.float32),
            pltpu.VMEM((p, n), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=b * n * n * n // 3,
            bytes_accessed=4 * b * n * n,
            transcendentals=b * n,
        ),
    )(cov.astype(jnp.float32), diff.astype(jnp.float32))
    return out[:, 0], out[:, 1]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _quad_logdet_single(cov, diff, interpret=False):
    """cov [N,N] (N a multiple of 128), diff [N] -> (quad, logdet)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = cov.shape[-1]

    def kernel(cov_ref, diff_ref, out_ref, l_ref, z_ref):
        z_ref[:] = diff_ref[:]
        _chol_solve_kernel(cov_ref, diff_ref, out_ref, l_ref, z_ref, n=n)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 2), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((n, n), jnp.float32),
            pltpu.VMEM((1, n), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=n * n * n // 3,
            bytes_accessed=4 * n * n,
            transcendentals=n,
        ),
    )(cov.astype(jnp.float32), diff.astype(jnp.float32).reshape(1, n))
    return out[0, 0], out[0, 1]


def _pad_cov_diff(cov, diff):
    """Pad event dim to a multiple of 128 with an identity block: the
    padding contributes 0 to both the quadratic form and the logdet."""
    n = cov.shape[-1]
    m = _round_up(n, _BLOCK)
    if m == n:
        return cov, diff
    pad = m - n
    eye_pad = jnp.eye(m, dtype=cov.dtype)[n:, :]
    cov = jnp.concatenate(
        [
            jnp.concatenate(
                [cov, jnp.zeros(cov.shape[:-1] + (pad,), cov.dtype)],
                axis=-1,
            ),
            jnp.broadcast_to(eye_pad, cov.shape[:-2] + (pad, m)),
        ],
        axis=-2,
    )
    diff = jnp.concatenate(
        [diff, jnp.zeros(diff.shape[:-1] + (pad,), diff.dtype)], axis=-1
    )
    return cov, diff


_STACK_P = 16  # particles per grid cell (measured best on chip: P=16/32
# plateau ~110 GFLOP/s vs 33 single-particle; VMEM-bound above)


def _quad_logdet_impl(cov, diff, interpret):
    cov, diff = _pad_cov_diff(cov, diff)
    batch = cov.shape[:-2]
    if batch:
        # explicit batch: the particle-stacked kernel amortizes the
        # factorization's sequential chain across in-cell particles
        n = cov.shape[-1]
        b = int(np.prod(batch))
        covf = jnp.reshape(cov, (b, n, n))
        difff = jnp.reshape(diff, (b, n))
        bp = _round_up(b, _STACK_P)
        if bp != b:
            covf = jnp.concatenate(
                [covf, jnp.broadcast_to(covf[-1:], (bp - b, n, n))], 0
            )
            difff = jnp.concatenate(
                [difff, jnp.broadcast_to(difff[-1:], (bp - b, n))], 0
            )
        q, ld = _quad_logdet_stacked(
            covf, difff, interpret=interpret,
            particles_per_cell=min(_STACK_P, bp),
        )
        return (
            jnp.reshape(q[:b], batch),
            jnp.reshape(ld[:b], batch),
        )
    return _quad_logdet_single(cov, diff, interpret=interpret)


def _quad_logdet_reference(cov, diff):
    """Stock-XLA reference (also the custom-VJP backward's recompute)."""
    chol = jnp.linalg.cholesky(cov)
    z = jax.scipy.linalg.solve_triangular(chol, diff[..., None], lower=True)[
        ..., 0
    ]
    quad = jnp.sum(z * z, axis=-1)
    logdet = jnp.sum(
        jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1
    )
    return quad, logdet


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def mvn_quad_logdet(cov, diff, interpret=False):
    """Batched ``(quad, half_logdet)`` via the fused VMEM kernel:
    ``quad = diff^T K^-1 diff`` and ``half_logdet = 0.5 log|K|``
    (= sum log diag chol K).  The MVN log-density is then
    ``-0.5 quad - half_logdet - 0.5 N log(2 pi)`` with the TRUE event
    size N (padding is identity-extended and contributes zero)."""
    return _quad_logdet_impl(cov, diff, interpret)


def _fwd(cov, diff, interpret):
    out = _quad_logdet_impl(cov, diff, interpret)
    return out, (cov, diff)


def _bwd(interpret, res, cots):
    # backward recomputes with stock XLA ops: alpha = K^-1 diff;
    # d quad/d K = -alpha alpha^T, d quad/d diff = 2 alpha,
    # d half_logdet/d K = 0.5 K^-1  (half_logdet = 0.5 log|K|)
    cov, diff = res
    g_quad, g_logdet = cots
    chol = jnp.linalg.cholesky(cov)
    alpha = jax.scipy.linalg.cho_solve((chol, True), diff[..., None])[..., 0]
    n = cov.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=cov.dtype), cov.shape)
    kinv = jax.scipy.linalg.cho_solve((chol, True), eye)
    g_quad_e = g_quad[..., None, None]
    g_ld_e = g_logdet[..., None, None]
    d_cov = (
        -g_quad_e * alpha[..., :, None] * alpha[..., None, :]
        + 0.5 * g_ld_e * kinv
    )
    d_diff = 2.0 * g_quad[..., None] * alpha
    return d_cov, d_diff


mvn_quad_logdet.defvjp(_fwd, _bwd)


def supported_backend():
    """The fused kernel runs compiled on TPU; everywhere else tests use
    interpret mode explicitly."""
    return jax.default_backend() == "tpu"
