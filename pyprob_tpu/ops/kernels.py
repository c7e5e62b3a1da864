"""Pallas TPU kernels for the hot distribution math.

The per-site score that dominates both IC training and guided IS is the
mixture log-pdf: for every particle, K component log-densities followed by
a logsumexp (reference computes this with per-component torch ops,
reference: pyprob/distributions/mixture.py:39-45).  XLA already fuses the
jnp version well; these kernels keep the whole [B, K] tile resident in
VMEM and fuse normalization + masking + logsumexp into one VPU pass with
no intermediate HBM traffic, following /opt/skills/guides/pallas_guide.md
(grid/block specs, (8,128) f32 tiling, VMEM memory space).

All kernels have jnp reference implementations; the Pallas path is used on
TPU backends and falls back to jnp elsewhere (``set_use_pallas`` to force).
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp

_LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)

_use_pallas = None  # None = auto (TPU only)


def set_use_pallas(value):
    """True/False to force, None for auto (Pallas on TPU backends only)."""
    global _use_pallas
    _use_pallas = value


def use_pallas():
    if _use_pallas is not None:
        return _use_pallas
    try:
        return jax.default_backend() in ("tpu",)
    except Exception:
        return False


def _round_up(x, m):
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# mixture-of-normals log_prob: x [B], means/stddevs/logits [B, K] -> [B]
# ---------------------------------------------------------------------------


def _mixture_normal_ref(x, means, stddevs, logits):
    z = (x[:, None] - means) / stddevs
    comp = -0.5 * z * z - jnp.log(stddevs) - _LOG_SQRT_2PI
    return jax.scipy.special.logsumexp(comp + logits, axis=-1)


def _mixture_normal_kernel(x_ref, means_ref, stddevs_ref, logits_ref, out_ref):
    x = x_ref[:]  # [TB, 1]
    means = means_ref[:]  # [TB, K]
    stddevs = stddevs_ref[:]
    logits = logits_ref[:]
    z = (x - means) / stddevs
    comp = -0.5 * z * z - jnp.log(stddevs) - _LOG_SQRT_2PI + logits
    m = jnp.max(comp, axis=1, keepdims=True)
    out = m + jnp.log(jnp.sum(jnp.exp(comp - m), axis=1, keepdims=True))
    out_ref[:] = out


def mixture_normal_log_prob(x, means, stddevs, logits, block_b=512):
    """Fused mixture-of-normals log-pdf.  x: [B]; params: [B, K]."""
    if not use_pallas():
        return _mixture_normal_ref(x, means, stddevs, logits)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, K = means.shape
    Bp = _round_up(B, block_b)
    Kp = _round_up(K, 128)
    xp = jnp.zeros((Bp, 1), jnp.float32).at[:B, 0].set(x.astype(jnp.float32))
    pad2 = lambda a, fill: (
        jnp.full((Bp, Kp), fill, jnp.float32).at[:B, :K].set(
            a.astype(jnp.float32)
        )
    )
    means_p = pad2(means, 0.0)
    stddevs_p = pad2(stddevs, 1.0)
    logits_p = pad2(logits, -1e30)  # padded components never win the lse

    grid = (Bp // block_b,)
    out = pl.pallas_call(
        _mixture_normal_kernel,
        out_shape=jax.ShapeDtypeStruct((Bp, 1), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, Kp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, Kp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, Kp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_b, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    )(xp, means_p, stddevs_p, logits_p)
    return out[:B, 0]


# ---------------------------------------------------------------------------
# mixture-of-truncated-normals log_prob (the Uniform/Poisson proposal heads)
# x [B], means/stddevs/logits [B, K], low/high [B] -> [B]
# ---------------------------------------------------------------------------


def _ndtr(z):
    return 0.5 * (1.0 + jax.lax.erf(z / math.sqrt(2.0)))


def _erf_poly(x):
    """Abramowitz & Stegun 7.1.26 rational erf approximation (|err| < 1.5e-7,
    at f32 resolution): Pallas TPU has no lowering for the ``erf`` primitive
    (jax 0.9.0 raises NotImplementedError inside kernels), so the kernel
    computes it from exp, which does lower."""
    a1, a2, a3, a4, a5 = (
        0.254829592,
        -0.284496736,
        1.421413741,
        -1.453152027,
        1.061405429,
    )
    p = 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _ndtr_kernel(z):
    return 0.5 * (1.0 + _erf_poly(z / math.sqrt(2.0)))


def _mixture_tnorm_ref(x, means, stddevs, logits, low, high):
    alpha = (low[:, None] - means) / stddevs
    beta = (high[:, None] - means) / stddevs
    znorm = jnp.clip(_ndtr(beta) - _ndtr(alpha), 1e-12, None)
    xi = (x[:, None] - means) / stddevs
    comp = (
        -0.5 * xi * xi
        - _LOG_SQRT_2PI
        - jnp.log(stddevs)
        - jnp.log(znorm)
        + logits
    )
    lse = jax.scipy.special.logsumexp(comp, axis=-1)
    inside = (x >= low) & (x <= high)
    return jnp.where(inside, lse, -jnp.inf)


def _mixture_tnorm_kernel(
    x_ref, means_ref, stddevs_ref, logits_ref, low_ref, high_ref, out_ref
):
    x = x_ref[:]
    means = means_ref[:]
    stddevs = stddevs_ref[:]
    logits = logits_ref[:]
    low = low_ref[:]
    high = high_ref[:]
    alpha = (low - means) / stddevs
    beta = (high - means) / stddevs
    zn = jnp.clip(_ndtr_kernel(beta) - _ndtr_kernel(alpha), 1e-12, None)
    xi = (x - means) / stddevs
    comp = (
        -0.5 * xi * xi - _LOG_SQRT_2PI - jnp.log(stddevs) - jnp.log(zn) + logits
    )
    m = jnp.max(comp, axis=1, keepdims=True)
    lse = m + jnp.log(jnp.sum(jnp.exp(comp - m), axis=1, keepdims=True))
    inside = (x[:, 0:1] >= low[:, 0:1]) & (x[:, 0:1] <= high[:, 0:1])
    out_ref[:] = jnp.where(inside, lse, -jnp.inf)


def mixture_truncated_normal_log_prob(
    x, means, stddevs, logits, low, high, block_b=512
):
    if not use_pallas():
        return _mixture_tnorm_ref(x, means, stddevs, logits, low, high)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, K = means.shape
    Bp = _round_up(B, block_b)
    Kp = _round_up(K, 128)

    def pad2(a, fill):
        return jnp.full((Bp, Kp), fill, jnp.float32).at[:B, :K].set(
            a.astype(jnp.float32)
        )

    xp = jnp.zeros((Bp, 1), jnp.float32).at[:B, 0].set(x.astype(jnp.float32))
    lowp = (
        jnp.full((Bp, Kp), -1e30, jnp.float32)
        .at[:B, :]
        .set(jnp.broadcast_to(low[:, None].astype(jnp.float32), (B, Kp)))
    )
    highp = (
        jnp.full((Bp, Kp), 1e30, jnp.float32)
        .at[:B, :]
        .set(jnp.broadcast_to(high[:, None].astype(jnp.float32), (B, Kp)))
    )
    means_p = pad2(means, 0.0)
    stddevs_p = pad2(stddevs, 1.0)
    logits_p = pad2(logits, -1e30)

    grid = (Bp // block_b,)
    spec = lambda k: pl.BlockSpec(
        (block_b, k), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _mixture_tnorm_kernel,
        out_shape=jax.ShapeDtypeStruct((Bp, 1), jnp.float32),
        grid=grid,
        in_specs=[
            spec(1),
            spec(Kp),
            spec(Kp),
            spec(Kp),
            spec(Kp),
            spec(Kp),
        ],
        out_specs=spec(1),
    )(xp, means_p, stddevs_p, logits_p, lowp, highp)
    return out[:B, 0]


# custom VJPs: Pallas forward, analytic backward through the jnp reference
# (pattern per pallas_guide.md "Patterns: Custom VJP") — so the fused
# kernels are safe inside differentiated losses.


@jax.custom_vjp
def mixture_normal_log_prob_fused(x, means, stddevs, logits):
    return mixture_normal_log_prob(x, means, stddevs, logits)


def _mn_fwd(x, means, stddevs, logits):
    return mixture_normal_log_prob(x, means, stddevs, logits), (
        x,
        means,
        stddevs,
        logits,
    )


def _mn_bwd(res, g):
    _, vjp = jax.vjp(_mixture_normal_ref, *res)
    return vjp(g)


mixture_normal_log_prob_fused.defvjp(_mn_fwd, _mn_bwd)


@jax.custom_vjp
def mixture_truncated_normal_log_prob_fused(x, means, stddevs, logits, low, high):
    return mixture_truncated_normal_log_prob(x, means, stddevs, logits, low, high)


def _mt_fwd(x, means, stddevs, logits, low, high):
    return (
        mixture_truncated_normal_log_prob(x, means, stddevs, logits, low, high),
        (x, means, stddevs, logits, low, high),
    )


def _mt_bwd(res, g):
    g = jnp.where(jnp.isfinite(g), g, 0.0)
    _, vjp = jax.vjp(_mixture_tnorm_ref, *res)
    outs = vjp(g)
    return tuple(jnp.where(jnp.isfinite(o), o, 0.0) for o in outs)


mixture_truncated_normal_log_prob_fused.defvjp(_mt_fwd, _mt_bwd)


# ---------------------------------------------------------------------------
# fused log-weight statistics: one pass producing (max, sumexp, sumexp2)
# over [N] log weights — normalization + ESS from a single HBM read
# ---------------------------------------------------------------------------


def _log_weight_stats_ref(log_weights):
    lw = jnp.ravel(log_weights)
    m = jnp.max(lw)
    s1 = jnp.sum(jnp.exp(lw - m))
    s2 = jnp.sum(jnp.exp(2.0 * (lw - m)))
    return m, s1, s2


def _lw_stats_kernel(lw_ref, m_ref, s1_ref, s2_ref):
    i = 0  # single grid point; the whole vector tile is in VMEM
    lw = lw_ref[:]
    m = jnp.max(lw)
    e = jnp.exp(lw - m)
    m_ref[0, 0] = m
    s1_ref[0, 0] = jnp.sum(e)
    s2_ref[0, 0] = jnp.sum(e * e)


def log_weight_stats(log_weights, vmem_limit=1 << 22):
    """(max, sum exp(lw-max), sum exp(2(lw-max))) in one fused pass.

    ESS = s1^2 / s2; log normalizer = max + log s1."""
    if not use_pallas():
        return _log_weight_stats_ref(log_weights)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    lw = jnp.ravel(log_weights).astype(jnp.float32)
    n = lw.shape[0]
    npad = _round_up(max(n, 1024), 1024)
    if npad * 4 > vmem_limit:
        return _log_weight_stats_ref(log_weights)
    lwp = jnp.full((npad // 128, 128), -jnp.inf, jnp.float32)
    lwp = lwp.reshape(-1).at[:n].set(lw).reshape(npad // 128, 128)
    m, s1, s2 = pl.pallas_call(
        _lw_stats_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
    )(lwp)
    return m[0, 0], s1[0, 0], s2[0, 0]
