"""Per-address proposal heads.

Counterparts of the reference's five active proposal modules
(reference: pyprob/nn/proposal_*.py), as pure functions over pytree params.
Each head maps the network feature vector x [B, H] plus the site's prior
parameters (packed as [B] arrays) to a proposal distribution:

* Normal      -> mixture of K Normals, means/stddevs residual-scaled by the
                 prior (reference: proposal_normal_normal_mixture.py:19-35)
* Uniform     -> mixture of K TruncatedNormals squashed into [low, high]
                 (reference: proposal_uniform_truncated_normal_mixture.py:18-37)
* Poisson     -> mixture of K TruncatedNormals on [0, 40]
                 (reference: proposal_poisson_truncated_normal_mixture.py:20-37)
* Categorical -> Categorical over the site's category count
* Bernoulli   -> Bernoulli

The head kind is chosen from the site's prior distribution type at
polymorph time, exactly as the reference does
(reference: inference_network_lstm.py:50-68).

Beyond parity (the reference raises "Distribution currently unsupported"
for everything else, inference_network_lstm.py:52): learned proposals for
positive-support priors (Gamma/Exponential/LogNormal/Weibull/Chi2/
HalfNormal/HalfCauchy -> LogNormal mixture residual-scaled by the prior's
exact log-space moments), heavy-tailed real-line priors (StudentT/Laplace/
Cauchy/Logistic/Gumbel -> StudentT mixture with learned per-component
df >= 0.5, so the head can match or exceed any such prior's tail
heaviness), Beta and VonMises (TruncatedNormal mixture over their
bounded support).

Event-shaped heads (values carry a trailing event dimension):

* MultivariateNormal -> full-covariance Gaussian: the net emits a
  residual mean (scaled through the PRIOR's Cholesky factor) and a
  lower-triangular factor M with positive diagonal; the proposal scale
  is ``L_prior @ M`` — zero net output means exactly the prior, and the
  learned factor is always a valid Cholesky.
* Dirichlet -> Dirichlet with multiplicative log-residual concentration
  (``alpha = alpha_prior * exp(raw)``): zero output is the prior, and
  the head can sharpen or flatten any corner of the simplex.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .. import util
from ..distributions import (
    Normal,
    Uniform,
    Categorical,
    Bernoulli,
    Beta,
    Poisson,
    TruncatedNormal,
    Mixture,
    Gamma,
    Exponential,
    LogNormal,
    Weibull,
    Chi2,
    HalfNormal,
    HalfCauchy,
    StudentT,
    Laplace,
    Cauchy,
    Logistic,
    Gumbel,
    VonMises,
    InverseGamma,
    Pareto,
    MultivariateNormal,
    Dirichlet,
    LKJCholesky,
    LKJCholeskyCPCNormal,
)
from .. import backend
from .layers import Static, mlp_init, mlp_apply

_EPSILON = 1e-6
_POISSON_LOW = 0.0
_POISSON_HIGH = 40.0
_EULER_GAMMA = 0.5772156649015329
_PI_OVER_SQRT6 = math.pi / math.sqrt(6.0)

_POSITIVE_LOGNORMAL_PRIORS = (
    Gamma,
    Exponential,
    LogNormal,
    Weibull,
    Chi2,
    HalfNormal,
    HalfCauchy,
    InverseGamma,
    Pareto,
)
_STUDENTT_PRIORS = (StudentT, Laplace, Cauchy, Logistic, Gumbel)


def head_kind_for(distribution):
    """Map a prior distribution to its proposal head kind; None if the
    distribution type has no learned proposal (falls back to the prior)."""
    if isinstance(distribution, Normal):
        return "normal_mixture"
    if isinstance(distribution, (Uniform, Beta, VonMises)):
        return "uniform_truncated_normal_mixture"
    if isinstance(distribution, Poisson):
        return "poisson_truncated_normal_mixture"
    if isinstance(distribution, Categorical):
        return "categorical"
    if isinstance(distribution, Bernoulli):
        return "bernoulli"
    if isinstance(distribution, _POSITIVE_LOGNORMAL_PRIORS):
        return "positive_lognormal_mixture"
    if isinstance(distribution, _STUDENTT_PRIORS):
        return "studentt_mixture"
    if isinstance(distribution, MultivariateNormal):
        return "mvn"
    if isinstance(distribution, Dirichlet):
        return "dirichlet"
    if isinstance(distribution, LKJCholesky):
        return "lkj_cpc_normal"
    return None


def event_dim_for(distribution):
    """Trailing event dimension an event-shaped head needs at init time
    (None for scalar heads)."""
    if isinstance(distribution, (MultivariateNormal, Dirichlet)):
        return int(distribution.event_shape[0])
    if isinstance(distribution, LKJCholesky):
        return int(distribution.dim)
    return None


def _log_space_moments(distribution):
    """Exact (mean, stddev) of log X under a positive-support prior —
    the reference point the LogNormal-mixture head residual-scales by."""
    B = backend.of(*distribution._leaves())
    if isinstance(distribution, LogNormal):
        return distribution._loc, distribution._scale
    if isinstance(distribution, Exponential):
        # log X = -log rate + log E, E ~ Exp(1); E[log E] = -gamma,
        # Std[log E] = pi/sqrt(6)
        rate = distribution._rate
        return -B.log(rate) - _EULER_GAMMA, B.full_like(rate, _PI_OVER_SQRT6)
    if isinstance(distribution, Gamma):
        a, r = distribution._concentration, distribution._rate
        return B.digamma(a) - B.log(r), B.sqrt(B.trigamma(a))
    if isinstance(distribution, Chi2):
        # Chi2(df) = Gamma(df/2, 1/2)
        half_df = distribution._df / 2.0
        return (
            B.digamma(half_df) + math.log(2.0),
            B.sqrt(B.trigamma(half_df)),
        )
    if isinstance(distribution, Weibull):
        # X = scale * E^(1/k), E ~ Exp(1)
        lam, k = distribution._scale, distribution._concentration
        return B.log(lam) - _EULER_GAMMA / k, _PI_OVER_SQRT6 / k
    if isinstance(distribution, HalfNormal):
        # E[log X] = log scale + (digamma(1/2) + log 2)/2,
        # Std[log X] = sqrt(trigamma(1/2))/2
        s = distribution._scale
        return B.log(s) - 0.6351814227307392, B.full_like(s, 1.1107207345395915)
    if isinstance(distribution, HalfCauchy):
        # no log-moments exist (heavy tails); anchor at the median
        # (= scale) with a wide log-space spread
        s = distribution._scale
        return B.log(s), B.full_like(s, 2.0)
    if isinstance(distribution, InverseGamma):
        # log X = log rate - log Gamma(a, 1)
        a, r = distribution._concentration, distribution._rate
        return B.log(r) - B.digamma(a), B.sqrt(B.trigamma(a))
    if isinstance(distribution, Pareto):
        # log X = log scale + E/alpha, E ~ Exp(1)
        m, a = distribution._scale, distribution._alpha
        return B.log(m) + 1.0 / a, 1.0 / a
    raise ValueError(f"No log-space moments for {distribution.name}")


def _location_scale_ref(distribution):
    """Reference (loc, scale) for heavy-tailed real-line priors."""
    B = backend.of(*distribution._leaves())
    if isinstance(distribution, StudentT):
        return distribution._loc, distribution._scale
    if isinstance(distribution, Laplace):
        return distribution._loc, distribution._scale * math.sqrt(2.0)
    if isinstance(distribution, Cauchy):
        return distribution._loc, distribution._scale
    if isinstance(distribution, Logistic):
        return distribution._loc, distribution._scale * (
            math.pi / math.sqrt(3.0)
        )
    if isinstance(distribution, Gumbel):
        return (
            distribution._loc + _EULER_GAMMA * distribution._scale,
            distribution._scale * _PI_OVER_SQRT6,
        )
    raise ValueError(f"No location/scale reference for {distribution.name}")


def prior_param_arrays(distribution):
    """The per-site prior parameters the head consumes at apply time,
    as a dict of scalars/arrays (packed to [B] over a sub-batch)."""
    if isinstance(distribution, Normal):
        return {"mean": distribution.mean, "stddev": distribution.stddev}
    if isinstance(distribution, Uniform):
        return {"low": distribution.low, "high": distribution.high}
    if isinstance(distribution, Beta):
        return {"low": distribution._low, "high": distribution._high}
    if isinstance(distribution, VonMises):
        # one full period centred on the prior location covers the support
        B = backend.of(*distribution._leaves())
        loc = B.asarray(distribution._loc, util.dtype())
        return {"low": loc - math.pi, "high": loc + math.pi}
    if isinstance(distribution, _POSITIVE_LOGNORMAL_PRIORS):
        log_loc, log_scale = _log_space_moments(distribution)
        return {"log_loc": log_loc, "log_scale": log_scale}
    if isinstance(distribution, _STUDENTT_PRIORS):
        loc, scale = _location_scale_ref(distribution)
        return {"loc": loc, "scale": scale}
    if isinstance(distribution, MultivariateNormal):
        return {"loc": distribution.loc, "scale_tril": distribution.scale_tril}
    if isinstance(distribution, Dirichlet):
        return {"concentration": distribution.concentration}
    return {}  # LKJCholesky: the CPC-normal head needs no prior params


def head_init(key, kind, input_dim, mixture_components=10, num_categories=None,
              event_dim=None):
    if kind in (
        "normal_mixture",
        "uniform_truncated_normal_mixture",
        "poisson_truncated_normal_mixture",
        "uniform_beta_mixture",
        "positive_lognormal_mixture",
    ):
        out_dim = 3 * mixture_components
    elif kind == "studentt_mixture":
        # means, log-scales, mixing logits, per-component df (0.5+softplus)
        out_dim = 4 * mixture_components
    elif kind in ("normal_normal", "uniform_beta"):
        # alternative single-component heads kept for parity with the
        # reference's unused-by-default ProposalNormalNormal /
        # ProposalUniformBeta (reference: pyprob/nn/proposal_normal_normal.py,
        # proposal_uniform_beta.py)
        out_dim = 2
    elif kind == "categorical":
        assert num_categories is not None
        out_dim = num_categories
    elif kind == "bernoulli":
        out_dim = 1
    elif kind == "mvn":
        # residual mean [D] + Cholesky diag [D] + strict lower tri D(D-1)/2
        assert event_dim is not None
        out_dim = event_dim + event_dim * (event_dim + 1) // 2
    elif kind == "dirichlet":
        assert event_dim is not None
        out_dim = event_dim
    elif kind == "lkj_cpc_normal":
        # means + log-scales over the d(d-1)/2 partial correlations
        assert event_dim is not None
        out_dim = event_dim * (event_dim - 1)
    else:
        raise ValueError(f"Unknown proposal head kind: {kind}")
    return {
        "ff": mlp_init(key, (input_dim,), (out_dim,), num_layers=2),
        "meta": Static(
            {
                "kind": kind,
                "mixture_components": mixture_components,
                "num_categories": num_categories,
                "event_dim": event_dim,
                # recorded so checkpoints decode df with the floor they
                # were trained under (older nets used 1.0)
                "df_floor": 0.5,
            }
        ),
    }


def head_apply(params, x, prior_params):
    """x: [B, H] network features; prior_params: dict of [B] arrays.
    Returns a batched proposal distribution (batch_shape (B,))."""
    meta = params["meta"].value
    kind = meta["kind"]
    K = meta["mixture_components"]
    out = mlp_apply(params["ff"], x, activation=jax.nn.relu, activation_last=None)
    B = out.shape[0]

    if kind == "normal_mixture":
        means = out[:, :K]
        stddevs = jnp.exp(out[:, K : 2 * K])
        coeffs = jax.nn.softmax(out[:, 2 * K :], axis=1)
        prior_mean = jnp.reshape(prior_params["mean"], (B, 1))
        prior_std = jnp.reshape(prior_params["stddev"], (B, 1))
        means = prior_mean + means * prior_std
        stddevs = stddevs * prior_std
        comps = [Normal(means[:, i], stddevs[:, i]) for i in range(K)]
        return Mixture(comps, probs=coeffs)

    if kind == "uniform_truncated_normal_mixture":
        means = jax.nn.sigmoid(out[:, :K])
        stddevs = jax.nn.sigmoid(out[:, K : 2 * K])
        coeffs = jax.nn.softmax(out[:, 2 * K :], axis=1)
        low = jnp.reshape(prior_params["low"], (B,))
        high = jnp.reshape(prior_params["high"], (B,))
        rng = (high - low)[:, None]
        means = low[:, None] + means * rng
        stddevs = rng / 1000.0 + stddevs * rng * 10.0
        comps = [
            TruncatedNormal(means[:, i], stddevs[:, i], low=low, high=high)
            for i in range(K)
        ]
        return Mixture(comps, probs=coeffs)

    if kind == "poisson_truncated_normal_mixture":
        means = jax.nn.sigmoid(out[:, :K])
        stddevs = jnp.exp(out[:, K : 2 * K])
        coeffs = jax.nn.softmax(out[:, 2 * K :], axis=1)
        low = jnp.full((B,), _POISSON_LOW, util.dtype())
        high = jnp.full((B,), _POISSON_HIGH, util.dtype())
        means = low[:, None] + means * (high - low)[:, None]
        comps = [
            TruncatedNormal(means[:, i], stddevs[:, i], low=low, high=high)
            for i in range(K)
        ]
        return Mixture(comps, probs=coeffs)

    if kind == "positive_lognormal_mixture":
        # residual-scaled in log space by the prior's exact log-moments,
        # mirroring the normal_mixture head's residual parameterization
        raw_means = out[:, :K]
        raw_stds = jnp.exp(out[:, K : 2 * K])
        coeffs = jax.nn.softmax(out[:, 2 * K :], axis=1)
        log_loc = jnp.reshape(prior_params["log_loc"], (B, 1))
        log_scale = jnp.reshape(prior_params["log_scale"], (B, 1))
        means = log_loc + raw_means * log_scale
        stddevs = raw_stds * log_scale
        comps = [LogNormal(means[:, i], stddevs[:, i]) for i in range(K)]
        return Mixture(comps, probs=coeffs)

    if kind == "studentt_mixture":
        raw_means = out[:, :K]
        raw_scales = jnp.exp(out[:, K : 2 * K])
        coeffs = jax.nn.softmax(out[:, 2 * K : 3 * K], axis=1)
        # df floor 0.5: the head can learn tails HEAVIER than any Cauchy
        # prior's (df=1), keeping prior/proposal ratios from exploding in
        # the tails once trained (no a-priori boundedness guarantee — the
        # learned df sets the proposal tail, as with every learned head).
        # The floor is read from meta so checkpoints trained under the old
        # 1.0 floor decode their parameters unchanged.
        dfs = meta.get("df_floor", 1.0) + jax.nn.softplus(out[:, 3 * K :])
        loc = jnp.reshape(prior_params["loc"], (B, 1))
        scale = jnp.reshape(prior_params["scale"], (B, 1))
        means = loc + raw_means * scale
        scales = raw_scales * scale
        comps = [
            StudentT(dfs[:, i], means[:, i], scales[:, i]) for i in range(K)
        ]
        return Mixture(comps, probs=coeffs)

    if kind == "normal_normal":
        mean = out[:, 0]
        stddev = jnp.exp(out[:, 1])
        prior_mean = jnp.reshape(prior_params["mean"], (B,))
        prior_std = jnp.reshape(prior_params["stddev"], (B,))
        return Normal(prior_mean + mean * prior_std, stddev * prior_std)

    if kind == "uniform_beta":
        low = jnp.reshape(prior_params["low"], (B,))
        high = jnp.reshape(prior_params["high"], (B,))
        c1 = 1.0 + jax.nn.softplus(out[:, 0])
        c0 = 1.0 + jax.nn.softplus(out[:, 1])
        return Beta(c1, c0, low=low, high=high)

    if kind == "uniform_beta_mixture":
        low = jnp.reshape(prior_params["low"], (B,))
        high = jnp.reshape(prior_params["high"], (B,))
        c1s = 1.0 + jax.nn.softplus(out[:, :K])
        c0s = 1.0 + jax.nn.softplus(out[:, K : 2 * K])
        coeffs = jax.nn.softmax(out[:, 2 * K :], axis=1)
        comps = [
            Beta(c1s[:, i], c0s[:, i], low=low, high=high) for i in range(K)
        ]
        return Mixture(comps, probs=coeffs)

    if kind == "mvn":
        # mean = loc + L_prior @ raw_mu; scale = L_prior @ M with M lower
        # triangular, positive diagonal: zero net output (raw_mu=0, M=I up
        # to exp(0)) proposes exactly the prior, and L_prior @ M is always
        # a valid Cholesky factor
        D = meta["event_dim"]
        raw_mu = out[:, :D]
        raw_diag = out[:, D : 2 * D]
        raw_off = out[:, 2 * D :]
        loc = jnp.reshape(prior_params["loc"], (B, D))
        L_prior = jnp.reshape(prior_params["scale_tril"], (B, D, D))
        mean = loc + jnp.einsum("bij,bj->bi", L_prior, raw_mu)
        M = jnp.zeros((B, D, D), util.dtype())
        if D > 1:
            rows, cols = jnp.tril_indices(D, k=-1)
            M = M.at[:, rows, cols].set(raw_off)
        diag_idx = jnp.arange(D)
        diag = jnp.exp(jnp.clip(raw_diag, -10.0, 10.0))
        M = M.at[:, diag_idx, diag_idx].set(diag)
        scale_tril = jnp.matmul(L_prior, M)
        return MultivariateNormal(mean, scale_tril=scale_tril)

    if kind == "dirichlet":
        D = meta["event_dim"]
        conc = jnp.reshape(prior_params["concentration"], (B, D))
        alpha = conc * jnp.exp(jnp.clip(out[:, :D], -10.0, 10.0))
        return Dirichlet(alpha + _EPSILON)

    if kind == "lkj_cpc_normal":
        # zero output -> z ~ N(0, 1) on the partial-correlation chart: a
        # broad full-support base over correlation matrices (the same
        # chart the gradient engines use, inference/hmc.py)
        D = meta["event_dim"]
        K2 = D * (D - 1) // 2
        loc = out[:, :K2]
        log_scale = jnp.clip(out[:, K2:], -8.0, 4.0)
        return LKJCholeskyCPCNormal(loc, log_scale, dim=D)

    if kind == "categorical":
        probs = jax.nn.softmax(out, axis=1) + _EPSILON
        return Categorical(probs=probs)

    if kind == "bernoulli":
        probs = jax.nn.sigmoid(out[:, 0]) + _EPSILON
        return Bernoulli(probs=jnp.clip(probs, 0.0, 1.0))

    raise ValueError(f"Unknown proposal head kind: {kind}")
