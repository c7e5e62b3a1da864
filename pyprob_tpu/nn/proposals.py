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
"""

from __future__ import annotations

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
)
from .layers import Static, mlp_init, mlp_apply

_EPSILON = 1e-6
_POISSON_LOW = 0.0
_POISSON_HIGH = 40.0


def head_kind_for(distribution):
    """Map a prior distribution to its proposal head kind; None if the
    distribution type has no learned proposal (falls back to the prior)."""
    if isinstance(distribution, Normal):
        return "normal_mixture"
    if isinstance(distribution, Uniform):
        return "uniform_truncated_normal_mixture"
    if isinstance(distribution, Poisson):
        return "poisson_truncated_normal_mixture"
    if isinstance(distribution, Categorical):
        return "categorical"
    if isinstance(distribution, Bernoulli):
        return "bernoulli"
    return None


def prior_param_arrays(distribution):
    """The per-site prior parameters the head consumes at apply time,
    as a dict of scalars/arrays (packed to [B] over a sub-batch)."""
    if isinstance(distribution, Normal):
        return {"mean": distribution.mean, "stddev": distribution.stddev}
    if isinstance(distribution, Uniform):
        return {"low": distribution.low, "high": distribution.high}
    return {}


def head_init(key, kind, input_dim, mixture_components=10, num_categories=None):
    if kind in (
        "normal_mixture",
        "uniform_truncated_normal_mixture",
        "poisson_truncated_normal_mixture",
        "uniform_beta_mixture",
    ):
        out_dim = 3 * mixture_components
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
    else:
        raise ValueError(f"Unknown proposal head kind: {kind}")
    return {
        "ff": mlp_init(key, (input_dim,), (out_dim,), num_layers=2),
        "meta": Static(
            {
                "kind": kind,
                "mixture_components": mixture_components,
                "num_categories": num_categories,
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

    if kind == "categorical":
        probs = jax.nn.softmax(out, axis=1) + _EPSILON
        return Categorical(probs=probs)

    if kind == "bernoulli":
        probs = jax.nn.sigmoid(out[:, 0]) + _EPSILON
        return Bernoulli(probs=jnp.clip(probs, 0.0, 1.0))

    raise ValueError(f"Unknown proposal head kind: {kind}")
