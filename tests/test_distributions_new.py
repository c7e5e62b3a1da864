"""Beyond-parity distributions round 2 (Cauchy, HalfCauchy, HalfNormal,
Gumbel, Logistic, Chi2, Geometric, Multinomial): moments vs MC,
cross-backend agreement, cdf/icdf round trips, jit crossing, models on
both execution tiers, and gradient-engine support for the new priors."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pyprob_tpu as pp
from pyprob_tpu.distributions import (
    Cauchy,
    HalfCauchy,
    HalfNormal,
    Gumbel,
    Logistic,
    Chi2,
    Geometric,
    Multinomial,
    Normal,
    Dirichlet,
)


def _pairs():
    return [
        (Cauchy(1.0, 2.0), Cauchy(jnp.float32(1.0), jnp.float32(2.0))),
        (HalfCauchy(2.0), HalfCauchy(jnp.float32(2.0))),
        (HalfNormal(1.5), HalfNormal(jnp.float32(1.5))),
        (Gumbel(0.5, 1.2), Gumbel(jnp.float32(0.5), jnp.float32(1.2))),
        (Logistic(0.3, 0.8), Logistic(jnp.float32(0.3), jnp.float32(0.8))),
        (Chi2(3.0), Chi2(jnp.float32(3.0))),
        (Geometric(0.3), Geometric(jnp.float32(0.3))),
        (
            Multinomial(20, [0.2, 0.3, 0.5]),
            Multinomial(20, jnp.array([0.2, 0.3, 0.5])),
        ),
    ]


@pytest.mark.parametrize("idx", range(8))
def test_moments_vs_mc_both_backends(idx):
    d_np, d_jx = _pairs()[idx]
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    s_np = np.asarray(d_np.sample(rng, (100000,)), dtype=np.float64)
    s_jx = np.asarray(d_jx.sample(key, (100000,)), dtype=np.float64)
    mean = np.asarray(d_np.mean, dtype=np.float64)
    var = np.asarray(d_np.variance, dtype=np.float64)
    if not np.all(np.isfinite(mean)):
        return  # Cauchy / HalfCauchy moments are undefined by design
    for s in (s_np, s_jx):
        assert np.allclose(
            s.mean(0), mean, atol=4 * np.sqrt(var.max() / 1e5) + 0.02
        )
        assert np.allclose(s.var(0), var, rtol=0.1, atol=0.05)


@pytest.mark.parametrize("idx", range(8))
def test_log_prob_cross_backend_and_jit(idx):
    d_np, d_jx = _pairs()[idx]
    rng = np.random.default_rng(1)
    x = np.asarray(d_np.sample(rng, (7,)))
    lp_np = np.asarray(d_np.log_prob(x), dtype=np.float64)
    lp_jx = np.asarray(d_jx.log_prob(jnp.asarray(x)), dtype=np.float64)
    assert np.allclose(lp_np, lp_jx, atol=1e-4)
    lp_jit = np.asarray(
        jax.jit(lambda v: d_jx.log_prob(v))(jnp.asarray(x)), dtype=np.float64
    )
    assert np.allclose(lp_np, lp_jit, atol=1e-4)
    # summed form matches
    assert np.allclose(
        float(d_np.log_prob(x, sum=True)), lp_np.sum(), rtol=1e-5
    )


def test_cdf_icdf_roundtrips():
    u = np.array([0.05, 0.3, 0.5, 0.7, 0.95])
    for d in (Cauchy(1.0, 2.0), HalfCauchy(2.0), HalfNormal(1.5),
              Gumbel(0.5, 1.2), Logistic(0.3, 0.8)):
        assert np.allclose(np.asarray(d.cdf(d.icdf(u))), u, atol=1e-5), d.name
    # chi2 / geometric expose cdf only
    assert abs(float(Chi2(2.0).cdf(2.0)) - (1 - math.exp(-1))) < 1e-5
    g = Geometric(0.5)
    assert abs(float(g.cdf(0)) - 0.5) < 1e-6
    assert abs(float(g.cdf(1)) - 0.75) < 1e-6
    assert float(g.cdf(-1)) == 0.0


def test_undefined_moments_are_nan_or_inf():
    assert np.isnan(float(Cauchy(0.0, 1.0).mean))
    assert np.isnan(float(Cauchy(0.0, 1.0).variance))
    assert np.isinf(float(HalfCauchy(1.0).mean))


def test_support_guards():
    assert float(HalfNormal(1.0).log_prob(-0.5)) == -np.inf
    assert float(HalfCauchy(1.0).log_prob(-0.5)) == -np.inf
    assert float(Chi2(3.0).log_prob(-1.0)) == -np.inf
    assert float(Geometric(0.3).log_prob(-1.0)) == -np.inf


def test_geometric_logits_and_pmf_sums_to_one():
    d = Geometric(logits=0.0)  # p = 0.5
    ks = np.arange(0, 60)
    total = np.exp(np.asarray(d.log_prob(ks), dtype=np.float64)).sum()
    assert abs(total - 1.0) < 1e-6
    assert abs(float(d.mean) - 1.0) < 1e-6


def test_multinomial_structure():
    d = Multinomial(12, logits=jnp.zeros(4))
    s = d.sample(jax.random.PRNGKey(3), (500,))
    assert s.shape == (500, 4)
    assert np.all(np.asarray(s).sum(-1) == 12)
    assert d.event_shape == (4,)
    # log_prob agrees with an explicit density at a point
    x = np.array([3.0, 3.0, 3.0, 3.0])
    expect = (
        math.lgamma(13.0) - 4 * math.lgamma(4.0) + 12 * math.log(0.25)
    )
    assert abs(float(d.log_prob(x)) - expect) < 1e-4


@pytest.mark.parametrize("vectorized", [False, True])
def test_halfnormal_prior_model_both_tiers(vectorized):
    class M(pp.Model):
        def forward(self):
            s = pp.sample(HalfNormal(2.0))
            pp.observe(Normal(0.0, 1.0), name="y")
            return s

    prior = M().prior_results(num_traces=4000, vectorized=vectorized)
    vals = np.asarray(prior.get_values(), dtype=np.float64)
    assert vals.min() >= 0.0
    assert abs(vals.mean() - 2.0 * math.sqrt(2.0 / math.pi)) < 0.12


def test_gradient_engine_on_new_priors():
    """HalfNormal scale + Gumbel location latents run under NUTS via the
    exp / identity transforms (pyprob_tpu/inference/hmc.py)."""

    class M(pp.Model):
        def forward(self):
            loc = pp.sample(Gumbel(0.0, 1.0))
            scale = pp.sample(HalfNormal(2.0))
            pp.observe(Normal(loc, scale), name="y")
            return loc, scale

    post = M().posterior_results(
        num_traces=2000,
        observe={"y": 1.5},
        inference_engine=pp.InferenceEngine.NO_U_TURN_SAMPLER,
        num_chains=16,
    )
    xs = np.asarray(
        [np.asarray(v, dtype=np.float64) for v in post.get_values()]
    )
    assert np.all(xs[:, 1] > 0.0)  # scale stays positive through exp
    ref = M().posterior_results(
        num_traces=200000, observe={"y": 1.5}, vectorized=True
    )
    # compare against a large IS reference (weighted Empirical means)
    assert abs(xs[:, 0].mean() - float(ref.map(lambda t: t[0]).mean)) < 0.25
    assert abs(xs[:, 1].mean() - float(ref.map(lambda t: t[1]).mean)) < 0.25


def test_geometric_in_interpreter_chain():
    """Geometric latent (non-enumerable discrete) runs through the
    interpreter-tier LMH chain."""

    class M(pp.Model):
        _never_vectorize = True

        def forward(self):
            k = pp.sample(Geometric(0.4))
            pp.observe(Normal(float(k), 1.0), name="y")
            return k

    post = M().posterior(
        num_traces=1500,
        observe={"y": 2.0},
        inference_engine=pp.InferenceEngine.LIGHTWEIGHT_METROPOLIS_HASTINGS,
    )
    vals = np.asarray(
        [float(t.result) for t in post.get_values()], dtype=np.float64
    )
    assert vals.min() >= 0.0
    # posterior mass shifts from the prior mean 1.5 toward the observe at 2
    assert 1.0 < vals[300:].mean() < 2.6


def test_cauchy_heavy_tails_vs_normal():
    rng = np.random.default_rng(5)
    s = np.asarray(Cauchy(0.0, 1.0).sample(rng, (20000,)), dtype=np.float64)
    assert np.mean(np.abs(s) > 6.0) > 0.02  # ~10% beyond 6 for Cauchy
    sn = np.asarray(Normal(0.0, 1.0).sample(rng, (20000,)), dtype=np.float64)
    assert np.mean(np.abs(sn) > 6.0) == 0.0
