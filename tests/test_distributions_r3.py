"""Beyond-parity distributions round 3 (InverseGamma, Pareto,
NegativeBinomial): moments vs MC, cross-backend agreement, torch
cross-validation, cdf/icdf round trips, support guards, conjugate
posteriors under the gradient engines, and IC proposal-head mapping."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pyprob_tpu as pp
from pyprob_tpu.distributions import (
    Beta,
    InverseGamma,
    NegativeBinomial,
    Normal,
    Pareto,
)


def _pairs():
    return [
        (InverseGamma(3.0, 2.0), InverseGamma(jnp.float32(3.0), jnp.float32(2.0))),
        (Pareto(1.5, 4.0), Pareto(jnp.float32(1.5), jnp.float32(4.0))),
        (
            NegativeBinomial(5.0, 0.4),
            NegativeBinomial(jnp.float32(5.0), jnp.float32(0.4)),
        ),
    ]


@pytest.mark.parametrize("idx", range(3))
def test_moments_vs_mc_both_backends(idx):
    d_np, d_jx = _pairs()[idx]
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    s_np = np.asarray(d_np.sample(rng, (100000,)), dtype=np.float64)
    s_jx = np.asarray(d_jx.sample(key, (100000,)), dtype=np.float64)
    mean = float(np.asarray(d_np.mean))
    var = float(np.asarray(d_np.variance))
    for s in (s_np, s_jx):
        assert abs(s.mean() - mean) < 4 * math.sqrt(var / 1e5) + 0.02
        assert abs(s.var() - var) / max(var, 1e-6) < 0.15


@pytest.mark.parametrize("idx", range(3))
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
    assert np.allclose(
        float(d_np.log_prob(x, sum=True)), lp_np.sum(), rtol=1e-5
    )


def test_log_prob_vs_torch():
    import torch
    import torch.distributions as td

    rng = np.random.default_rng(2)
    # Pareto: identical convention
    d = Pareto(1.5, 4.0)
    x = np.asarray(d.sample(rng, (50,)), np.float64)
    ours = np.asarray(d.log_prob(x), np.float64)
    theirs = td.Pareto(torch.tensor(1.5), torch.tensor(4.0)).log_prob(
        torch.tensor(x)
    ).numpy()
    assert np.allclose(ours, theirs, atol=1e-5)
    # NegativeBinomial: torch's probs is the per-trial FAILURE probability
    # relative to our scipy convention (ours p = success prob)
    d = NegativeBinomial(5.0, 0.4)
    k = np.asarray(d.sample(rng, (50,)), np.float64)
    ours = np.asarray(d.log_prob(k), np.float64)
    theirs = td.NegativeBinomial(
        torch.tensor(5.0), probs=torch.tensor(0.6)
    ).log_prob(torch.tensor(k)).numpy()
    assert np.allclose(ours, theirs, atol=1e-5)
    # InverseGamma (torch >= 2.0)
    if hasattr(td, "InverseGamma"):
        d = InverseGamma(3.0, 2.0)
        x = np.asarray(d.sample(rng, (50,)), np.float64)
        ours = np.asarray(d.log_prob(x), np.float64)
        theirs = td.InverseGamma(
            torch.tensor(3.0), torch.tensor(2.0)
        ).log_prob(torch.tensor(x)).numpy()
        assert np.allclose(ours, theirs, atol=1e-5)


def test_cdf_and_support_guards():
    rng = np.random.default_rng(3)
    ig = InverseGamma(3.0, 2.0)
    x = np.asarray(ig.sample(rng, (100000,)), np.float64)
    for q in (0.5, 1.0, 2.0):
        assert abs(float(ig.cdf(q)) - (x <= q).mean()) < 0.01
    assert float(ig.cdf(-1.0)) == 0.0
    assert float(ig.log_prob(-1.0)) == -np.inf

    par = Pareto(1.5, 4.0)
    u = np.linspace(0.05, 0.95, 7)
    np.testing.assert_allclose(
        np.asarray(par.cdf(par.icdf(u)), np.float64), u, atol=1e-5
    )
    assert float(par.log_prob(1.0)) == -np.inf  # below scale
    assert float(par.cdf(1.0)) == 0.0

    nb = NegativeBinomial(5.0, 0.4)
    assert float(nb.log_prob(-1.0)) == -np.inf
    assert float(nb.log_prob(2.5)) == -np.inf  # non-integer
    # pmf sums to ~1 over a generous support range
    ks = np.arange(0, 200, dtype=np.float64)
    assert abs(np.exp(np.asarray(nb.log_prob(ks))).sum() - 1.0) < 1e-6


class _VarianceModel(pp.Model):
    """Conjugate Normal-variance model: sigma2 ~ InverseGamma(3, 2),
    x_i | sigma2 ~ Normal(0, sqrt(sigma2)) — posterior
    InverseGamma(3 + n/2, 2 + sum(x^2)/2)."""

    def forward(self):
        sigma2 = pp.sample(InverseGamma(3.0, 2.0), name="sigma2")
        B = jnp if hasattr(sigma2, "aval") or isinstance(sigma2, jnp.ndarray) else np
        sd = B.sqrt(sigma2)
        for i in range(4):
            pp.observe(Normal(0.0, sd), name=f"x{i}")
        return sigma2


def test_inverse_gamma_conjugate_nuts():
    m = _VarianceModel()
    obs = {"x0": 1.2, "x1": -0.8, "x2": 2.1, "x3": 0.3}
    ssq = sum(v * v for v in obs.values())
    a_post, b_post = 3.0 + 2.0, 2.0 + ssq / 2.0
    true_mean = b_post / (a_post - 1.0)
    true_std = math.sqrt(b_post**2 / ((a_post - 1.0) ** 2 * (a_post - 2.0)))
    post = m.posterior_results(
        num_traces=20000, observe=obs,
        inference_engine=pp.InferenceEngine.NO_U_TURN_SAMPLER,
    )
    assert abs(float(post.mean) - true_mean) < 0.15
    assert abs(float(post.stddev) - true_std) < 0.15


class _ParetoModel(pp.Model):
    def forward(self):
        x = pp.sample(Pareto(1.0, 3.0), name="x")
        pp.observe(Normal(x, 0.5), name="y")
        return x


def test_pareto_latent_hmc_matches_is():
    m = _ParetoModel()
    obs = {"y": 2.0}
    ref = m.posterior_results(num_traces=400000, observe=obs)
    hmc = m.posterior_results(
        num_traces=20000, observe=obs,
        inference_engine=pp.InferenceEngine.HAMILTONIAN_MONTE_CARLO,
    )
    assert abs(float(hmc.mean) - float(ref.mean)) < 0.05
    assert abs(float(hmc.stddev) - float(ref.stddev)) < 0.05


class _NBModel(pp.Model):
    """Overdispersed-count likelihood with a bounded latent success
    probability."""

    def forward(self):
        p = pp.sample(Beta(2.0, 2.0), name="p")
        pp.observe(NegativeBinomial(5.0, p), name="k0")
        pp.observe(NegativeBinomial(5.0, p), name="k1")
        return p


def test_negative_binomial_observation_nuts():
    m = _NBModel()
    obs = {"k0": 7.0, "k1": 9.0}
    ref = m.posterior_results(num_traces=400000, observe=obs)
    nuts = m.posterior_results(
        num_traces=20000, observe=obs,
        inference_engine=pp.InferenceEngine.NO_U_TURN_SAMPLER,
    )
    assert abs(float(nuts.mean) - float(ref.mean)) < 0.03
    assert abs(float(nuts.stddev) - float(ref.stddev)) < 0.03


def test_ic_head_mapping():
    from pyprob_tpu.nn.proposals import head_kind_for, _log_space_moments

    assert head_kind_for(InverseGamma(3.0, 2.0)) == "positive_lognormal_mixture"
    assert head_kind_for(Pareto(1.5, 4.0)) == "positive_lognormal_mixture"
    assert head_kind_for(NegativeBinomial(5.0, 0.4)) is None
    # exact log-space moments vs MC
    rng = np.random.default_rng(4)
    for d in (InverseGamma(3.0, 2.0), Pareto(1.5, 4.0)):
        logs = np.log(np.asarray(d.sample(rng, (200000,)), np.float64))
        mu, sd = _log_space_moments(d)
        assert abs(float(mu) - logs.mean()) < 0.01
        assert abs(float(sd) - logs.std()) < 0.01
