"""Extended proposal-head coverage (beyond parity).

The reference's IC stack raises "Distribution currently unsupported" for
any prior outside {Normal, Uniform, Poisson, Categorical, Bernoulli}
(reference: pyprob/nn/inference_network_lstm.py:50-68). Here every common
continuous prior gets a learned proposal head:

* positive support  -> LogNormal mixture (residual-scaled in log space)
* heavy-tailed real -> StudentT mixture (learned per-component df)
* Beta / VonMises   -> TruncatedNormal mixture over the bounded support

Statistical checks run against conjugate/analytic ground truths.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pyprob_tpu as pp
from pyprob_tpu.distributions import (
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
    Beta,
    VonMises,
    Normal,
    Bernoulli,
)
from pyprob_tpu.nn.proposals import (
    head_kind_for,
    head_init,
    head_apply,
    prior_param_arrays,
)


ALL_NEW_PRIORS = [
    Gamma(3.0, 2.0),
    Exponential(1.5),
    LogNormal(0.3, 0.7),
    Weibull(2.0, 1.5),
    Chi2(4.0),
    HalfNormal(2.0),
    HalfCauchy(1.0),
    StudentT(4.0, 1.0, 2.0),
    Laplace(0.0, 1.0),
    Cauchy(0.0, 1.0),
    Logistic(0.5, 1.2),
    Gumbel(0.0, 1.0),
    Beta(2.0, 3.0),
    VonMises(0.5, 2.0),
]


def test_head_kind_coverage():
    kinds = {d.name: head_kind_for(d) for d in ALL_NEW_PRIORS}
    assert all(k is not None for k in kinds.values()), kinds
    assert kinds["Gamma"] == "positive_lognormal_mixture"
    assert kinds["Laplace"] == "studentt_mixture"
    assert kinds["Beta"] == "uniform_truncated_normal_mixture"
    assert kinds["VonMises"] == "uniform_truncated_normal_mixture"


@pytest.mark.parametrize("dist", ALL_NEW_PRIORS, ids=lambda d: d.name)
def test_head_apply_valid_proposals(dist):
    B, H = 4, 16
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H))
    kind = head_kind_for(dist)
    params = head_init(jax.random.PRNGKey(1), kind, H, mixture_components=3)
    prior = {
        k: jnp.broadcast_to(jnp.asarray(v), (B,))
        for k, v in prior_param_arrays(dist).items()
    }
    q = head_apply(params, x, prior)
    v = q.sample()
    assert np.shape(np.asarray(v)) == (B,)
    # finite proposal density at its own samples, finite prior density too
    # (support match: proposal only produces values the prior can score)
    assert np.all(np.isfinite(np.asarray(q.log_prob(v))))
    assert np.all(np.isfinite(np.asarray(dist.log_prob(np.asarray(v)))))


def test_log_space_moments_exact():
    # Monte-Carlo cross-check of the analytic log-space reference moments
    rng = np.random.default_rng(0)
    for dist, sampler in [
        (Gamma(3.0, 2.0), lambda: rng.gamma(3.0, 1 / 2.0, 200_000)),
        (Exponential(1.5), lambda: rng.exponential(1 / 1.5, 200_000)),
        (Weibull(2.0, 1.5), lambda: 2.0 * rng.weibull(1.5, 200_000)),
        (Chi2(4.0), lambda: rng.chisquare(4.0, 200_000)),
        (HalfNormal(2.0), lambda: np.abs(rng.normal(0, 2.0, 200_000))),
    ]:
        pp_prior = prior_param_arrays(dist)
        logs = np.log(sampler())
        assert abs(float(pp_prior["log_loc"]) - logs.mean()) < 0.02, dist.name
        assert abs(float(pp_prior["log_scale"]) - logs.std()) < 0.02, dist.name


class GammaPoissonModel(pp.Model):
    """rate ~ Gamma(2,1); k_i ~ Poisson(rate) — conjugate posterior
    Gamma(2 + sum k, 1 + n). Observations are small counts, so the
    observe-embedding MLP sees bounded inputs."""

    def forward(self):
        rate = pp.sample(Gamma(2.0, 1.0))
        lik = pp.distributions.Poisson(rate)
        pp.observe(lik, name="obs0")
        pp.observe(lik, name="obs1")
        return rate


def test_ic_training_gamma_prior():
    m = GammaPoissonModel()
    m.learn_inference_network(
        num_traces=12000,
        observe_embeddings={"obs0": {"dim": 16}, "obs1": {"dim": 16}},
        inference_network=pp.InferenceNetwork.FEEDFORWARD,
        batch_size=512,
        learning_rate_init=0.005,
    )
    obs = {"obs0": 3.0, "obs1": 5.0}
    post = m.posterior_results(
        num_traces=2000,
        observe=obs,
        inference_engine=pp.InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK,
    )
    # Gamma(10, 3): mean 3.3333, stddev 1.0541
    assert abs(float(post.mean) - 10.0 / 3.0) < 0.35
    assert abs(float(post.stddev) - math.sqrt(10.0) / 3.0) < 0.35
    # the learned proposal must beat prior-proposal IS on ESS
    is_post = m.posterior_results(
        num_traces=2000,
        observe=obs,
        inference_engine=pp.InferenceEngine.IMPORTANCE_SAMPLING,
    )
    assert post.effective_sample_size > is_post.effective_sample_size
    assert post.effective_sample_size > 0.15 * 2000


class GammaExponentialModel(pp.Model):
    """rate ~ Gamma(2,1); x_i ~ Exponential(rate) — conjugate posterior
    Gamma(2 + n, 1 + sum x).  The observations are heavy-tailed (their
    scale is 1/rate, unbounded as rate -> 0): raw values blow up the
    observe-embedding MLP (the reference diverges on such models), so this
    exercises the opt-in arcsinh input squash."""

    def forward(self):
        rate = pp.sample(Gamma(2.0, 1.0))
        lik = Exponential(rate)
        pp.observe(lik, name="obs0")
        pp.observe(lik, name="obs1")
        return rate


def test_ic_training_heavy_tailed_observations():
    m = GammaExponentialModel()
    m.learn_inference_network(
        num_traces=12000,
        observe_embeddings={
            "obs0": {"dim": 16, "input_transform": "arcsinh"},
            "obs1": {"dim": 16, "input_transform": "arcsinh"},
        },
        inference_network=pp.InferenceNetwork.FEEDFORWARD,
        batch_size=512,
        learning_rate_init=0.005,
    )
    obs = {"obs0": 0.3, "obs1": 0.5}
    post = m.posterior_results(
        num_traces=2000,
        observe=obs,
        inference_engine=pp.InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK,
    )
    # Gamma(4, 1.8): mean 2.2222, stddev 1.1111
    assert abs(float(post.mean) - 4.0 / 1.8) < 0.35
    assert abs(float(post.stddev) - 2.0 / 1.8) < 0.35
    assert post.effective_sample_size > 0.15 * 2000


class LaplaceLocationModel(pp.Model):
    """x ~ Laplace(0, 1); obs ~ Normal(x, 0.5) — heavy-tailed prior where a
    learned StudentT-mixture proposal concentrates near the observation."""

    def forward(self):
        x = pp.sample(Laplace(0.0, 1.0))
        pp.observe(Normal(x, 0.5), name="obs0")
        return x


def test_ic_training_laplace_prior():
    m = LaplaceLocationModel()
    m.learn_inference_network(
        num_traces=12000,
        observe_embeddings={"obs0": {"dim": 16}},
        inference_network=pp.InferenceNetwork.FEEDFORWARD,
        batch_size=512,
        learning_rate_init=0.005,
    )
    obs = {"obs0": 4.0}
    post = m.posterior_results(
        num_traces=2000,
        observe=obs,
        inference_engine=pp.InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK,
    )
    # grid ground truth for the posterior mean
    xs = np.linspace(-30, 30, 200_001)
    logp = -np.abs(xs) - 0.5 * ((4.0 - xs) / 0.5) ** 2
    w = np.exp(logp - logp.max())
    true_mean = float((xs * w).sum() / w.sum())
    assert abs(float(post.mean) - true_mean) < 0.3
    is_post = m.posterior_results(
        num_traces=2000,
        observe=obs,
        inference_engine=pp.InferenceEngine.IMPORTANCE_SAMPLING,
    )
    assert post.effective_sample_size > is_post.effective_sample_size
