"""LAPLACE engine and Model.map_estimate (beyond parity — the reference
has no optimization-based inference; its engines are simulation-based
only, reference: pyprob/util.py:49-53).

The Laplace posterior is importance-reweighted draws from N(z_map, H^-1)
in unconstrained space, so on a Gaussian-posterior model it must be
exact (constant weights), and on non-Gaussian posteriors the reweighted
moments must still match the analytic conjugate ones.
"""

import math

import numpy as np
import pytest

import pyprob_tpu as pp
from pyprob_tpu.distributions import Bernoulli, Gamma, Normal, Poisson
from pyprob_tpu.models import GaussianUnknownMean

OBS = {"obs0": 8.0, "obs1": 9.0}
TRUE_MEAN = 7.25
TRUE_STD = math.sqrt(1 / 1.2)
# log N(7.25; 1, sqrt 5) + log N(8; 7.25, sqrt 2) + log N(9; 7.25, sqrt 2)
TRUE_LOG_JOINT_AT_MODE = -9.0672
# log N(8; 1, sqrt 7) + log N(9; 6, sqrt(24/7))
TRUE_LOG_EVIDENCE = -8.2395


@pytest.fixture(scope="module")
def gum():
    return GaussianUnknownMean()


def test_laplace_exact_on_gaussian_posterior(gum):
    post = gum.posterior_results(
        num_traces=4000,
        observe=OBS,
        inference_engine=pp.InferenceEngine.LAPLACE,
    )
    # Gaussian posterior + identity transform: the Laplace approximation
    # IS the posterior, so the reweighted draws carry constant weights
    assert post.effective_sample_size > 0.99 * 4000
    assert abs(float(post.mean) - TRUE_MEAN) < 0.05
    assert abs(float(post.stddev) - TRUE_STD) < 0.05
    # both evidence estimates are exact here
    assert abs(post.log_evidence - TRUE_LOG_EVIDENCE) < 0.02
    assert abs(post.log_evidence_laplace - TRUE_LOG_EVIDENCE) < 0.02


def test_map_estimate_gum(gum):
    res = gum.map_estimate(observe=OBS)
    assert len(res.values) == 1
    (mode,) = res.values.values()
    assert abs(float(mode) - TRUE_MEAN) < 0.01
    assert abs(float(res.result) - TRUE_MEAN) < 0.01
    assert abs(res.log_joint - TRUE_LOG_JOINT_AT_MODE) < 0.01


class _GammaPoisson(pp.Model):
    """Conjugate Gamma-Poisson: posterior Gamma(3 + 4 + 6, 1 + 2) —
    positive-support latent exercises the exp transform (the Gaussian is
    fit in log space; the IS reweighting must still recover the exact
    skewed posterior moments)."""

    def forward(self):
        lam = pp.sample(Gamma(3.0, 1.0), name="lam")
        pp.observe(Poisson(lam), name="c0")
        pp.observe(Poisson(lam), name="c1")
        return lam


def test_laplace_positive_support_reweighting():
    m = _GammaPoisson()
    obs = {"c0": 4.0, "c1": 6.0}
    post = m.posterior_results(
        num_traces=20000, observe=obs,
        inference_engine=pp.InferenceEngine.LAPLACE,
    )
    # posterior Gamma(13, 3): mean 13/3, std sqrt(13)/3
    assert post.effective_sample_size > 0.5 * 20000
    assert abs(float(post.mean) - 13.0 / 3.0) < 0.05
    assert abs(float(post.stddev) - math.sqrt(13.0) / 3.0) < 0.05
    # constrained-space MAP of Gamma(13, 3) is (13-1)/3 = 4.0 exactly
    # (no-Jacobian convention; the log-space mode would be 13/3)
    res = m.map_estimate(observe=obs)
    assert abs(float(res.values["lam"]) - 4.0) < 0.03


class _MixedDiscrete(pp.Model):
    """Continuous latent plus an enumerable Bernoulli shift: LAPLACE must
    marginalize the discrete site and redraw it from its exact
    conditional at decode time."""

    def forward(self):
        z = pp.sample(Normal(0.0, 2.0), name="z")
        d = pp.sample(Bernoulli(0.3), name="d")
        # 0.5 shift at 0.5 noise: the two conditional modes overlap, so a
        # single Gaussian covers the marginalized posterior and the IS
        # reweighting recovers the exact mixture moments
        pp.observe(Normal(z + 0.5 * d, 0.5), name="y")
        return z


def test_laplace_enumerates_discrete():
    m = _MixedDiscrete()
    obs = {"y": 0.8}
    ref = m.posterior_results(num_traces=400000, observe=obs)
    post = m.posterior_results(
        num_traces=20000, observe=obs,
        inference_engine=pp.InferenceEngine.LAPLACE,
    )
    assert abs(float(post.mean) - float(ref.mean)) < 0.1
    assert abs(float(post.stddev) - float(ref.stddev)) < 0.1


def test_laplace_requires_observe(gum):
    with pytest.raises(RuntimeError, match="observe"):
        gum.posterior_results(
            num_traces=10, inference_engine=pp.InferenceEngine.LAPLACE
        )


def test_laplace_untraceable_raises():
    class Host(pp.Model):
        _never_vectorize = True

        def forward(self):
            mu = pp.sample(Normal(0.0, 1.0))
            pp.observe(Normal(mu, 1.0), name="y")
            return mu

    with pytest.raises(RuntimeError, match="jax-traceable"):
        Host().posterior_results(
            num_traces=10, observe={"y": 1.0},
            inference_engine=pp.InferenceEngine.LAPLACE,
        )


def test_laplace_cache_reuse(gum):
    # second call with the same observe name-set reuses the built programs
    from pyprob_tpu.inference.laplace import _laplace_cache

    gum.posterior_results(
        num_traces=500, observe=OBS,
        inference_engine=pp.InferenceEngine.LAPLACE,
    )
    n = len(_laplace_cache)
    post = gum.posterior_results(
        num_traces=500, observe={"obs0": 2.0, "obs1": 3.0},
        inference_engine=pp.InferenceEngine.LAPLACE,
    )
    assert len(_laplace_cache) == n  # same name-set: no rebuild
    # observations are traced arguments: new values, correct posterior
    assert abs(float(post.mean) - (1.0 / 5 + 2.5 / 1) / (1 / 5 + 1 / 1)) < 0.1
