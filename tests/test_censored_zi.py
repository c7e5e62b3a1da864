"""Censored and ZeroInflated observation wrappers (beyond parity,
pyprob_tpu/distributions/censored.py, zero_inflated.py): probability
accounting, cross-backend/jit agreement, and end-to-end Tobit /
zero-inflated-Poisson inference against grid-integration ground truth."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.stats import norm, poisson

import pyprob_tpu as pp
from pyprob_tpu.distributions import (
    Censored, ZeroInflated, Normal, Poisson, Exponential, Gamma,
)


def test_censored_normal_probability_accounting():
    c = Censored(Normal(0.0, 1.0), lower=-1.0, upper=1.5)
    rng = np.random.default_rng(0)
    s = np.asarray(c.sample(rng, (200000,)), dtype=np.float64)
    assert abs(np.mean(s <= -1.0) - norm.cdf(-1)) < 0.005
    assert abs(np.mean(s >= 1.5) - norm.sf(1.5)) < 0.005
    assert s.min() >= -1.0 and s.max() <= 1.5
    # bound atoms carry the tail mass; interior keeps the density
    assert abs(float(c.log_prob(-1.0)) - math.log(norm.cdf(-1))) < 1e-5
    assert abs(float(c.log_prob(1.5)) - math.log(norm.sf(1.5))) < 1e-4
    assert abs(float(c.log_prob(0.3)) - norm.logpdf(0.3)) < 1e-5
    # interior integral + atoms = 1
    xs = np.linspace(-0.9999, 1.4999, 100001)
    interior = np.trapezoid(
        np.exp(np.asarray(c.log_prob(xs), dtype=np.float64)), xs
    )
    assert abs(interior + norm.cdf(-1) + norm.sf(1.5) - 1.0) < 1e-3
    # cdf saturates at the bounds
    assert float(c.cdf(-1.01)) == 0.0
    assert float(c.cdf(1.5)) == 1.0


def test_censored_one_sided_and_positive_base():
    c = Censored(Exponential(2.0), upper=1.0)
    rng = np.random.default_rng(1)
    s = np.asarray(c.sample(rng, (100000,)), dtype=np.float64)
    assert abs(np.mean(s >= 1.0) - math.exp(-2.0)) < 0.005
    assert abs(float(c.log_prob(1.0)) - (-2.0)) < 1e-4
    with pytest.raises(ValueError, match="at least one"):
        Censored(Normal(0.0, 1.0))


def test_censored_jit_cross_backend():
    c = Censored(Normal(0.0, 1.0), lower=-1.0, upper=1.5)
    x = np.array([-1.0, 0.3, 1.5])
    lp_np = np.asarray(c.log_prob(x), dtype=np.float64)
    lp_j = np.asarray(
        jax.jit(lambda v: c.log_prob(v))(jnp.asarray(x)), dtype=np.float64
    )
    assert np.allclose(lp_np, lp_j, atol=1e-5)


def test_zero_inflated_poisson_pmf_and_moments():
    z = ZeroInflated(Poisson(3.0), gate=0.4)
    ks = np.arange(0, 40).astype(float)
    total = np.exp(np.asarray(z.log_prob(ks), dtype=np.float64)).sum()
    assert abs(total - 1.0) < 1e-6
    assert abs(float(z.log_prob(0.0)) - math.log(0.4 + 0.6 * math.exp(-3))) < 1e-6
    assert abs(float(z.log_prob(2.0)) - (math.log(0.6) + poisson.logpmf(2, 3))) < 1e-5
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    for s in (z.sample(rng, (200000,)), z.sample(key, (200000,))):
        s = np.asarray(s, dtype=np.float64)
        assert abs(s.mean() - float(z.mean)) < 0.02
        assert abs(s.var() - float(z.variance)) < 0.1
        assert abs(np.mean(s == 0) - (0.4 + 0.6 * math.exp(-3))) < 0.006


class Tobit(pp.Model):
    """Right-censored Gaussian observations (sensor saturating at 1.0)."""

    def forward(self):
        mu = pp.sample(Normal(0.0, 2.0))
        lik = Censored(Normal(mu, 1.0), upper=1.0)
        for i in range(4):
            pp.observe(lik, name=f"y{i}")
        return mu


TOBIT_OBS = {"y0": 0.5, "y1": 1.0, "y2": 1.0, "y3": -0.2}


def _tobit_grid_truth():
    mus = np.linspace(-6, 8, 20001)
    logp = (
        norm.logpdf(mus, 0, 2)
        + norm.logpdf(0.5, mus, 1)
        + norm.logpdf(-0.2, mus, 1)
        + 2 * np.log(norm.sf(1.0, mus, 1))
    )
    w = np.exp(logp - logp.max())
    w /= w.sum()
    mean = float((mus * w).sum())
    std = float(np.sqrt(((mus - mean) ** 2 * w).sum()))
    return mean, std


def test_tobit_inference_vs_grid_truth_is():
    true_mean, true_std = _tobit_grid_truth()
    post = Tobit().posterior_results(
        num_traces=200000, observe=TOBIT_OBS, vectorized=True
    )
    assert abs(float(post.mean) - true_mean) < 0.03
    assert abs(float(post.stddev) - true_std) < 0.03


def test_tobit_inference_vs_grid_truth_nuts():
    """The censored likelihood is differentiable (ndtr-based cdf), so the
    gradient engines handle Tobit models directly."""
    true_mean, true_std = _tobit_grid_truth()
    post = Tobit().posterior_results(
        num_traces=2000, observe=TOBIT_OBS,
        inference_engine=pp.InferenceEngine.NO_U_TURN_SAMPLER,
        num_chains=8,
    )
    vals = np.asarray(post.get_values(), dtype=np.float64)
    assert abs(vals.mean() - true_mean) < 0.07
    assert abs(vals.std() - true_std) < 0.07


def test_zip_rate_inference_vs_grid_truth():
    class ZIP(pp.Model):
        def forward(self):
            lam = pp.sample(Gamma(2.0, 1.0))
            lik = ZeroInflated(Poisson(lam), gate=0.3)
            for i in range(5):
                pp.observe(lik, name=f"y{i}")
            return lam

    ys = [0.0, 4.0, 0.0, 3.0, 5.0]
    obs = {f"y{i}": v for i, v in enumerate(ys)}
    lams = np.linspace(1e-3, 15, 20001)
    logp = (lams).copy() * 0 + np.log(lams) * (2 - 1) - lams  # Gamma(2,1)
    for v in ys:
        if v == 0:
            logp += np.log(0.3 + 0.7 * np.exp(-lams))
        else:
            logp += np.log(0.7) + poisson.logpmf(int(v), lams)
    w = np.exp(logp - logp.max())
    w /= w.sum()
    true_mean = float((lams * w).sum())
    post = ZIP().posterior_results(
        num_traces=200000, observe=obs, vectorized=True
    )
    assert abs(float(post.mean) - true_mean) < 0.05
