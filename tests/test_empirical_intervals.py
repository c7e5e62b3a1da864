"""Empirical.quantile and Empirical.hpd_interval (beyond parity — the
reference's Empirical stops at mode/median/min/max,
reference: pyprob/distributions/empirical.py:663-793)."""

import math

import numpy as np
import pytest

import pyprob_tpu as pp
from pyprob_tpu.distributions import Empirical, Gamma, Normal


def test_quantile_uniform_weights():
    rng = np.random.default_rng(0)
    xs = rng.normal(2.0, 3.0, size=200000)
    emp = Empirical.from_arrays(xs, np.zeros(len(xs)))
    assert abs(emp.quantile(0.5) - 2.0) < 0.05
    assert abs(emp.quantile(0.975) - (2.0 + 1.95996 * 3.0)) < 0.1
    qs = emp.quantile([0.25, 0.5, 0.75])
    assert qs.shape == (3,)
    assert qs[0] < qs[1] < qs[2]
    assert abs(qs[0] - (2.0 - 0.67449 * 3.0)) < 0.1
    with pytest.raises(ValueError):
        emp.quantile(1.5)


def test_quantile_weighted_importance():
    # prior N(0, 3) draws reweighted to the posterior N(2, 1):
    # weighted quantiles must match the reweighted target
    rng = np.random.default_rng(1)
    xs = rng.normal(0.0, 3.0, size=400000)
    lw = (
        -0.5 * (xs - 2.0) ** 2
        + 0.5 * (xs / 3.0) ** 2
    )
    emp = Empirical.from_arrays(xs, lw)
    assert abs(emp.quantile(0.5) - 2.0) < 0.05
    assert abs(emp.quantile(0.841345) - 3.0) < 0.1  # +1 sigma


def test_hpd_symmetric_matches_central():
    rng = np.random.default_rng(2)
    xs = rng.normal(0.0, 1.0, size=200000)
    emp = Empirical.from_arrays(xs, np.zeros(len(xs)))
    lo, hi = emp.hpd_interval(0.9)
    # symmetric posterior: HPD == equal-tailed == +-1.6449
    assert abs(lo + 1.6449) < 0.05
    assert abs(hi - 1.6449) < 0.05
    # covered mass
    assert abs(((xs >= lo) & (xs <= hi)).mean() - 0.9) < 0.01


def test_hpd_skewed_shorter_than_equal_tailed():
    rng = np.random.default_rng(3)
    xs = rng.gamma(2.0, 1.0, size=200000)  # skewed right
    emp = Empirical.from_arrays(xs, np.zeros(len(xs)))
    lo, hi = emp.hpd_interval(0.9)
    eq_lo, eq_hi = emp.quantile(0.05), emp.quantile(0.95)
    assert hi - lo < eq_hi - eq_lo  # strictly shorter on a skewed posterior
    assert abs(((xs >= lo) & (xs <= hi)).mean() - 0.9) < 0.01
    # the HPD of Gamma(2,1) starts near 0.06 (density-level cut), far
    # below the 5% quantile ~0.355
    assert lo < 0.2
    with pytest.raises(ValueError):
        emp.hpd_interval(1.5)


def test_quantile_hpd_on_posterior():
    # end-to-end: GUM posterior N(7.25, 0.913)
    class GUM(pp.Model):
        def forward(self):
            mu = pp.sample(Normal(1.0, math.sqrt(5.0)))
            lik = Normal(mu, math.sqrt(2.0))
            pp.observe(lik, name="obs0")
            pp.observe(lik, name="obs1")
            return mu

    post = GUM().posterior_results(
        num_traces=200000, observe={"obs0": 8.0, "obs1": 9.0}
    )
    sd = math.sqrt(1 / 1.2)
    assert abs(post.quantile(0.5) - 7.25) < 0.05
    lo, hi = post.hpd_interval(0.95)
    assert abs(lo - (7.25 - 1.95996 * sd)) < 0.1
    assert abs(hi - (7.25 + 1.95996 * sd)) < 0.1
