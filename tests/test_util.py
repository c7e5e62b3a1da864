"""Seeding/determinism and substrate helper tests
(reference: tests/test_util.py:12-30)."""

import math

import numpy as np

import pyprob_tpu as pp
from pyprob_tpu import util
from pyprob_tpu.distributions import Normal, Categorical, Empirical


def test_seed_determinism_interpreter():
    pp.seed(42)
    a = [float(pp.sample(Normal(0.0, 1.0))) for _ in range(5)]
    pp.seed(42)
    b = [float(pp.sample(Normal(0.0, 1.0))) for _ in range(5)]
    assert a == b
    pp.seed(43)
    c = [float(pp.sample(Normal(0.0, 1.0))) for _ in range(5)]
    assert a != c


def test_seed_determinism_compiled():
    from pyprob_tpu.models import GaussianUnknownMean

    m = GaussianUnknownMean()
    pp.seed(42)
    p1 = m.posterior_results(500, observe={"obs0": 8, "obs1": 9}, vectorized=True)
    pp.seed(42)
    p2 = m.posterior_results(500, observe={"obs0": 8, "obs1": 9}, vectorized=True)
    assert np.isclose(float(p1.mean), float(p2.mean))
    pp.seed(7)
    p3 = m.posterior_results(500, observe={"obs0": 8, "obs1": 9}, vectorized=True)
    assert not np.isclose(float(p1.mean), float(p3.mean))


def test_effective_sample_size():
    assert np.isclose(util.effective_sample_size(np.zeros(10)), 10.0)
    assert np.isclose(
        util.effective_sample_size(np.array([0.0, -1e9])), 1.0, atol=1e-6
    )
    # scale invariance in log space
    lw = np.random.default_rng(0).normal(size=100)
    assert np.isclose(
        util.effective_sample_size(lw), util.effective_sample_size(lw + 5.0)
    )


def test_safe_log_and_guards():
    assert util.safe_log(0.0) == -np.inf
    assert util.has_nan_or_inf([1.0, np.nan])
    assert util.has_nan_or_inf([np.inf])
    assert not util.has_nan_or_inf([1.0, 2.0])
    out = util.replace_negative_inf([1.0, -np.inf])
    assert np.isfinite(out).all()
    p = util.clamp_probs(np.array([0.0, 0.5, 1.0]))
    assert (p > 0).all() and (p < 1).all()


def test_empirical_to_categorical():
    e = Empirical(values=[0, 1, 1, 2], log_weights=[0.0, 0.0, 0.0, 0.0])
    cat, values = util.empirical_to_categorical(e)
    assert isinstance(cat, Categorical)
    probs = {v: float(p) for v, p in zip(values, np.asarray(cat.probs))}
    assert np.isclose(probs[1], 0.5)


def test_utils_alias_package():
    from pyprob_tpu import utils

    assert utils.effective_sample_size is util.effective_sample_size
