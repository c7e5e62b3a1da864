"""State/handler tests: address extraction, factor conditioning equivalence,
prior inflation (reference: tests/test_state.py:19-216)."""

import math

import numpy as np
import pytest

import pyprob_tpu as pp
from pyprob_tpu import state
from pyprob_tpu.distributions import Normal, Uniform, Categorical, Factor


def test_state_address_format():
    # Address format: {lineno}__{chain}__{DistSuffix}__{instance} with the
    # assignment-target variable name extracted from source text (unlike the
    # reference's bytecode-offset scheme, this is interpreter-stable).
    class AddrModel(pp.Model):
        def forward(self):
            address = pp.sample(Normal(0.0, 1.0))
            return address

    trace = AddrModel().sample()
    addr = trace.variables[0].address
    parts = addr.split("__")
    assert parts[-2] == "Normal"
    assert parts[-1] == "1"
    assert "address" in parts  # assignment-target name captured
    assert "forward" in parts


def test_outside_trace_sample():
    # sample outside a model context draws from the prior directly
    v = pp.sample(Normal(3.0, 0.0001))
    assert abs(float(v) - 3.0) < 0.1


class GaussianObserve(pp.Model):
    def forward(self):
        mu = pp.sample(Normal(1.0, math.sqrt(5.0)))
        pp.observe(Normal(mu, math.sqrt(2.0)), name="obs0")
        return mu


class GaussianFactor(pp.Model):
    def __init__(self):
        super().__init__()
        self.obs0 = 8.0

    def forward(self):
        mu = pp.sample(Normal(1.0, math.sqrt(5.0)))
        pp.factor(log_prob=float(Normal(mu, math.sqrt(2.0)).log_prob(self.obs0)))
        return mu


def test_factor_conditioning_equivalence():
    # factor-based soft conditioning == observe conditioning
    # (reference: tests/test_state.py:29-160)
    m1 = GaussianObserve()
    p1 = m1.posterior_results(num_traces=4000, observe={"obs0": 8.0})
    m2 = GaussianFactor()
    p2 = m2.posterior_results(num_traces=4000)
    assert abs(float(p1.mean) - float(p2.mean)) < 0.5
    assert abs(float(p1.stddev) - float(p2.stddev)) < 0.5


def test_factor_func():
    class FactorFuncModel(pp.Model):
        def forward(self):
            mu = pp.sample(Normal(0.0, 1.0))
            pp.factor(log_prob_func=lambda _: -float(mu) ** 2)
            return mu

    m = FactorFuncModel()
    post = m.posterior_results(num_traces=2000)
    # posterior \propto N(0,1) * exp(-mu^2) = N(0, 1/3)
    assert abs(float(post.mean)) < 0.2
    assert abs(float(post.stddev) - math.sqrt(1.0 / 3.0)) < 0.15


def test_prior_inflation():
    # (reference: tests/test_state.py:163-216)
    class InflModel(pp.Model):
        def forward(self):
            a = pp.sample(Normal(0.0, 1.0))
            b = pp.sample(Categorical(probs=[0.9, 0.05, 0.05]))
            return a, b

    m = InflModel()
    prior_infl = m.prior(
        num_traces=3000, prior_inflation=pp.PriorInflation.ENABLED
    )
    a_vals = np.asarray([float(t.variables[0].value) for t in prior_infl.get_values()])
    b_vals = np.asarray([float(t.variables[1].value) for t in prior_infl.get_values()])
    # Normal stddev inflated 3x
    assert abs(a_vals.std() - 3.0) < 0.3
    # Categorical flattened to uniform
    freq = np.bincount(b_vals.astype(np.int64), minlength=3) / len(b_vals)
    assert np.allclose(freq, 1.0 / 3.0, atol=0.05)
    # importance weights correct the inflation: posterior == true prior stats
    post = m.posterior(
        num_traces=4000, prior_inflation=pp.PriorInflation.ENABLED
    )
    # hack: prior inflation applies in POSTERIOR+IS mode through _inflate
    a_mean = post.map(lambda t: float(t.variables[0].value)).mean
    assert abs(float(a_mean)) < 0.2


def test_likelihood_importance():
    m = GaussianObserve()
    trace = next(
        m._trace_generator(
            trace_mode=pp.TraceMode.POSTERIOR,
            inference_engine=pp.InferenceEngine.IMPORTANCE_SAMPLING,
            observe={"obs0": 8.0},
            likelihood_importance=0.5,
        )
    )
    v = trace.variables_observed[0]
    full_lp = float(v.distribution.log_prob(v.value, sum=True))
    assert np.isclose(float(v.log_prob), 0.5 * full_lp)
