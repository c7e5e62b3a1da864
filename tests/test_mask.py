"""observe(..., mask=) — masked observations (beyond parity).

A masked-off observe contributes nothing to the trace density or
importance weight, so variable-length observation sequences can be
written as fixed-bound loops — which is what makes them compilable on
the vectorized tier (the reference runs such models one trace at a time
because their trace shape is data-dependent).
"""

import math

import numpy as np
import jax.numpy as jnp
import pytest

import pyprob_tpu as pp
from pyprob_tpu.distributions import Normal, Categorical
from pyprob_tpu.vectorized import _TraceabilityCache

PRIOR_MEAN, PRIOR_STD = 1.0, math.sqrt(5.0)
LIK_STD = math.sqrt(2.0)
OBS = [8.0, 9.0, 7.0]
MAX_N = 3


class VarLenCompiled(pp.Model):
    """n ~ Uniform{1..3}; mu ~ Normal; the first n of MAX_N observations
    apply — written as a fixed-bound masked loop, so it compiles."""

    def forward(self):
        n = pp.sample(Categorical(probs=jnp.ones(MAX_N) / MAX_N)) + 1
        mu = pp.sample(Normal(PRIOR_MEAN, PRIOR_STD))
        lik = Normal(mu, LIK_STD)
        for t in range(MAX_N):
            pp.observe(lik, name=f"obs{t}", mask=t < n)
        return mu


class VarLenInterpreter(pp.Model):
    """Same model written reference-style (data-dependent trace shape)."""

    _never_vectorize = True

    def forward(self):
        n = int(pp.sample(Categorical(probs=np.ones(MAX_N) / MAX_N))) + 1
        mu = pp.sample(Normal(PRIOR_MEAN, PRIOR_STD))
        lik = Normal(mu, LIK_STD)
        for t in range(n):
            pp.observe(lik, name=f"obs{t}")
        return mu


def _analytic_mixture():
    """Posterior over mu = sum_n p(n) p(y_1..n | n) N(mu; m_n, s_n)."""
    comps, log_ws = [], []
    for n in range(1, MAX_N + 1):
        ys = OBS[:n]
        # sequential conjugate update + marginal likelihood
        m, v = PRIOR_MEAN, PRIOR_STD**2
        log_ml = 0.0
        for y in ys:
            log_ml += float(
                -0.5 * math.log(2 * math.pi * (v + LIK_STD**2))
                - 0.5 * (y - m) ** 2 / (v + LIK_STD**2)
            )
            post_v = 1.0 / (1.0 / v + 1.0 / LIK_STD**2)
            m = post_v * (m / v + y / LIK_STD**2)
            v = post_v
        comps.append((m, math.sqrt(v)))
        log_ws.append(math.log(1.0 / MAX_N) + log_ml)
    ws = np.exp(np.asarray(log_ws) - max(log_ws))
    ws /= ws.sum()
    mean = sum(w * m for w, (m, s) in zip(ws, comps))
    second = sum(w * (s * s + m * m) for w, (m, s) in zip(ws, comps))
    return mean, math.sqrt(second - mean**2), ws


OBSERVE = {f"obs{t}": OBS[t] for t in range(MAX_N)}
TRUE_MEAN, TRUE_STD, TRUE_WS = _analytic_mixture()


def test_compiled_masked_posterior_matches_analytic():
    m = VarLenCompiled()
    post = m.posterior_results(
        num_traces=200000, observe=OBSERVE, vectorized=True
    )
    assert _TraceabilityCache._cache.get(type(m)) is True
    assert abs(float(post.mean) - TRUE_MEAN) < 0.1
    assert abs(float(post.stddev) - TRUE_STD) < 0.1


def test_two_tiers_agree():
    c = VarLenCompiled()
    i = VarLenInterpreter()
    pc = c.posterior_results(num_traces=100000, observe=OBSERVE, vectorized=True)
    pi = i.posterior_results(num_traces=8000, observe=OBSERVE)
    assert abs(float(pc.mean) - float(pi.mean)) < 0.25
    assert abs(float(pi.mean) - TRUE_MEAN) < 0.25


def test_interpreter_mask_weight_accounting():
    # the trace importance weight must equal the sum of ACTIVE observe lps
    class TwoObs(pp.Model):
        _never_vectorize = True

        def forward(self):
            mu = pp.sample(Normal(0.0, 1.0))
            pp.observe(Normal(mu, 1.0), name="a", mask=True)
            pp.observe(Normal(mu, 1.0), name="b", mask=False)
            return mu

    m = TwoObs()
    traces = m.posterior(num_traces=20, observe={"a": 0.5, "b": 99.0})
    for i in range(traces.length):
        t = traces._get_value(i)
        lp_a = float(t.named_variables["a"].log_prob)
        lp_b = float(t.named_variables["b"].log_prob)
        assert lp_b == 0.0  # masked off, despite the absurd observed value
        assert abs(float(t.log_importance_weight) - lp_a) < 1e-6


def test_masked_factor():
    class F(pp.Model):
        def forward(self):
            mu = pp.sample(Normal(0.0, 1.0))
            pp.factor(log_prob=-50.0, mask=mu > 100.0)  # never active here
            pp.observe(Normal(mu, 1.0), name="a")
            return mu

    m = F()
    post = m.posterior_results(
        num_traces=50000, observe={"a": 1.0}, vectorized=True
    )
    # inactive factor: plain conjugate posterior N(0.5, sqrt(0.5))
    assert abs(float(post.mean) - 0.5) < 0.05


def test_smc_masked_stages():
    m = VarLenCompiled()
    post = m.posterior_results(
        num_traces=50000,
        observe=OBSERVE,
        inference_engine=pp.InferenceEngine.SEQUENTIAL_MONTE_CARLO,
    )
    assert abs(float(post.mean) - TRUE_MEAN) < 0.15


def test_nuts_enumerates_mask_selector():
    # the mask depends on an enumerable discrete latent: gradient engines
    # marginalize n and the masked observe terms enter each branch
    m = VarLenCompiled()
    post = m.posterior_results(
        num_traces=4000,
        observe=OBSERVE,
        inference_engine=pp.InferenceEngine.NO_U_TURN_SAMPLER,
        num_chains=16,
    )
    assert abs(float(post.mean) - TRUE_MEAN) < 0.25
    assert abs(float(post.stddev) - TRUE_STD) < 0.25
