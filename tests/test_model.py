"""Model API tests (reference: tests/test_model.py:45-372): prior moments,
on-disk Empirical append, trace-length stats, MCMC stop/resume via
initial_trace, online thinning, ConditionalModel acceptance."""

import math

import numpy as np
import pytest

import pyprob_tpu as pp
from pyprob_tpu.distributions import Normal, Uniform, Empirical


class GUM(pp.Model):
    def __init__(self):
        super().__init__(name="Gaussian with unknown mean")

    def forward(self):
        mu = pp.sample(Normal(1.0, math.sqrt(5.0)))
        likelihood = Normal(mu, math.sqrt(2.0))
        pp.observe(likelihood, name="obs0")
        pp.observe(likelihood, name="obs1")
        return mu


class GUMMarsaglia(pp.Model):
    def __init__(self, replace=False):
        super().__init__(name="GUM (Marsaglia)")
        self._replace = replace

    def marsaglia(self, mean, stddev):
        uniform = Uniform(-1.0, 1.0)
        while True:
            x = pp.sample(uniform)
            y = pp.sample(uniform)
            s = float(x) * float(x) + float(y) * float(y)
            if s < 1:
                return mean + stddev * (
                    float(x) * math.sqrt(-2 * math.log(s) / s)
                )

    def forward(self):
        mu = self.marsaglia(1.0, math.sqrt(5.0))
        likelihood = Normal(mu, math.sqrt(2.0))
        pp.observe(likelihood, name="obs0")
        pp.observe(likelihood, name="obs1")
        return mu


def test_prior_moments():
    m = GUM()
    prior = m.prior_results(num_traces=2000)
    assert abs(float(prior.mean) - 1.0) < 0.25
    assert abs(float(prior.stddev) - math.sqrt(5.0)) < 0.25


def test_prior_on_disk_append(tmp_path):
    # (reference: tests/test_model.py:59-77)
    fn = str(tmp_path / "prior_file")
    m = GUM()
    p1 = m.prior_results(num_traces=100, file_name=fn)
    assert p1.length == 100
    p1.close()
    p2 = m.prior_results(num_traces=100, file_name=fn)
    assert p2.length == 200
    p2.close()


def test_marsaglia_trace_lengths():
    # 100k-run reference constants: controlled mean 2.563, stddev 1.208
    # (reference: tests/test_model.py:80-83)
    m = GUMMarsaglia()
    lens = [m.sample().length_controlled for _ in range(3000)]
    assert abs(np.mean(lens) - 2.563) < 0.15
    assert abs(np.std(lens) - 1.208) < 0.15


def test_posterior_importance_sampling():
    m = GUM()
    post = m.posterior_results(num_traces=4000, observe={"obs0": 8, "obs1": 9})
    assert abs(float(post.mean) - 7.25) < 0.75
    assert abs(float(post.stddev) - math.sqrt(1 / 1.2)) < 0.75
    assert post.effective_sample_size > 0.005 * 4000


def test_posterior_lmh():
    m = GUM()
    post = m.posterior_results(
        num_traces=3000,
        inference_engine=pp.InferenceEngine.LIGHTWEIGHT_METROPOLIS_HASTINGS,
        observe={"obs0": 8, "obs1": 9},
    )[500:]
    assert abs(float(post.mean) - 7.25) < 0.75
    assert abs(float(post.stddev) - math.sqrt(1 / 1.2)) < 0.75


def test_posterior_rmh():
    m = GUM()
    post = m.posterior_results(
        num_traces=3000,
        inference_engine=pp.InferenceEngine.RANDOM_WALK_METROPOLIS_HASTINGS,
        observe={"obs0": 8, "obs1": 9},
    )[500:]
    assert abs(float(post.mean) - 7.25) < 0.75
    assert abs(float(post.stddev) - math.sqrt(1 / 1.2)) < 0.75


def test_mcmc_stop_resume():
    # (reference: tests/test_model.py:98-128)
    m = GUM()
    observe = {"obs0": 8, "obs1": 9}
    engine = pp.InferenceEngine.RANDOM_WALK_METROPOLIS_HASTINGS
    post1 = m.posterior(num_traces=1000, inference_engine=engine, observe=observe)
    last_trace = post1[-1]
    post2 = m.posterior(
        num_traces=1000,
        inference_engine=engine,
        observe=observe,
        initial_trace=last_trace,
    )
    combined = Empirical(concat_empiricals=[post1, post2])
    vals = [t.result for t in combined.get_values()[500:]]
    assert abs(float(np.mean(vals)) - 7.25) < 0.8


def test_mcmc_thinning():
    m = GUM()
    post = m.posterior(
        num_traces=1000,
        inference_engine=pp.InferenceEngine.LIGHTWEIGHT_METROPOLIS_HASTINGS,
        observe={"obs0": 8, "obs1": 9},
        thinning_steps=10,
    )
    assert post.length == 100


def test_marsaglia_posterior_rmh():
    m = GUMMarsaglia()
    post = m.posterior_results(
        num_traces=3000,
        inference_engine=pp.InferenceEngine.RANDOM_WALK_METROPOLIS_HASTINGS,
        observe={"obs0": 8, "obs1": 9},
    )[500:]
    assert abs(float(post.mean) - 7.25) < 0.8


def test_conditional_model():
    # (reference: tests/test_model.py:345-372)
    class Base(pp.Model):
        def forward(self):
            x = pp.sample(Uniform(0.0, 1.0))
            return float(x)

    base = Base()
    cond = base.condition(lambda trace: trace.result > 0.8)
    prior = cond.prior_results(num_traces=200)
    vals = np.asarray(prior.get_values())
    assert (vals > 0.8).all()
    assert 0.05 < cond.acceptance_ratio < 0.45


def test_conditional_model_timeout():
    class Base(pp.Model):
        def forward(self):
            return float(pp.sample(Uniform(0.0, 1.0)))

    cond = Base().condition(lambda trace: False, criterion_timeout=50)
    with pytest.raises(RuntimeError):
        cond.prior_results(num_traces=1)


def test_model_sample_returns_trace():
    m = GUM()
    t = m.sample()
    assert t.length_controlled == 1
    assert np.isfinite(float(t.result))


def test_posterior_predictive():
    """Beyond parity: pin posterior latents, sample observes fresh.
    Predictive of obs0 for GUM is N(7.25, 1/1.2 + 2)."""
    import math

    import numpy as np

    from pyprob_tpu.distributions import Normal

    class GUM2(pp.Model):
        def forward(self):
            mu = pp.sample(Normal(1.0, math.sqrt(5.0)))
            lik = Normal(mu, math.sqrt(2.0))
            pp.observe(lik, name="obs0")
            pp.observe(lik, name="obs1")
            return mu

    m = GUM2()
    post = m.posterior(
        num_traces=20000, observe={"obs0": 8.0, "obs1": 9.0},
        vectorized=True,
    )
    pred = m.posterior_predictive(post, num_traces=3000)
    obs_vals = []
    for i in range(pred.length):
        t = pred._get_value(i)
        for v in t.variables:
            if v.name == "obs0":
                obs_vals.append(float(np.asarray(v.value)))
    obs_vals = np.asarray(obs_vals)
    assert len(obs_vals) == 3000
    assert abs(obs_vals.mean() - 7.25) < 0.2
    assert abs(obs_vals.std() - math.sqrt(1 / 1.2 + 2.0)) < 0.15
    # results-valued posteriors are rejected with a pointer
    import pytest

    with pytest.raises(RuntimeError, match="trace-valued"):
        m.posterior_predictive(
            m.posterior_results(
                num_traces=100, observe={"obs0": 8.0, "obs1": 9.0},
                vectorized=True,
            ),
            num_traces=10,
        )
