"""TEMPERED_SMC engine (beyond parity,
pyprob_tpu/inference/tempered_smc.py): prior-to-posterior annealing with
adaptive temperature selection, HMC rejuvenation, unbiased evidence,
multimodal transport, discrete enumeration, and error paths."""

import math

import numpy as np
import pytest

import pyprob_tpu as pp
from pyprob_tpu.distributions import Normal, Uniform, Categorical

TSMC = pp.InferenceEngine.TEMPERED_SMC


class GUM(pp.Model):
    def forward(self):
        mu = pp.sample(Normal(1.0, math.sqrt(5.0)))
        lik = Normal(mu, math.sqrt(2.0))
        pp.observe(lik, name="obs0")
        pp.observe(lik, name="obs1")
        return mu


GUM_OBS = {"obs0": 8.0, "obs1": 9.0}


def test_tempered_smc_gum_posterior_and_evidence():
    post = GUM().posterior_results(
        num_traces=8000, observe=GUM_OBS, inference_engine=TSMC
    )
    assert abs(float(post.mean) - 7.25) < 0.1
    assert abs(float(post.stddev) - math.sqrt(1 / 1.2)) < 0.1
    # unbiased marginal-likelihood estimate vs the analytic -8.2395
    assert abs(post.log_evidence - (-8.2395)) < 0.15
    md = post.metadata[-1]
    assert md["final_beta"] == 1.0
    assert md["stages"] >= 2  # the ladder was genuinely adaptive
    assert 0.2 < md["acceptance_rate"] <= 1.0


class Hierarchy(pp.Model):
    def forward(self):
        x1 = pp.sample(Normal(0.0, 1.0))
        x2 = pp.sample(Normal(x1, 1.0))
        pp.observe(Normal(x2, 1.0), name="y")
        return x1


def test_tempered_smc_hierarchy_evidence():
    post = Hierarchy().posterior_results(
        num_traces=8000, observe={"y": 2.0}, inference_engine=TSMC
    )
    assert abs(float(post.mean) - 2.0 / 3.0) < 0.08
    # y ~ N(0, 3) at 2 -> log Z = -2.135
    assert abs(post.log_evidence - (-2.135)) < 0.1


class Bimodal(pp.Model):
    """Modes at ±4 behind a ~128-nat valley: the anneal keeps particles
    in both basins and reweights them to the right proportions."""

    def forward(self):
        mu = pp.sample(Normal(0.0, 3.0))
        pp.observe(Normal(mu * mu, 1.0), name="y")
        return mu


def test_tempered_smc_multimodal_transport():
    post = Bimodal().posterior_results(
        num_traces=8000, observe={"y": 16.0}, inference_engine=TSMC
    )
    vals = np.asarray(post.get_values(), dtype=np.float64)
    assert abs(float(np.mean(np.abs(vals))) - 4.0) < 0.15
    frac_pos = float(np.mean(vals > 0))
    assert 0.3 < frac_pos < 0.7


def test_tempered_smc_enumerates_discrete_sites():
    import jax.numpy as jnp

    class Mix(pp.Model):
        def forward(self):
            mu = pp.sample(Normal(0.0, 5.0))
            k = pp.sample(Categorical([0.5, 0.5]))
            shift = jnp.where(k == 0, -2.0, 2.0)
            pp.observe(Normal(mu + shift, 1.0), name="y")
            return mu

    m = Mix()
    ref = m.posterior_results(
        num_traces=400000, observe={"y": 1.0}, vectorized=True
    )
    post = m.posterior_results(
        num_traces=8000, observe={"y": 1.0}, inference_engine=TSMC
    )
    assert abs(float(post.mean) - float(ref.mean)) < 0.12
    assert abs(float(post.stddev) - float(ref.stddev)) < 0.12


def test_tempered_smc_knobs_and_mesh():
    import jax
    from pyprob_tpu.parallel import data_parallel_mesh

    mesh = data_parallel_mesh(len(jax.devices()))
    post = GUM().posterior_results(
        num_traces=4000,
        observe=GUM_OBS,
        inference_engine=TSMC,
        resample_threshold=0.7,
        rejuvenation_steps=3,
        leapfrog_steps=5,
        mesh=mesh,
    )
    assert abs(float(post.mean) - 7.25) < 0.15
    md = post.metadata[-1]
    assert md["rejuvenation_steps"] == 3
    assert md["leapfrog_steps"] == 5


class NotTraceable(pp.Model):
    def forward(self):
        while True:
            x = pp.sample(Uniform(0.0, 1.0))
            if float(x) < 0.5:
                break
        pp.observe(Normal(float(x), 1.0), name="y")
        return x


def test_tempered_smc_untraceable_raises():
    with pytest.raises(RuntimeError, match="jax-traceable"):
        NotTraceable().posterior(
            num_traces=100, observe={"y": 0.1}, inference_engine=TSMC
        )


def test_tempered_smc_requires_observe():
    with pytest.raises(RuntimeError, match="observe"):
        GUM().posterior(num_traces=100, inference_engine=TSMC)


def test_tempered_smc_discrete_dependent_continuous():
    """Regression: continuous-site parameters depending on the
    enumerated discrete latent; evidence vs the analytic mixture
    marginal log p(y) = log sum_d p(d) N(y; mu_d, 1.25) = -2.984."""
    import jax.numpy as jnp

    class DepMix(pp.Model):
        def forward(self):
            d = pp.sample(Categorical([0.3, 0.7]))
            centers = jnp.asarray([-3.0, 3.0])
            x = pp.sample(Normal(centers[d], 1.0))
            pp.observe(Normal(x, 0.5), name="y")
            return x

    m = DepMix()
    ref = m.posterior_results(
        num_traces=400000, observe={"y": 1.0}, vectorized=True
    )
    post = m.posterior_results(
        num_traces=12000, observe={"y": 1.0}, inference_engine=TSMC
    )
    assert abs(float(post.mean) - float(ref.mean)) < 0.1
    assert abs(float(post.stddev) - float(ref.stddev)) < 0.1
    assert abs(post.log_evidence - (-2.984)) < 0.12
