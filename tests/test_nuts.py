"""NO_U_TURN_SAMPLER engine (beyond parity, pyprob_tpu/inference/nuts.py):
posterior correctness vs analytic ground truth, dynamic tree depth,
mass-matrix warmup on ill-scaled posteriors, support transforms, R-hat
over chains, and the discrete/untraceable errors."""

import math

import numpy as np
import pytest

import pyprob_tpu as pp
from pyprob_tpu.distributions import Normal, Uniform, Categorical

NUTS = pp.InferenceEngine.NO_U_TURN_SAMPLER


class GUM(pp.Model):
    def forward(self):
        mu = pp.sample(Normal(1.0, math.sqrt(5.0)))
        lik = Normal(mu, math.sqrt(2.0))
        pp.observe(lik, name="obs0")
        pp.observe(lik, name="obs1")
        return mu


GUM_OBS = {"obs0": 8.0, "obs1": 9.0}


def test_nuts_gum_posterior():
    post = GUM().posterior_results(
        num_traces=20000, observe=GUM_OBS, inference_engine=NUTS
    )
    assert abs(float(post.mean) - 7.25) < 0.1
    assert abs(float(post.stddev) - math.sqrt(1 / 1.2)) < 0.1
    md = post.metadata[-1]
    assert 0.6 < md["acceptance_rate"] <= 1.0
    assert md["final_step_size"] > 0
    # trajectory length is chosen by the U-turn criterion, not a knob
    assert 1.0 <= md["mean_tree_depth"] <= md["max_tree_depth"]
    assert md["divergences"] >= 0


class Hierarchy(pp.Model):
    """Correlated posterior: gradients flow through dependent sites."""

    def forward(self):
        x1 = pp.sample(Normal(0.0, 1.0))
        x2 = pp.sample(Normal(x1, 1.0))
        pp.observe(Normal(x2, 1.0), name="y")
        return x1


def test_nuts_hierarchical_correlated():
    post = Hierarchy().posterior_results(
        num_traces=20000, observe={"y": 3.0}, inference_engine=NUTS
    )
    # x1 | y=3 is N(1, 2/3)
    assert abs(float(post.mean) - 1.0) < 0.08
    assert abs(float(post.variance) - 2 / 3) < 0.08


class TwoScale(pp.Model):
    """Latent scales 100x apart: needs the Welford mass matrix."""

    def forward(self):
        import jax.numpy as jnp

        a = pp.sample(Normal(0.0, 10.0))
        b = pp.sample(Normal(0.0, 0.1))
        pp.observe(Normal(a, 10.0), name="ya")
        pp.observe(Normal(b, 0.1), name="yb")
        return jnp.stack([a, b])


def test_nuts_mass_matrix_two_scale():
    post = TwoScale().posterior_results(
        num_traces=20000,
        observe={"ya": 6.0, "yb": 0.12},
        inference_engine=NUTS,
        burn_in=400,
    )
    mean = np.asarray(post.mean, dtype=np.float64)
    std = np.asarray(post.stddev, dtype=np.float64)
    # analytic: a|ya ~ N(3, 50), b|yb ~ N(0.06, 0.005)
    assert abs(mean[0] - 3.0) < 0.5
    assert abs(mean[1] - 0.06) < 0.02
    assert abs(std[0] - math.sqrt(50.0)) < 0.6
    assert abs(std[1] - math.sqrt(0.005)) < 0.01


class UniformGUM(pp.Model):
    def forward(self):
        mu = pp.sample(Uniform(0.0, 20.0))
        lik = Normal(mu, math.sqrt(2.0))
        pp.observe(lik, name="obs0")
        pp.observe(lik, name="obs1")
        return mu


def test_nuts_bounded_support():
    post = UniformGUM().posterior_results(
        num_traces=20000, observe=GUM_OBS, inference_engine=NUTS
    )
    assert abs(float(post.mean) - 8.5) < 0.12
    assert abs(float(post.stddev) - 1.0) < 0.12
    vals = np.asarray(post.get_values(), dtype=np.float64)
    assert vals.min() > 0.0 and vals.max() < 20.0


def test_nuts_knobs_and_chains_rhat():
    from pyprob_tpu.diagnostics import gelman_rubin_values

    chains = GUM().posterior_results(
        num_traces=8000,
        observe=GUM_OBS,
        inference_engine=NUTS,
        num_chains=8,
        burn_in=200,
        max_tree_depth=6,
        target_accept=0.9,
        step_size=0.5,
        return_chains=True,
    )
    assert len(chains) == 8
    iters, rhats = gelman_rubin_values(chains)
    assert float(np.asarray(rhats)[-1]) < 1.1


def test_nuts_enumerates_discrete_sites():
    """Bernoulli indicator marginalized out of the NUTS potential."""
    from pyprob_tpu.distributions import Bernoulli

    class BernMix(pp.Model):
        def forward(self):
            mu = pp.sample(Normal(0.0, 5.0))
            b = pp.sample(Bernoulli(0.3))
            pp.observe(Normal(mu + 3.0 * b, 1.0), name="y")
            return mu

    m = BernMix()
    ref = m.posterior_results(
        num_traces=400000, observe={"y": 2.0}, vectorized=True
    )
    post = m.posterior_results(
        num_traces=20000, observe={"y": 2.0}, inference_engine=NUTS
    )
    assert abs(float(post.mean) - float(ref.mean)) < 0.12
    assert abs(float(post.stddev) - float(ref.stddev)) < 0.12


class Disc(pp.Model):
    def forward(self):
        k = pp.sample(Categorical(probs=[0.5, 0.5]))
        pp.observe(Normal(1.0 * k, 1.0), name="y")
        return k


def test_nuts_all_discrete_raises():
    with pytest.raises(RuntimeError, match="no continuous latent"):
        Disc().posterior_results(
            num_traces=100, observe={"y": 1.0}, inference_engine=NUTS
        )


class NotTraceable(pp.Model):
    def forward(self):
        while True:
            x = pp.sample(Uniform(0.0, 1.0))
            if float(x) < 0.5:
                break
        pp.observe(Normal(float(x), 1.0), name="y")
        return x


def test_nuts_untraceable_raises():
    with pytest.raises(RuntimeError, match="jax-traceable"):
        NotTraceable().posterior(
            num_traces=100, observe={"y": 0.1}, inference_engine=NUTS
        )
