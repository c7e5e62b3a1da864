"""PARALLEL_TEMPERING engine (beyond parity, pyprob_tpu/inference/pt.py):
mode-hopping on multimodal posteriors no other engine's chains can cross,
unimodal correctness vs analytic ground truth, swap-rate metadata, and
the discrete/untraceable errors."""

import math

import numpy as np
import pytest

import pyprob_tpu as pp
from pyprob_tpu.distributions import Normal, Uniform, Categorical

PT = pp.InferenceEngine.PARALLEL_TEMPERING
HMC = pp.InferenceEngine.HAMILTONIAN_MONTE_CARLO


class Bimodal(pp.Model):
    """y ~ N(mu^2, 1) observed at 16: modes at ±4 separated by a ~128-nat
    likelihood valley — gradient chains cannot cross it."""

    def forward(self):
        mu = pp.sample(Normal(0.0, 3.0))
        pp.observe(Normal(mu * mu, 1.0), name="y")
        return mu


def test_pt_hops_modes_hmc_cannot():
    # ONE PT ensemble must visit both modes in the right proportions
    post = Bimodal().posterior_results(
        num_traces=8000,
        observe={"y": 16.0},
        inference_engine=PT,
        num_chains=1,
        burn_in=500,
    )
    vals = np.asarray(post.get_values(), dtype=np.float64)
    frac_pos = float(np.mean(vals > 0))
    assert 0.3 < frac_pos < 0.7  # symmetric modes, equal mass
    assert abs(float(np.mean(np.abs(vals))) - 4.0) < 0.15
    md = post.metadata[-1]
    assert md["swap_acceptance_rate"] > 0.2
    assert md["num_temperatures"] == 8

    # contrast: every individual HMC chain freezes in whichever mode it
    # started (the mesh pads num_chains, so check per-chain)
    hmc_chains = Bimodal().posterior_results(
        num_traces=8000,
        observe={"y": 16.0},
        inference_engine=HMC,
        num_chains=8,
        burn_in=500,
        return_chains=True,
    )
    for c in hmc_chains:
        cv = np.asarray(
            [float(np.asarray(c._get_value(i))) for i in range(c.length)]
        )
        cfrac = float(np.mean(cv > 0))
        assert min(cfrac, 1 - cfrac) < 0.02  # stuck in one mode
    # ...while every individual PT ensemble hops between both modes
    pt_chains = Bimodal().posterior_results(
        num_traces=8000,
        observe={"y": 16.0},
        inference_engine=PT,
        num_chains=8,
        burn_in=500,
        return_chains=True,
    )
    hopped = 0
    for c in pt_chains:
        cv = np.asarray(
            [float(np.asarray(c._get_value(i))) for i in range(c.length)]
        )
        cfrac = float(np.mean(cv > 0))
        if 0.1 < cfrac < 0.9:
            hopped += 1
    assert hopped >= 7  # allow one unlucky short ensemble


class GUM(pp.Model):
    def forward(self):
        mu = pp.sample(Normal(1.0, math.sqrt(5.0)))
        lik = Normal(mu, math.sqrt(2.0))
        pp.observe(lik, name="obs0")
        pp.observe(lik, name="obs1")
        return mu


def test_pt_unimodal_correctness():
    post = GUM().posterior_results(
        num_traces=8000,
        observe={"obs0": 8.0, "obs1": 9.0},
        inference_engine=PT,
        num_chains=8,
        burn_in=300,
        num_temperatures=6,
    )
    assert abs(float(post.mean) - 7.25) < 0.1
    assert abs(float(post.stddev) - math.sqrt(1 / 1.2)) < 0.12


class BoundedBimodal(pp.Model):
    """Support transforms compose with tempering."""

    def forward(self):
        mu = pp.sample(Uniform(-10.0, 10.0))
        pp.observe(Normal(mu * mu, 1.0), name="y")
        return mu


def test_pt_bounded_support():
    post = BoundedBimodal().posterior_results(
        num_traces=6000,
        observe={"y": 9.0},
        inference_engine=PT,
        num_chains=2,
        burn_in=400,
    )
    vals = np.asarray(post.get_values(), dtype=np.float64)
    assert vals.min() > -10.0 and vals.max() < 10.0
    assert abs(float(np.mean(np.abs(vals))) - 3.0) < 0.2
    frac_pos = float(np.mean(vals > 0))
    assert 0.25 < frac_pos < 0.75


def test_pt_enumerates_discrete_sites():
    """Marginalization composes with tempering: the tempered likelihood
    is [sum_k p(k) lik(z, k)]^beta."""
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
        num_traces=12000,
        observe={"y": 1.0},
        inference_engine=PT,
        num_chains=4,
        burn_in=300,
        num_temperatures=4,
    )
    assert abs(float(post.mean) - float(ref.mean)) < 0.12
    assert abs(float(post.stddev) - float(ref.stddev)) < 0.12


class Disc(pp.Model):
    def forward(self):
        k = pp.sample(Categorical(probs=[0.5, 0.5]))
        pp.observe(Normal(1.0 * k, 1.0), name="y")
        return k


def test_pt_all_discrete_raises():
    with pytest.raises(RuntimeError, match="no continuous latent"):
        Disc().posterior_results(
            num_traces=100, observe={"y": 1.0}, inference_engine=PT
        )


class NotTraceable(pp.Model):
    def forward(self):
        while True:
            x = pp.sample(Uniform(0.0, 1.0))
            if float(x) < 0.5:
                break
        pp.observe(Normal(float(x), 1.0), name="y")
        return x


def test_pt_untraceable_raises():
    with pytest.raises(RuntimeError, match="jax-traceable"):
        NotTraceable().posterior(
            num_traces=100, observe={"y": 0.1}, inference_engine=PT
        )


def test_pt_discrete_dependent_continuous():
    """Regression: a continuous site whose parameters depend on the
    enumerated discrete latent — the tempered target must marginalize
    per-combo (pi_b ∝ sum_d exp(lp_d + b*ll_d)), not split a shared
    prior from the likelihood."""
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
        num_traces=12000,
        observe={"y": 1.0},
        inference_engine=PT,
        num_chains=4,
        burn_in=300,
        num_temperatures=4,
    )
    assert abs(float(post.mean) - float(ref.mean)) < 0.1
    assert abs(float(post.stddev) - float(ref.stddev)) < 0.1


def test_pt_single_temperature_raises():
    with pytest.raises(ValueError, match="num_temperatures"):
        GUM().posterior_results(
            num_traces=100,
            observe={"obs0": 8.0, "obs1": 9.0},
            inference_engine=PT,
            num_temperatures=1,
        )
