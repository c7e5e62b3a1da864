"""STEIN_VARIATIONAL_GRADIENT_DESCENT engine (beyond parity,
pyprob_tpu/inference/svgd.py): ensemble posterior correctness vs analytic
ground truth, correlation capture without a guide density, support
transforms, bimodal transport, discrete enumeration, and error paths."""

import math

import numpy as np
import pytest

import pyprob_tpu as pp
from pyprob_tpu.distributions import Normal, Uniform, Exponential, Categorical

SVGD = pp.InferenceEngine.STEIN_VARIATIONAL_GRADIENT_DESCENT


class GUM(pp.Model):
    def forward(self):
        mu = pp.sample(Normal(1.0, math.sqrt(5.0)))
        lik = Normal(mu, math.sqrt(2.0))
        pp.observe(lik, name="obs0")
        pp.observe(lik, name="obs1")
        return mu


GUM_OBS = {"obs0": 8.0, "obs1": 9.0}


def test_svgd_gum_posterior():
    post = GUM().posterior_results(
        num_traces=2000, observe=GUM_OBS, inference_engine=SVGD,
        svgd_particles=512, svgd_steps=600,
    )
    assert post.length == 2000
    assert abs(float(post.mean) - 7.25) < 0.1
    assert abs(float(post.stddev) - math.sqrt(1 / 1.2)) < 0.15
    md = post.metadata[-1]
    assert md["latent_dim"] == 1
    assert md["svgd_particles"] == 512
    assert np.isfinite(md["final_mean_update_norm"])
    # particles are a uniform-weight ensemble, not a weighted IS cloud
    assert float(post.effective_sample_size) > 0.99 * 2000


class Hierarchy(pp.Model):
    """Correlated 2-D Gaussian posterior: precision [[2,-1],[-1,2]],
    observe y=2 -> mean [2/3, 4/3], corr 0.5."""

    def forward(self):
        x1 = pp.sample(Normal(0.0, 1.0))
        x2 = pp.sample(Normal(x1, 1.0))
        pp.observe(Normal(x2, 1.0), name="y")
        return x1, x2


def test_svgd_captures_correlation_without_guide():
    post = Hierarchy().posterior_results(
        num_traces=512, observe={"y": 2.0}, inference_engine=SVGD,
        svgd_particles=512, svgd_steps=600,
    )
    xs = np.asarray(
        [np.asarray(v, dtype=np.float64) for v in post.get_values()]
    )
    assert abs(xs[:, 0].mean() - 2.0 / 3.0) < 0.1
    assert abs(xs[:, 1].mean() - 4.0 / 3.0) < 0.1
    # cov = inv(precision) = [[2/3,1/3],[1/3,2/3]] -> corr 0.5; meanfield
    # VI cannot represent this, the SVGD ensemble just does
    corr = np.corrcoef(xs[:, 0], xs[:, 1])[0, 1]
    assert abs(corr - 0.5) < 0.15
    assert abs(xs[:, 0].std() - math.sqrt(2.0 / 3.0)) < 0.12


class UniformGUM(pp.Model):
    """Bounded latent exercises the sigmoid transform + log-Jacobian."""

    def forward(self):
        mu = pp.sample(Uniform(0.0, 20.0))
        lik = Normal(mu, math.sqrt(2.0))
        pp.observe(lik, name="obs0")
        pp.observe(lik, name="obs1")
        return mu


def test_svgd_bounded_support():
    post = UniformGUM().posterior_results(
        num_traces=1024, observe=GUM_OBS, inference_engine=SVGD,
        svgd_particles=512, svgd_steps=600,
    )
    vals = np.asarray(post.get_values(), dtype=np.float64)
    assert vals.min() > 0.0 and vals.max() < 20.0
    assert abs(float(post.mean) - 8.5) < 0.15
    assert abs(float(post.stddev) - 1.0) < 0.15


class PositiveLatent(pp.Model):
    def forward(self):
        lam = pp.sample(Exponential(1.0))
        pp.observe(Normal(lam, 0.5), name="y")
        return lam


def test_svgd_positive_support():
    post = PositiveLatent().posterior_results(
        num_traces=512, observe={"y": 2.0}, inference_engine=SVGD,
        svgd_particles=512, svgd_steps=600,
    )
    vals = np.asarray(post.get_values(), dtype=np.float64)
    assert vals.min() > 0.0
    assert abs(float(post.mean) - 1.76) < 0.12


class Bimodal(pp.Model):
    """Posterior has symmetric modes near +/-2 (observe mu^2 = 4): a
    single HMC chain sticks to one mode; the kernel repulsion keeps the
    SVGD ensemble covering both."""

    def forward(self):
        mu = pp.sample(Normal(0.0, 3.0))
        pp.observe(Normal(mu * mu, 0.5), name="y")
        return mu


def test_svgd_populates_both_modes():
    post = Bimodal().posterior_results(
        num_traces=512, observe={"y": 4.0}, inference_engine=SVGD,
        svgd_particles=512, svgd_steps=800,
    )
    vals = np.asarray(post.get_values(), dtype=np.float64)
    frac_pos = float(np.mean(vals > 0))
    assert 0.2 < frac_pos < 0.8
    assert abs(abs(vals).mean() - 2.0) < 0.2


def test_svgd_enumerates_discrete_sites():
    """Mixed discrete-continuous: the Categorical indicator is
    marginalized out of the Stein flow and redrawn exactly per draw."""
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
        num_traces=2048, observe={"y": 1.0}, inference_engine=SVGD,
        svgd_particles=512, svgd_steps=800,
    )
    assert abs(float(post.mean) - float(ref.mean)) < 0.2
    assert abs(float(post.stddev) - float(ref.stddev)) < 0.2


class DiscreteModel(pp.Model):
    def forward(self):
        k = pp.sample(Categorical([0.3, 0.7]))
        pp.observe(Normal(k.astype(float), 1.0), name="y")
        return k


def test_svgd_rejects_all_discrete():
    with pytest.raises(RuntimeError, match="no continuous latent"):
        DiscreteModel().posterior(
            num_traces=100, observe={"y": 1.0}, inference_engine=SVGD
        )


class Untraceable(pp.Model):
    def forward(self):
        mu = pp.sample(Normal(0.0, 1.0))
        if float(mu) > 0:  # host control flow -> not jax-traceable
            mu = mu + 0.0
        pp.observe(Normal(mu, 1.0), name="y")
        return mu


def test_svgd_rejects_untraceable():
    with pytest.raises(RuntimeError, match="jax-traceable"):
        Untraceable().posterior(
            num_traces=100, observe={"y": 1.0}, inference_engine=SVGD
        )


def test_svgd_requires_observe():
    with pytest.raises(RuntimeError, match="observe"):
        GUM().posterior(num_traces=100, inference_engine=SVGD)


def test_svgd_program_cache_reused_for_new_observation():
    from pyprob_tpu.inference import svgd as svgd_mod

    m = GUM()
    m.posterior_results(
        num_traces=256, observe=GUM_OBS, inference_engine=SVGD,
        svgd_particles=256, svgd_steps=100,
    )
    n_cached = len(svgd_mod._svgd_cache)
    post = m.posterior_results(
        num_traces=256,
        observe={"obs0": -3.0, "obs1": -4.0},
        inference_engine=SVGD,
        svgd_particles=256,
        svgd_steps=100,
    )
    assert len(svgd_mod._svgd_cache) == n_cached
    # posterior follows the new observation: mean near (-3.5)*10/12 + 1/12
    assert float(post.mean) < -2.0
