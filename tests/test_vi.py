"""VARIATIONAL_INFERENCE engine (beyond parity, pyprob_tpu/inference/vi.py):
ADVI posterior correctness vs analytic ground truth, meanfield vs fullrank
guides on correlated posteriors, importance reweighting + evidence
estimates, support transforms, and discrete/untraceable error paths."""

import math

import numpy as np
import pytest

import pyprob_tpu as pp
from pyprob_tpu.distributions import Normal, Uniform, Exponential, Categorical

VI = pp.InferenceEngine.VARIATIONAL_INFERENCE


class GUM(pp.Model):
    def forward(self):
        mu = pp.sample(Normal(1.0, math.sqrt(5.0)))
        lik = Normal(mu, math.sqrt(2.0))
        pp.observe(lik, name="obs0")
        pp.observe(lik, name="obs1")
        return mu


GUM_OBS = {"obs0": 8.0, "obs1": 9.0}
# marginal of (obs0, obs1) is N([1,1], [[7,5],[5,7]]) evaluated at (8,9)
GUM_LOG_Z = -8.2395


def test_vi_gum_posterior_and_evidence():
    post = GUM().posterior_results(
        num_traces=4000, observe=GUM_OBS, inference_engine=VI
    )
    # IS reweighting makes the moments exact beyond the guide's fit
    assert abs(float(post.mean) - 7.25) < 0.1
    assert abs(float(post.stddev) - math.sqrt(1 / 1.2)) < 0.1
    # a 1-D Gaussian posterior is inside the meanfield family: near-perfect
    # guide -> near-full ESS and a tight evidence estimate
    assert float(post.effective_sample_size) > 0.9 * 4000
    assert abs(post.log_evidence - GUM_LOG_Z) < 0.05
    md = post.metadata[-1]
    assert md["guide"] == "meanfield"
    assert md["latent_dim"] == 1
    assert np.isfinite(md["final_elbo"])
    # ELBO lower-bounds log Z
    assert md["final_elbo"] <= post.log_evidence + 0.1


class Hierarchy(pp.Model):
    """Correlated 2-D Gaussian posterior: precision [[2,-1],[-1,2]],
    observe y=2 -> mean [2/3, 4/3]."""

    def forward(self):
        x1 = pp.sample(Normal(0.0, 1.0))
        x2 = pp.sample(Normal(x1, 1.0))
        pp.observe(Normal(x2, 1.0), name="y")
        return x1


def test_vi_fullrank_beats_meanfield_on_correlation():
    m = Hierarchy()
    obs = {"y": 2.0}
    post_mf = m.posterior_results(
        num_traces=4000, observe=obs, inference_engine=VI, guide="meanfield"
    )
    post_fr = m.posterior_results(
        num_traces=4000, observe=obs, inference_engine=VI, guide="fullrank"
    )
    for post in (post_mf, post_fr):
        assert abs(float(post.mean) - 2.0 / 3.0) < 0.08
        # analytic logZ: y ~ N(0, 3) at 2 -> -2.135
        assert abs(post.log_evidence - (-2.135)) < 0.1
    # fullrank captures the posterior correlation meanfield cannot:
    # materially higher ESS at equal draw count
    assert (
        post_fr.effective_sample_size
        > post_mf.effective_sample_size + 0.2 * 4000
    )
    assert (
        post_fr.metadata[-1]["final_elbo"]
        > post_mf.metadata[-1]["final_elbo"]
    )


class UniformGUM(pp.Model):
    """Bounded latent exercises the sigmoid transform + log-Jacobian."""

    def forward(self):
        mu = pp.sample(Uniform(0.0, 20.0))
        lik = Normal(mu, math.sqrt(2.0))
        pp.observe(lik, name="obs0")
        pp.observe(lik, name="obs1")
        return mu


def test_vi_bounded_support():
    post = UniformGUM().posterior_results(
        num_traces=4000, observe=GUM_OBS, inference_engine=VI
    )
    assert abs(float(post.mean) - 8.5) < 0.12
    assert abs(float(post.stddev) - 1.0) < 0.12
    vals = np.asarray(post.get_values(), dtype=np.float64)
    assert vals.min() > 0.0 and vals.max() < 20.0


class PositiveLatent(pp.Model):
    """Positive latent exercises the exp transform; conjugate-ish check via
    moments against a long HMC run constant (rate posterior)."""

    def forward(self):
        lam = pp.sample(Exponential(1.0))
        pp.observe(Normal(lam, 0.5), name="y")
        return lam


def test_vi_positive_support():
    post = PositiveLatent().posterior_results(
        num_traces=4000, observe={"y": 2.0}, inference_engine=VI
    )
    vals = np.asarray(post.get_values(), dtype=np.float64)
    assert vals.min() > 0.0
    # truncated-normal-ish posterior around y - sigma^2*rate = 1.75
    assert abs(float(post.mean) - 1.76) < 0.1


def test_vi_enumerates_discrete_sites():
    """Mixed discrete-continuous: the Categorical indicator is
    marginalized out of the ELBO and redrawn exactly per posterior draw."""
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
        num_traces=8000, observe={"y": 1.0}, inference_engine=VI
    )
    # IS reweighting is exact against the marginalized joint even though
    # the (bimodal-ish) posterior is outside the meanfield family
    assert abs(float(post.mean) - float(ref.mean)) < 0.15
    assert abs(float(post.stddev) - float(ref.stddev)) < 0.15


class DiscreteModel(pp.Model):
    def forward(self):
        k = pp.sample(Categorical([0.3, 0.7]))
        pp.observe(Normal(k.astype(float), 1.0), name="y")
        return k


def test_vi_rejects_all_discrete():
    with pytest.raises(RuntimeError, match="no continuous latent"):
        DiscreteModel().posterior(
            num_traces=100, observe={"y": 1.0}, inference_engine=VI
        )


class Untraceable(pp.Model):
    def forward(self):
        mu = pp.sample(Normal(0.0, 1.0))
        if float(mu) > 0:  # host control flow -> not jax-traceable
            mu = mu + 0.0
        pp.observe(Normal(mu, 1.0), name="y")
        return mu


def test_vi_rejects_untraceable():
    with pytest.raises(RuntimeError, match="jax-traceable"):
        Untraceable().posterior(
            num_traces=100, observe={"y": 1.0}, inference_engine=VI
        )


def test_vi_requires_observe():
    with pytest.raises(RuntimeError, match="observe"):
        GUM().posterior(num_traces=100, inference_engine=VI)


def test_vi_program_cache_reused_for_new_observation():
    from pyprob_tpu.inference import vi as vi_mod

    m = GUM()
    m.posterior_results(
        num_traces=500, observe=GUM_OBS, inference_engine=VI, vi_steps=200
    )
    n_cached = len(vi_mod._vi_cache)
    # new observation values, same structure: no rebuild
    post = m.posterior_results(
        num_traces=500,
        observe={"obs0": -3.0, "obs1": -4.0},
        inference_engine=VI,
        vi_steps=200,
    )
    assert len(vi_mod._vi_cache) == n_cached
    # posterior tracked the new observation: N(1,5) prior, obs -3,-4
    # -> mean = (1/5 + (-7)/2) / (1/5+2/2... ) use precision form:
    # post prec = 1/5 + 2/2 = 1.2; mean = (1/5*1 + (-3-4)/2)/1.2 = -2.75
    assert abs(float(post.mean) - (-2.75)) < 0.15


class Banana(pp.Model):
    """Curved posterior (y concentrates on the x^2 parabola): outside
    every Gaussian family — exercises the RealNVP flow guide."""

    def forward(self):
        import jax.numpy as jnp

        x = pp.sample(Normal(0.0, 1.0))
        y = pp.sample(Normal(0.0, 2.0))
        pp.observe(Normal(y - x * x, 0.3), name="w")
        return jnp.stack([x, y])


def test_vi_flow_guide_beats_gaussians_on_banana():
    m = Banana()
    obs = {"w": 0.0}
    ref = m.posterior_results(num_traces=400000, observe=obs, vectorized=True)
    post_fr = m.posterior_results(
        num_traces=8000, observe=obs, inference_engine=VI,
        guide="fullrank", vi_steps=3000,
    )
    post_fl = m.posterior_results(
        num_traces=8000, observe=obs, inference_engine=VI,
        guide="flow", vi_steps=3000, learning_rate=0.01,
    )
    # the flow wraps around the curve: much higher ESS and a tighter ELBO
    assert (
        post_fl.effective_sample_size
        > post_fr.effective_sample_size + 0.3 * 8000
    )
    assert (
        post_fl.metadata[-1]["final_elbo"]
        > post_fr.metadata[-1]["final_elbo"]
    )
    # reweighted moments match the large-sample IS reference
    mean = np.asarray(post_fl.mean, dtype=np.float64)
    std = np.asarray(post_fl.stddev, dtype=np.float64)
    rmean = np.asarray(ref.mean, dtype=np.float64)
    rstd = np.asarray(ref.stddev, dtype=np.float64)
    assert np.abs(mean - rmean).max() < 0.08
    assert np.abs(std - rstd).max() < 0.08
