"""HAMILTONIAN_MONTE_CARLO engine (beyond parity, pyprob_tpu/inference/hmc.py):
posterior correctness vs analytic ground truth, support transforms
(bounded/positive), gradients through dependent sites, step-size
adaptation, mesh sharding, and the discrete/untraceable errors."""

import math

import numpy as np
import pytest

import pyprob_tpu as pp
from pyprob_tpu.distributions import (
    Normal,
    Uniform,
    Exponential,
    Categorical,
)

HMC = pp.InferenceEngine.HAMILTONIAN_MONTE_CARLO


class GUM(pp.Model):
    def forward(self):
        mu = pp.sample(Normal(1.0, math.sqrt(5.0)))
        lik = Normal(mu, math.sqrt(2.0))
        pp.observe(lik, name="obs0")
        pp.observe(lik, name="obs1")
        return mu


GUM_OBS = {"obs0": 8.0, "obs1": 9.0}


def test_hmc_gum_posterior():
    post = GUM().posterior_results(
        num_traces=20000, observe=GUM_OBS, inference_engine=HMC
    )
    assert abs(float(post.mean) - 7.25) < 0.1
    assert abs(float(post.stddev) - math.sqrt(1 / 1.2)) < 0.1
    md = post.metadata[-1]
    # dual-averaging adaptation should land near the target
    assert 0.5 < md["acceptance_rate"] <= 1.0
    assert md["final_step_size"] > 0


class UniformGUM(pp.Model):
    """Bounded latent: sigmoid transform + log-Jacobian."""

    def forward(self):
        mu = pp.sample(Uniform(0.0, 20.0))
        lik = Normal(mu, math.sqrt(2.0))
        pp.observe(lik, name="obs0")
        pp.observe(lik, name="obs1")
        return mu


def test_hmc_bounded_support():
    post = UniformGUM().posterior_results(
        num_traces=20000, observe=GUM_OBS, inference_engine=HMC
    )
    # flat prior: posterior ~= N(8.5, 1) well inside the bounds
    assert abs(float(post.mean) - 8.5) < 0.12
    assert abs(float(post.stddev) - 1.0) < 0.12
    vals = np.asarray(post.get_values(), dtype=np.float64)
    assert vals.min() > 0.0 and vals.max() < 20.0


class Hierarchy(pp.Model):
    """Gradients flow through distribution params that depend on earlier
    sites."""

    def forward(self):
        x1 = pp.sample(Normal(0.0, 1.0))
        x2 = pp.sample(Normal(x1, 1.0))
        pp.observe(Normal(x2, 1.0), name="y")
        return x1


def test_hmc_hierarchical_gradients():
    post = Hierarchy().posterior_results(
        num_traces=20000, observe={"y": 3.0}, inference_engine=HMC
    )
    # x1 | y=3 is N(1, 2/3)
    assert abs(float(post.mean) - 1.0) < 0.08
    assert abs(float(post.variance) - 2 / 3) < 0.08


class Scale(pp.Model):
    """Positive-support latent: exp transform."""

    def forward(self):
        s = pp.sample(Exponential(1.0))
        for i in range(3):
            pp.observe(Normal(0.0, s), name=f"y{i}")
        return s


def test_hmc_positive_support():
    obs = {"y0": 1.5, "y1": -2.0, "y2": 1.0}
    m = Scale()
    post = m.posterior_results(
        num_traces=20000, observe=obs, inference_engine=HMC
    )
    vals = np.asarray(post.get_values(), dtype=np.float64)
    assert (vals > 0).all()
    # cross-check the mean against a large vectorized-IS estimate
    ref = m.posterior_results(num_traces=100000, observe=obs, vectorized=True)
    assert abs(float(post.mean) - float(ref.mean)) < 0.1


class TwoScale(pp.Model):
    """Latent scales 100x apart: exercises the diagonal mass-matrix
    (Welford) warmup — a single unpreconditioned step size cannot serve
    both dimensions well."""

    def forward(self):
        import jax.numpy as jnp

        a = pp.sample(Normal(0.0, 10.0))
        b = pp.sample(Normal(0.0, 0.1))
        pp.observe(Normal(a, 10.0), name="ya")
        pp.observe(Normal(b, 0.1), name="yb")
        return jnp.stack([a, b])


def test_hmc_mass_matrix_two_scale():
    post = TwoScale().posterior_results(
        num_traces=20000,
        observe={"ya": 6.0, "yb": 0.12},
        inference_engine=HMC,
        burn_in=400,
    )
    mean = np.asarray(post.mean, dtype=np.float64)
    std = np.asarray(post.stddev, dtype=np.float64)
    # analytic: a|ya ~ N(3, 50), b|yb ~ N(0.06, 0.005)
    assert abs(mean[0] - 3.0) < 0.5
    assert abs(mean[1] - 0.06) < 0.02
    assert abs(std[0] - math.sqrt(50.0)) < 0.6
    assert abs(std[1] - math.sqrt(0.005)) < 0.01


def test_hmc_sharded_over_mesh():
    import jax
    from pyprob_tpu.parallel import data_parallel_mesh

    mesh = data_parallel_mesh(len(jax.devices()))
    post = GUM().posterior_results(
        num_traces=4000,
        observe=GUM_OBS,
        inference_engine=HMC,
        num_chains=16,
        burn_in=100,
        mesh=mesh,
    )
    assert abs(float(post.mean) - 7.25) < 0.3


def test_hmc_return_chains_rhat():
    from pyprob_tpu.diagnostics import gelman_rubin_values

    chains = GUM().posterior_results(
        num_traces=8000,
        observe=GUM_OBS,
        inference_engine=HMC,
        num_chains=8,
        burn_in=200,
        return_chains=True,
    )
    assert len(chains) == 8
    iters, rhats = gelman_rubin_values(chains)
    assert float(np.asarray(rhats)[-1]) < 1.1  # converged chains


class MixedDiscrete(pp.Model):
    """Categorical indicator + continuous location: the indicator is
    marginalized out of the potential (enumeration) and redrawn from its
    exact conditional at decode time."""

    def forward(self):
        import jax.numpy as jnp

        mu = pp.sample(Normal(0.0, 5.0))
        k = pp.sample(Categorical([0.5, 0.5]))
        shift = jnp.where(k == 0, -2.0, 2.0)
        pp.observe(Normal(mu + shift, 1.0), name="y")
        return mu


def test_hmc_enumerates_discrete_sites():
    m = MixedDiscrete()
    ref = m.posterior_results(
        num_traces=400000, observe={"y": 1.0}, vectorized=True
    )
    post = m.posterior_results(
        num_traces=20000, observe={"y": 1.0}, inference_engine=HMC
    )
    assert abs(float(post.mean) - float(ref.mean)) < 0.1
    assert abs(float(post.stddev) - float(ref.stddev)) < 0.1
    # the decoded discrete marginal matches the analytic conditional:
    # y | k ~ N(±2, 26) so P(k=1 | y=1) = softmax of the two logpdfs
    full = m.posterior(
        num_traces=30000,
        observe={"y": 1.0},
        inference_engine=HMC,
        num_chains=64,
        burn_in=400,
    )
    ks = []
    for i in range(full.length):
        t = full._get_value(i)
        for v in t.variables:
            if "Categorical" in (v.address or ""):
                ks.append(int(v.value))
    l0 = -((1.0 + 2.0) ** 2) / (2 * 26.0)
    l1 = -((1.0 - 2.0) ** 2) / (2 * 26.0)
    true_p1 = math.exp(l1) / (math.exp(l0) + math.exp(l1))
    assert abs(float(np.mean(ks)) - true_p1) < 0.05


class Disc(pp.Model):
    def forward(self):
        k = pp.sample(Categorical(probs=[0.5, 0.5]))
        pp.observe(Normal(1.0 * k, 1.0), name="y")
        return k


def test_hmc_all_discrete_raises():
    with pytest.raises(RuntimeError, match="no continuous latent"):
        Disc().posterior_results(
            num_traces=100, observe={"y": 1.0}, inference_engine=HMC
        )


class NotTraceable(pp.Model):
    def forward(self):
        while True:
            x = pp.sample(Uniform(0.0, 1.0))
            if float(x) < 0.5:
                break
        pp.observe(Normal(float(x), 1.0), name="y")
        return x


def test_hmc_untraceable_raises():
    with pytest.raises(RuntimeError, match="jax-traceable"):
        NotTraceable().posterior(
            num_traces=100, observe={"y": 0.1}, inference_engine=HMC
        )


def test_hmc_rerun_with_different_chain_geometry():
    """Regression: lax.scan caches jaxprs by body identity — re-running a
    cached program builder with a different total_steps/burn_in must not
    leak tracers from the previous trace."""
    m = GUM()
    p1 = m.posterior_results(
        num_traces=2000, observe=GUM_OBS, inference_engine=HMC,
        num_chains=8, burn_in=100,
    )
    p2 = m.posterior_results(
        num_traces=2000, observe=GUM_OBS, inference_engine=HMC,
        num_chains=8, burn_in=300,
    )
    assert abs(float(p1.mean) - 7.25) < 0.3
    assert abs(float(p2.mean) - 7.25) < 0.3


class DirichletCategorical(pp.Model):
    """Simplex latent: theta lives on the 2-simplex via the stick-breaking
    transform (pyprob_tpu/inference/hmc.py:_simplex_to_x), so the gradient
    engines sample a (K-1)-dim unconstrained vector."""

    def forward(self):
        from pyprob_tpu.distributions import Dirichlet, Categorical

        theta = pp.sample(Dirichlet([2.0, 3.0, 4.0]))
        for i in range(3):
            pp.observe(Categorical(theta), name=f"y{i}")
        return theta


DC_OBS = {"y0": 0, "y1": 0, "y2": 2}
DC_TRUE_MEAN = [4.0 / 12.0, 3.0 / 12.0, 5.0 / 12.0]  # Dirichlet([4,3,5])


def test_hmc_simplex_latent_conjugate():
    post = DirichletCategorical().posterior_results(
        num_traces=2000, observe=DC_OBS, inference_engine=HMC,
        num_chains=16,
    )
    xs = np.stack(
        [np.asarray(v, dtype=np.float64) for v in post.get_values()]
    )
    assert np.allclose(xs.sum(-1), 1.0, atol=1e-5)
    assert xs.min() > 0.0
    assert np.allclose(xs.mean(0), DC_TRUE_MEAN, atol=0.035)
    # true posterior variance of theta_0: a0(a-a0)/(a^2(a+1)), a=12
    assert abs(xs[:, 0].std() - math.sqrt(4 * 8 / (144 * 13))) < 0.02


def test_vi_and_svgd_simplex_latent():
    m = DirichletCategorical()
    post_vi = m.posterior_results(
        num_traces=2000, observe=DC_OBS,
        inference_engine=pp.InferenceEngine.VARIATIONAL_INFERENCE,
    )
    post_svgd = m.posterior_results(
        num_traces=512, observe=DC_OBS,
        inference_engine=pp.InferenceEngine.STEIN_VARIATIONAL_GRADIENT_DESCENT,
        svgd_particles=512, svgd_steps=500,
    )
    for post, tol in ((post_vi, 0.03), (post_svgd, 0.05)):
        xs = np.stack(
            [np.asarray(v, dtype=np.float64) for v in post.get_values()]
        )
        assert np.allclose(xs.sum(-1), 1.0, atol=1e-5)
        assert np.allclose(xs.mean(0), DC_TRUE_MEAN, atol=tol)
