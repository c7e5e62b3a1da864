"""Built-in model families + parity extras (reobserve, plots, alt heads)."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pyprob_tpu as pp
from pyprob_tpu.models import (
    GaussianUnknownMean,
    GaussianUnknownMeanMarsaglia,
    HiddenMarkovModel,
    Branching,
    MiniCaptcha,
)
from pyprob_tpu.distributions import Normal
from pyprob_tpu.nn import head_init, head_apply

OBS = {"obs0": 8, "obs1": 9}


def test_gum_builtin_vectorized():
    m = GaussianUnknownMean()
    true = m.true_posterior([8.0, 9.0])
    assert np.isclose(float(true.mean), 7.25)
    post = m.posterior_results(num_traces=20000, observe=OBS, vectorized=True)
    assert abs(float(post.mean) - float(true.mean)) < 0.3


def test_marsaglia_builtin():
    m = GaussianUnknownMeanMarsaglia()
    post = m.posterior_results(num_traces=2000, observe=OBS)
    assert abs(float(post.mean) - 7.25) < 1.0


def test_hmm_builtin():
    m = HiddenMarkovModel(
        init_probs=[1 / 3] * 3,
        transition_probs=[[0.1, 0.5, 0.4], [0.2, 0.2, 0.6], [0.15, 0.15, 0.7]],
        emission_means=[-1.0, 1.0, 0.0],
        obs_length=4,
    )
    obs = {f"obs{t}": v for t, v in enumerate([-1.0, -1.0, 1.0, 1.0])}
    post = m.posterior_results(num_traces=5000, observe=obs, vectorized=True)
    assert np.asarray(post.mean).shape == (5, 3)


def test_branching_builtin_true_posterior():
    m = Branching()
    tp = m.true_posterior()
    assert tp.length == 1600
    assert np.isfinite(float(tp.mean))


def test_branching_compiled_builtin():
    from pyprob_tpu.models import BranchingCompiled
    from pyprob_tpu.vectorized import _TraceabilityCache

    m = BranchingCompiled()
    post = m.posterior_results(
        num_traces=100000, observe={"obs": 6.0}, vectorized=True
    )
    assert _TraceabilityCache._cache.get(type(m)) is True
    tp = m.true_posterior(6)
    assert abs(float(post.mean) - float(tp.mean)) < 0.15
    assert abs(float(post.stddev) - float(tp.stddev)) < 0.15
    # interpreter tier produces the same posterior
    ip = m.posterior_results(
        num_traces=4000, observe={"obs": 6.0}, vectorized=False
    )
    assert abs(float(ip.mean) - float(tp.mean)) < 0.3


def test_mini_captcha_builtin():
    from pyprob_tpu.vectorized import _TraceabilityCache

    m = MiniCaptcha(alphabet=("A", "B"))
    img = m.render("A")
    post = m.posterior_results(
        num_traces=500, observe={"query_image": img}, vectorized=True
    )
    assert int(np.asarray(post.mode)) == 0
    # template rendering happens at init, so the forward is pure jnp ops
    # and the model runs on the compiled tier
    assert _TraceabilityCache._cache.get(type(m)) is True


def test_variable_length_gaussian_builtin():
    from pyprob_tpu.models import VariableLengthGaussian
    from pyprob_tpu.vectorized import _TraceabilityCache

    m = VariableLengthGaussian()
    obs = {"obs0": 8.0, "obs1": 9.0, "obs2": 7.0}
    post = m.posterior_results(num_traces=150000, observe=obs, vectorized=True)
    assert _TraceabilityCache._cache.get(type(m)) is True
    tm, ts = m.true_posterior_moments([8.0, 9.0, 7.0])
    assert abs(float(post.mean) - tm) < 0.1
    assert abs(float(post.stddev) - ts) < 0.1


def test_reobserve():
    m = GaussianUnknownMean()
    post = m.posterior(num_traces=2000, observe=OBS)
    # reobserve with different observed values rescoring the same traces
    re = post.reobserve(observe={"obs0": 2.0, "obs1": 2.0})
    m2 = GaussianUnknownMean()
    direct = m2.posterior(num_traces=2000, observe={"obs0": 2.0, "obs1": 2.0})
    mean_re = float(re.map(lambda t: float(t.result)).mean)
    mean_direct = float(direct.map(lambda t: float(t.result)).mean)
    assert abs(mean_re - mean_direct) < 1.0


def test_distribution_plot(tmp_path):
    fn = str(tmp_path / "plot.png")
    Normal(0.0, 1.0).plot(min_val=-4, max_val=4, file_name=fn)
    assert (tmp_path / "plot.png").exists()


def test_empirical_plot_histogram(tmp_path):
    from pyprob_tpu.distributions import Empirical

    e = Empirical(values=list(np.random.default_rng(0).normal(size=200)))
    fn = str(tmp_path / "hist.png")
    e.plot_histogram(file_name=fn)
    assert (tmp_path / "hist.png").exists()


def test_alternative_proposal_heads():
    key = jax.random.PRNGKey(0)
    x = jnp.ones((5, 16))
    # normal_normal
    p = head_init(key, "normal_normal", 16)
    d = head_apply(p, x, {"mean": jnp.zeros(5), "stddev": jnp.ones(5)})
    assert np.asarray(d.log_prob(jnp.zeros(5))).shape == (5,)
    # uniform_beta
    p = head_init(key, "uniform_beta", 16)
    d = head_apply(p, x, {"low": jnp.zeros(5), "high": jnp.ones(5) * 2})
    s = np.asarray(d._sample_jax(key, ()))
    assert ((s >= 0) & (s <= 2)).all()
    # uniform_beta_mixture
    p = head_init(key, "uniform_beta_mixture", 16, mixture_components=3)
    d = head_apply(p, x, {"low": jnp.zeros(5), "high": jnp.ones(5) * 2})
    s = np.asarray(d._sample_jax(key, ()))
    assert ((s >= 0) & (s <= 2)).all()
    lp = np.asarray(d.log_prob(jnp.full(5, 1.0)))
    assert np.isfinite(lp).all()


def test_remote_timeout():
    # RemoteModel with timeout raises instead of hanging on a dead address
    m = pp.RemoteModel("ipc:///tmp/nonexistent_ppx_socket_xyz", timeout_sec=0.5)
    with pytest.raises((TimeoutError, RuntimeError)):
        m.sample()


def test_eight_schools_nuts_and_tempered_smc_agree():
    # the canonical hierarchical benchmark (non-centered): NUTS and
    # tempered SMC agree with each other and with the published Stan
    # anchors (mu ~ 4.4 +- 3.3, tau ~ 3.6 under HalfCauchy(5))
    from pyprob_tpu.models import EightSchools

    import numpy as np

    m = EightSchools()
    obs = m.observes()
    assert obs["y0"] == 28.0 and len(obs) == 8
    nuts = m.posterior_results(
        num_traces=20000, observe=obs,
        inference_engine=pp.InferenceEngine.NO_U_TURN_SAMPLER,
    )
    mu_mean, tau_mean = np.asarray(nuts.mean, np.float64)
    assert 3.2 < mu_mean < 5.6
    assert 2.2 < tau_mean < 5.2
    tsmc = m.posterior_results(
        num_traces=20000, observe=obs,
        inference_engine=pp.InferenceEngine.TEMPERED_SMC,
    )
    diff = np.abs(np.asarray(nuts.mean) - np.asarray(tsmc.mean))
    assert diff.max() < 0.6, (np.asarray(nuts.mean), np.asarray(tsmc.mean))


def test_bayesian_linear_regression_conjugate():
    # IS (compiled tier) and Laplace both recover the exact conjugate
    # Gaussian posterior; Laplace is exact on this family (Gaussian
    # target), so its variance must match the closed form too.
    from pyprob_tpu.models import BayesianLinearRegression

    rng = np.random.default_rng(0)
    X = rng.normal(size=(40, 2))
    m = BayesianLinearRegression(X)
    y = m.synthesize([1.5, -0.7], rng=1)
    mean, cov = m.true_posterior(y)

    post = m.posterior_results(num_traces=20000, observe={"y": y}, vectorized=True)
    assert np.abs(np.asarray(post.mean, np.float64) - mean).max() < 0.12

    lap = m.posterior(
        num_traces=1500, observe={"y": y},
        inference_engine=pp.InferenceEngine.LAPLACE,
    )
    draws = np.stack([np.asarray(t.result, np.float64) for t in lap])
    assert np.abs(draws.mean(axis=0) - mean).max() < 0.05
    assert np.abs(draws.var(axis=0) - np.diag(cov)).max() < 0.4 * np.diag(cov).max() + 0.003


def test_bayesian_logistic_regression_nuts_vs_grid():
    from pyprob_tpu.models import BayesianLogisticRegression

    rng = np.random.default_rng(4)
    X = rng.normal(size=(60, 1))
    m = BayesianLogisticRegression(X)
    y = m.synthesize([1.2], rng=2)
    tmean, tstd = m.true_posterior_moments(y)
    post = m.posterior(
        num_traces=600, observe={"y": y},
        inference_engine=pp.InferenceEngine.NO_U_TURN_SAMPLER, burn_in=200,
    )
    draws = np.stack([np.asarray(t.result, np.float64) for t in post])
    assert abs(draws.mean() - tmean[0]) < 0.5 * tstd[0]
    assert abs(draws.std() - tstd[0]) < 0.5 * tstd[0]


def test_gp_regression_hyperposterior():
    # marginal-likelihood GP: HMC and compiled-tier IS agree with the
    # grid-integrated exact posterior of the log-lengthscale
    from pyprob_tpu.models import GaussianProcessRegression

    x = np.linspace(0, 4, 25)
    m = GaussianProcessRegression(x, learn=("lengthscale",), noise=0.2)
    y = m.synthesize(rng=3, lengthscale=1.0)
    gmean, gstd = m.true_posterior_moments(y)

    post = m.posterior(
        num_traces=400, observe={"y": y},
        inference_engine=pp.InferenceEngine.HAMILTONIAN_MONTE_CARLO, burn_in=200,
    )
    draws = np.array([float(np.asarray(t.result).reshape(-1)[0]) for t in post])
    assert abs(draws.mean() - gmean) < 0.6 * gstd

    isv = m.posterior_results(num_traces=4000, observe={"y": y}, vectorized=True)
    is_mean = float(np.asarray(isv.mean).reshape(-1)[0])
    assert abs(is_mean - gmean) < 0.6 * gstd

def test_gaussian_mixture_label_switching():
    # marginalized-assignment GMM: the K=2 symmetric posterior is
    # label-switching bimodal. Every PT ensemble hops between the modes
    # (replica exchange) and the pooled draws match the grid-integrated
    # moments; every NUTS chain freezes in a single mode — the contrast
    # this family showcases.  Chains pad to the mesh (8 devices here).
    from pyprob_tpu.models import GaussianMixture

    m = GaussianMixture(num_components=2, obs_stddev=0.6, num_data=40)
    y = m.synthesize([-2.0, 2.0], rng=0)
    tmean, tstd = m.true_posterior_moments(y)
    assert abs(tmean[0] - tmean[1]) < 1e-9  # symmetric by construction

    pt = m.posterior(
        num_traces=2000, observe={"y": y}, burn_in=500, return_chains=True,
        inference_engine=pp.InferenceEngine.PARALLEL_TEMPERING,
    )
    pooled = np.concatenate([np.asarray(c, np.float64) for c in pt])
    hopping = sum(
        0.05 < (np.asarray(c, np.float64)[:, 0] < 0).mean() < 0.95
        for c in pt
    )
    assert hopping >= len(pt) - 1, hopping  # nearly all ensembles hop
    assert abs(pooled[:, 0].std() - tstd[0]) < 0.35 * tstd[0]

    nuts = m.posterior(
        num_traces=1600, observe={"y": y}, burn_in=200, return_chains=True,
        inference_engine=pp.InferenceEngine.NO_U_TURN_SAMPLER,
    )
    frozen = sum(
        (lambda f: f < 0.05 or f > 0.95)(
            (np.asarray(c, np.float64)[:, 0] < 0).mean()
        )
        for c in nuts
    )
    assert frozen >= len(nuts) - 1, frozen  # chains freeze per mode

    # Dirichlet weight latent exercises the stick-breaking transform
    mw = GaussianMixture(num_components=2, obs_stddev=0.6, num_data=40,
                         learn_weights=True)
    hw = mw.posterior(
        num_traces=200, observe={"y": y},
        inference_engine=pp.InferenceEngine.HAMILTONIAN_MONTE_CARLO,
        burn_in=150,
    )
    assert len(hw) == 200


def test_linear_gaussian_state_space_vs_kalman():
    # built-in SSM: the trace posterior's mean is the SMOOTHED path —
    # SMC and NUTS both match the exact RTS smoother; plain IS
    # degenerates over the T observes (the SMC showcase contrast).
    from pyprob_tpu.models import LinearGaussianStateSpace

    m = LinearGaussianStateSpace(num_steps=8, a=0.9)
    xs, ys = m.synthesize(rng=0)
    sm, sv = m.kalman_smoother(ys)
    fm, fv = m.kalman_filter(ys)
    assert abs(sm[-1] - fm[-1]) < 1e-12  # smoother == filter at t=T
    assert (sv[1:] <= fv + 1e-12).all()  # smoothing never widens x_1..x_T

    smc = m.posterior_results(
        num_traces=30000, observe=m.observes(ys),
        inference_engine=pp.InferenceEngine.SEQUENTIAL_MONTE_CARLO,
    )
    assert np.abs(np.asarray(smc.mean, np.float64) - sm).max() < 0.06
    assert np.abs(np.asarray(smc.variance, np.float64) - sv).max() < 0.04

    nuts = m.posterior_results(
        num_traces=4000, observe=m.observes(ys), burn_in=0,
        inference_engine=pp.InferenceEngine.NO_U_TURN_SAMPLER,
    )
    assert np.abs(np.asarray(nuts.mean, np.float64) - sm).max() < 0.08

    isv = m.posterior_results(
        num_traces=30000, observe=m.observes(ys), vectorized=True
    )
    assert smc.effective_sample_size > 5 * isv.effective_sample_size


def test_model_zoo_structural():
    # every exported family constructs, samples a trace, and runs a
    # small prior batch — guards the whole pyprob_tpu.models surface
    import pyprob_tpu.models as zoo

    rng = np.random.default_rng(0)
    for name in zoo.__all__:
        cls = getattr(zoo, name)
        if name == "MiniCaptcha":
            m = cls(alphabet=("A", "B"))
        elif name == "HiddenMarkovModel":
            m = cls(init_probs=[0.5, 0.5],
                    transition_probs=[[0.9, 0.1], [0.2, 0.8]],
                    emission_means=[-1.0, 1.0], obs_length=3)
        elif name in ("BayesianLinearRegression", "BayesianLogisticRegression"):
            m = cls(rng.normal(size=(10, 2)))
        elif name == "GaussianProcessRegression":
            m = cls(np.linspace(0, 2, 8))
        else:
            m = cls()
        trace = m.sample()
        assert np.isfinite(np.asarray(trace.result, np.float64)).all(), name
        prior = m.prior_results(num_traces=20)
        assert prior.length == 20, name
