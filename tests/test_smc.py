"""SEQUENTIAL_MONTE_CARLO engine (beyond parity, pyprob_tpu/inference/smc.py):
posterior correctness vs analytic/Kalman/forward-algorithm ground truth,
ESS advantage over plain IS, log-evidence estimate, adaptive resampling,
integer-site replay, and the no-interpreter-tier error."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

import pyprob_tpu as pp
from pyprob_tpu.distributions import Normal, Categorical, Uniform

SMC = pp.InferenceEngine.SEQUENTIAL_MONTE_CARLO


class GUM(pp.Model):
    def forward(self):
        mu = pp.sample(Normal(1.0, math.sqrt(5.0)))
        lik = Normal(mu, math.sqrt(2.0))
        pp.observe(lik, name="obs0")
        pp.observe(lik, name="obs1")
        return mu


GUM_OBS = {"obs0": 8.0, "obs1": 9.0}
GUM_LOGZ = float(
    -np.log(2 * np.pi)
    - 0.5 * np.log(np.linalg.det([[7.0, 5.0], [5.0, 7.0]]))
    - 0.5
    * np.array([7.0, 8.0])
    @ np.linalg.inv([[7.0, 5.0], [5.0, 7.0]])
    @ np.array([7.0, 8.0])
)


def test_smc_gum_posterior_and_evidence():
    m = GUM()
    post = m.posterior_results(
        num_traces=50000, observe=GUM_OBS, inference_engine=SMC,
        resample_threshold=1.0,
    )
    # per-run sd of the posterior-mean estimate is ~0.05 at 50k particles:
    # resampled particles share ancestors, so the weight-based ESS
    # understates MC error (standard SMC genealogy effect)
    assert abs(float(post.mean) - 7.25) < 0.2
    assert abs(float(post.stddev) - math.sqrt(1 / 1.2)) < 0.1
    # unbiased logZ estimator, empirical sigma ~0.07 at 50k particles
    assert abs(post.log_evidence - GUM_LOGZ) < 0.25
    assert post.metadata[-1]["log_evidence"] == post.log_evidence


def test_smc_beats_is_ess():
    m = GUM()
    post_is = m.posterior_results(
        num_traces=20000, observe=GUM_OBS, vectorized=True
    )
    post_smc = m.posterior_results(
        num_traces=20000, observe=GUM_OBS, inference_engine=SMC,
        resample_threshold=1.0,
    )
    # resampling after obs0 removes its weight variance: ESS gain is large
    assert post_smc.effective_sample_size > 5 * post_is.effective_sample_size


T = 8
Q, R = 0.5, 0.3


class SSM(pp.Model):
    """Linear-Gaussian random walk, observed each step."""

    def forward(self):
        x = pp.sample(Normal(0.0, 1.0), address="x0")
        for t in range(T):
            x = pp.sample(Normal(x, math.sqrt(Q)), address=f"x{t + 1}")
            pp.observe(Normal(x, math.sqrt(R)), name=f"y{t}")
        return x


def _kalman(ys):
    mean, var = 0.0, 1.0
    for y in ys:
        mean_p, var_p = mean, var + Q
        k = var_p / (var_p + R)
        mean = mean_p + k * (y - mean_p)
        var = (1 - k) * var_p
    return mean, var


def test_smc_state_space_matches_kalman():
    ys = [0.3, 0.8, 1.5, 1.1, 2.0, 2.4, 2.2, 3.0]
    m = SSM()
    post = m.posterior_results(
        num_traces=30000,
        observe={f"y{t}": ys[t] for t in range(T)},
        inference_engine=SMC,
    )
    mean_true, var_true = _kalman(ys)
    assert abs(float(post.mean) - mean_true) < 0.05
    assert abs(float(post.variance) - var_true) < 0.05
    # plain IS degenerates over 8 observes; SMC must stay healthy
    assert post.effective_sample_size > 0.2 * 30000


def test_smc_adaptive_resampling_metadata():
    m = SSM()
    ys = [0.0] * T
    post = m.posterior_results(
        num_traces=5000,
        observe={f"y{t}": ys[t] for t in range(T)},
        inference_engine=SMC,
        resample_threshold=0.5,
    )
    md = post.metadata[-1]
    assert md["stages"] == T
    assert md["resample_threshold"] == 0.5
    assert np.isfinite(post.log_evidence)


N_HMM, T_HMM = 3, 6
TRANS = np.array([[0.7, 0.2, 0.1], [0.1, 0.8, 0.1], [0.2, 0.2, 0.6]])
INIT = np.array([0.5, 0.3, 0.2])
EMIT_LOC = np.array([-1.0, 0.0, 1.5])
EMIT_SCALE = 0.6


class HMM(pp.Model):
    """Discrete-state HMM: integer Categorical sites must replay exactly."""

    def forward(self):
        trans = jnp.asarray(TRANS, jnp.float32)
        z = pp.sample(Categorical(probs=jnp.asarray(INIT, jnp.float32)),
                      address="z0")
        locs = jnp.asarray(EMIT_LOC, jnp.float32)
        for t in range(T_HMM):
            pp.observe(Normal(locs[z], EMIT_SCALE), name=f"y{t}")
            if t < T_HMM - 1:
                z = pp.sample(Categorical(probs=trans[z]),
                              address=f"z{t + 1}")
        return z


def _forward_marginal(ys):
    alpha = INIT.copy()
    for t, y in enumerate(ys):
        like = np.exp(
            -0.5 * ((y - EMIT_LOC) / EMIT_SCALE) ** 2
        ) / (EMIT_SCALE * np.sqrt(2 * np.pi))
        alpha = alpha * like
        if t < len(ys) - 1:
            alpha = alpha @ TRANS
    return alpha / alpha.sum()


def test_smc_hmm_integer_sites():
    ys = [-0.8, -1.2, 0.1, 0.3, 1.4, 1.6]
    m = HMM()
    post = m.posterior_results(
        num_traces=30000,
        observe={f"y{t}": ys[t] for t in range(T_HMM)},
        inference_engine=SMC,
    )
    truth = _forward_marginal(ys)
    values = np.asarray(post.get_values(), dtype=np.int64)
    w = np.asarray(post.weights, dtype=np.float64)
    est = np.array([w[values == k].sum() for k in range(N_HMM)])
    assert np.allclose(est, truth, atol=0.03)


class MarsagliaGUM(pp.Model):
    """Unbounded rejection loop with host control flow: NOT jax-traceable;
    SMC must fall back to the interpreter-tier filter."""

    def forward(self):
        while True:
            x = pp.sample(Uniform(-1.0, 1.0))
            y = pp.sample(Uniform(-1.0, 1.0))
            s = float(x) ** 2 + float(y) ** 2
            if s < 1:
                break
        mu = 1.0 + math.sqrt(5.0) * (
            float(x) * math.sqrt(-2 * math.log(s) / s)
        )
        lik = Normal(mu, math.sqrt(2.0))
        pp.observe(lik, name="obs0")
        pp.observe(lik, name="obs1")
        return mu


def test_smc_interpreter_fallback_untraceable_model():
    # divergent control flow per particle; replayed prefixes keep each
    # particle on its ancestor's path through the rejection loop
    m = MarsagliaGUM()
    post = m.posterior_results(
        num_traces=2000, observe=GUM_OBS, inference_engine=SMC,
        resample_threshold=1.0,
    )
    assert abs(float(post.mean) - 7.25) < 0.35
    assert abs(float(post.stddev) - math.sqrt(1 / 1.2)) < 0.25
    assert abs(post.log_evidence - GUM_LOGZ) < 0.5
    assert post.metadata[-1]["vectorized"] is False


def test_guided_smc_untraceable_raises():
    # raises either "no inference network" (none trained) or, with one,
    # "requires a jax-traceable model" — never silently falls back
    m = MarsagliaGUM()
    with pytest.raises(RuntimeError):
        m.posterior(
            num_traces=100,
            observe=GUM_OBS,
            inference_engine=(
                pp.InferenceEngine.SEQUENTIAL_MONTE_CARLO_WITH_INFERENCE_NETWORK
            ),
        )


def test_smc_requires_observes():
    m = GUM()
    with pytest.raises(RuntimeError, match="observe"):
        m.posterior(num_traces=100, inference_engine=SMC)


def test_guided_smc_with_inference_network():
    # amortized SMC: IC proposals inside every stage; the replayed prefix
    # advances the LSTM via forced values so the recurrent chain stays
    # intact across resampling
    m = GUM()
    m.learn_inference_network(
        num_traces=4000,
        observe_embeddings={"obs0": {"dim": 8}, "obs1": {"dim": 8}},
        inference_network=pp.InferenceNetwork.LSTM,
        batch_size=256,
        learning_rate_init=0.01,
        lstm_dim=32,
    )
    post = m.posterior_results(
        num_traces=20000,
        observe=GUM_OBS,
        inference_engine=(
            pp.InferenceEngine.SEQUENTIAL_MONTE_CARLO_WITH_INFERENCE_NETWORK
        ),
        resample_threshold=1.0,
    )
    assert abs(float(post.mean) - 7.25) < 0.2
    assert abs(float(post.stddev) - math.sqrt(1 / 1.2)) < 0.1
    assert abs(post.log_evidence - GUM_LOGZ) < 0.3
    assert post.effective_sample_size > 0.2 * 20000
    assert "WITH_INFERENCE_NETWORK" in post.metadata[-1]["inference_engine"]


def test_guided_smc_feedforward_network():
    # the FF proposal_step's forced_value/replay branches
    m = GUM()
    m.learn_inference_network(
        num_traces=4000,
        observe_embeddings={"obs0": {"dim": 8}, "obs1": {"dim": 8}},
        inference_network=pp.InferenceNetwork.FEEDFORWARD,
        batch_size=256,
        learning_rate_init=0.01,
    )
    post = m.posterior_results(
        num_traces=20000,
        observe=GUM_OBS,
        inference_engine=(
            pp.InferenceEngine.SEQUENTIAL_MONTE_CARLO_WITH_INFERENCE_NETWORK
        ),
        resample_threshold=1.0,
    )
    assert abs(float(post.mean) - 7.25) < 0.2
    assert abs(post.log_evidence - GUM_LOGZ) < 0.3
    assert post.effective_sample_size > 0.2 * 20000


def test_guided_smc_requires_network():
    m = GUM()
    with pytest.raises(RuntimeError, match="inference network"):
        m.posterior(
            num_traces=100,
            observe=GUM_OBS,
            inference_engine=(
                pp.InferenceEngine.SEQUENTIAL_MONTE_CARLO_WITH_INFERENCE_NETWORK
            ),
        )


def test_smc_sharded_over_mesh():
    import jax
    from pyprob_tpu.parallel import data_parallel_mesh

    mesh = data_parallel_mesh(len(jax.devices()))
    m = GUM()
    post = m.posterior_results(
        num_traces=8192,
        observe=GUM_OBS,
        inference_engine=SMC,
        resample_threshold=1.0,
        mesh=mesh,
    )
    assert abs(float(post.mean) - 7.25) < 0.4
    assert np.isfinite(post.log_evidence)
