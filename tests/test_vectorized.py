"""Compiled (vmap) tier tests: vectorized prior/IS/MCMC against analytic
posteriors, interpreter-tier agreement, and fallback behavior."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

import pyprob_tpu as pp
from pyprob_tpu.distributions import Normal, Uniform, Categorical


class GUM(pp.Model):
    def forward(self):
        mu = pp.sample(Normal(1.0, math.sqrt(5.0)))
        likelihood = Normal(mu, math.sqrt(2.0))
        pp.observe(likelihood, name="obs0")
        pp.observe(likelihood, name="obs1")
        return mu


class MarsagliaGUM(pp.Model):
    """Unbounded rejection loop with host control flow: NOT jax-traceable;
    must fall back to the interpreter tier."""

    def forward(self):
        while True:
            x = pp.sample(Uniform(-1.0, 1.0))
            y = pp.sample(Uniform(-1.0, 1.0))
            s = float(x) ** 2 + float(y) ** 2
            if s < 1:
                break
        mu = 1.0 + math.sqrt(5.0) * (float(x) * math.sqrt(-2 * math.log(s) / s))
        lik = Normal(mu, math.sqrt(2.0))
        pp.observe(lik, name="obs0")
        pp.observe(lik, name="obs1")
        return mu


OBS = {"obs0": 8, "obs1": 9}
TRUE_MEAN = 7.25
TRUE_STD = math.sqrt(1 / 1.2)


def test_vectorized_prior():
    m = GUM()
    prior = m.prior_results(num_traces=10000, vectorized=True)
    assert abs(float(prior.mean) - 1.0) < 0.15
    assert abs(float(prior.stddev) - math.sqrt(5.0)) < 0.15


def test_vectorized_is_posterior():
    m = GUM()
    post = m.posterior_results(num_traces=20000, observe=OBS, vectorized=True)
    assert abs(float(post.mean) - TRUE_MEAN) < 0.3
    assert abs(float(post.stddev) - TRUE_STD) < 0.3
    assert post.effective_sample_size > 0.005 * 20000


def test_vectorized_matches_interpreter():
    m = GUM()
    p_vec = m.posterior_results(num_traces=20000, observe=OBS, vectorized=True)
    p_int = m.posterior_results(num_traces=4000, observe=OBS, vectorized=False)
    assert abs(float(p_vec.mean) - float(p_int.mean)) < 0.5


def test_vectorized_full_traces():
    m = GUM()
    post = m.posterior(num_traces=500, observe=OBS, vectorized=True)
    trace = post[0]
    assert trace.length_controlled == 1
    assert len(trace.variables_observed) == 2
    assert np.isfinite(float(trace.log_importance_weight))
    # weighted stats over mapped traces
    mean = float(post.map(lambda t: float(t.result)).mean)
    assert abs(mean - TRUE_MEAN) < 1.0


def test_vectorized_lmh():
    m = GUM()
    post = m.posterior_results(
        num_traces=50000,
        observe=OBS,
        vectorized=True,
        inference_engine=pp.InferenceEngine.LIGHTWEIGHT_METROPOLIS_HASTINGS,
    )
    assert abs(float(post.mean) - TRUE_MEAN) < 0.75
    assert abs(float(post.stddev) - TRUE_STD) < 0.75


def test_vectorized_rmh():
    m = GUM()
    post = m.posterior_results(
        num_traces=50000,
        observe=OBS,
        vectorized=True,
        inference_engine=pp.InferenceEngine.RANDOM_WALK_METROPOLIS_HASTINGS,
    )
    assert abs(float(post.mean) - TRUE_MEAN) < 0.3
    assert abs(float(post.stddev) - TRUE_STD) < 0.3


def test_vectorized_fallback_to_interpreter():
    m = MarsagliaGUM()
    post = m.posterior_results(num_traces=2000, observe=OBS, vectorized=True)
    # fell back, still correct
    assert abs(float(post.mean) - TRUE_MEAN) < 1.0
    # cached: second call goes straight to interpreter without retracing
    from pyprob_tpu.vectorized import _TraceabilityCache

    assert _TraceabilityCache.known_untraceable(m)


def test_vectorized_multisite_hmm():
    class HMM(pp.Model):
        def forward(self):
            T = jnp.asarray([[0.9, 0.1], [0.2, 0.8]])
            mus = jnp.asarray([-1.0, 1.0])
            z = pp.sample(Categorical(probs=jnp.asarray([0.5, 0.5])))
            zs = []
            for t in range(4):
                z = pp.sample(Categorical(probs=T[z]))
                pp.observe(Normal(mus[z], 0.5), name=f"obs{t}")
                zs.append(z)
            return jnp.stack(zs)

    m = HMM()
    obs = {f"obs{t}": v for t, v in enumerate([-1.0, -1.0, 1.0, 1.0])}
    post = m.posterior_results(num_traces=20000, observe=obs, vectorized=True)
    marginals = np.asarray(post.mean)
    assert marginals[0] < 0.1 and marginals[1] < 0.1
    assert marginals[2] > 0.9 and marginals[3] > 0.9
    post2 = m.posterior_results(
        num_traces=20000,
        observe=obs,
        vectorized=True,
        inference_engine=pp.InferenceEngine.RANDOM_WALK_METROPOLIS_HASTINGS,
    )
    marginals2 = np.asarray(post2.mean)
    assert marginals2[0] < 0.15 and marginals2[3] > 0.85


def test_vectorized_factor():
    class FactorModel(pp.Model):
        def forward(self):
            mu = pp.sample(Normal(0.0, 1.0))
            pp.factor(log_prob_func=lambda _: -(mu**2))
            return mu

    m = FactorModel()
    post = m.posterior_results(num_traces=20000, vectorized=True)
    assert abs(float(post.mean)) < 0.1
    assert abs(float(post.stddev) - math.sqrt(1.0 / 3.0)) < 0.1


def test_vectorized_missing_observe_raises():
    m = GUM()
    with pytest.raises(RuntimeError):
        m.posterior_results(
            num_traces=10, observe={"obs0": None, "obs1": 9}, vectorized=True
        )


def test_vectorized_mcmc_per_chain_resume(tmp_path):
    # ChainState: every chain resumes from its own final state (the
    # reference can resume only a single sequential chain via
    # initial_trace=posterior[-1], reference: model.py:122-127)
    m = GUM()
    post1 = m.posterior_results(
        num_traces=20000,
        observe=OBS,
        vectorized=True,
        inference_engine=pp.InferenceEngine.RANDOM_WALK_METROPOLIS_HASTINGS,
    )
    state = post1.final_chain_state
    assert isinstance(state, pp.ChainState)
    assert state.num_chains >= 1

    # save/load round trip
    fn = str(tmp_path / "chains.pkl")
    state.save(fn)
    state2 = pp.ChainState.load(fn)
    assert state2.num_chains == state.num_chains
    for a in state.values:
        assert np.allclose(state2.values[a], state.values[a])

    # resume: no burn-in (chains already at posterior states), same count
    post2 = m.posterior_results(
        num_traces=20000,
        observe=OBS,
        vectorized=True,
        initial_trace=state2,
        inference_engine=pp.InferenceEngine.RANDOM_WALK_METROPOLIS_HASTINGS,
    )
    assert abs(float(post2.mean) - TRUE_MEAN) < 0.3
    assert abs(float(post2.stddev) - TRUE_STD) < 0.3
    assert post2.final_chain_state.num_chains == state.num_chains

    # resume under a CHANGED observation: stored likelihoods are invalid;
    # one rescore pass must re-anchor the chains to the new posterior
    obs_new = {"obs0": 0.0, "obs1": 1.0}
    # true posterior for observes {0, 1}: Normal(0.892..., sqrt(1/1.2))
    true_mean_new = (1.0 / 5.0 + (0.0 + 1.0) / 2.0) / (1.0 / 5.0 + 2.0 / 2.0)
    post3 = m.posterior_results(
        num_traces=20000,
        observe=obs_new,
        vectorized=True,
        initial_trace=state2,
        inference_engine=pp.InferenceEngine.RANDOM_WALK_METROPOLIS_HASTINGS,
    )
    assert abs(float(post3.mean) - true_mean_new) < 0.4


def test_vectorized_mcmc_chain_state_mismatch():
    class Other(pp.Model):
        def forward(self):
            a = pp.sample(Normal(0.0, 1.0), address="completely_different")
            pp.observe(Normal(a, 1.0), name="obs0")
            return a

    m = GUM()
    post = m.posterior_results(
        num_traces=4000,
        observe=OBS,
        vectorized=True,
        inference_engine=pp.InferenceEngine.LIGHTWEIGHT_METROPOLIS_HASTINGS,
    )
    state = post.final_chain_state
    other = Other()
    with pytest.raises(ValueError):
        other.posterior_results(
            num_traces=4000,
            observe={"obs0": 1.0},
            vectorized=True,
            initial_trace=state,
            inference_engine=pp.InferenceEngine.LIGHTWEIGHT_METROPOLIS_HASTINGS,
        )


def test_chain_state_rejected_on_interpreter_tier():
    m = GUM()
    post = m.posterior_results(
        num_traces=4000,
        observe=OBS,
        vectorized=True,
        inference_engine=pp.InferenceEngine.LIGHTWEIGHT_METROPOLIS_HASTINGS,
    )
    state = post.final_chain_state
    # untraceable model: compiled tier unavailable -> clear error, not a
    # silent fall-through into the sequential chain
    mars = MarsagliaGUM()
    with pytest.raises((ValueError, TypeError)):
        mars.posterior_results(
            num_traces=100,
            observe=OBS,
            vectorized=True,
            initial_trace=state,
            inference_engine=pp.InferenceEngine.LIGHTWEIGHT_METROPOLIS_HASTINGS,
        )
    # explicit interpreter tier: same protection
    with pytest.raises(TypeError):
        m.posterior_results(
            num_traces=100,
            observe=OBS,
            vectorized=False,
            initial_trace=state,
            inference_engine=pp.InferenceEngine.LIGHTWEIGHT_METROPOLIS_HASTINGS,
        )


def test_mcmc_chain_knobs_route_through_posterior():
    # num_chains / burn_in / return_chains are first-class posterior()
    # arguments for the compiled MCMC tier (previously they leaked into
    # forward(**kwargs) and crashed)
    m = GUM()
    p = m.posterior_results(
        num_traces=8000,
        observe=OBS,
        vectorized=True,
        inference_engine=pp.InferenceEngine.RANDOM_WALK_METROPOLIS_HASTINGS,
        num_chains=32,
        burn_in=16,
    )
    assert p.final_chain_state.num_chains == 32
    # chain count pads to a mesh-size multiple (8 virtual devices in tests)
    chains = m.posterior_results(
        num_traces=4000,
        observe=OBS,
        vectorized=True,
        inference_engine=pp.InferenceEngine.RANDOM_WALK_METROPOLIS_HASTINGS,
        num_chains=8,
        return_chains=True,
    )
    assert len(chains) == 8
    # interpreter tier: warned and ignored, not forwarded to forward()
    with pytest.warns(UserWarning, match="compiled MCMC/SMC tiers"):
        m.posterior_results(
            num_traces=50,
            observe=OBS,
            vectorized=False,
            inference_engine=pp.InferenceEngine.RANDOM_WALK_METROPOLIS_HASTINGS,
            num_chains=4,
        )


def test_oom_backoff_halves_dispatch_and_remembers(monkeypatch):
    # a dispatch that OOMs (compile- or run-time) halves the chunk size,
    # retries, stitches the full result, and remembers the working cap
    # for the model so the next call starts there
    from pyprob_tpu import vectorized as V

    class FakeModel:
        pass

    model = FakeModel()
    calls = []

    def fake_get_jitted_run(m, *a, **k):
        def run(keys, obs):
            n = len(keys)
            calls.append(n)
            if n > 64:
                raise RuntimeError(
                    "RESOURCE_EXHAUSTED: Ran out of memory in memory "
                    "space hbm"
                )
            return {"result": np.arange(n, dtype=np.float32)}

        return run, [("site0",)], m

    monkeypatch.setattr(V, "_get_jitted_run", fake_get_jitted_run)
    monkeypatch.setattr(V, "_BATCH_LIMIT", 512)
    V._oom_batch_limit.pop(id(model), None)

    with pytest.warns(UserWarning, match="device OOM"):
        host, sites = V._run_batched(
            model, 300, {}, pp.util.TraceMode.POSTERIOR,
            pp.InferenceEngine.IMPORTANCE_SAMPLING,
            pp.util.PriorInflation.DISABLED, 1.0,
        )
    assert host["result"].shape == (300,)
    assert sites == ("site0",)
    # 300 requested, OOM at 300 then 150 then 75; succeeds at <=64
    assert max(calls) > 64 and V._oom_batch_limit[id(model)] <= 64

    # second call starts at the remembered cap: no oversized dispatches
    calls.clear()
    host, _ = V._run_batched(
        model, 200, {}, pp.util.TraceMode.POSTERIOR,
        pp.InferenceEngine.IMPORTANCE_SAMPLING,
        pp.util.PriorInflation.DISABLED, 1.0,
    )
    assert host["result"].shape == (200,)
    assert max(calls) <= 64
    V._oom_batch_limit.pop(id(model), None)


def test_batch_limit_env_knob(monkeypatch):
    from pyprob_tpu import vectorized as V

    class FakeModel:
        pass

    model = FakeModel()
    sizes = []

    def fake_get_jitted_run(m, *a, **k):
        def run(keys, obs):
            sizes.append(len(keys))
            return {"result": np.zeros(len(keys), dtype=np.float32)}

        return run, [()], m

    monkeypatch.setattr(V, "_get_jitted_run", fake_get_jitted_run)
    monkeypatch.setenv("PYPROB_TPU_BATCH_LIMIT", "50")
    host, _ = V._run_batched(
        model, 120, {}, pp.util.TraceMode.POSTERIOR,
        pp.InferenceEngine.IMPORTANCE_SAMPLING,
        pp.util.PriorInflation.DISABLED, 1.0,
    )
    assert host["result"].shape == (120,)
    assert max(sizes) <= 50
