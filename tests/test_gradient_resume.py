"""Warm-start resume for the gradient engines (HMC/NUTS): posteriors
carry ``final_gradient_state`` (positions + adapted mass matrix + step
size per chain) and accept it via ``initial_trace=`` — skipping warmup
and rescoring automatically when the observation changed.  Mirrors the
LMH/RMH ChainState resume (inference/mcmc.py)."""

import math
import pickle

import numpy as np
import pytest

import pyprob_tpu as pp
from pyprob_tpu.distributions import Normal
from pyprob_tpu.models import GaussianUnknownMean

OBS = {"obs0": 8.0, "obs1": 9.0}
TRUE_MEAN = 7.25
TRUE_STD = math.sqrt(1 / 1.2)


@pytest.fixture(scope="module", params=["hmc", "nuts"])
def engine(request):
    return {
        "hmc": pp.InferenceEngine.HAMILTONIAN_MONTE_CARLO,
        "nuts": pp.InferenceEngine.NO_U_TURN_SAMPLER,
    }[request.param]


def test_resume_skips_warmup_and_stays_exact(engine):
    m = GaussianUnknownMean()
    post = m.posterior_results(
        num_traces=8000, observe=OBS, inference_engine=engine,
        num_chains=64,
    )
    state = post.final_gradient_state
    assert state is not None
    assert state.num_chains == 64 and state.dim == 1
    assert np.all(state.step_size > 0) and np.all(state.inv_mass > 0)
    # warm resume: burn_in defaults to 0, adapted step size reused
    post2 = m.posterior_results(
        num_traces=8000, observe=OBS, inference_engine=engine,
        initial_trace=state,
    )
    assert abs(float(post2.mean) - TRUE_MEAN) < 0.1
    assert abs(float(post2.stddev) - TRUE_STD) < 0.1
    meta = post2._metadata[-1]
    assert meta["burn_in"] == 0
    # no re-adaptation happened: the step size is the carried one
    assert abs(
        meta["final_step_size"] - float(np.mean(state.step_size))
    ) < 1e-5
    # the resumed run exposes its own state for further chaining
    assert post2.final_gradient_state is not None


def test_resume_rescores_changed_observation(engine):
    m = GaussianUnknownMean()
    post = m.posterior_results(
        num_traces=8000, observe=OBS, inference_engine=engine,
        num_chains=64,
    )
    state = post.final_gradient_state
    # new observation: the carried positions are rescored against the new
    # traced observe values; a short warm run must land on the NEW
    # posterior (prior N(1,5), obs {2,3} at sqrt(2): mean 2.25)
    post2 = m.posterior_results(
        num_traces=8000, observe={"obs0": 2.0, "obs1": 3.0},
        inference_engine=engine, initial_trace=state, burn_in=50,
    )
    assert abs(float(post2.mean) - 2.25) < 0.15
    assert abs(float(post2.stddev) - TRUE_STD) < 0.1


def test_state_pickles(engine):
    m = GaussianUnknownMean()
    post = m.posterior_results(
        num_traces=4000, observe=OBS, inference_engine=engine,
        num_chains=64,
    )
    state = pickle.loads(pickle.dumps(post.final_gradient_state))
    post2 = m.posterior_results(
        num_traces=4000, observe=OBS, inference_engine=engine,
        initial_trace=state,
    )
    assert abs(float(post2.mean) - TRUE_MEAN) < 0.25


def test_resume_validation_errors():
    m = GaussianUnknownMean()
    with pytest.raises(RuntimeError, match="GradientChainState"):
        m.posterior_results(
            num_traces=100, observe=OBS,
            inference_engine=pp.InferenceEngine.HAMILTONIAN_MONTE_CARLO,
            initial_trace="not a state",
        )
    post = m.posterior_results(
        num_traces=1000, observe=OBS,
        inference_engine=pp.InferenceEngine.HAMILTONIAN_MONTE_CARLO,
        num_chains=8,
    )
    state = post.final_gradient_state

    class TwoLatent(pp.Model):
        def forward(self):
            a = pp.sample(Normal(0.0, 1.0))
            b = pp.sample(Normal(0.0, 1.0))
            pp.observe(Normal(a + b, 1.0), name="obs0")
            pp.observe(Normal(a - b, 1.0), name="obs1")
            return a

    with pytest.raises(RuntimeError, match="latent dim"):
        TwoLatent().posterior_results(
            num_traces=100, observe=OBS,
            inference_engine=pp.InferenceEngine.HAMILTONIAN_MONTE_CARLO,
            initial_trace=state,
        )


def test_pt_resume_replica_ladder():
    m = GaussianUnknownMean()
    pt = pp.InferenceEngine.PARALLEL_TEMPERING
    post = m.posterior_results(
        num_traces=4000, observe=OBS, inference_engine=pt, num_chains=16,
        num_temperatures=4,
    )
    state = post.final_gradient_state
    assert state.z.ndim == 3 and state.z.shape[1:] == (4, 1)
    assert state.step_size.shape == (16, 4)
    post2 = m.posterior_results(
        num_traces=4000, observe=OBS, inference_engine=pt,
        num_temperatures=4, initial_trace=state,
    )
    assert abs(float(post2.mean) - TRUE_MEAN) < 0.2
    assert post2._metadata[-1]["burn_in"] == 0
    # rank mismatch: an HMC state cannot warm-start PT and vice versa
    hmc_post = m.posterior_results(
        num_traces=1000, observe=OBS,
        inference_engine=pp.InferenceEngine.HAMILTONIAN_MONTE_CARLO,
        num_chains=8,
    )
    with pytest.raises(RuntimeError, match="rank"):
        m.posterior_results(
            num_traces=100, observe=OBS, inference_engine=pt,
            num_temperatures=4,
            initial_trace=hmc_post.final_gradient_state,
        )
    with pytest.raises(RuntimeError, match="rank"):
        m.posterior_results(
            num_traces=100, observe=OBS,
            inference_engine=pp.InferenceEngine.HAMILTONIAN_MONTE_CARLO,
            initial_trace=state,
        )
