"""Lockstep guided inference for LOCAL interpreter-tier models
(pyprob_tpu.interpreter_lockstep) — the in-process counterpart of
test_remote_lockstep.py's PPX pool.

K worker threads run forward() under thread-local contexts; every
proposal-network site is answered by ONE batched device step per round
(VERDICT r2 directive #3).  Measured on this machine (BASELINE.md r3):
GUM-Marsaglia guided IC-LSTM 1,082 traces/s vs the reference's 72.3 at
matched architecture and better ESS — the tests here pin correctness,
not throughput.
"""

import math

import numpy as np
import pytest

import pyprob_tpu as pp
from pyprob_tpu.distributions import Distribution, Normal, Uniform
from pyprob_tpu.models import GaussianUnknownMeanMarsaglia

GUM_OBS = {"obs0": 8.0, "obs1": 9.0}
GUM_TRUE = Normal(7.25, math.sqrt(1 / 1.2))
ENGINE = pp.InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK


class GUM(pp.Model):
    def forward(self):
        mu = pp.sample(Normal(1.0, math.sqrt(5.0)))
        likelihood = Normal(mu, math.sqrt(2.0))
        pp.observe(likelihood, name="obs0")
        pp.observe(likelihood, name="obs1")
        return mu


def _check_gum(post, tol=0.75, kl_tol=0.25):
    mean, stddev = float(post.mean), float(post.stddev)
    kl = float(
        Distribution.kl_divergence(Normal(mean, max(stddev, 1e-3)), GUM_TRUE)
    )
    assert abs(mean - 7.25) < tol, mean
    assert abs(stddev - math.sqrt(1 / 1.2)) < tol, stddev
    assert kl < kl_tol, kl


def _train(model, network=pp.InferenceNetwork.LSTM, num_traces=3072,
           lstm_dim=64, **kw):
    model.learn_inference_network(
        num_traces=num_traces,
        observe_embeddings={"obs0": {"dim": 16}, "obs1": {"dim": 16}},
        inference_network=network,
        batch_size=256,
        learning_rate_init=0.005,
        lstm_dim=lstm_dim,
        **kw,
    )
    return model


def test_lockstep_gum_lstm_matches_sequential_statistics():
    pp.seed(7)
    m = _train(GUM())
    post = m.posterior_results(
        4000, observe=GUM_OBS, vectorized=False, inference_engine=ENGINE
    )
    _check_gum(post)
    # guided: well above the unguided-IS ESS regime (the full-budget 15%
    # floor lives in test_inference.py; this is a short training run)
    assert post.effective_sample_size > 0.03 * 4000
    seq = m.posterior_results(
        1000,
        observe=GUM_OBS,
        vectorized=False,
        inference_engine=ENGINE,
        lockstep=False,
    )
    _check_gum(seq)
    # same proposal quality on both paths (per-trace weights from the
    # same network): ESS fractions in the same band
    f_lock = post.effective_sample_size / 4000
    f_seq = seq.effective_sample_size / 1000
    assert abs(f_lock - f_seq) < 0.25, (f_lock, f_seq)


def test_lockstep_marsaglia_lstm():
    """The canonical universal-PPL IC benchmark: divergent while-loop
    control flow fragments buckets without breaking semantics."""
    pp.seed(11)
    m = _train(GaussianUnknownMeanMarsaglia())
    post = m.posterior_results(
        4000, observe=GUM_OBS, vectorized=False, inference_engine=ENGINE
    )
    _check_gum(post)
    assert post.effective_sample_size > 0.004 * 4000


def test_lockstep_ff_network():
    pp.seed(3)
    m = _train(GUM(), network=pp.InferenceNetwork.FEEDFORWARD)
    post = m.posterior_results(
        4000, observe=GUM_OBS, vectorized=False, inference_engine=ENGINE
    )
    _check_gum(post)
    assert post.effective_sample_size > 0.05 * 4000


def test_lockstep_deterministic_per_seed():
    m = _train(GUM(), num_traces=1024)
    pp.seed(42)
    p1 = m.posterior_results(
        512, observe=GUM_OBS, vectorized=False, inference_engine=ENGINE
    )
    pp.seed(42)
    p2 = m.posterior_results(
        512, observe=GUM_OBS, vectorized=False, inference_engine=ENGINE
    )
    # per-(seed, ticket) RNG streams + per-request device keys: results
    # identical regardless of thread scheduling / bucket composition
    np.testing.assert_allclose(
        np.sort(np.asarray(p1.get_values(), dtype=np.float64)),
        np.sort(np.asarray(p2.get_values(), dtype=np.float64)),
        rtol=1e-6,
    )


def test_lockstep_rejection_block_retries():
    """rejection_sample inside a lockstep worker: the proposal shim's
    lazy materialization serves the defensive-mixture retry scoring and
    the per-worker recurrent-state snapshot/restore works."""
    pp.seed(5)

    class RejModel(pp.Model):
        def forward(self):
            def attempt():
                x = pp.sample(Uniform(-1.0, 1.0))
                y = pp.sample(Uniform(-1.0, 1.0))
                s = float(x) ** 2 + float(y) ** 2
                return (float(x), s), s < 1
            (x, s) = pp.rejection_sample(attempt)[0], None
            mu = 1.0 + math.sqrt(5.0) * x
            pp.observe(Normal(mu, math.sqrt(2.0)), name="obs0")
            pp.observe(Normal(mu, math.sqrt(2.0)), name="obs1")
            return mu

    m = RejModel()
    m.learn_inference_network(
        num_traces=2048,
        observe_embeddings={"obs0": {"dim": 16}, "obs1": {"dim": 16}},
        inference_network=pp.InferenceNetwork.LSTM,
        batch_size=256,
        learning_rate_init=0.005,
        lstm_dim=32,
    )
    post = m.posterior_results(
        2000, observe=GUM_OBS, vectorized=False, inference_engine=ENGINE
    )
    assert np.isfinite(float(post.mean))
    assert post.effective_sample_size > 1


def test_lockstep_parallel_model_composition():
    """ParallelModel x lockstep: guided IC fans across worker PROCESSES,
    each running the thread-lockstep pool (the reference's ParallelModel
    cannot run IC at all, reference: pyprob/model.py:332-333)."""
    pp.seed(9)
    m = _train(GaussianUnknownMeanMarsaglia(), num_traces=2048)
    pm = pp.ParallelModel(m, num_workers=2)
    post = pm.posterior_results(
        1200, observe=GUM_OBS, inference_engine=ENGINE
    )
    _check_gum(post)
    assert post.length > 1000
