"""Inference-compilation training tests: online/offline training, IC
posterior quality, save->load->continue round trips preserving optimizer
state and LR-scheduler position (reference: tests/test_train.py:44-215)."""

import math
import os

import numpy as np
import pytest

import pyprob_tpu as pp
from pyprob_tpu.distributions import Normal

OBS_EMB = {"obs0": {"dim": 16}, "obs1": {"dim": 16}}
OBS = {"obs0": 8, "obs1": 9}


class GUM(pp.Model):
    def forward(self):
        mu = pp.sample(Normal(1.0, math.sqrt(5.0)))
        likelihood = Normal(mu, math.sqrt(2.0))
        pp.observe(likelihood, name="obs0")
        pp.observe(likelihood, name="obs1")
        return mu


def _train(m, num_traces=8000, network=pp.InferenceNetwork.FEEDFORWARD, **kw):
    m.learn_inference_network(
        num_traces=num_traces,
        observe_embeddings=OBS_EMB,
        inference_network=network,
        batch_size=512,
        learning_rate_init=0.005,
        **kw,
    )


def test_train_ff_and_ic_posterior():
    m = GUM()
    _train(m, num_traces=16000)
    post = m.posterior_results(
        num_traces=2000,
        observe=OBS,
        inference_engine=pp.InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK,
    )
    assert abs(float(post.mean) - 7.25) < 0.6
    # IC ESS floor: reference demands >15% (tests/test_inference.py:149)
    assert post.effective_sample_size > 0.15 * 2000


def test_train_lstm_and_vectorized_ic():
    m = GUM()
    _train(m, num_traces=16000, network=pp.InferenceNetwork.LSTM, lstm_dim=64)
    post = m.posterior_results(
        num_traces=5000,
        observe=OBS,
        vectorized=True,
        inference_engine=pp.InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK,
    )
    assert abs(float(post.mean) - 7.25) < 0.6
    assert post.effective_sample_size > 0.15 * 5000


def test_save_load_continue(tmp_path):
    m = GUM()
    _train(m, num_traces=4000)
    traces_before = m._inference_network._total_train_traces
    iters_before = m._inference_network._total_train_iterations
    fn = str(tmp_path / "net.network")
    m.save_inference_network(fn)

    m2 = GUM()
    m2.load_inference_network(fn)
    net = m2._inference_network
    assert net._total_train_traces == traces_before
    assert net._total_train_iterations == iters_before
    # optimizer state restored: moments present
    assert net._opt_state is not None
    # continue training
    _train(m2, num_traces=2000)
    assert m2._inference_network._total_train_traces > traces_before
    post = m2.posterior_results(
        num_traces=2000,
        observe=OBS,
        inference_engine=pp.InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK,
    )
    assert abs(float(post.mean) - 7.25) < 0.8


def test_adam_larc_poly2_schedule():
    # ADAM_LARC + POLY2 decays lr from init toward end over the trace budget
    # (reference: tests/test_train.py:112-117)
    m = GUM()
    m.learn_inference_network(
        num_traces=2048,
        num_traces_end=2048,
        observe_embeddings=OBS_EMB,
        batch_size=256,
        optimizer_type=pp.Optimizer.ADAM_LARC,
        learning_rate_init=0.1,
        learning_rate_end=0.0025,
        learning_rate_scheduler_type=pp.LearningRateScheduler.POLY2,
    )
    net = m._inference_network
    assert net._total_train_traces >= 2048
    assert np.isclose(net.learning_rate, 0.0025, atol=1e-4)


def test_offline_dataset_training(tmp_path):
    dataset_dir = str(tmp_path / "dataset")
    m = GUM()
    m.save_dataset(dataset_dir, num_traces=2000, num_traces_per_file=500)
    m2 = GUM()
    m2.learn_inference_network(
        num_traces=4000,
        observe_embeddings=OBS_EMB,
        dataset_dir=dataset_dir,
        batch_size=256,
        learning_rate_init=0.005,
    )
    post = m2.posterior_results(
        num_traces=2000,
        observe=OBS,
        inference_engine=pp.InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK,
    )
    assert abs(float(post.mean) - 7.25) < 0.8
    assert post.effective_sample_size > 0.05 * 2000


def test_snapshot_restore_params_checkpoint_selection():
    """snapshot_params/restore_params: restoring a checkpoint must also
    invalidate the memoized serving closure
    (cached_vectorized_proposal_step bakes parameters at creation and
    keys on the train-iteration count, which a restore does not change)
    — bench.py's best-of-segments selection depends on this."""
    import jax

    pp.seed(3)
    m = GUM()
    _train(m, num_traces=1024, network=pp.InferenceNetwork.LSTM, lstm_dim=16)
    net = m._inference_network
    snap = net.snapshot_params()
    ps1 = net.cached_vectorized_proposal_step(OBS)
    _train(m, num_traces=1024, network=pp.InferenceNetwork.LSTM, lstm_dim=16)
    ps2 = net.cached_vectorized_proposal_step(OBS)
    assert ps2 is not ps1  # retraining invalidates via the iteration key
    net.restore_params(snap)
    ps3 = net.cached_vectorized_proposal_step(OBS)
    assert ps3 is not ps2  # the restore invalidates too
    # and the parameters really are the snapshot again (r5: snapshots
    # carry {params, ema_params, ema_steps} for EMA-aware selection)
    for a, b in zip(
        jax.tree_util.tree_leaves(snap["params"]),
        jax.tree_util.tree_leaves(net._params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the restored net serves: posterior is finite and sane
    post = m.posterior_results(
        1000,
        observe=OBS,
        vectorized=True,
        inference_engine=(
            pp.InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK
        ),
    )
    assert np.isfinite(float(post.mean))
