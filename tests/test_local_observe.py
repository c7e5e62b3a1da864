"""Per-step local observation slot for tied-instance Markov IC
(round 4): the values of the observes following each controlled site
feed the LSTM input at that site, so filtering proposals condition on
y_t directly instead of having to localize it inside a fixed-width
whole-sequence embedding — the measured information bottleneck behind
guided scan-SMC's flat ESS at large T (BASELINE.md r4).

No reference counterpart (the reference has no scan-SMC and no tied
instances); the feature's exactness argument is the usual one — the
proposal is scored exactly as used, so any input only changes proposal
QUALITY, never weights.
"""

import numpy as np
import pytest

import pyprob_tpu as pp
from pyprob_tpu.models import LinearGaussianStateSpaceMarkov


@pytest.fixture(scope="module")
def informative_trained():
    """LGSS with diffuse transitions (stddev 2.0) against precise
    observations (stddev 0.1): bootstrap proposals collapse (per-step
    survival ~ sigma_obs/sigma_pred ~ 5%), the regime amortized
    proposals exist for."""
    pp.seed(11)
    T = 8
    m = LinearGaussianStateSpaceMarkov(
        num_steps=T, transition_stddev=2.0, observation_stddev=0.1
    )
    xs, ys = m.synthesize(rng=2)
    m.learn_inference_network(
        num_traces=6144,
        observe_embeddings={"y": {"dim": 16}},
        inference_network=pp.InferenceNetwork.LSTM,
        batch_size=256,
        learning_rate_init=0.003,
        lstm_dim=64,
    )
    return m, ys


def test_local_slot_sized_from_step_structure(informative_trained):
    m, _ = informative_trained
    net = m._inference_network
    # one scalar observe follows each step's sample site
    assert net._local_observe_dim == 1
    # and the LSTM input grew by exactly that slot
    base = (
        net._observe_embedding_dim
        + net._sample_embedding_dim
        + 2 * (net._address_embedding_dim
               + net._distribution_type_embedding_dim)
    )
    assert net._lstm_input_dim == base + 1


def test_guided_scan_smc_beats_bootstrap_with_local_obs(
    informative_trained,
):
    m, ys = informative_trained
    obs = m.observes(ys)
    fm, fv = m.kalman_filter(ys)
    lz = m.kalman_log_evidence(ys)
    n = 4096
    ess = {}
    for label, eng in (
        ("unguided", pp.InferenceEngine.SEQUENTIAL_MONTE_CARLO),
        (
            "guided",
            pp.InferenceEngine.SEQUENTIAL_MONTE_CARLO_WITH_INFERENCE_NETWORK,
        ),
    ):
        post = m.posterior_results(
            n, observe=obs, inference_engine=eng, resample_threshold=0.7
        )
        # exact vs the Kalman filter regardless of proposal quality
        assert abs(float(post.mean) - fm[-1]) < 4.0 * np.sqrt(fv[-1] / 50)
        assert abs(post.log_evidence - lz) < 1.0
        ess[label] = post.effective_sample_size
    # the point of the feature: the local slot lets the proposal track
    # the precise observation, where the whole-sequence-embedding-only
    # design measured ESS parity with bootstrap in every regime
    assert ess["guided"] > 2.0 * ess["unguided"], ess


def test_checkpoint_roundtrip_preserves_local_slot(
    informative_trained, tmp_path
):
    m, ys = informative_trained
    net = m._inference_network
    path = str(tmp_path / "net.network")
    net._save(path)
    from pyprob_tpu.nn.inference_network import InferenceNetwork

    net2 = InferenceNetwork._load(path)
    assert net2._local_observe_dim == net._local_observe_dim
    assert net2._lstm_input_dim == net._lstm_input_dim


def test_untied_training_keeps_slot_off():
    pp.seed(3)
    from pyprob_tpu.models import GaussianUnknownMean

    m = GaussianUnknownMean()
    m.learn_inference_network(
        num_traces=256,
        observe_embeddings={"obs0": {"dim": 8}, "obs1": {"dim": 8}},
        inference_network=pp.InferenceNetwork.LSTM,
        batch_size=64,
    )
    assert m._inference_network._local_observe_dim == 0
