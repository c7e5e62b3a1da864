"""sample(mask=) — masked latent sites (beyond parity; completes the
masking story: observe/factor masks shipped earlier).

A masked-off sample site is structural padding: its value is still drawn
and PRIOR-scored — exact marginalization for every likelihood-based
engine (the padded joint's marginal over padding dims is the true
posterior) — while the IC engine proposes it from the prior with zero
weight correction and excludes it from the training loss.  This lets
variable-latent-structure programs compile as fixed-bound loops (one
program per bound), like observe(mask=) does for observations.
"""

import math

import numpy as np
import pytest

import pyprob_tpu as pp
from pyprob_tpu.distributions import Categorical, Normal, Uniform
from pyprob_tpu.vectorized import _TraceabilityCache

_MAX_K = 3
_PROBS = (0.3, 0.4, 0.3)
_SIGMA = 0.5
_Y = 2.5


class VarLatent(pp.Model):
    """K ~ Categorical{1..3}; x_i ~ Normal(0,1) for i < K (sites i >= K
    masked off); observe Normal(sum of active x_i, 0.5).  The number of
    REAL latents is data-dependent, but the program has a fixed site set."""

    def forward(self):
        k = pp.sample(Categorical(probs=list(_PROBS)), name="k") + 1
        total = 0.0
        for i in range(_MAX_K):
            active = i < k
            x = pp.sample(Normal(0.0, 1.0), address=f"x{i}", mask=active)
            total = total + x * active
        pp.observe(Normal(total, _SIGMA), name="y")
        return total


def _true_k_posterior(y):
    """p(k | y) with sum of k active x_i ~ N(0, k): enumerate k."""
    pdf = np.array(
        [
            p * math.exp(-0.5 * y * y / (k + _SIGMA**2))
            / math.sqrt(k + _SIGMA**2)
            for k, p in zip(range(1, _MAX_K + 1), _PROBS)
        ]
    )
    return pdf / pdf.sum()


TRUE_K = _true_k_posterior(_Y)


def _k_posterior_from(post):
    vals = np.array([float(post._get_value(i)) for i in range(post.length)])
    lw = np.asarray(post._log_weights, np.float64)
    w = np.exp(lw - lw.max())
    w = w / w.sum()
    return np.array([w[vals == k].sum() for k in range(1, _MAX_K + 1)])


@pytest.fixture(scope="module")
def model():
    return VarLatent()


def test_compiled_is_exact(model):
    post = model.posterior(
        num_traces=100000, observe={"y": _Y}, vectorized=True,
        map_func=lambda t: float(t.named_variables["k"].value) + 1,
    )
    assert _TraceabilityCache._cache.get(VarLatent) is True
    est = _k_posterior_from(post)
    assert np.abs(est - TRUE_K).max() < 0.02, (est, TRUE_K)


def test_interpreter_is_exact():
    class Host(VarLatent):
        _never_vectorize = True

    post = Host().posterior(
        num_traces=4000, observe={"y": _Y}, vectorized=False,
        map_func=lambda t: float(t.named_variables["k"].value) + 1,
    )
    est = _k_posterior_from(post)
    assert np.abs(est - TRUE_K).max() < 0.1, (est, TRUE_K)


def test_masked_flags_recorded(model):
    # masked flags follow each trace's own structure selector, both tiers
    for vectorized in (True, False):
        traces = model.prior(num_traces=40, vectorized=vectorized)
        for i in range(traces.length):
            t = traces._get_value(i)
            k = int(t.named_variables["k"].value) + 1
            for j in range(_MAX_K):
                v = t.variables_dict_address[f"x{j}__Normal__1"]
                assert v.masked == (j >= k), (vectorized, k, j)
                # masked or not, the value was drawn and the site scored
                # (prior padding)
                assert v.value is not None and v.log_prob is not None


def test_mcmc_compiled_exact(model):
    # vectorized MCMC returns result values (the sum of active x_i); its
    # posterior must match a large IS reference — the padded prior-scored
    # chain targets the correct marginal
    ref = model.posterior_results(num_traces=300000, observe={"y": _Y})
    post = model.posterior_results(
        num_traces=60000, observe={"y": _Y}, vectorized=True,
        inference_engine=pp.InferenceEngine.LIGHTWEIGHT_METROPOLIS_HASTINGS,
    )
    assert abs(float(post.mean) - float(ref.mean)) < 0.1
    assert abs(float(post.stddev) - float(ref.stddev)) < 0.1


def test_gradient_engine_enumerates_and_pads(model):
    # k is enumerable; the x_i keep their prior density when masked off
    # (the potential stays proper along padding dims) — the RESULT
    # posterior must match a large IS reference
    ref = model.posterior_results(num_traces=300000, observe={"y": _Y})
    hmc = model.posterior_results(
        num_traces=20000, observe={"y": _Y},
        inference_engine=pp.InferenceEngine.HAMILTONIAN_MONTE_CARLO,
    )
    assert abs(float(hmc.mean) - float(ref.mean)) < 0.1
    assert abs(float(hmc.stddev) - float(ref.stddev)) < 0.1


def test_ic_training_and_guided_is():
    m = VarLatent()
    m.learn_inference_network(
        num_traces=16000,
        observe_embeddings={"y": {"dim": 16}},
        inference_network=pp.InferenceNetwork.LSTM,
        lstm_dim=64,
        batch_size=512,
        learning_rate_init=0.005,
    )
    ic = m.posterior(
        num_traces=20000, observe={"y": _Y}, vectorized=True,
        inference_engine=pp.InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK,
        map_func=lambda t: float(t.named_variables["k"].value) + 1,
    )
    est = _k_posterior_from(ic)
    assert np.abs(est - TRUE_K).max() < 0.05, (est, TRUE_K)
    is_post = m.posterior(
        num_traces=20000, observe={"y": _Y}, vectorized=True,
        map_func=lambda t: float(t.named_variables["k"].value) + 1,
    )
    # guided proposals (with masked sites excluded from loss and weight
    # corrections) must beat prior IS on ESS
    assert ic.effective_sample_size > is_post.effective_sample_size


def test_training_loss_gates_masked_steps():
    # structural check: packed sub-batches carry a per-step 1/0 mask
    # exactly at steps where some trace masked the site
    from pyprob_tpu.nn.inference_network_lstm import InferenceNetworkLSTM

    m = VarLatent()
    traces = [
        m.prior(num_traces=1, vectorized=False)._get_value(0)
        for _ in range(16)
    ]
    net = InferenceNetworkLSTM(
        model=m, observe_embeddings={"y": {"dim": 8}}, lstm_dim=16
    )
    packed = net._pack_sub_batch(traces)
    ks = [int(t.named_variables["k"].value) + 1 for t in traces]
    # step 0 is x0 after the k site?  controlled order: k, x0, x1, x2
    for step_idx, site in enumerate(["k", "x0", "x1", "x2"]):
        sm = packed["steps"][step_idx].get("mask")
        if site == "k" or site == "x0":
            assert sm is None  # never masked (x0 active for every k >= 1)
        else:
            j = int(site[1])
            expect = np.array([0.0 if j >= k else 1.0 for k in ks])
            assert sm is not None
            np.testing.assert_allclose(np.asarray(sm), expect)


def test_mask_inside_rejection_block_raises():
    class Bad(pp.Model):
        def forward(self):
            def attempt():
                x = pp.sample(Uniform(0.0, 1.0), mask=True)
                return x, x > 0.5

            x = pp.rejection_sample(attempt)
            pp.observe(Normal(x, 1.0), name="y")
            return x

    with pytest.raises(RuntimeError, match="not supported"):
        Bad().posterior_results(num_traces=10, observe={"y": 0.7})
