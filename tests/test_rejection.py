"""rejection_sample combinator: compiled-tier rejection loops.

SURVEY.md hard part #1 — the reference's GUM-Marsaglia rejection loop is
the canonical universal-PPL stress model and runs one-trace-at-a-time in
Python there (reference: tests/test_inference.py:249-310).  Here the
combinator gives the loop replacement semantics (stable addresses, like
pyprob_cpp's replace=true / test_gum_marsaglia_replacement), which lets
the compiled tier lower it to a lax.while_loop inside the vmapped particle
program.
"""

import math

import numpy as np
import pytest

import pyprob_tpu as pp
from pyprob_tpu.distributions import Normal, Uniform
from pyprob_tpu.models import GaussianUnknownMeanMarsagliaRejection
from pyprob_tpu.vectorized import _TraceabilityCache

OBS = {"obs0": 8.0, "obs1": 9.0}
TRUE_MEAN = 7.25
TRUE_STD = math.sqrt(1 / 1.2)


@pytest.fixture(scope="module")
def model():
    return GaussianUnknownMeanMarsagliaRejection()


def test_compiled_prior_moments(model):
    pr = model.prior_results(num_traces=20000)
    # Marsaglia polar method produces exactly Normal(1, sqrt 5)
    assert abs(float(pr.mean) - 1.0) < 0.1
    assert abs(float(pr.stddev) - math.sqrt(5.0)) < 0.1


def test_compiled_is_posterior(model):
    post = model.posterior_results(
        num_traces=50000, observe=OBS, vectorized=True
    )
    # must have stayed on the compiled tier
    assert _TraceabilityCache._cache.get(type(model)) is True
    assert abs(float(post.mean) - TRUE_MEAN) < 0.15
    assert abs(float(post.stddev) - TRUE_STD) < 0.15
    # reference IS ESS floor for Marsaglia: >0.2% (tests/test_inference.py:287)
    assert post.effective_sample_size > 0.002 * 50000


def test_interpreter_is_posterior(model):
    post = model.posterior_results(
        num_traces=3000, observe=OBS, vectorized=False
    )
    assert abs(float(post.mean) - TRUE_MEAN) < 0.4
    assert post.effective_sample_size > 0.002 * 3000


def test_replacement_semantics_trace_structure(model):
    # the accepted attempt replaces rejected ones: every trace records
    # exactly 2 controlled sites, all with instance 1
    traces = model.prior(num_traces=50, vectorized=False)
    for i in range(traces.length):
        t = traces._get_value(i)
        assert t.length_controlled == 2
        assert all(v.instance == 1 for v in t.variables_controlled)
        assert all(v.address.endswith("__1") for v in t.variables_controlled)


def test_mcmc_engines_compiled_chains(model):
    # block-atomic ReplayHandler kernel: vmapped chains stay on the
    # compiled tier, single-site moves inside the block
    for engine in (
        pp.InferenceEngine.LIGHTWEIGHT_METROPOLIS_HASTINGS,
        pp.InferenceEngine.RANDOM_WALK_METROPOLIS_HASTINGS,
    ):
        post = model.posterior_results(
            num_traces=20000, observe=OBS, inference_engine=engine,
            vectorized=True,
        )
        assert "compiled" in post.name, engine
        assert abs(float(post.mean) - TRUE_MEAN) < 0.3, engine
        assert abs(float(post.stddev) - TRUE_STD) < 0.25, engine


def test_mcmc_interpreter_tier_converges(model):
    post = model.posterior_results(
        num_traces=3000,
        observe=OBS,
        inference_engine=pp.InferenceEngine.LIGHTWEIGHT_METROPOLIS_HASTINGS,
        vectorized=False,
    )[1000:]
    assert abs(float(post.mean) - TRUE_MEAN) < 0.5


class _OuterLatentBlock(pp.Model):
    """An outer latent plus a rejection block: MCMC moves on the outer
    latent replay the stored block values (indicator recheck branch),
    moves on block sites redraw them conditionally."""

    def forward(self):
        mu = pp.sample(Normal(0.0, 2.0))

        def attempt():
            e = pp.sample(Normal(0.0, 1.0))
            return e, e * e < 4.0  # truncation at |e|<2, Z constant

        e = pp.rejection_sample(attempt)
        pp.observe(Normal(mu + e, 0.5), name="obs0")
        return mu


def test_mcmc_outer_latent_with_block():
    m = _OuterLatentBlock()
    obs = {"obs0": 3.0}
    ref = m.posterior_results(num_traces=200000, observe=obs, vectorized=True)
    lmh = m.posterior_results(
        num_traces=30000,
        observe=obs,
        inference_engine=pp.InferenceEngine.LIGHTWEIGHT_METROPOLIS_HASTINGS,
        vectorized=True,
    )
    assert "compiled" in lmh.name
    assert abs(float(lmh.mean) - float(ref.mean)) < 0.2
    assert abs(float(lmh.stddev) - float(ref.stddev)) < 0.2


def test_gradient_engine_raises(model):
    with pytest.raises((NotImplementedError, RuntimeError)):
        model.posterior_results(
            num_traces=100,
            observe=OBS,
            inference_engine=pp.InferenceEngine.HAMILTONIAN_MONTE_CARLO,
        )


def test_smc_posterior(model):
    post = model.posterior_results(
        num_traces=20000,
        observe=OBS,
        inference_engine=pp.InferenceEngine.SEQUENTIAL_MONTE_CARLO,
    )
    assert abs(float(post.mean) - TRUE_MEAN) < 0.2
    assert abs(float(post.stddev) - TRUE_STD) < 0.2


def test_ic_training_and_guided_is(model):
    m = GaussianUnknownMeanMarsagliaRejection()
    # LSTM: the second block site's proposal conditions on the first
    # through the recurrent state (the pair is strongly coupled here)
    m.learn_inference_network(
        num_traces=16000,
        observe_embeddings={"obs0": {"dim": 16}, "obs1": {"dim": 16}},
        inference_network=pp.InferenceNetwork.LSTM,
        lstm_dim=64,
        batch_size=512,
        learning_rate_init=0.005,
    )
    post = m.posterior_results(
        num_traces=5000,
        observe=OBS,
        vectorized=True,
        inference_engine=pp.InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK,
    )
    assert abs(float(post.mean) - TRUE_MEAN) < 0.2
    is_post = m.posterior_results(
        num_traces=5000, observe=OBS, vectorized=True
    )
    # learned first-attempt proposals must beat prior IS on ESS; reference
    # demands IC-LSTM > 1.6% on Marsaglia (tests/test_inference.py:344)
    assert post.effective_sample_size > is_post.effective_sample_size
    assert post.effective_sample_size > 0.016 * 5000
    # guided SMC through the block: prefix replay forces block values and
    # advances the proposal LSTM, first-attempt proposals elsewhere
    smc = m.posterior_results(
        num_traces=5000,
        observe=OBS,
        inference_engine=pp.InferenceEngine.SEQUENTIAL_MONTE_CARLO_WITH_INFERENCE_NETWORK,
    )
    assert abs(float(smc.mean) - TRUE_MEAN) < 0.25


def _biased_block_proposal():
    """A deliberately biased full-support proposal for the Marsaglia block's
    Uniform(-1,1) sites: only the extended-space weighting (every executed
    attempt's prior−proposal delta counted) keeps the posterior exact."""
    from pyprob_tpu.distributions import TruncatedNormal

    return TruncatedNormal(0.5, 0.6, low=-1.0, high=1.0)


# analytic GUM evidence for observes {8, 9}: log N(8; 1, sqrt 7) +
# log N(9; 6, sqrt(24/7)) — the mean importance weight must estimate this
TRUE_LOG_EVIDENCE = -8.2395


def _log_evidence(emp):
    lw = np.asarray(emp._log_weights, np.float64)
    m = lw.max()
    return m + math.log(np.exp(lw - m).mean())


def test_compiled_ic_proposals_drive_retries():
    # retries inside the compiled while_loop must (a) call the proposal
    # step — one traced call per site in the first attempt plus one in the
    # loop body — and (b) stay exact under a biased proposal, which fails
    # if rejected attempts' corrections are dropped from the weight
    from pyprob_tpu import vectorized
    from pyprob_tpu.util import TraceMode, InferenceEngine

    import jax
    import jax.numpy as jnp

    m = GaussianUnknownMeanMarsagliaRejection()
    calls = {}
    seen_defensive = []

    def fake_step(site, distribution, key, observed, forced_value=None,
                  defensive=None):
        calls[site.address] = calls.get(site.address, 0) + 1
        seen_defensive.append(defensive)
        q = _biased_block_proposal()
        if defensive is None:
            v = q._sample_jax(key, ())
            return v, q.log_prob(v, sum=True)
        # defensive mixture (retries): sample π·q + (1−π)·prior, score
        # against the mixture — weights must remain exact under it
        kq, kp, ku = jax.random.split(key, 3)
        xq = q._sample_jax(kq, ())
        xp = distribution._sample_jax(kp, ())
        v = jnp.where(jax.random.bernoulli(ku, defensive), xq, xp)
        plp = jnp.logaddexp(
            jnp.log(defensive) + q.log_prob(v, sum=True),
            jnp.log1p(-defensive) + distribution.log_prob(v, sum=True),
        )
        return v, plp

    fake_step.reset = lambda: None
    fake_step.get_state = lambda: ((), ())
    fake_step.set_state = lambda s: None
    fake_step.supports_defensive = True

    def trace_result(t):
        return t.result

    post = vectorized.vectorized_traces(
        m,
        100000,
        TraceMode.POSTERIOR,
        inference_engine=InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK,
        observe=dict(OBS),
        proposal_step=fake_step,
        map_func=trace_result,
    )
    # two block sites, each traced twice: first attempt + while_loop body
    assert sorted(calls.values()) == [2, 2], calls
    # first attempt proposes pure q; retries use the defensive mixture
    assert sorted(seen_defensive, key=str) == [0.5, 0.5, None, None]
    # the weight is dominated by the (untrained) likelihood term — plain
    # Marsaglia IS ESS is ~0.8%; the biased proposal adds variance on top
    assert post.effective_sample_size > 300
    assert abs(float(post.mean) - TRUE_MEAN) < 0.15
    assert abs(float(post.stddev) - TRUE_STD) < 0.15
    # the mean weight must still be an unbiased evidence estimate: missing
    # or double-counted attempt corrections shift it off the analytic value
    assert abs(_log_evidence(post) - TRUE_LOG_EVIDENCE) < 0.15


def test_interpreter_ic_proposals_drive_retries():
    # interpreter tier: proposals on every attempt with per-retry network
    # state restore and cumulative attempt corrections
    class _FakeNet:
        _total_train_traces = 0

        def __init__(self):
            self._infer_lstm_state = None
            self.calls = 0

        def _infer_init(self, observed):
            pass

        def _infer_step(self, variable, prev_variable=None,
                        proposal_min_train_iterations=None):
            self.calls += 1
            return _biased_block_proposal()

    class _Marsaglia(GaussianUnknownMeanMarsagliaRejection):
        _never_vectorize = True

    m = _Marsaglia()
    net = _FakeNet()
    m._inference_network = net
    num_traces = 8000
    post = m.posterior_results(
        num_traces=num_traces,
        observe=OBS,
        vectorized=False,
        inference_engine=pp.InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK,
    )
    # the biased proposal rejects sometimes, so retries must have proposed
    assert net.calls > 2 * num_traces + 50
    assert post.effective_sample_size > 0.004 * num_traces
    assert abs(float(post.mean) - TRUE_MEAN) < 0.4
    assert abs(float(post.stddev) - TRUE_STD) < 0.35
    assert abs(_log_evidence(post) - TRUE_LOG_EVIDENCE) < 0.5


class _ObserveInside(pp.Model):
    def forward(self):
        def attempt():
            x = pp.sample(Uniform(-1.0, 1.0))
            pp.observe(Normal(x, 1.0), name="bad")
            return x, x > 0
        return pp.rejection_sample(attempt)


def test_observe_inside_block_raises_interpreter():
    m = _ObserveInside()
    m._never_vectorize = True
    with pytest.raises(RuntimeError, match="not supported"):
        m.posterior_results(num_traces=5, observe={"bad": 0.5}, vectorized=False)


def test_max_attempts_overflow_discards():
    class Tight(pp.Model):
        def forward(self):
            def attempt():
                x = pp.sample(Uniform(0.0, 1.0))
                return x, x > 0.95  # ~5% acceptance

            x = pp.rejection_sample(attempt, max_attempts=2)
            pp.observe(Normal(x, 0.5), name="obs0")
            return x

        _ = None

    m = Tight()
    post = m.posterior_results(num_traces=4000, observe={"obs0": 1.0}, vectorized=True)
    # rejected-after-cap particles carry -inf weight and are discarded;
    # survivors are exact draws from the truncated prior, so the posterior
    # over [0.95, 1] is unbiased
    assert post.effective_sample_size > 0
    assert 0.95 < float(post.mean) < 1.0


class _DependentBlock(pp.Model):
    """Within-block dependence: p(b | a) changes when a move redraws a, so
    the MH ratio must rescore the companion site (code-review regression)."""

    def forward(self):
        def attempt():
            a = pp.sample(Normal(0.0, 1.0))
            b = pp.sample(Normal(a, 0.5))
            return (a, b), a * a < 100.0

        a, b = pp.rejection_sample(attempt)
        pp.observe(Normal(b, 0.5), name="obs0")
        return a


def test_compiled_lmh_rescores_dependent_block_sites():
    m = _DependentBlock()
    obs = {"obs0": 2.0}
    ref = m.posterior_results(num_traces=300000, observe=obs, vectorized=True)
    lmh = m.posterior_results(
        num_traces=30000,
        observe=obs,
        vectorized=True,
        inference_engine=pp.InferenceEngine.LIGHTWEIGHT_METROPOLIS_HASTINGS,
    )
    assert abs(float(lmh.mean) - float(ref.mean)) < 0.15
    assert abs(float(lmh.stddev) - float(ref.stddev)) < 0.15


def test_interpreter_max_attempts_discards():
    # exhausting max_attempts marks the trace invalid (weight -inf) on the
    # interpreter tier too, instead of crashing (code-review regression)
    class Tight(pp.Model):
        _never_vectorize = True

        def forward(self):
            def attempt():
                x = pp.sample(Uniform(0.0, 1.0))
                return x, x > 0.95

            x = pp.rejection_sample(attempt, max_attempts=1)
            pp.observe(Normal(x, 0.5), name="obs0")
            return x

    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("ignore")
        post = Tight().posterior_results(
            num_traces=800, observe={"obs0": 1.0}, vectorized=False
        )
    assert 0.9 < float(post.mean) <= 1.0


class _OuterPredicate(pp.Model):
    """Acceptance depends on an outer latent: replayed block values can
    violate it — both tiers apply indicator semantics instead of spinning
    (code-review regression: the interpreter used to retry 1e6 times)."""

    def forward(self):
        mu = pp.sample(Normal(0.0, 1.0))

        def attempt():
            e = pp.sample(Normal(0.0, 1.0))
            return e, e < mu

        e = pp.rejection_sample(attempt, max_attempts=64)
        pp.observe(Normal(mu + e, 0.5), name="obs0")
        return mu


def test_outer_predicate_tiers_agree_and_terminate():
    import time as _t
    import warnings as _w

    m = _OuterPredicate()
    obs = {"obs0": 1.0}
    t0 = _t.time()
    with _w.catch_warnings():
        _w.simplefilter("ignore")
        ip = m.posterior_results(
            num_traces=1500,
            observe=obs,
            vectorized=False,
            inference_engine=pp.InferenceEngine.LIGHTWEIGHT_METROPOLIS_HASTINGS,
        )[500:]
    assert _t.time() - t0 < 120
    cp = m.posterior_results(
        num_traces=20000,
        observe=obs,
        vectorized=True,
        inference_engine=pp.InferenceEngine.LIGHTWEIGHT_METROPOLIS_HASTINGS,
    )
    assert abs(float(ip.mean) - float(cp.mean)) < 0.35


def test_no_eager_zmq_import():
    import subprocess, sys as _s

    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys, pyprob_tpu;"
        "bad=[m for m in sys.modules if 'zmq' in m];"
        "assert not bad, bad"
    )
    r = subprocess.run([_s.executable, "-c", code], capture_output=True)
    assert r.returncode == 0, r.stderr.decode()[-500:]


def test_rejection_sample_outside_trace():
    # plain call with no active trace: behaves like a host rejection loop
    def attempt():
        x = pp.sample(Uniform(0.0, 1.0))
        return x, x > 0.5

    for _ in range(5):
        assert float(pp.rejection_sample(attempt)) > 0.5
