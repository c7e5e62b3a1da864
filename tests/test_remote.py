"""PPX remote model tests: a simulator server (the pyprob_cpp role) serves
a GUM model over ipc://, the RemoteModel drives inference through the wire
protocol (reference: tests/test_model_remote.py, tests/test_inference_remote.py
— there via Docker; here as an in-process thread, SURVEY.md §4)."""

import math
import threading
import uuid

import numpy as np
import pytest

import pyprob_tpu as pp
from pyprob_tpu.distributions import Normal, Uniform
from pyprob_tpu.ppx import wire
from pyprob_tpu.ppx.server import PPXSimulatorServer


def _gum_forward(server):
    mu = server.sample(Normal(1.0, math.sqrt(5.0)), address="mu_addr")
    mu = float(np.asarray(mu).reshape(-1)[0])
    likelihood = Normal(mu, math.sqrt(2.0))
    server.observe(likelihood, name="obs0", address="obs0_addr")
    server.observe(likelihood, name="obs1", address="obs1_addr")
    return mu


def _marsaglia_forward(server):
    while True:
        x = float(np.asarray(server.sample(Uniform(-1.0, 1.0), address="x")).reshape(-1)[0])
        y = float(np.asarray(server.sample(Uniform(-1.0, 1.0), address="y")).reshape(-1)[0])
        s = x * x + y * y
        if s < 1:
            break
    mu = 1.0 + math.sqrt(5.0) * (x * math.sqrt(-2 * math.log(s) / s))
    lik = Normal(mu, math.sqrt(2.0))
    server.observe(lik, name="obs0", address="obs0_addr")
    server.observe(lik, name="obs1", address="obs1_addr")
    server.tag(mu, name="mu", address="mu_tag")
    return mu


def _start_simulator(forward_func, address, model_name):
    ready = threading.Event()
    box = {}

    def run():
        server = PPXSimulatorServer(
            address, forward_func, model_name=model_name
        )
        box["server"] = server
        ready.set()
        try:
            server.serve()
        except Exception as e:  # socket closed at teardown
            box["error"] = e

    t = threading.Thread(target=run, daemon=True)
    t.start()
    ready.wait(timeout=10)
    return t, box


def test_remote_gum_prior_and_posterior():
    address = f"ipc://@pyprob_tpu_test_{uuid.uuid4()}"
    t, box = _start_simulator(_gum_forward, address, "GUM remote")
    model = pp.RemoteModel(address)
    try:
        prior = model.prior_results(num_traces=500)
        assert abs(float(prior.mean) - 1.0) < 0.5
        assert model.name.startswith("GUM remote")
        post = model.posterior_results(
            num_traces=2000, observe={"obs0": 8, "obs1": 9}
        )
        assert abs(float(post.mean) - 7.25) < 0.75
        assert abs(float(post.stddev) - math.sqrt(1 / 1.2)) < 0.75
        # ESS floor (reference: tests/test_inference_remote.py:112)
        assert post.effective_sample_size > 0.005 * 2000
    finally:
        model.close()


def test_remote_addresses_cross_language():
    # addresses come from the remote side and round-trip through the trace
    # (reference golden strings: tests/test_model_remote.py:44-45)
    address = f"ipc://@pyprob_tpu_test_{uuid.uuid4()}"
    t, box = _start_simulator(_gum_forward, address, "GUM remote")
    model = pp.RemoteModel(address)
    try:
        trace = model.sample()
        addrs = [v.address for v in trace.variables]
        assert addrs[0] == "mu_addr__Normal__1"
        assert addrs[1] == "obs0_addr__Normal__1"
    finally:
        model.close()


def test_remote_marsaglia_variable_length():
    address = f"ipc://@pyprob_tpu_test_{uuid.uuid4()}"
    t, box = _start_simulator(_marsaglia_forward, address, "Marsaglia remote")
    model = pp.RemoteModel(address)
    try:
        lens = []
        for _ in range(50):
            tr = model.sample()
            lens.append(tr.length_controlled)
            assert "mu" in tr.named_variables
        assert min(lens) >= 2
        assert max(lens) > 2  # rejection loop produces variable lengths
        post = model.posterior_results(
            num_traces=1500, observe={"obs0": 8, "obs1": 9}
        )
        assert abs(float(post.mean) - 7.25) < 1.0
    finally:
        model.close()


def test_remote_smc():
    # SMC across the wire: the simulator holds the program counter and
    # re-runs each stage; replayed prefix values flow back through the
    # Sample round-trips (interpreter-tier filter, divergent control flow)
    address = f"ipc://@pyprob_tpu_test_{uuid.uuid4()}"
    t, box = _start_simulator(_marsaglia_forward, address, "Marsaglia remote")
    model = pp.RemoteModel(address)
    try:
        post = model.posterior_results(
            num_traces=800,
            observe={"obs0": 8, "obs1": 9},
            inference_engine=pp.InferenceEngine.SEQUENTIAL_MONTE_CARLO,
            resample_threshold=1.0,
        )
        assert abs(float(post.mean) - 7.25) < 0.6
        assert np.isfinite(post.log_evidence)
        assert post.metadata[-1]["vectorized"] is False
    finally:
        model.close()


def test_remote_rmh():
    address = f"ipc://@pyprob_tpu_test_{uuid.uuid4()}"
    t, box = _start_simulator(_gum_forward, address, "GUM remote")
    model = pp.RemoteModel(address)
    try:
        post = model.posterior_results(
            num_traces=2000,
            inference_engine=pp.InferenceEngine.RANDOM_WALK_METROPOLIS_HASTINGS,
            observe={"obs0": 8, "obs1": 9},
        )[500:]
        assert abs(float(post.mean) - 7.25) < 0.8
    finally:
        model.close()


def test_wire_roundtrip_all_distributions():
    from pyprob_tpu.remote import distribution_from_spec, spec_from_distribution
    from pyprob_tpu.distributions import (
        Normal,
        Uniform,
        Categorical,
        Poisson,
        Bernoulli,
        Beta,
        Exponential,
        Gamma,
        LogNormal,
        Binomial,
        Weibull,
    )

    dists = [
        Normal(1.0, 2.0),
        Uniform(0.0, 3.0),
        Categorical(probs=[0.2, 0.3, 0.5]),
        Poisson(4.0),
        Bernoulli(probs=0.3),
        Beta(2.0, 3.0),
        Exponential(2.0),
        Gamma(2.0, 3.0),
        LogNormal(0.0, 1.0),
        Binomial(10, probs=0.4),
        Weibull(1.0, 2.0),
    ]
    for d in dists:
        dist_type, params = spec_from_distribution(d)
        buf = wire.build_sample("a", "n", dist_type, params)
        dec = wire.decode_message(buf)
        d2 = distribution_from_spec(dec.fields["distribution"])
        assert type(d2) is type(d)
        x = d.sample(np.random.default_rng(0))
        lp1 = float(np.sum(np.asarray(d.log_prob(x))))
        lp2 = float(np.sum(np.asarray(d2.log_prob(x))))
        assert np.isclose(lp1, lp2, atol=1e-5), (type(d).__name__, lp1, lp2)


def test_run_payload_wire_parity_and_roundtrip():
    # a payload-free Run must stay byte-identical to the reference's empty
    # Run table (wire parity); a payload round-trips as an optional
    # trailing Tensor field old readers skip
    import flatbuffers

    b = flatbuffers.Builder(32)
    b.StartObject(0)
    body = b.EndObject()
    b.StartObject(2)
    b.PrependUint8Slot(0, wire.MessageBody.Run, 0)
    b.PrependUOffsetTRelativeSlot(1, body, 0)
    msg = b.EndObject()
    b.Finish(msg, file_identifier=wire.FILE_IDENTIFIER)
    assert wire.build_run() == bytes(b.Output())
    assert wire.decode_message(wire.build_run()).fields["payload"] is None
    p = np.array([[1.5, 2.5], [3.5, 4.5]])
    dec = wire.decode_message(wire.build_run(p))
    assert dec.body_type == wire.MessageBody.Run
    np.testing.assert_allclose(dec.fields["payload"], p)


def _payload_gum_forward(server):
    # prior parameterized by the Run payload: [mean, stddev]
    prior_mean, prior_stddev = 1.0, math.sqrt(5.0)
    if server.payload is not None:
        p = np.asarray(server.payload).reshape(-1)
        prior_mean = float(p[0])
        if p.size > 1:
            prior_stddev = float(p[1])
    mu = float(
        np.asarray(
            server.sample(Normal(prior_mean, prior_stddev), address="mu")
        ).reshape(-1)[0]
    )
    lik = Normal(mu, math.sqrt(2.0))
    server.observe(lik, name="obs0", address="o0")
    server.observe(lik, name="obs1", address="o1")
    return mu


def test_remote_run_payload():
    # Run-payload extension: the same simulator serves different priors per
    # inference call, conditioned through the payload tensor
    address = f"ipc://@pyprob_tpu_test_{uuid.uuid4()}"
    t, box = _start_simulator(_payload_gum_forward, address, "payload GUM")
    model = pp.RemoteModel(address)
    try:
        obs = {"obs0": 8, "obs1": 9}
        # prior N(4, 1): posterior mean (4 + 8.5)/2 = 6.25
        post = model.posterior_results(
            num_traces=3000, observe=obs, payload=np.array([4.0, 1.0])
        )
        assert abs(float(post.mean) - 6.25) < 0.5
        # reference-style empty Run: classic GUM posterior 7.25
        post0 = model.posterior_results(num_traces=3000, observe=obs)
        assert abs(float(post0.mean) - 7.25) < 0.5
        assert float(post0.mean) - float(post.mean) > 0.3
    finally:
        model.close()
