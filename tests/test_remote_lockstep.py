"""Lockstep PPX driver tests: K simulators answered with batched site
handling (pyprob_tpu/remote_lockstep.py).  Simulators are in-process
threads serving the byte-compatible PPX wire protocol, as in
test_remote.py; correctness is asserted against the GUM analytic posterior
(reference: tests/test_inference.py:114-142) and the guided-IS ESS floors
(reference: tests/test_inference.py:149)."""

import math
import threading
import uuid

import numpy as np
import pytest

import pyprob_tpu as pp
from pyprob_tpu.distributions import Normal, Uniform
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
    return mu


_live_addresses = []


def _reset_simulator(address):
    """Send a PPX Reset so the in-thread server's serve() loop exits."""
    import zmq
    from pyprob_tpu.ppx import wire

    ctx = zmq.Context.instance()
    s = ctx.socket(zmq.REQ)
    s.setsockopt(zmq.LINGER, 100)
    s.setsockopt(zmq.RCVTIMEO, 2000)
    s.setsockopt(zmq.SNDTIMEO, 2000)
    try:
        s.connect(address)
        s.send(wire.build_reset())
        s.recv()
    except Exception:
        pass
    finally:
        s.close(0)


@pytest.fixture(autouse=True)
def _shutdown_simulators():
    # daemon server threads stuck in recv() outlive their test otherwise,
    # leaving sockets open for the rest of the pytest process
    yield
    while _live_addresses:
        _reset_simulator(_live_addresses.pop())


def _start_simulators(forward_func, n, model_name):
    """n simulator threads on fresh ipc addresses; returns addresses."""
    addresses = []
    for _ in range(n):
        address = f"ipc://@pyprob_tpu_lockstep_{uuid.uuid4()}"
        ready = threading.Event()

        def run(address=address, ready=ready):
            server = PPXSimulatorServer(
                address, forward_func, model_name=model_name
            )
            ready.set()
            try:
                server.serve()
            except Exception:
                pass  # socket closed at teardown

        t = threading.Thread(target=run, daemon=True)
        t.start()
        ready.wait(timeout=10)
        addresses.append(address)
        _live_addresses.append(address)
    return addresses


def test_lockstep_gum_prior_posterior_and_addresses():
    addresses = _start_simulators(_gum_forward, 3, "GUM lockstep")
    model = pp.LockstepRemoteModel(addresses, timeout_sec=60)
    try:
        prior = model.prior_results(num_traces=600)
        assert abs(float(prior.mean) - 1.0) < 0.5
        assert "GUM lockstep" in model.name

        trace = model.sample()
        addrs = [v.address for v in trace.variables]
        assert addrs[0] == "mu_addr__Normal__1"
        assert addrs[1] == "obs0_addr__Normal__1"

        post = model.posterior_results(
            num_traces=2000, observe={"obs0": 8, "obs1": 9}
        )
        assert abs(float(post.mean) - 7.25) < 0.75
        assert abs(float(post.stddev) - math.sqrt(1 / 1.2)) < 0.75
        assert post.effective_sample_size > 0.005 * 2000
    finally:
        model.close()


def test_lockstep_rejects_mcmc():
    addresses = _start_simulators(_gum_forward, 1, "GUM lockstep")
    model = pp.LockstepRemoteModel(addresses, timeout_sec=60)
    try:
        with pytest.raises(ValueError):
            model.posterior(
                num_traces=10,
                inference_engine=pp.InferenceEngine.RANDOM_WALK_METROPOLIS_HASTINGS,
                observe={"obs0": 8, "obs1": 9},
            )
    finally:
        model.close()


def test_lockstep_marsaglia_divergent_control_flow():
    # rejection loops desynchronize the pool: simulators sit at different
    # addresses within one round and form separate buckets
    addresses = _start_simulators(_marsaglia_forward, 3, "Marsaglia lockstep")
    model = pp.LockstepRemoteModel(addresses, timeout_sec=60)
    try:
        lens = [model.sample().length_controlled for _ in range(20)]
        assert min(lens) >= 2 and max(lens) > 2
        post = model.posterior_results(
            num_traces=1500, observe={"obs0": 8, "obs1": 9}
        )
        assert abs(float(post.mean) - 7.25) < 1.0
    finally:
        model.close()


@pytest.mark.parametrize("network", ["lstm", "ff"])
def test_lockstep_inference_compilation(network):
    # train on traces generated THROUGH the lockstep pool, then run guided
    # IS where each site is one batched proposal-network dispatch for the
    # whole pool
    addresses = _start_simulators(_gum_forward, 3, "GUM lockstep IC")
    model = pp.LockstepRemoteModel(addresses, timeout_sec=120)
    try:
        model.learn_inference_network(
            num_traces=4096,
            observe_embeddings={"obs0": {"dim": 16}, "obs1": {"dim": 16}},
            inference_network=(
                pp.InferenceNetwork.LSTM
                if network == "lstm"
                else pp.InferenceNetwork.FEEDFORWARD
            ),
            batch_size=256,
            learning_rate_init=0.01,
            lstm_dim=64,
        )
        post = model.posterior_results(
            num_traces=1024,
            observe={"obs0": 8, "obs1": 9},
            inference_engine=pp.InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK,
        )
        assert abs(float(post.mean) - 7.25) < 0.75
        # modest ESS floor: lockstep mechanics are what's under test here
        # (the full 15% parity floor at the 25.6k budget lives in
        # test_inference.py; this training runs over real sockets)
        assert post.effective_sample_size > 0.015 * 1024
        # the batched path (not a per-sim fallback) answered the sites
        cache = model._inference_network._lockstep_jit_cache
        assert len(cache) >= 1
    finally:
        model.close()


_SIM_MODULE = '''
import jax
jax.config.update("jax_platforms", "cpu")
import math
import numpy as np
from pyprob_tpu.distributions import Normal


def forward(server):
    mu = float(np.asarray(
        server.sample(Normal(1.0, math.sqrt(5.0)), address="mu_addr")
    ).reshape(-1)[0])
    lik = Normal(mu, math.sqrt(2.0))
    server.observe(lik, name="obs0", address="o0")
    server.observe(lik, name="obs1", address="o1")
    return mu
'''


def test_python_simulator_subprocess_pool(tmp_path):
    # PPXSimulatorServer.spawn: Python simulators as real subprocesses
    # (process-level pool, no GIL contention), driven in lockstep
    import os
    import sys
    import time

    (tmp_path / "gum_sim.py").write_text(_SIM_MODULE)
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep
        + env.get("PYTHONPATH", "")
    )
    from pyprob_tpu.ppx.server import PPXSimulatorServer

    procs, addrs = PPXSimulatorServer.spawn(
        "gum_sim:forward", num_simulators=2, cwd=str(tmp_path), env=env
    )
    try:
        deadline = time.time() + 60
        model = None
        while True:
            try:
                model = pp.LockstepRemoteModel(addrs, timeout_sec=60)
                break
            except Exception:
                if time.time() > deadline:
                    raise
                time.sleep(0.5)
        post = model.posterior_results(
            num_traces=1500, observe={"obs0": 8, "obs1": 9}
        )
        assert abs(float(post.mean) - 7.25) < 0.75
        model.close()
    finally:
        for p in procs:
            p.terminate()
        for p in procs:
            p.wait(timeout=10)


def test_lockstep_ic_unknown_address_prior_fallback():
    # guided IS against simulators whose addresses the network has never
    # seen: every site must fall back to the prior (weight contribution 0)
    # instead of crashing — mirrors _infer_step returning the prior
    gum_addrs = _start_simulators(_gum_forward, 2, "GUM train")
    trained = pp.LockstepRemoteModel(gum_addrs, timeout_sec=60)
    try:
        trained.learn_inference_network(
            num_traces=512,
            observe_embeddings={"obs0": {"dim": 8}, "obs1": {"dim": 8}},
            inference_network=pp.InferenceNetwork.FEEDFORWARD,
            batch_size=128,
        )
        mars_addrs = _start_simulators(_marsaglia_forward, 2, "Mars unseen")
        other = pp.LockstepRemoteModel(mars_addrs, timeout_sec=60)
        other._inference_network = trained._inference_network
        try:
            import warnings as _w

            with _w.catch_warnings():
                _w.simplefilter("ignore")
                post = other.posterior_results(
                    num_traces=800,
                    observe={"obs0": 8, "obs1": 9},
                    inference_engine=pp.InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK,
                )
            # prior-proposal IS: still a valid posterior estimate
            assert abs(float(post.mean) - 7.25) < 1.0
        finally:
            other.close()
    finally:
        trained.close()
