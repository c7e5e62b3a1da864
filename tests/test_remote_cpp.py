"""Cross-language PPX tests: real C++ simulator subprocesses driven by the
Python inference engine (reference runs pyprob_cpp via Docker,
tests/test_inference_remote.py:94-104; here local binaries from cpp/)."""

import math
import os
import subprocess
import time
import uuid

import numpy as np
import pytest

import pyprob_tpu as pp

CPP_BUILD = os.path.join(os.path.dirname(__file__), "..", "cpp", "build")


def _binary(name):
    path = os.path.abspath(os.path.join(CPP_BUILD, name))
    if not os.path.exists(path):
        # build on demand
        r = subprocess.run(
            ["make", "-j4"],
            cwd=os.path.abspath(os.path.join(CPP_BUILD, "..")),
            capture_output=True,
        )
        if r.returncode != 0 or not os.path.exists(path):
            pytest.skip(f"C++ simulator {name} not built: {r.stderr.decode()[:200]}")
    return path


@pytest.fixture
def simulator():
    procs = []

    def start(name):
        addr = f"ipc:///tmp/pyprob_tpu_cpp_{uuid.uuid4()}"
        proc = subprocess.Popen(
            [_binary(name), addr], stdout=subprocess.DEVNULL
        )
        procs.append(proc)
        time.sleep(0.5)
        return addr

    yield start
    for p in procs:
        p.kill()
        p.wait()


def test_cpp_gum_inference(simulator):
    addr = simulator("test_gum")
    model = pp.RemoteModel(addr)
    try:
        assert "Gaussian with unknown mean C++" in model_name(model)
        post = model.posterior_results(
            num_traces=2000, observe={"obs0": 8, "obs1": 9}
        )
        assert abs(float(post.mean) - 7.25) < 0.75
        assert abs(float(post.stddev) - math.sqrt(1 / 1.2)) < 0.75
        # ESS floor (reference: tests/test_inference_remote.py:112)
        assert post.effective_sample_size > 0.005 * 2000
    finally:
        model.close()


def model_name(model):
    model.sample()  # triggers lazy connect + handshake
    return model.name


def test_cpp_gum_addresses(simulator):
    # golden cross-language address strings
    # (reference: tests/test_model_remote.py:44-45)
    addr = simulator("test_gum")
    model = pp.RemoteModel(addr)
    try:
        trace = model.sample()
        assert [v.address for v in trace.variables] == [
            "mu_addr__Normal__1",
            "obs0_addr__Normal__1",
            "obs1_addr__Normal__1",
        ]
    finally:
        model.close()


def test_cpp_marsaglia(simulator):
    addr = simulator("test_gum_marsaglia_replacement")
    model = pp.RemoteModel(addr)
    try:
        lens = [model.sample().length_controlled for _ in range(40)]
        assert max(lens) > 2  # variable-length rejection traces
        post = model.posterior_results(
            num_traces=1500, observe={"obs0": 8, "obs1": 9}
        )
        assert abs(float(post.mean) - 7.25) < 1.0
    finally:
        model.close()


def test_cpp_distributions_all_types(simulator):
    addr = simulator("test_distributions")
    model = pp.RemoteModel(addr)
    try:
        trace = model.sample()
        names = [v.distribution.name for v in trace.variables]
        assert names == [
            "Normal",
            "Uniform",
            "Categorical",
            "Poisson",
            "Bernoulli",
            "Beta",
            "Exponential",
            "Gamma",
            "LogNormal",
            "Binomial",
            "Weibull",
        ]
        for v in trace.variables:
            assert np.isfinite(float(np.sum(np.asarray(v.log_prob))))
    finally:
        model.close()


def test_cpp_branching(simulator):
    addr = simulator("test_branching")
    model = pp.RemoteModel(addr)
    try:
        post = model.posterior_results(num_traces=1000, observe={"obs": 6})
        vals = np.asarray(post.get_values(), dtype=np.float64)
        assert vals.min() >= 0
        assert np.isfinite(float(post.mean))
    finally:
        model.close()


def test_cpp_defaults_and_addresses(simulator):
    addr = simulator("test_set_defaults_and_addresses")
    model = pp.RemoteModel(addr)
    try:
        trace = model.sample()
        assert trace.length_controlled == 1  # control=false site uncontrolled
        assert len(trace.variables_tagged) == 1
        assert "sum_ab" in trace.named_variables
        assert trace.variables[0].address == "address_a__Normal__1"
    finally:
        model.close()


def test_cpp_rmh(simulator):
    addr = simulator("test_gum")
    model = pp.RemoteModel(addr)
    try:
        post = model.posterior_results(
            num_traces=2000,
            inference_engine=pp.InferenceEngine.RANDOM_WALK_METROPOLIS_HASTINGS,
            observe={"obs0": 8, "obs1": 9},
        )[500:]
        assert abs(float(post.mean) - 7.25) < 0.8
    finally:
        model.close()
