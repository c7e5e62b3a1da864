"""Posterior serving subsystem (beyond parity — production deployment).

PosteriorService answers observation queries by reusing ONE compiled
particle program per observe-name set (observed values are traced
arguments); PosteriorServer/Client expose it over ZMQ REP/REQ with JSON.
"""

import math
import uuid

import numpy as np
import pytest

import pyprob_tpu as pp
from pyprob_tpu.distributions import Normal
from pyprob_tpu.models import GaussianUnknownMean
from pyprob_tpu.serving import PosteriorService, PosteriorServer, PosteriorClient


def _true(obs):
    return GaussianUnknownMean().true_posterior(list(obs))


def test_service_queries_without_recompile():
    svc = PosteriorService(
        GaussianUnknownMean(), num_traces=20000, vectorized=True
    )
    r1 = svc.query({"obs0": 8.0, "obs1": 9.0})
    t1 = _true([8.0, 9.0])
    assert r1["ok"]
    assert abs(r1["mean"] - float(t1.mean)) < 0.15
    assert abs(r1["stddev"] - float(t1.stddev)) < 0.15
    # a NEW observation set reuses the compiled program: much faster than
    # the compile-bearing first query
    r2 = svc.query({"obs0": -3.0, "obs1": -2.0})
    t2 = _true([-3.0, -2.0])
    assert abs(r2["mean"] - float(t2.mean)) < 0.15
    assert r2["latency_s"] < r1["latency_s"] / 2
    assert svc.stats["queries"] == 2


def test_service_samples():
    svc = PosteriorService(GaussianUnknownMean(), num_traces=5000)
    r = svc.query({"obs0": 8.0, "obs1": 9.0}, num_samples=16)
    assert len(r["samples"]) == 16
    t = _true([8.0, 9.0])
    assert abs(np.mean(r["samples"]) - float(t.mean)) < 1.2


def test_server_client_roundtrip():
    svc = PosteriorService(
        GaussianUnknownMean(), num_traces=10000, vectorized=True
    )
    addr = f"ipc://@pyprob_tpu_serve_test_{uuid.uuid4().hex[:8]}"
    server = PosteriorServer(svc, addr)
    thread = server.serve_in_thread()
    client = PosteriorClient(addr)
    try:
        r = client.query({"obs0": 8.0, "obs1": 9.0}, num_samples=4)
        t = _true([8.0, 9.0])
        assert abs(r["mean"] - float(t.mean)) < 0.2
        assert len(r["samples"]) == 4
        # per-query num_traces override
        r_small = client.query({"obs0": 0.0, "obs1": 0.0}, num_traces=500)
        assert r_small["num_traces"] == 500
        # error path: a missing observed value is reported, not fatal
        with pytest.raises(RuntimeError, match="server error"):
            client.query({"obs0": None, "obs1": 1.0})
        # the server survives the error
        r3 = client.query({"obs0": 8.0, "obs1": 9.0})
        assert r3["ok"]
    finally:
        client.shutdown()
        client.close()
        thread.join(timeout=30)
    assert not thread.is_alive()


def test_quantiles_and_hpd_over_the_wire():
    import math

    # LAPLACE is exact on the Gaussian GUM posterior (constant weights),
    # so the served tail quantiles are reliable at this particle count
    # (plain-IS tails at 20k are ESS-starved; SMC's final-weight ESS
    # overstates accuracy after resampling — genealogy correlation)
    svc = PosteriorService(
        GaussianUnknownMean(),
        num_traces=20000,
        inference_engine=pp.InferenceEngine.LAPLACE,
    )
    server = PosteriorServer(svc, f"ipc://@pyprob_tpu_serve_q_{uuid.uuid4()}")
    server.serve_in_thread()
    client = PosteriorClient(server.address)
    try:
        r = client.query(
            {"obs0": 8.0, "obs1": 9.0},
            quantiles=[0.05, 0.5, 0.95],
            hpd_mass=0.9,
        )
        sd = math.sqrt(1 / 1.2)
        qs = r["quantiles"]
        assert abs(qs[1] - 7.25) < 0.1
        assert abs(qs[2] - (7.25 + 1.6449 * sd)) < 0.15
        lo, hi = r["hpd"]
        assert abs(lo - (7.25 - 1.6449 * sd)) < 0.15
        assert abs(hi - (7.25 + 1.6449 * sd)) < 0.15
    finally:
        client.shutdown()
        client.close()
