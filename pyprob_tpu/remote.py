"""PPX remote model execution: ZMQ REQ/REP client driving an external
simulator (reference: pyprob/remote.py:36-393).

The simulator holds the program counter; this side is the inference engine
answering each random choice: send Run, then service Sample/Observe/Tag
callbacks (decode wire distribution -> call state.sample/observe/tag ->
reply result tensor) until RunResult arrives.
"""

from __future__ import annotations

import numpy as np
import zmq

from . import state, util
from .distributions import (
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
from .ppx import wire
from .ppx.wire import MessageBody, DistributionType


class ZMQRequester:
    """REQ socket wrapper (reference: pyprob/remote.py:36-64).

    ``timeout_sec`` bounds each receive (the reference blocks forever on a
    dead simulator); None preserves the blocking behavior."""

    def __init__(self, server_address, timeout_sec=None):
        self._server_address = server_address
        self._context = zmq.Context.instance()
        self._socket = self._context.socket(zmq.REQ)
        self._socket.setsockopt(zmq.LINGER, 100)
        if timeout_sec is not None:
            self._socket.setsockopt(zmq.RCVTIMEO, int(timeout_sec * 1000))
        util.log_print(
            f"ppx (pyprob_tpu): zmq.REQ socket connecting to server "
            f"{server_address}"
        )
        self._socket.connect(server_address)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def send_request(self, request_bytes):
        self._socket.send(request_bytes)

    def receive_reply(self):
        try:
            return self._socket.recv()
        except zmq.error.Again as e:
            raise TimeoutError(
                f"PPX simulator at {self._server_address} did not reply "
                f"within the receive timeout"
            ) from e

    def close(self):
        if self._socket is not None:
            self._socket.close()
            self._socket = None


def distribution_from_spec(spec):
    """Wire DistSpec -> framework distribution (11 wire types,
    reference: pyprob/remote.py:195-266)."""
    t, p = spec.type, spec.params
    s = lambda k: np.asarray(p[k], dtype=util.dtype())
    if t == DistributionType.Normal:
        return Normal(s("mean"), s("stddev"))
    if t == DistributionType.Uniform:
        return Uniform(s("low"), s("high"))
    if t == DistributionType.Categorical:
        return Categorical(probs=s("probs"))
    if t == DistributionType.Poisson:
        return Poisson(s("rate"))
    if t == DistributionType.Bernoulli:
        return Bernoulli(probs=s("probs"))
    if t == DistributionType.Beta:
        return Beta(s("concentration1"), s("concentration0"))
    if t == DistributionType.Exponential:
        return Exponential(s("rate"))
    if t == DistributionType.Gamma:
        return Gamma(s("concentration"), s("rate"))
    if t == DistributionType.LogNormal:
        return LogNormal(s("loc"), s("scale"))
    if t == DistributionType.Binomial:
        return Binomial(s("total_count"), probs=s("probs"))
    if t == DistributionType.Weibull:
        return Weibull(s("scale"), s("concentration"))
    raise RuntimeError(f"Unsupported wire distribution type: {t}")


def spec_from_distribution(dist):
    """Framework distribution -> (wire type, params dict)."""
    import numpy as _np

    if isinstance(dist, Normal):
        return DistributionType.Normal, {
            "mean": dist.mean,
            "stddev": dist.stddev,
        }
    if isinstance(dist, Uniform):
        return DistributionType.Uniform, {"low": dist.low, "high": dist.high}
    if isinstance(dist, Categorical):
        return DistributionType.Categorical, {"probs": dist.probs}
    if isinstance(dist, Poisson):
        return DistributionType.Poisson, {"rate": dist.rate}
    if isinstance(dist, Bernoulli):
        return DistributionType.Bernoulli, {"probs": dist.probs}
    if isinstance(dist, Beta):
        return DistributionType.Beta, {
            "concentration1": dist.concentration1,
            "concentration0": dist.concentration0,
        }
    if isinstance(dist, Exponential):
        return DistributionType.Exponential, {"rate": dist.rate}
    if isinstance(dist, Gamma):
        return DistributionType.Gamma, {
            "concentration": dist._concentration,
            "rate": dist._rate,
        }
    if isinstance(dist, LogNormal):
        return DistributionType.LogNormal, {
            "loc": dist._loc,
            "scale": dist._scale,
        }
    if isinstance(dist, Binomial):
        return DistributionType.Binomial, {
            "total_count": dist.total_count,
            "probs": dist.probs,
        }
    if isinstance(dist, Weibull):
        return DistributionType.Weibull, {
            "scale": dist._scale,
            "concentration": dist._concentration,
        }
    raise RuntimeError(
        f"Distribution not supported on the PPX wire: {type(dist).__name__}"
    )


class ModelServer:
    """Client side of the PPX protocol: handshakes with a simulator and
    services its Sample/Observe/Tag callbacks during forward()
    (reference: pyprob/remote.py:67-393)."""

    def __init__(self, server_address, timeout_sec=None):
        self._requester = ZMQRequester(server_address, timeout_sec=timeout_sec)
        self.system_name = None
        self.model_name = None
        self._handshake()

    def _handshake(self):
        util.log_print("ppx (pyprob_tpu): handshake...")
        self._requester.send_request(
            wire.build_handshake(f"pyprob_tpu {util.__version__}")
        )
        reply = wire.decode_message(self._requester.receive_reply())
        if reply.body_type != MessageBody.HandshakeResult:
            raise RuntimeError(
                f"Expected HandshakeResult, got body type {reply.body_type}"
            )
        self.system_name = reply.fields["system_name"]
        self.model_name = reply.fields["model_name"]
        util.log_print(
            f"ppx (pyprob_tpu): connected to model {self.model_name!r} on "
            f"system {self.system_name!r}"
        )

    def close(self):
        self._requester.close()

    def forward(self, payload=None):
        # payload: optional per-run input tensor for the simulator
        # (pyprob_tpu PPX extension; see wire.build_run)
        self._requester.send_request(wire.build_run(payload))
        while True:
            msg = wire.decode_message(self._requester.receive_reply())
            if msg.body_type == MessageBody.RunResult:
                return msg.fields["result"]
            if msg.body_type == MessageBody.Sample:
                f = msg.fields
                dist = distribution_from_spec(f["distribution"])
                name = f["name"] or None
                value = state.sample(
                    dist,
                    name=name,
                    address=f["address"] or None,
                    control=f.get("control", True),
                )
                self._requester.send_request(
                    wire.build_sample_result(np.asarray(value, np.float64))
                )
            elif msg.body_type == MessageBody.Observe:
                f = msg.fields
                dist = (
                    distribution_from_spec(f["distribution"])
                    if f["distribution"] is not None
                    else None
                )
                name = f["name"] or None
                state.observe(
                    dist,
                    value=f["value"],
                    name=name,
                    address=f["address"] or None,
                )
                self._requester.send_request(wire.build_observe_result())
            elif msg.body_type == MessageBody.Tag:
                f = msg.fields
                state.tag(
                    f["value"], name=f["name"] or None, address=f["address"] or None
                )
                self._requester.send_request(wire.build_tag_result())
            else:
                raise RuntimeError(
                    f"Unexpected PPX message body type: {msg.body_type}"
                )
