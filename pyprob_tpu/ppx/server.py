"""PPX simulator-side server: the role played by pyprob_cpp in the
reference's remote tests (reference: Dockerfile:1,
tests/test_inference_remote.py:98).

A simulator program binds a ZMQ REP socket, receives Run, and — while its
forward function executes — emits Sample/Observe/Tag messages that the
inference engine answers.  This Python implementation serves as the
in-process test double and the reference for the C++ library in cpp/ppx.
"""

from __future__ import annotations

import numpy as np
import zmq

from .. import util
from . import wire
from .wire import MessageBody


def _spec_from_distribution(distribution):
    # imported lazily: remote.py itself imports this package
    from ..remote import spec_from_distribution

    return spec_from_distribution(distribution)


class PPXSimulatorServer:
    """Run a model program as a PPX simulator.

    forward_func receives this server object and calls ``server.sample`` /
    ``server.observe`` / ``server.tag``; its return value is sent back as
    the RunResult tensor.
    """

    def __init__(
        self,
        server_address,
        forward_func,
        system_name="pyprob_tpu python simulator",
        model_name="unnamed model",
    ):
        self._forward_func = forward_func
        self._system_name = system_name
        self._model_name = model_name
        # per-run input tensor from the Run message (PPX extension); None
        # when the controller sent a reference-style empty Run
        self.payload = None
        self._context = zmq.Context.instance()
        self._socket = self._context.socket(zmq.REP)
        self._socket.bind(server_address)
        self._running = False

    def close(self):
        if self._socket is not None:
            self._socket.close()
            self._socket = None

    # ---- calls available to forward_func ---------------------------------
    def sample(self, distribution, name=None, address=None, control=True,
               mask=None):
        # mask is not part of the PPX wire format; a masked-off site is
        # still exact (prior-scored padding) but cannot signal the IC
        # training gate across the wire
        dist_type, params = _spec_from_distribution(distribution)
        self._socket.send(
            wire.build_sample(
                address or "", name or "", dist_type, params, control=control
            )
        )
        reply = wire.decode_message(self._socket.recv())
        if reply.body_type != MessageBody.SampleResult:
            raise RuntimeError(
                f"Expected SampleResult, got {reply.body_type}"
            )
        return reply.fields["result"]

    def observe(self, distribution, value=None, name=None, address=None):
        dist_type, params = _spec_from_distribution(distribution)
        self._socket.send(
            wire.build_observe(
                address or "",
                name or "",
                dist_type,
                params,
                value=value,
            )
        )
        reply = wire.decode_message(self._socket.recv())
        if reply.body_type != MessageBody.ObserveResult:
            raise RuntimeError(
                f"Expected ObserveResult, got {reply.body_type}"
            )

    def tag(self, value, name=None, address=None):
        self._socket.send(
            wire.build_tag(address or "", name or "", value)
        )
        reply = wire.decode_message(self._socket.recv())
        if reply.body_type != MessageBody.TagResult:
            raise RuntimeError(f"Expected TagResult, got {reply.body_type}")

    # ---- main loop --------------------------------------------------------
    @staticmethod
    def spawn(
        spec,
        num_simulators=1,
        address_prefix=None,
        python=None,
        **popen_kwargs,
    ):
        """Launch ``num_simulators`` Python simulators as SUBPROCESSES, each
        serving ``spec`` ("package.module:function") on its own socket.

        Returns (processes, addresses); pass the addresses to
        RemoteModelPool or LockstepRemoteModel.  Subprocesses sidestep the
        GIL for CPU-bound Python simulators — the in-thread test doubles
        (``PPXSimulatorServer(...).serve()`` on a thread) only overlap
        socket waits.  The reference has no Python simulator runner at all
        (its simulators are the pyprob_cpp docker binaries,
        reference: tests/test_inference_remote.py:98).
        """
        import subprocess
        import sys
        import uuid as _uuid

        if address_prefix is None:
            address_prefix = f"ipc://@pyprob_tpu_sim_{_uuid.uuid4()}"

        def _address(i):
            if address_prefix.startswith("tcp://"):
                # tcp: consecutive ports from the given base port
                host, _, port = address_prefix[len("tcp://"):].rpartition(":")
                if not port.isdigit():
                    raise ValueError(
                        "tcp address_prefix must end in a base port, e.g. "
                        "tcp://127.0.0.1:5555"
                    )
                return f"tcp://{host}:{int(port) + i}"
            return f"{address_prefix}_{i}"

        processes, addresses = [], []
        for i in range(num_simulators):
            address = _address(i)
            processes.append(
                subprocess.Popen(
                    [
                        python or sys.executable,
                        "-m",
                        "pyprob_tpu.ppx.server",
                        spec,
                        address,
                    ],
                    **popen_kwargs,
                )
            )
            addresses.append(address)
        return processes, addresses

    def serve(self, max_runs=None):
        """Handle handshake then Run requests until Reset (or max_runs)."""
        runs = 0
        self._running = True
        while self._running:
            msg = wire.decode_message(self._socket.recv())
            if msg.body_type == MessageBody.Handshake:
                self._socket.send(
                    wire.build_handshake_result(
                        self._system_name, self._model_name
                    )
                )
            elif msg.body_type == MessageBody.Run:
                # optional per-run input tensor (pyprob_tpu PPX extension);
                # forward_func reads it from ``server.payload``
                self.payload = msg.fields.get("payload")
                result = self._forward_func(self)
                self._socket.send(
                    wire.build_run_result(np.asarray(result, np.float64))
                )
                runs += 1
                if max_runs is not None and runs >= max_runs:
                    self._running = False
            elif msg.body_type == MessageBody.Reset:
                self._socket.send(wire.build_reset())
                self._running = False
            else:
                raise RuntimeError(
                    f"Simulator received unexpected body type: {msg.body_type}"
                )
        self.close()


def _main(argv=None):
    """CLI simulator runner: ``python -m pyprob_tpu.ppx.server
    package.module:forward_func tcp://host:port`` serves the named forward
    function as a PPX simulator until Reset."""
    import argparse
    import importlib

    parser = argparse.ArgumentParser(
        description="Serve a Python forward function as a PPX simulator."
    )
    parser.add_argument(
        "spec", help="import spec of the forward function: module:function"
    )
    parser.add_argument("address", help="ZMQ bind address (tcp:// or ipc://)")
    parser.add_argument("--model-name", default=None)
    parser.add_argument(
        "--max-runs", type=int, default=None, help="exit after N Run messages"
    )
    args = parser.parse_args(argv)
    module_name, _, func_name = args.spec.partition(":")
    if not func_name:
        parser.error("spec must be module:function")
    forward_func = getattr(importlib.import_module(module_name), func_name)
    server = PPXSimulatorServer(
        args.address,
        forward_func,
        model_name=args.model_name or args.spec,
    )
    server.serve(max_runs=args.max_runs)


if __name__ == "__main__":
    _main()
