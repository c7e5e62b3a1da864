"""Posterior serving: answer observation queries from a long-lived process.

Production deployment story (no reference counterpart — the reference is a
library only).  The compiled tier treats observed values as traced
*arguments* of the particle program, so one compiled program answers every
query for a given observe-name set; a query is a single device dispatch
(examples/amortized_serving.py measures ~40 posterior queries/s sustained
on one chip at 20k particles each).

Three layers:

* :class:`PosteriorService` — in-process query API over a model.
* :class:`PosteriorServer` — ZMQ REP loop speaking JSON; ``serve()``
  blocks, ``serve_in_thread()`` runs it on a daemon thread, and
  ``PosteriorServer.spawn`` launches a subprocess server.
* :class:`PosteriorClient` — ZMQ REQ client for the wire protocol.

Wire protocol (JSON over ZMQ REQ/REP):

  request:  {"observe": {name: value | [values]},
             "num_samples": k,          # optional posterior draws
             "num_traces": n,           # optional per-query override
             "quantiles": [q...],       # optional weighted quantiles
             "hpd_mass": m}             # optional HPD interval mass
  reply:    {"ok": true, "mean": ..., "stddev": ..., "ess": ...,
             "log_evidence": ... | null, "latency_s": ...,
             "samples": [...],          # present when num_samples > 0
             "quantiles": [...],        # parallel to the request's qs
             "hpd": [low, high]}        # present when hpd_mass given
  errors:   {"ok": false, "error": "..."}

A "shutdown" request ({"shutdown": true}) stops the server loop.
"""

from __future__ import annotations

import json
import time

import numpy as np

from . import util
from .util import InferenceEngine


class PosteriorService:
    """In-process posterior query service over one model.

    The first query per observe-name set compiles the particle program;
    subsequent queries reuse it (the jitted-run cache is keyed on the
    observe-name set, and observed values enter as traced arguments).
    """

    def __init__(
        self,
        model,
        inference_engine=InferenceEngine.IMPORTANCE_SAMPLING,
        num_traces=4096,
        vectorized=True,
        **engine_kwargs,
    ):
        self._model = model
        self._engine = inference_engine
        self._num_traces = int(num_traces)
        self._vectorized = vectorized
        self._engine_kwargs = engine_kwargs
        self._queries = 0
        self._total_latency = 0.0

    def warm_up(self, observe):
        """Compile the query program for this observe-name set."""
        self.query(observe)

    def query(self, observe, num_samples=0, num_traces=None, quantiles=None,
              hpd_mass=None):
        """Run posterior inference for one observation set.

        Returns a dict with posterior summary statistics (plus ``samples``
        when ``num_samples`` > 0, weighted ``quantiles`` for the requested
        levels, and the shortest credible interval ``hpd`` when
        ``hpd_mass`` is given).
        """
        if num_traces is not None and int(num_traces) <= 0:
            raise ValueError(f"num_traces must be positive, got {num_traces}")
        t0 = time.time()
        posterior = self._model.posterior_results(
            num_traces=(
                self._num_traces if num_traces is None else int(num_traces)
            ),
            observe=observe,
            inference_engine=self._engine,
            vectorized=self._vectorized,
            **self._engine_kwargs,
        )
        latency = time.time() - t0
        self._queries += 1
        self._total_latency += latency
        out = {
            "ok": True,
            "mean": np.asarray(posterior.mean).tolist(),
            "stddev": np.asarray(posterior.stddev).tolist(),
            "ess": float(posterior.effective_sample_size),
            "num_traces": int(posterior.length),
            "log_evidence": (
                float(posterior.log_evidence)
                if getattr(posterior, "log_evidence", None) is not None
                else None
            ),
            "latency_s": latency,
        }
        if num_samples:
            out["samples"] = [
                np.asarray(posterior.sample()).tolist()
                for _ in range(int(num_samples))
            ]
        if quantiles is not None:
            out["quantiles"] = np.atleast_1d(
                posterior.quantile(list(quantiles))
            ).tolist()
        if hpd_mass is not None:
            out["hpd"] = list(posterior.hpd_interval(float(hpd_mass)))
        return out

    @property
    def stats(self):
        return {
            "queries": self._queries,
            "mean_latency_s": self._total_latency / max(1, self._queries),
        }


class PosteriorServer:
    """ZMQ REP server exposing a :class:`PosteriorService` over a socket."""

    def __init__(self, service, address):
        import zmq

        self._service = service
        self._address = address
        self._context = zmq.Context.instance()
        self._socket = self._context.socket(zmq.REP)
        self._socket.setsockopt(zmq.LINGER, 100)
        self._socket.bind(address)
        self._running = False

    @property
    def address(self):
        return self._address

    def _handle(self, raw):
        try:
            request = json.loads(raw)
        except Exception as e:
            return {"ok": False, "error": f"bad request: {e}"}, False
        if request.get("shutdown"):
            return {"ok": True, "shutdown": True}, True
        try:
            reply = self._service.query(
                request.get("observe") or {},
                num_samples=int(request.get("num_samples", 0)),
                num_traces=request.get("num_traces"),
                quantiles=request.get("quantiles"),
                hpd_mass=request.get("hpd_mass"),
            )
            return reply, False
        except Exception as e:
            return {"ok": False, "error": f"{type(e).__name__}: {e}"}, False

    def serve(self):
        """Blocking request loop; returns after a shutdown request."""
        self._running = True
        util.log_print(f"[serving] posterior server at {self._address}")
        try:
            while self._running:
                raw = self._socket.recv()
                reply, stop = self._handle(raw)
                self._socket.send(json.dumps(reply).encode())
                if stop:
                    self._running = False
        finally:
            self._socket.close(0)

    def serve_in_thread(self):
        import threading

        t = threading.Thread(target=self.serve, daemon=True)
        t.start()
        return t

    @staticmethod
    def spawn(spec, address=None, python=None, **popen_kwargs):
        """Launch a subprocess server.

        ``spec`` is ``"package.module:function"`` where the function
        returns a :class:`PosteriorService` (so model construction /
        network loading happens inside the subprocess).  Returns
        ``(process, address)``.
        """
        import subprocess
        import sys
        import uuid

        if address is None:
            address = f"ipc://@pyprob_tpu_serve_{uuid.uuid4()}"
        # spec/address travel via argv, never interpolated into code (a
        # quote in either would otherwise break or inject into the child)
        code = (
            "import sys, importlib;"
            "mod, fn = sys.argv[1].split(':');"
            "service = getattr(importlib.import_module(mod), fn)();"
            "from pyprob_tpu.serving import PosteriorServer;"
            "PosteriorServer(service, sys.argv[2]).serve()"
        )
        proc = subprocess.Popen(
            [python or sys.executable, "-c", code, spec, address],
            **popen_kwargs,
        )
        return proc, address


class PosteriorClient:
    """ZMQ REQ client for :class:`PosteriorServer`.

    Usable as a context manager; the socket is also closed at interpreter
    exit (an open REQ socket left behind by an exception would otherwise
    block zmq context termination and hang the process)."""

    def __init__(self, address, timeout_seconds=300):
        import atexit
        import zmq

        self._context = zmq.Context.instance()
        self._socket = self._context.socket(zmq.REQ)
        self._socket.setsockopt(zmq.LINGER, 100)
        self._socket.setsockopt(zmq.RCVTIMEO, int(timeout_seconds * 1000))
        self._socket.connect(address)
        self._closed = False
        atexit.register(self.close)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def query(self, observe, num_samples=0, num_traces=None, quantiles=None,
              hpd_mass=None):
        request = {"observe": _jsonable(observe), "num_samples": num_samples}
        if num_traces is not None:
            request["num_traces"] = int(num_traces)
        if quantiles is not None:
            request["quantiles"] = [float(q) for q in quantiles]
        if hpd_mass is not None:
            request["hpd_mass"] = float(hpd_mass)
        self._socket.send(json.dumps(request).encode())
        reply = json.loads(self._socket.recv())
        if not reply.get("ok"):
            raise RuntimeError(f"server error: {reply.get('error')}")
        return reply

    def shutdown(self):
        self._socket.send(json.dumps({"shutdown": True}).encode())
        self._socket.recv()

    def close(self):
        if not self._closed:
            self._closed = True
            self._socket.close(0)


def _jsonable(observe):
    # tolist() on a 0-d array returns a plain Python scalar, so this also
    # coerces numpy scalar types json.dumps cannot serialize
    return {k: np.asarray(v).tolist() for k, v in (observe or {}).items()}
