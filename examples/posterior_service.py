"""Posterior serving: a subprocess inference server answering JSON queries.

The service owns the model and the device; clients speak ZMQ REQ with
JSON bodies. One compiled particle program serves every observation set
(observed values are traced arguments), so a query is a single device
dispatch after the first.

Run: python examples/posterior_service.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

from pyprob_tpu.serving import PosteriorServer, PosteriorClient


def main():
    # the factory runs INSIDE the subprocess: model construction, network
    # loading and device ownership all live server-side
    proc, addr = PosteriorServer.spawn(
        "tests.extra.serving_factory:make_service"
    )
    print(f"server subprocess {proc.pid} at {addr}")
    try:
        with PosteriorClient(addr, timeout_seconds=300) as client:
            t0 = time.time()
            r = client.query({"obs0": 8.0, "obs1": 9.0})
            print(
                f"first query (compiles): {time.time() - t0:.2f}s -> "
                f"mean {r['mean']:.3f} +- {r['stddev']:.3f} "
                f"(true 7.250 +- 0.913), ESS {r['ess']:,.0f}"
            )
            t0 = time.time()
            n = 25
            for i in range(n):
                r = client.query(
                    {"obs0": float(i % 7), "obs1": float(i % 5)},
                    num_samples=4,
                )
            dt = time.time() - t0
            print(
                f"{n} distinct-observation queries in {dt:.2f}s "
                f"({n / dt:,.1f} queries/s, {len(r['samples'])} draws each)"
            )
            client.shutdown()
    finally:
        try:
            proc.wait(timeout=60)
        except Exception:
            proc.kill()
            proc.wait()
    print("server exited", proc.returncode)


if __name__ == "__main__":
    main()
