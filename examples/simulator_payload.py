"""Conditioning a PPX simulator per inference call with the Run payload.

Run: python examples/simulator_payload.py

The payload is a pyprob_tpu extension to the PPX protocol: an OPTIONAL
input tensor inside the Run message (payload-free Runs stay
byte-identical to the reference wire format).  Here one GUM simulator
serves different priors per posterior query — no named observes, no
restart.  Works identically against the C++ simulators
(cpp/build/test_gum_payload, Model::payload()).
"""

import math
import threading
import uuid

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import pyprob_tpu as pp
from pyprob_tpu.distributions import Normal
from pyprob_tpu.ppx.server import PPXSimulatorServer


def forward(server):
    # prior parameterized by the per-run payload: [mean, stddev]
    prior_mean, prior_stddev = 1.0, math.sqrt(5.0)
    if server.payload is not None:
        p = np.asarray(server.payload).reshape(-1)
        prior_mean = float(p[0])
        if p.size > 1:
            prior_stddev = float(p[1])
    mu = float(np.asarray(
        server.sample(Normal(prior_mean, prior_stddev), address="mu")
    ).reshape(-1)[0])
    lik = Normal(mu, math.sqrt(2.0))
    server.observe(lik, name="obs0", address="o0")
    server.observe(lik, name="obs1", address="o1")
    return mu


def main():
    pp.set_verbosity(0)
    pp.seed(7)
    address = f"ipc://@pyprob_tpu_payload_example_{uuid.uuid4()}"
    threading.Thread(
        target=lambda: PPXSimulatorServer(
            address, forward, model_name="payload GUM"
        ).serve(),
        daemon=True,
    ).start()

    model = pp.RemoteModel(address)
    obs = {"obs0": 8, "obs1": 9}
    for mean, std in [(1.0, math.sqrt(5.0)), (4.0, 1.0), (9.0, 0.5)]:
        post = model.posterior_results(
            num_traces=3000, observe=obs,
            payload=np.array([mean, std]),
        )
        prec = 1.0 / std**2 + 1.0  # prior + two obs at stddev sqrt(2)
        true = (mean / std**2 + 8.5) / prec
        print(f"prior N({mean}, {std:.3f}): posterior mean "
              f"{float(post.mean):.3f} (analytic {true:.3f})")
    model.close()


if __name__ == "__main__":
    main()
