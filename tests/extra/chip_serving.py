"""Chip measurement: posterior-serving query throughput (guided IS).

Runs on the real TPU. Trains the GUM proposal network once, then answers
distinct-observation posterior queries through PosteriorService — each
query is one device dispatch of the shared compiled program.

Usage: python tests/extra/chip_serving.py
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import jax

import pyprob_tpu as pp
from pyprob_tpu.distributions import Normal
from pyprob_tpu.models import GaussianUnknownMean
from pyprob_tpu.serving import PosteriorService

pp.set_verbosity(0)
pp.seed(0)

PARTICLES = 20000
QUERIES = 100


def main():
    print("backend:", jax.default_backend(), jax.devices())
    model = GaussianUnknownMean()
    t0 = time.time()
    model.learn_inference_network(
        num_traces=25600,
        observe_embeddings={"obs0": {"dim": 16}, "obs1": {"dim": 16}},
        inference_network=pp.InferenceNetwork.LSTM,
        batch_size=256,
        learning_rate_init=0.01,
        lstm_dim=128,
    )
    print(f"trained in {time.time() - t0:.0f}s")

    svc = PosteriorService(
        model,
        inference_engine=pp.InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK,
        num_traces=PARTICLES,
        vectorized=True,
    )
    svc.warm_up({"obs0": 0.0, "obs1": 0.0})

    rng = np.random.default_rng(0)
    queries = rng.uniform(-5.0, 12.0, size=(QUERIES, 2))
    errs = []
    t0 = time.time()
    for q in queries:
        r = svc.query({"obs0": float(q[0]), "obs1": float(q[1])})
        true_mean = (1.0 / 5.0 + (q[0] + q[1]) / 2.0) / (1.0 / 5.0 + 2.0 / 2.0)
        errs.append(abs(r["mean"] - true_mean))
    dt = time.time() - t0
    print(
        f"{QUERIES} distinct-observation guided-IS queries "
        f"({PARTICLES:,} particles each) in {dt:.2f}s = "
        f"{QUERIES / dt:,.1f} queries/s on 1 chip; "
        f"max |posterior-mean error| {max(errs):.3f}"
    )


if __name__ == "__main__":
    main()
