"""Amortized inference serving: train once, answer many observation
queries — the inference-compilation deployment story (arXiv:1610.09900).

The guided-IS program treats observed values as traced arguments, so ONE
compiled program serves every query; per-query cost is a single device
dispatch. This measures query throughput after a short training run.

Run: python examples/amortized_serving.py
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import pyprob_tpu as pp
from pyprob_tpu.models import GaussianUnknownMean

PARTICLES_PER_QUERY = 4096
NUM_QUERIES = 100


def main():
    pp.set_verbosity(0)
    pp.seed(0)
    model = GaussianUnknownMean()
    print("training the proposal network once ...")
    t0 = time.time()
    model.learn_inference_network(
        num_traces=25600,
        observe_embeddings={"obs0": {"dim": 16}, "obs1": {"dim": 16}},
        inference_network=pp.InferenceNetwork.LSTM,
        batch_size=256,
        learning_rate_init=0.01,
        lstm_dim=128,
    )
    print(f"trained in {time.time() - t0:.1f}s")

    engine = pp.InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK
    rng = np.random.default_rng(0)
    queries = rng.uniform(-5.0, 12.0, size=(NUM_QUERIES, 2))

    # warm up (compiles the one program all queries share)
    model.posterior_results(
        PARTICLES_PER_QUERY,
        observe={"obs0": 0.0, "obs1": 0.0},
        vectorized=True,
        inference_engine=engine,
    )

    t0 = time.time()
    max_err = 0.0
    ess_total = 0.0
    for q in queries:
        post = model.posterior_results(
            PARTICLES_PER_QUERY,
            observe={"obs0": float(q[0]), "obs1": float(q[1])},
            vectorized=True,
            inference_engine=engine,
        )
        true = model.true_posterior([float(q[0]), float(q[1])])
        max_err = max(max_err, abs(float(post.mean) - float(true.mean)))
        ess_total += post.effective_sample_size / PARTICLES_PER_QUERY
    dt = time.time() - t0
    print(
        f"{NUM_QUERIES} posterior queries x {PARTICLES_PER_QUERY} particles "
        f"in {dt:.2f}s = {NUM_QUERIES / dt:,.1f} queries/s "
        f"({NUM_QUERIES * PARTICLES_PER_QUERY / dt:,.0f} traces/s)"
    )
    print(
        f"max |posterior mean error| across queries: {max_err:.3f}; "
        f"mean ESS fraction {ess_total / NUM_QUERIES:.3f}"
    )


if __name__ == "__main__":
    main()
