"""Interpreter-tier guided-IC throughput: lockstep vs sequential vs the
reference (manual; the BASELINE.md r3 lockstep table).

GUM-Marsaglia (the canonical universal-PPL IC benchmark: divergent
while-loop control flow, untraceable), LSTM-128 proposal network at the
same architecture the reference baseline was measured with
(tests/extra/reference_baseline.py measures the reference side:
72.3 traces/s guided IS at ESS 1.0% on this machine).

Run: python tests/extra/lockstep_bench.py            # CPU (forced)
     PYPROB_TPU_LOCKSTEP=128 python tests/extra/lockstep_bench.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")  # host-bound workload

import pyprob_tpu as pp
from pyprob_tpu.models import GaussianUnknownMeanMarsaglia

OBS = {"obs0": 8.0, "obs1": 9.0}
ENGINE = pp.InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK


def main(train_traces=12800, measure=12000):
    pp.set_verbosity(0)
    pp.seed(123)
    m = GaussianUnknownMeanMarsaglia()
    t0 = time.time()
    m.learn_inference_network(
        num_traces=train_traces,
        observe_embeddings={"obs0": {"dim": 32}, "obs1": {"dim": 32}},
        inference_network=pp.InferenceNetwork.LSTM,
        batch_size=256,
        learning_rate_init=0.002,
        lstm_dim=128,
    )
    train_tps = train_traces / (time.time() - t0)

    out = {"train_traces_per_s": round(train_tps, 1)}
    for label, n, kw in (
        ("sequential", max(500, measure // 16), {"lockstep": False}),
        ("lockstep", measure, {}),
    ):
        # warm the jitted programs before timing
        m.posterior_results(
            min(1000, n), observe=OBS, vectorized=False,
            inference_engine=ENGINE, **kw,
        )
        t0 = time.time()
        post = m.posterior_results(
            n, observe=OBS, vectorized=False, inference_engine=ENGINE, **kw
        )
        out[label] = {
            "traces_per_s": round(n / (time.time() - t0), 1),
            "ess_fraction": round(post.effective_sample_size / n, 4),
            "mean": round(float(post.mean), 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
