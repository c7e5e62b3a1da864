"""Chip measurements for compiled data-dependent control flow.

Runs on the real TPU (do NOT force CPU). Measures warm throughput of:
  - GUM-Marsaglia (rejection_sample) compiled IS
  - GUM-Marsaglia compiled LMH chains
  - BranchingCompiled IS
  - masked variable-length model IS

Usage: python tests/extra/chip_control_flow.py
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp

import pyprob_tpu as pp
from pyprob_tpu.distributions import Normal, Categorical
from pyprob_tpu.models import (
    GaussianUnknownMeanMarsagliaRejection,
    BranchingCompiled,
)

pp.set_verbosity(0)
pp.seed(123)
OBS = {"obs0": 8.0, "obs1": 9.0}
N = 1 << 18


def best_of(f, n=3):
    best = float("inf")
    out = None
    for _ in range(n):
        t0 = time.time()
        out = f()
        best = min(best, time.time() - t0)
    return out, best


def main():
    print("backend:", jax.default_backend(), jax.devices())

    m = GaussianUnknownMeanMarsagliaRejection()
    m.posterior_results(num_traces=N, observe=OBS, vectorized=True)  # compile
    post, dt = best_of(
        lambda: m.posterior_results(num_traces=N, observe=OBS, vectorized=True)
    )
    print(
        f"Marsaglia-rejection IS: {N / dt:,.0f} traces/s "
        f"(mean {float(post.mean):.3f}, ESS {post.effective_sample_size:,.0f})"
    )

    kw = dict(
        num_traces=N,
        observe=OBS,
        vectorized=True,
        inference_engine=pp.InferenceEngine.LIGHTWEIGHT_METROPOLIS_HASTINGS,
    )
    m.posterior_results(**kw)  # compile
    post, dt = best_of(lambda: m.posterior_results(**kw))
    print(
        f"Marsaglia-rejection LMH chains: {N / dt:,.0f} transitions/s "
        f"(mean {float(post.mean):.3f}, std {float(post.stddev):.3f})"
    )

    b = BranchingCompiled()
    b.posterior_results(num_traces=N, observe={"obs": 6.0}, vectorized=True)
    post, dt = best_of(
        lambda: b.posterior_results(
            num_traces=N, observe={"obs": 6.0}, vectorized=True
        )
    )
    tp = b.true_posterior(6)
    print(
        f"BranchingCompiled IS: {N / dt:,.0f} traces/s "
        f"(mean {float(post.mean):.3f}, true {float(tp.mean):.3f})"
    )

    class VarLen(pp.Model):
        def forward(self):
            n = pp.sample(Categorical(probs=jnp.ones(3) / 3)) + 1
            mu = pp.sample(Normal(1.0, math.sqrt(5.0)))
            lik = Normal(mu, math.sqrt(2.0))
            for t in range(3):
                pp.observe(lik, name=f"obs{t}", mask=t < n)
            return mu

    v = VarLen()
    vobs = {"obs0": 8.0, "obs1": 9.0, "obs2": 7.0}
    v.posterior_results(num_traces=N, observe=vobs, vectorized=True)
    post, dt = best_of(
        lambda: v.posterior_results(num_traces=N, observe=vobs, vectorized=True)
    )
    print(
        f"Masked variable-length IS: {N / dt:,.0f} traces/s "
        f"(mean {float(post.mean):.3f})"
    )


if __name__ == "__main__":
    main()
