"""Compiled data-dependent control flow: rejection loops and branching.

The canonical universal-PPL stress models run one-trace-at-a-time in the
reference (Python control flow can't be traced).  Two patterns make them
compile here:

1. ``pyprob_tpu.rejection_sample`` — rejection loops with replacement
   semantics lower to ``lax.while_loop`` inside the vmapped particle
   program (GUM-Marsaglia below).
2. Tensorized branches — ``where`` + table lookups instead of Python
   ``if`` over sampled values (Branching below).

Run: python examples/compiled_control_flow.py            (CPU)
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import pyprob_tpu as pp
from pyprob_tpu.models import (
    GaussianUnknownMeanMarsaglia,
    GaussianUnknownMeanMarsagliaRejection,
    BranchingCompiled,
)

OBS = {"obs0": 8.0, "obs1": 9.0}


def timed(fn):
    t0 = time.time()
    out = fn()
    return out, time.time() - t0


def main():
    # -- Marsaglia: interpreter loop vs compiled while_loop --------------
    interp = GaussianUnknownMeanMarsaglia()  # plain `while True:` -> interpreter
    comp = GaussianUnknownMeanMarsagliaRejection()  # combinator -> compiled

    n = 20000
    post_i, t_i = timed(
        lambda: interp.posterior_results(num_traces=n, observe=OBS)
    )
    post_c, _ = timed(  # first call pays compilation
        lambda: comp.posterior_results(num_traces=n, observe=OBS, vectorized=True)
    )
    post_c, t_c = timed(
        lambda: comp.posterior_results(num_traces=n, observe=OBS, vectorized=True)
    )
    true = comp.true_posterior([8.0, 9.0])
    print(
        f"GUM-Marsaglia, {n:,} traces    true posterior: "
        f"N({float(true.mean):.3f}, {float(true.stddev):.3f})"
    )
    print(
        f"  interpreter: {t_i:6.2f}s ({n / t_i:10,.0f} traces/s)  "
        f"mean {float(post_i.mean):.3f}"
    )
    print(
        f"  compiled:    {t_c:6.2f}s ({n / t_c:10,.0f} traces/s)  "
        f"mean {float(post_c.mean):.3f}   ({t_i / t_c:.0f}x faster, warm)"
    )

    # MCMC also stays compiled: vmapped chains with block-aware moves
    lmh, t_m = timed(
        lambda: comp.posterior_results(
            num_traces=n,
            observe=OBS,
            inference_engine=pp.InferenceEngine.LIGHTWEIGHT_METROPOLIS_HASTINGS,
            vectorized=True,
        )
    )
    print(
        f"  compiled LMH chains: {t_m:.2f}s  mean {float(lmh.mean):.3f} "
        f"std {float(lmh.stddev):.3f}"
    )

    # -- Branching: tensorized branch -------------------------------------
    b = BranchingCompiled()
    post_b, t_b = timed(
        lambda: b.posterior_results(
            num_traces=100000, observe={"obs": 6.0}, vectorized=True
        )
    )
    tp = b.true_posterior(6)
    print(
        f"Branching, 100,000 traces in {t_b:.2f}s: posterior mean "
        f"{float(post_b.mean):.3f} (enumerated truth {float(tp.mean):.3f})"
    )


if __name__ == "__main__":
    main()
