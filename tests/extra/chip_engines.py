"""One-chip throughput of the gradient engines (manual; run on TPU).

Measures warm-cache samples/s for HMC, NUTS, PT and tempered SMC on the
GUM model — each engine's entire run is ONE device dispatch, so the
number is dominated by on-chip compute, not tunnel round-trips.
Appends nothing; prints a table for BASELINE.md.

Run: python tests/extra/chip_engines.py          (real chip)
     SCALING_PLATFORM=cpu python tests/extra/chip_engines.py
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

if os.environ.get("SCALING_PLATFORM", "").lower() == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import pyprob_tpu as pp
from pyprob_tpu.distributions import Normal


class GUM(pp.Model):
    def forward(self):
        mu = pp.sample(Normal(1.0, math.sqrt(5.0)))
        lik = Normal(mu, math.sqrt(2.0))
        pp.observe(lik, name="obs0")
        pp.observe(lik, name="obs1")
        return mu


def main():
    pp.set_verbosity(0)
    pp.seed(11)
    model = GUM()
    observe = {"obs0": 8.0, "obs1": 9.0}
    n = 100000

    configs = [
        ("HMC", pp.InferenceEngine.HAMILTONIAN_MONTE_CARLO, {}),
        ("NUTS", pp.InferenceEngine.NO_U_TURN_SAMPLER, {}),
        ("PT (K=8)", pp.InferenceEngine.PARALLEL_TEMPERING, {}),
        ("tempered SMC", pp.InferenceEngine.TEMPERED_SMC, {}),
        ("VI meanfield", pp.InferenceEngine.VARIATIONAL_INFERENCE, {}),
        ("Laplace", pp.InferenceEngine.LAPLACE, {}),
        ("SVGD", pp.InferenceEngine.STEIN_VARIATIONAL_GRADIENT_DESCENT,
         {"svgd_particles": 1024}),
    ]
    print(f"{'engine':14s} {'samples/s':>12s}  (n={n:,}, warm, one dispatch)")
    for label, engine, kw in configs:
        # warm: compile + first run
        model.posterior_results(
            num_traces=n, observe=observe, inference_engine=engine, **kw
        )
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            post = model.posterior_results(
                num_traces=n, observe=observe, inference_engine=engine, **kw
            )
            best = min(best, time.time() - t0)
        ok = abs(float(post.mean) - 7.25) < 0.2
        print(f"{label:14s} {n / best:12,.0f}  correct={ok}")


if __name__ == "__main__":
    main()
