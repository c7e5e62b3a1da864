"""Sequential Monte Carlo on a nonlinear state-space model.

Demonstrates the SEQUENTIAL_MONTE_CARLO engine (beyond the reference's
engine set): a stochastic-volatility-style model observed at every step.
Plain importance sampling degenerates exponentially with the number of
observes; SMC resamples between them and stays healthy — and the whole
T-stage filter runs as ONE compiled device dispatch, including the
log-evidence estimate.

Run: python examples/state_space_smc.py
"""

import math
import os
import sys
import time

import numpy as np
import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

jax.config.update("jax_platforms", "cpu")  # demo on host; bench uses TPU

import pyprob_tpu as pp  # noqa: E402
from pyprob_tpu.distributions import Normal  # noqa: E402

T = 12
PHI, SIGMA, BETA = 0.9, 0.4, 0.7


class StochasticVolatility(pp.Model):
    """x_t = phi x_{t-1} + sigma eps;  y_t ~ N(0, beta^2 exp(x_t))."""

    def forward(self):
        x = pp.sample(Normal(0.0, SIGMA / math.sqrt(1 - PHI ** 2)),
                      address="x0")
        xs = []
        for t in range(T):
            x = pp.sample(Normal(PHI * x, SIGMA), address=f"x{t + 1}")
            import jax.numpy as jnp

            pp.observe(Normal(0.0, BETA * jnp.exp(0.5 * x)), name=f"y{t}")
            xs.append(x)
        return x


class StochasticVolatilityMarkov(pp.MarkovModel):
    """The same model through the markov protocol: SMC then runs the
    O(T) ``lax.scan`` filter (one vmapped step per stage) instead of the
    O(T^2) staged replay, and scales to T in the hundreds.  The per-step
    observation is a single [T] array named "y"."""

    def markov_init(self):
        return pp.sample(
            Normal(0.0, SIGMA / math.sqrt(1 - PHI ** 2)), address="x0"
        )

    def markov_step(self, x, t):
        import jax.numpy as jnp

        x = pp.sample(Normal(PHI * x, SIGMA), address="x")
        pp.observe(Normal(0.0, BETA * jnp.exp(0.5 * x)), name="y")
        return x


def main():
    pp.set_verbosity(0)
    pp.seed(7)

    # synthesize data from the generative process
    rng = np.random.default_rng(0)
    x = rng.normal(0, SIGMA / math.sqrt(1 - PHI ** 2))
    ys = []
    for _ in range(T):
        x = PHI * x + SIGMA * rng.normal()
        ys.append(BETA * math.exp(0.5 * x) * rng.normal())
    observe = {f"y{t}": ys[t] for t in range(T)}

    model = StochasticVolatility()
    n = 50_000

    t0 = time.time()
    post_is = model.posterior_results(
        num_traces=n, observe=observe, vectorized=True
    )
    t_is = time.time() - t0

    t0 = time.time()
    post_smc = model.posterior_results(
        num_traces=n,
        observe=observe,
        inference_engine=pp.InferenceEngine.SEQUENTIAL_MONTE_CARLO,
    )
    t_smc = time.time() - t0

    print(f"{T}-step stochastic volatility, {n:,} particles")
    print(
        f"  IS : ESS {post_is.effective_sample_size:10,.1f} "
        f"({100 * post_is.effective_sample_size / n:6.2f}%)  "
        f"final-state mean {float(post_is.mean):+.3f}   {t_is:.2f}s"
    )
    print(
        f"  SMC: ESS {post_smc.effective_sample_size:10,.1f} "
        f"({100 * post_smc.effective_sample_size / n:6.2f}%)  "
        f"final-state mean {float(post_smc.mean):+.3f}   {t_smc:.2f}s"
        f"   log Z = {post_smc.log_evidence:.3f}"
    )

    # the markov protocol: same filter as ONE lax.scan (O(T), scales to
    # long horizons) — note the single [T]-array observation
    mmodel = StochasticVolatilityMarkov(num_steps=T)
    t0 = time.time()
    post_scan = mmodel.posterior_results(
        num_traces=n,
        observe={"y": np.asarray(ys)},
        inference_engine=pp.InferenceEngine.SEQUENTIAL_MONTE_CARLO,
    )
    t_scan = time.time() - t0
    print(
        f"  SMC (markov/scan): ESS {post_scan.effective_sample_size:10,.1f} "
        f"({100 * post_scan.effective_sample_size / n:6.2f}%)  "
        f"final-state mean {float(post_scan.mean):+.3f}   {t_scan:.2f}s"
        f"   log Z = {post_scan.log_evidence:.3f}"
    )


if __name__ == "__main__":
    main()
