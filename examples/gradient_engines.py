"""Tour of the gradient-based engines (all beyond the reference's set).

One mixed discrete-continuous model — a two-component location mixture —
run through HMC, NUTS, VI (meanfield + fullrank) and parallel tempering,
plus the modern convergence diagnostics. The Categorical indicator is
marginalized out of every engine's potential automatically (enumeration)
and redrawn from its exact conditional in the returned traces.

Run: python examples/gradient_engines.py   (CPU-friendly, a few seconds)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import pyprob_tpu as pp
from pyprob_tpu import diagnostics
from pyprob_tpu.distributions import Normal, Categorical


class Mixture(pp.Model):
    def forward(self):
        mu = pp.sample(Normal(0.0, 5.0))
        k = pp.sample(Categorical([0.5, 0.5]))  # marginalized by enumeration
        shift = jnp.where(k == 0, -2.0, 2.0)
        pp.observe(Normal(mu + shift, 1.0), name="y")
        return mu


def main():
    pp.set_verbosity(1)
    pp.seed(1)
    model = Mixture()
    observe = {"y": 1.0}
    N = 20000

    # large-sample importance-sampling reference
    ref = model.posterior_results(
        num_traces=400000, observe=observe, vectorized=True
    )
    print(f"IS reference (400k particles): mean={float(ref.mean):+.4f} "
          f"std={float(ref.stddev):.4f}")

    rows = []
    for label, engine, kw in [
        ("HMC", pp.InferenceEngine.HAMILTONIAN_MONTE_CARLO, {}),
        ("NUTS", pp.InferenceEngine.NO_U_TURN_SAMPLER, {}),
        ("PT", pp.InferenceEngine.PARALLEL_TEMPERING,
         dict(num_chains=8, num_temperatures=4)),
        ("VI-meanfield", pp.InferenceEngine.VARIATIONAL_INFERENCE, {}),
        ("VI-fullrank", pp.InferenceEngine.VARIATIONAL_INFERENCE,
         dict(guide="fullrank")),
    ]:
        t0 = time.time()
        post = model.posterior_results(
            num_traces=N, observe=observe, inference_engine=engine, **kw
        )
        dt = time.time() - t0
        md = post.metadata[-1]
        extras = []
        if "mean_tree_depth" in md:
            extras.append(f"depth {md['mean_tree_depth']:.1f}")
        if "swap_acceptance_rate" in md:
            extras.append(f"swap {md['swap_acceptance_rate']:.2f}")
        if "final_elbo" in md:
            extras.append(f"ELBO {md['final_elbo']:.3f}")
        rows.append(
            f"{label:13s} mean={float(post.mean):+.4f} "
            f"std={float(post.stddev):.4f} ({dt:5.1f}s"
            + (", " + ", ".join(extras) if extras else "")
            + ")"
        )
    print("\n".join(rows))

    # convergence diagnostics over NUTS chains
    chains = model.posterior_results(
        num_traces=N,
        observe=observe,
        inference_engine=pp.InferenceEngine.NO_U_TURN_SAMPLER,
        num_chains=8,
        burn_in=300,
        return_chains=True,
    )
    rhat = diagnostics.split_rhat(chains)
    bulk = diagnostics.effective_sample_size_chains(chains, "bulk")
    tail = diagnostics.effective_sample_size_chains(chains, "tail")
    print(f"NUTS diagnostics: split-R-hat {rhat:.4f}, "
          f"bulk-ESS {bulk:,.0f}, tail-ESS {tail:,.0f}")

    # warm-start resume: the adapted state answers a NEW observation
    # without re-running warmup (amortized MCMC serving)
    import time as _t

    nuts = pp.InferenceEngine.NO_U_TURN_SAMPLER
    post = model.posterior_results(
        num_traces=N, observe=observe, inference_engine=nuts, num_chains=64
    )
    new_obs = {"y": -1.0}
    ref2 = model.posterior_results(num_traces=400000, observe=new_obs)
    t0 = _t.time()
    warm = model.posterior_results(
        num_traces=N,
        observe=new_obs,
        inference_engine=nuts,
        initial_trace=post.final_gradient_state,
        burn_in=50,
    )
    print(f"warm NUTS on a new observation: mean {float(warm.mean):+.4f} "
          f"(IS reference {float(ref2.mean):+.4f}) in {_t.time() - t0:.2f}s,"
          f" no warmup")


if __name__ == "__main__":
    main()
