"""Bayesian workflow: fit competing models, compare them predictively.

Three models of the same bivariate data — independent Gaussians, a
correlated Gaussian with an LKJ prior on the correlation Cholesky factor,
and a deliberately overdispersed variant — each fitted with NUTS, then
ranked with PSIS-LOO (Pareto-smoothed importance-sampling leave-one-out
cross-validation) and WAIC via ``diagnostics.compare``.  The k-hat column
flags observations whose LOO estimate is unreliable.

Run: python examples/model_comparison.py   (CPU-friendly, ~1 min)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import pyprob_tpu as pp
from pyprob_tpu import diagnostics
from pyprob_tpu.distributions import (
    Normal, MultivariateNormal, LKJCholesky, HalfNormal,
)

N_OBS = 12
RHO_TRUE = 0.75


def make_data():
    rng = np.random.default_rng(11)
    cov = np.array([[1.0, RHO_TRUE], [RHO_TRUE, 1.0]])
    ys = rng.multivariate_normal([0.0, 0.0], cov, size=N_OBS)
    return {f"y{i}": ys[i] for i in range(N_OBS)}


class Independent(pp.Model):
    """No correlation: diagonal covariance."""

    def forward(self):
        sigma = pp.sample(HalfNormal(2.0))
        lik = MultivariateNormal(
            jnp.zeros(2), scale_tril=sigma * jnp.eye(2)
        )
        for i in range(N_OBS):
            pp.observe(lik, name=f"y{i}")
        return sigma


class Correlated(pp.Model):
    """LKJ prior on the correlation Cholesky factor (the data-generating
    family)."""

    def forward(self):
        L = pp.sample(LKJCholesky(2, 1.0))
        sigma = pp.sample(HalfNormal(2.0))
        lik = MultivariateNormal(jnp.zeros(2), scale_tril=sigma * L)
        for i in range(N_OBS):
            pp.observe(lik, name=f"y{i}")
        return L[1, 0]


class Overdispersed(pp.Model):
    """Likelihood scale inflated 5x: predictively much worse."""

    def forward(self):
        L = pp.sample(LKJCholesky(2, 1.0))
        lik = MultivariateNormal(jnp.zeros(2), scale_tril=5.0 * L)
        for i in range(N_OBS):
            pp.observe(lik, name=f"y{i}")
        return L[1, 0]


def main():
    pp.set_verbosity(1)
    pp.seed(0)
    obs = make_data()
    nuts = pp.InferenceEngine.NO_U_TURN_SAMPLER

    posteriors = {}
    for model in (Independent(), Correlated(), Overdispersed()):
        name = type(model).__name__
        posteriors[name] = model.posterior(
            num_traces=2000, observe=obs, inference_engine=nuts,
            num_chains=8,
        )
        print(f"fitted {name}")

    rho = np.mean([
        float(t.result) for t in posteriors["Correlated"].get_values()
    ])
    print(f"\nposterior mean correlation (Correlated): {rho:.3f} "
          f"(true {RHO_TRUE})\n")

    for ic in ("loo", "waic"):
        rows = diagnostics.compare(posteriors, ic=ic)
        print(f"--- compare(ic={ic!r}) ---")
        hdr = f"{'model':<16}{'elpd':>10}{'se':>8}{'d_elpd':>10}{'dse':>8}"
        if ic == "loo":
            hdr += f"{'k_max':>8}"
        print(hdr)
        for r in rows:
            line = (f"{r['name']:<16}{r['elpd']:>10.2f}{r['se']:>8.2f}"
                    f"{r['elpd_diff']:>10.2f}{r['dse']:>8.2f}")
            if ic == "loo":
                line += f"{r['pareto_k_max']:>8.2f}"
            print(line)
        print()

    best = diagnostics.compare(posteriors)[0]["name"]
    print(f"best predictive model: {best}")
    assert best == "Correlated"


if __name__ == "__main__":
    main()
