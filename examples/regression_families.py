"""Bayesian regression families: exact posteriors, evidence, model choice.

Run: python examples/regression_families.py

Three built-in regression models (pyprob_tpu.models):

1. BayesianLinearRegression — conjugate, so the exact Gaussian posterior
   AND the exact log marginal likelihood are available in closed form.
   We check compiled-tier IS, NUTS and Laplace against the closed-form
   moments, and the Laplace evidence against the analytic evidence
   (exact here: the log joint is quadratic).
2. Bayes-factor model selection — linear vs quadratic feature sets on
   data generated from a quadratic; the Laplace evidences (exact for
   this family) rank the models, matching the analytic Bayes factor.
3. GaussianProcessRegression — the latent function marginalized out,
   latents = kernel hyperparameters, one [N,N] Cholesky per particle;
   HMC and compiled-tier IS both recover the grid-integrated exact
   log-lengthscale posterior.
"""

import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import pyprob_tpu as pp
from pyprob_tpu.models import (
    BayesianLinearRegression,
    GaussianProcessRegression,
)


def analytic_log_evidence(m, y):
    """Closed-form log p(y) for the conjugate linear model:
    y ~ N(0, sigma^2 I + tau^2 X X^T)."""
    y = np.asarray(y, dtype=np.float64)
    S = (
        m.noise_stddev**2 * np.eye(m.num_data)
        + m.prior_stddev**2 * m.X @ m.X.T
    )
    sign, logdet = np.linalg.slogdet(S)
    return float(
        -0.5 * y @ np.linalg.solve(S, y)
        - 0.5 * logdet
        - 0.5 * m.num_data * math.log(2 * math.pi)
    )


def main():
    pp.seed(7)
    rng = np.random.default_rng(7)

    # ------------------------------------------------------- 1. conjugate
    X = rng.normal(size=(50, 3))
    m = BayesianLinearRegression(X, prior_stddev=1.0, noise_stddev=0.5)
    y = m.synthesize([1.2, -0.4, 0.8], rng=1)
    true_mean, true_cov = m.true_posterior(y)
    print("exact posterior mean :", np.round(true_mean, 4))

    post_is = m.posterior_results(
        num_traces=30000, observe={"y": y}, vectorized=True
    )
    print("compiled IS mean     :", np.round(np.asarray(post_is.mean), 4))

    post_nuts = m.posterior(
        num_traces=800,
        observe={"y": y},
        inference_engine=pp.InferenceEngine.NO_U_TURN_SAMPLER,
        burn_in=300,
    )
    draws = np.stack([np.asarray(t.result, np.float64) for t in post_nuts])
    print("NUTS mean            :", np.round(draws.mean(axis=0), 4))

    post_lap = m.posterior(
        num_traces=2000,
        observe={"y": y},
        inference_engine=pp.InferenceEngine.LAPLACE,
    )
    ld = np.stack([np.asarray(t.result, np.float64) for t in post_lap])
    print("Laplace mean         :", np.round(ld.mean(axis=0), 4))
    print("Laplace var          :", np.round(ld.var(axis=0), 5))
    print("exact var (diag)     :", np.round(np.diag(true_cov), 5))

    lev = analytic_log_evidence(m, y)
    print(f"analytic log evidence: {lev:.4f}")
    print(f"Laplace log evidence : {post_lap.log_evidence_laplace:.4f}"
          "  (exact on this family)")

    # ------------------------------------------------ 2. model selection
    x1 = rng.uniform(-2, 2, size=60)
    y_quad = 0.8 * x1 * x1 - 0.5 * x1 + rng.normal(0, 0.5, size=60)
    X_lin = np.stack([np.ones_like(x1), x1], axis=1)
    X_quad = np.stack([np.ones_like(x1), x1, x1 * x1], axis=1)
    m_lin = BayesianLinearRegression(X_lin, noise_stddev=0.5)
    m_quad = BayesianLinearRegression(X_quad, noise_stddev=0.5)
    print("\nBayes-factor model selection (quadratic data):")
    evs = {}
    for name, mm in [("linear", m_lin), ("quadratic", m_quad)]:
        post = mm.posterior(
            num_traces=500,
            observe={"y": y_quad},
            inference_engine=pp.InferenceEngine.LAPLACE,
        )
        evs[name] = post.log_evidence_laplace
        print(f"  {name:10s} Laplace={evs[name]:10.3f}"
              f"  analytic={analytic_log_evidence(mm, y_quad):10.3f}")
    bf = evs["quadratic"] - evs["linear"]
    print(f"  log Bayes factor (quad vs lin): {bf:.1f}"
          f"  -> prefers {'quadratic' if bf > 0 else 'linear'}")

    # ----------------------------------------------------------- 3. GP
    xg = np.linspace(0, 4, 30)
    gp = GaussianProcessRegression(xg, learn=("lengthscale",), noise=0.2)
    yg = gp.synthesize(rng=3, lengthscale=1.0)
    gmean, gstd = gp.true_posterior_moments(yg)
    print(f"\nGP log-lengthscale posterior (grid): {gmean:.3f} +- {gstd:.3f}")

    post_h = gp.posterior(
        num_traces=600,
        observe={"y": yg},
        inference_engine=pp.InferenceEngine.HAMILTONIAN_MONTE_CARLO,
        burn_in=300,
    )
    hd = np.array([float(np.asarray(t.result).reshape(-1)[0]) for t in post_h])
    print(f"HMC:  {hd.mean():.3f} +- {hd.std():.3f}")

    post_g = gp.posterior_results(
        num_traces=6000, observe={"y": yg}, vectorized=True
    )
    print(f"IS (compiled, 6k particles, [30,30] Cholesky each): "
          f"{float(np.asarray(post_g.mean).reshape(-1)[0]):.3f}")


if __name__ == "__main__":
    main()
