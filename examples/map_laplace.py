"""MAP estimation and the Laplace-approximation engine.

Run: python examples/map_laplace.py

A conjugate Gamma-Poisson rate model: the constrained-space MAP is
(alpha_post - 1) / beta_post exactly, and the Laplace engine's
importance-reweighted draws recover the exact skewed Gamma posterior
moments even though the Gaussian is fit in log space.
"""

import math

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import pyprob_tpu as pp
from pyprob_tpu.distributions import Gamma, Poisson

COUNTS = [4.0, 6.0, 3.0]


class RateModel(pp.Model):
    def forward(self):
        lam = pp.sample(Gamma(3.0, 1.0), name="lam")
        for i in range(len(COUNTS)):
            pp.observe(Poisson(lam), name=f"c{i}")
        return lam


def main():
    pp.set_verbosity(0)
    pp.seed(1)
    m = RateModel()
    obs = {f"c{i}": c for i, c in enumerate(COUNTS)}
    a_post, b_post = 3.0 + sum(COUNTS), 1.0 + len(COUNTS)

    # point estimate: the posterior mode (Stan `optimizing` convention)
    res = m.map_estimate(observe=obs)
    print(f"MAP lam       = {float(res.values['lam']):.4f} "
          f"(analytic {(a_post - 1) / b_post:.4f})")
    print(f"log joint     = {res.log_joint:.4f}")

    # full approximate posterior: reweighted Gaussian-at-the-mode draws
    post = m.posterior_results(
        num_traces=20000, observe=obs,
        inference_engine=pp.InferenceEngine.LAPLACE,
    )
    print(f"posterior mean {float(post.mean):.4f} "
          f"(analytic {a_post / b_post:.4f}), "
          f"std {float(post.stddev):.4f} "
          f"(analytic {math.sqrt(a_post) / b_post:.4f})")
    print(f"ESS {post.effective_sample_size:,.0f} / {post.length:,}")
    print(f"log evidence: IS {post.log_evidence:.4f}, "
          f"Laplace closed-form {post.log_evidence_laplace:.4f}")


if __name__ == "__main__":
    main()
