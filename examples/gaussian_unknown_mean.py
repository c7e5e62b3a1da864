"""Gaussian with unknown mean — the canonical first example
(counterpart of reference examples/gaussian_unknown_mean.ipynb).

Run: python examples/gaussian_unknown_mean.py
"""

import math
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pyprob_tpu as pp
from pyprob_tpu.distributions import Normal


class GaussianUnknownMean(pp.Model):
    def __init__(self):
        super().__init__(name="Gaussian with unknown mean")

    def forward(self):
        mu = pp.sample(Normal(1.0, math.sqrt(5.0)))
        likelihood = Normal(mu, math.sqrt(2.0))
        pp.observe(likelihood, name="obs0")
        pp.observe(likelihood, name="obs1")
        return mu


def main():
    pp.seed(1)
    model = GaussianUnknownMean()

    print("== prior ==")
    prior = model.prior_results(num_traces=5000, vectorized=True)
    print(f"prior mean {float(prior.mean):.3f} (true 1.0), "
          f"stddev {float(prior.stddev):.3f} (true {math.sqrt(5):.3f})")

    print("== posterior, importance sampling (compiled tier) ==")
    post = model.posterior_results(
        num_traces=50000, observe={"obs0": 8, "obs1": 9}, vectorized=True
    )
    print(f"posterior mean {float(post.mean):.3f} (true 7.25), "
          f"stddev {float(post.stddev):.3f} (true {math.sqrt(1/1.2):.3f}), "
          f"ESS {post.effective_sample_size:,.0f}")

    print("== posterior, RMH (vmapped parallel chains) ==")
    post = model.posterior_results(
        num_traces=50000,
        observe={"obs0": 8, "obs1": 9},
        vectorized=True,
        inference_engine=pp.InferenceEngine.RANDOM_WALK_METROPOLIS_HASTINGS,
    )
    print(f"posterior mean {float(post.mean):.3f}, stddev {float(post.stddev):.3f}")

    print("== inference compilation (LSTM proposal network) ==")
    model.learn_inference_network(
        num_traces=25600,
        observe_embeddings={"obs0": {"dim": 16}, "obs1": {"dim": 16}},
        inference_network=pp.InferenceNetwork.LSTM,
        batch_size=256,
        learning_rate_init=0.01,
        lstm_dim=128,
    )
    post = model.posterior_results(
        num_traces=50000,
        observe={"obs0": 8, "obs1": 9},
        vectorized=True,
        inference_engine=pp.InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK,
    )
    print(f"amortized posterior mean {float(post.mean):.3f}, "
          f"stddev {float(post.stddev):.3f}, "
          f"ESS {post.effective_sample_size:,.0f} "
          f"({100 * post.effective_sample_size / 50000:.1f}% of particles)")


if __name__ == "__main__":
    main()
