"""GUM via the Marsaglia rejection sampler: the canonical universal-PPL
stress model with unbounded stochastic control flow
(counterpart of reference examples/gaussian_unknown_mean_marsaglia.ipynb).

The rejection loop uses host Python control flow, so the program is not
jax-traceable — the framework automatically falls back to the interpreter
tier, demonstrating the universality contract.

Run: python examples/gaussian_unknown_mean_marsaglia.py
"""

import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pyprob_tpu as pp
from pyprob_tpu.distributions import Normal, Uniform


class GaussianUnknownMeanMarsaglia(pp.Model):
    def __init__(self):
        super().__init__(name="GUM (Marsaglia)")

    def marsaglia(self, mean, stddev):
        uniform = Uniform(-1.0, 1.0)
        while True:
            x = pp.sample(uniform)
            y = pp.sample(uniform)
            s = float(x) ** 2 + float(y) ** 2
            if s < 1:
                return mean + stddev * (float(x) * math.sqrt(-2 * math.log(s) / s))

    def forward(self):
        mu = self.marsaglia(1.0, math.sqrt(5.0))
        likelihood = Normal(mu, math.sqrt(2.0))
        pp.observe(likelihood, name="obs0")
        pp.observe(likelihood, name="obs1")
        return mu


def main():
    pp.seed(1)
    model = GaussianUnknownMeanMarsaglia()

    print("== prior trace structure ==")
    lengths = [model.sample().length_controlled for _ in range(2000)]
    print(f"controlled trace length: mean {sum(lengths)/len(lengths):.3f} "
          f"(reference 100k-run value: 2.563)")

    print("== posterior, importance sampling ==")
    post = model.posterior_results(num_traces=5000, observe={"obs0": 8, "obs1": 9})
    print(f"posterior mean {float(post.mean):.3f} (true 7.25), "
          f"ESS {post.effective_sample_size:.1f}")

    print("== posterior, random-walk Metropolis-Hastings ==")
    post = model.posterior_results(
        num_traces=5000,
        observe={"obs0": 8, "obs1": 9},
        inference_engine=pp.InferenceEngine.RANDOM_WALK_METROPOLIS_HASTINGS,
    )[1000:]
    print(f"posterior mean {float(post.mean):.3f}, "
          f"stddev {float(post.stddev):.3f} (true {math.sqrt(1/1.2):.3f})")

    print("== trace-structure diagnostics ==")
    from pyprob_tpu import diagnostics

    prior = model.prior(num_traces=2000)
    g = diagnostics.graph(prior)
    print(g)
    print("execution sample:", " -> ".join(n.address_id for n in g.sample_execution()))


if __name__ == "__main__":
    main()
