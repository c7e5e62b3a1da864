"""Manual diagnostics: large RMH run on GUM-Marsaglia with autocorrelation,
Gelman-Rubin, and trace-graph outputs
(counterpart of reference tests/extra/diagnostics/gum_marsaglia.py:53-143).

Run: python tests/extra/diagnostics/gum_marsaglia_mcmc.py [num_traces]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

import numpy as np

import pyprob_tpu as pp
from pyprob_tpu import diagnostics
from pyprob_tpu.models import GaussianUnknownMeanMarsaglia

OBS = {"obs0": 8, "obs1": 9}


def main():
    num_traces = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "output")
    os.makedirs(out_dir, exist_ok=True)
    pp.set_verbosity(2)
    pp.seed(1)
    model = GaussianUnknownMeanMarsaglia()

    chains = []
    for c in range(3):
        print(f"chain {c + 1}/3 ...")
        chains.append(
            model.posterior(
                num_traces=num_traces,
                inference_engine=pp.InferenceEngine.RANDOM_WALK_METROPOLIS_HASTINGS,
                observe=OBS,
            )
        )

    print("autocorrelation ...")
    lags, acf = diagnostics.autocorrelation(
        chains[0],
        n_most_frequent=5,
        plot=True,
        file_name=os.path.join(out_dir, "autocorrelation.pdf"),
    )
    print("gelman-rubin ...")
    iters, rhat = diagnostics.gelman_rubin(
        chains,
        n_most_frequent=5,
        plot=True,
        file_name=os.path.join(out_dir, "gelman_rubin.pdf"),
    )
    for label, r in rhat.items():
        print(f"  {label[:50]}: final R-hat {r[-1]:.4f}")

    print("jensen-shannon between chain halves ...")
    half = num_traces // 2
    js = diagnostics.jensen_shannon(chains[0][:half], chains[0][half:])
    for label, v in js.items():
        print(f"  {label[:50]}: JS {v:.5f}")

    print("trace graph ...")
    prior = model.prior(num_traces=5000)
    g = diagnostics.graph(prior, file_name=os.path.join(out_dir, "graph.dot"))
    print(g)

    print("trace plot + log-prob evolution ...")
    diagnostics.trace_plot(
        chains[0],
        plot=True,
        file_name=os.path.join(out_dir, "trace_plot.pdf"),
    )
    diagnostics.log_prob(
        chains[0],
        plot=True,
        file_name=os.path.join(out_dir, "log_prob.pdf"),
    )
    means = [float(c.map(lambda t: float(t.result)).mean) for c in chains]
    print(f"chain means: {np.round(means, 3)} (true 7.25)")
    print(f"outputs in {out_dir}")


if __name__ == "__main__":
    main()
