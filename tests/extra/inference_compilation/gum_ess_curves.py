"""Manual benchmark: IC-vs-IS ESS curves on GUM
(counterpart of reference tests/extra/inference_compilation/gum_marsaglia.py:55-120).

Trains the LSTM inference network at increasing trace budgets and plots
ESS fraction of guided IS against plain IS, writing gum_ess_curves.csv/.pdf.

Run: python tests/extra/inference_compilation/gum_ess_curves.py
"""

import csv
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

import pyprob_tpu as pp
from pyprob_tpu.models import GaussianUnknownMean

OBS = {"obs0": 8, "obs1": 9}
NUM_POSTERIOR = 20000
TRAIN_BUDGETS = [1024, 4096, 16384, 65536]


def main():
    pp.set_verbosity(1)
    pp.seed(7)

    rows = []
    m = GaussianUnknownMean()
    post = m.posterior_results(NUM_POSTERIOR, observe=OBS, vectorized=True)
    is_ess = post.effective_sample_size / NUM_POSTERIOR
    rows.append(("IS", 0, is_ess, float(post.mean)))
    print(f"IS baseline: ESS fraction {is_ess:.4f}")

    model = GaussianUnknownMean()
    trained = 0
    for budget in TRAIN_BUDGETS:
        t0 = time.time()
        model.learn_inference_network(
            num_traces=budget - trained,
            observe_embeddings={"obs0": {"dim": 16}, "obs1": {"dim": 16}},
            inference_network=pp.InferenceNetwork.LSTM,
            batch_size=256,
            learning_rate_init=0.01,
            lstm_dim=128,
        )
        trained = budget
        post = model.posterior_results(
            NUM_POSTERIOR,
            observe=OBS,
            vectorized=True,
            inference_engine=pp.InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK,
        )
        frac = post.effective_sample_size / NUM_POSTERIOR
        rows.append(("IC-LSTM", budget, frac, float(post.mean)))
        print(
            f"IC after {budget:>6} training traces: ESS fraction {frac:.4f} "
            f"(train step took {time.time() - t0:.1f}s)"
        )

    out_dir = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(out_dir, "gum_ess_curves.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["engine", "train_traces", "ess_fraction", "posterior_mean"])
        w.writerows(rows)

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(8, 5))
        ic = [(r[1], r[2]) for r in rows if r[0] == "IC-LSTM"]
        ax.semilogx([x for x, _ in ic], [y for _, y in ic], "o-", label="IC-LSTM")
        ax.axhline(is_ess, color="gray", linestyle="--", label="IS baseline")
        ax.set_xlabel("Training traces")
        ax.set_ylabel("ESS fraction")
        ax.legend()
        fig.savefig(os.path.join(out_dir, "gum_ess_curves.pdf"), bbox_inches="tight")
    except Exception as e:
        print(f"(plot skipped: {e})")


if __name__ == "__main__":
    main()
