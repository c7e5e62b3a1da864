"""Measure the reference pyprob (torch, CPU) at an explicit architecture.

Arch-matched baselines (VERDICT r2 weak #1): the guided-IS/training
baseline must be measured at the SAME proposal-network architecture the
TPU bench runs — both at LSTM-128/batch-256 (our bench default) and at
the reference's own LSTM-512/batch-512 default
(reference: pyprob/nn/inference_network_lstm.py:11-33,
reference: pyprob/model.py:186).  Embedding spec is identical on both
sides ({'dim': 16} feedforward observe embeddings, default depth).

Defaults reproduce the recorded BASELINE.md r3 condition verbatim
(25.6k training traces — the numbers in the "Arch-matched reference
baselines" table).

Usage:
    python tests/extra/reference_baseline.py [lstm_dim] [batch] [train_traces]
    python tests/extra/reference_baseline.py marsaglia [lstm_dim] [batch] [train_traces]

The ``marsaglia`` mode measures the reference on the VARIABLE-STRUCTURE
GUM-Marsaglia model (rejection-loop control flow, reference:
tests/test_inference.py:249-344) — the arch-matched baseline for our
gather-table training loss and lockstep guided inference
(tests/extra/lockstep_bench.py uses the same model/arch/embeddings).

Prints one JSON line:
    {"arch": "lstm<D>/batch<B>", "train_traces_per_s": ...,
     "guided_is_traces_per_s": ..., "ess_fraction": ...,
     "posterior_mean": ...}
"""

import json
import math
import sys
import time
import types

# the image lacks sqlitedict/pyzmq; the measured paths never touch them
sys.modules.setdefault("sqlitedict", types.ModuleType("sqlitedict"))
sys.modules["sqlitedict"].SqliteDict = dict
_zmq = types.ModuleType("zmq")
_zmq.Context = object
_zmq.REQ = 3
sys.modules.setdefault("zmq", _zmq)
sys.path.insert(0, "/root/reference")

import torch

torch.set_num_threads(8)

import pyprob
from pyprob import InferenceEngine, InferenceNetwork
from pyprob.distributions import Normal


class GUM(pyprob.Model):
    def forward(self):
        mu = pyprob.sample(Normal(1.0, math.sqrt(5.0)))
        likelihood = Normal(mu, math.sqrt(2.0))
        pyprob.observe(likelihood, name="obs0")
        pyprob.observe(likelihood, name="obs1")
        return mu


class GUMMarsaglia(pyprob.Model):
    """Same posterior, rejection-sampling control flow — variable-length
    traces (reference model: tests/test_inference.py:252-269)."""

    def marsaglia(self, mean, stddev):
        from pyprob.distributions import Uniform

        uniform = Uniform(-1, 1)
        s = 1
        while float(s) >= 1:
            x = pyprob.sample(uniform)
            y = pyprob.sample(uniform)
            s = x * x + y * y
        return mean + stddev * (x * torch.sqrt(-2 * torch.log(s) / s))

    def forward(self):
        mu = self.marsaglia(1.0, math.sqrt(5.0))
        likelihood = Normal(mu, math.sqrt(2.0))
        pyprob.observe(likelihood, name="obs0")
        pyprob.observe(likelihood, name="obs1")
        return mu


def main(lstm_dim=512, batch_size=512, train_traces=25600,
         posterior_traces=2000, marsaglia=False):
    pyprob.set_verbosity(0)
    pyprob.seed(123)
    model = GUMMarsaglia() if marsaglia else GUM()
    observe = {"obs0": 8, "obs1": 9}

    # marsaglia mode mirrors tests/extra/lockstep_bench.py exactly
    # (dim-32 embeddings, lr 0.002) so the comparison is arch-matched
    emb_dim = 32 if marsaglia else 16
    lr = 0.002 if marsaglia else 0.01
    t0 = time.time()
    model.learn_inference_network(
        num_traces=train_traces,
        observe_embeddings={"obs0": {"dim": emb_dim}, "obs1": {"dim": emb_dim}},
        inference_network=InferenceNetwork.LSTM,
        batch_size=batch_size,
        learning_rate_init=lr,
        lstm_dim=lstm_dim,
    )
    train_s = train_traces / (time.time() - t0)

    t0 = time.time()
    post = model.posterior_results(
        num_traces=posterior_traces,
        observe=observe,
        inference_engine=(
            InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK
        ),
    )
    is_s = posterior_traces / (time.time() - t0)
    ess = float(post.effective_sample_size) / posterior_traces
    print(
        json.dumps(
            {
                "model": "gum_marsaglia" if marsaglia else "gum",
                "arch": f"lstm{lstm_dim}/batch{batch_size}",
                "train_traces": train_traces,
                "train_traces_per_s": round(train_s, 1),
                "guided_is_traces_per_s": round(is_s, 1),
                "ess_fraction": round(ess, 3),
                "posterior_mean": round(float(post.mean), 3),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    argv = sys.argv[1:]
    marsaglia = bool(argv) and argv[0] == "marsaglia"
    if marsaglia:
        argv = argv[1:]
    main(*[int(a) for a in argv], marsaglia=marsaglia)
