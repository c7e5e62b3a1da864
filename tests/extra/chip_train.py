"""On-chip IC training throughput study (VERDICT r1 item 4).

Measures warm fused-online-step training traces/s on the real TPU for
the bench GUM+LSTM configuration, A/B-ing PYPROB_TPU_FUSED_STEPS — the
scan depth K that batches K optimizer steps into one device dispatch.
Over the remote (tunneled) device, dispatch latency is 0.4-3.5 s, so K
trades one K-times-larger compile for (K-1)/K of the round-trips.

Run on the chip:  python tests/extra/chip_train.py
Reference anchor: 700 traces/s CPU training (BASELINE.md; reference
training loop is reference/pyprob/nn/inference_network.py:381-599).
"""

import json
import math
import os
import sys
import time

sys.path.insert(
    0,
    os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ),
)

WARMUP_TRACES = 2048
MEASURE_TRACES = 51200
BATCH = 256


def build():
    import pyprob_tpu as pp
    from pyprob_tpu.distributions import Normal

    class GUM(pp.Model):
        def forward(self):
            mu = pp.sample(Normal(1.0, math.sqrt(5.0)))
            likelihood = Normal(mu, math.sqrt(2.0))
            pp.observe(likelihood, name="obs0")
            pp.observe(likelihood, name="obs1")
            return mu

    return pp, GUM()


def run(k):
    os.environ["PYPROB_TPU_FUSED_STEPS"] = str(k)
    pp, model = build()
    pp.set_verbosity(0)
    pp.seed(123)
    kw = dict(
        observe_embeddings={"obs0": {"dim": 16}, "obs1": {"dim": 16}},
        inference_network=pp.InferenceNetwork.LSTM,
        batch_size=BATCH,
        learning_rate_init=0.01,
        lstm_dim=128,
    )
    t0 = time.time()
    model.learn_inference_network(num_traces=WARMUP_TRACES, **kw)
    warm = time.time() - t0
    t0 = time.time()
    model.learn_inference_network(num_traces=MEASURE_TRACES, **kw)
    dt = time.time() - t0
    return warm, MEASURE_TRACES / dt


def main():
    results = {}
    for k in (1, 4, 16):
        # fresh process-level state per K would be ideal; the fused
        # program cache keys on the step closure, so a fresh model per K
        # (inside run()) is enough
        warm, tps = run(k)
        results[k] = tps
        print(
            f"K={k:3d}: warmup+compile {warm:6.1f}s, "
            f"warm training {tps:,.0f} traces/s",
            flush=True,
        )
    best = max(results, key=results.get)
    print(
        json.dumps(
            {
                "metric": "GUM IC warm training traces/s by FUSED_STEPS",
                "results": {str(k): round(v, 1) for k, v in results.items()},
                "best_k": best,
                "vs_reference_700": round(results[best] / 700.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
