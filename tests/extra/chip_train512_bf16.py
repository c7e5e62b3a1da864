"""bf16 compute-policy A/B on the 512d TRAINING step (VERDICT r3 #9).

The round-1 bf16 A/B covered guided-IS *serving* at lstm128 (bf16 ~11%
slower — VPU/memory-bound at that size, BASELINE.md).  Training at
lstm512/batch512 is a different regime: the [512, 2048] gate GEMMs are
MXU-shaped, so the cast cost could pay for itself.  This script measures
warm fused-online-step training traces/s at lstm512/batch512 with and
without `util.set_compute_dtype('bfloat16')`, each in a FRESH subprocess
(the compute dtype is read at trace time and baked into compiled
programs; a subprocess guarantees no stale cache hits), and records the
post-training guided-IS ESS so a throughput win can't hide a quality
regression.

Run on the chip:  python tests/extra/chip_train512_bf16.py
Reference anchor for the metric: train512 1,466 traces/s
(tests/extra/reference_baseline.py, BASELINE.md r3).
"""

import json
import math
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WARMUP_TRACES = 12800
SEGMENT_TRACES = 12800
SEGMENTS = 3
ESS_TRACES = 200000

_CHILD = r"""
import json, math, os, sys, time
sys.path.insert(0, %(repo)r)
import pyprob_tpu as pp
from pyprob_tpu import util
from pyprob_tpu.distributions import Normal

dtype = %(dtype)r
if dtype:
    util.set_compute_dtype(dtype)
pp.set_verbosity(0)
pp.seed(123)


class GUM(pp.Model):
    def forward(self):
        mu = pp.sample(Normal(1.0, math.sqrt(5.0)))
        likelihood = Normal(mu, math.sqrt(2.0))
        pp.observe(likelihood, name="obs0")
        pp.observe(likelihood, name="obs1")
        return mu


model = GUM()
kw = dict(
    observe_embeddings={"obs0": {"dim": 16}, "obs1": {"dim": 16}},
    inference_network=pp.InferenceNetwork.LSTM,
    batch_size=512,
    learning_rate_init=0.005,
    lstm_dim=512,
)
t0 = time.time()
model.learn_inference_network(num_traces=%(warmup)d, **kw)
cold_s = time.time() - t0
segs = []
for _ in range(%(segments)d):
    t0 = time.time()
    model.learn_inference_network(num_traces=%(segment)d, **kw)
    segs.append(%(segment)d / (time.time() - t0))
post = model.posterior_results(
    num_traces=%(ess)d,
    observe={"obs0": 8.0, "obs1": 9.0},
    vectorized=True,
    inference_engine=pp.InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK,
)
print("RESULT " + json.dumps({
    "dtype": dtype or "float32",
    "cold_s": round(cold_s, 1),
    "train_tps_segments": [round(s, 1) for s in segs],
    "train_tps_best": round(max(segs), 1),
    "ess_fraction": round(post.effective_sample_size / %(ess)d, 4),
    "mean": round(float(post.mean), 4),
}))
"""


def run(dtype):
    code = _CHILD % dict(
        repo=REPO,
        dtype=dtype,
        warmup=WARMUP_TRACES,
        segment=SEGMENT_TRACES,
        segments=SEGMENTS,
        ess=ESS_TRACES,
    )
    env = dict(os.environ, TF_CPP_MIN_LOG_LEVEL="3")
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    print(out.stdout[-2000:], file=sys.stderr)
    print(out.stderr[-4000:], file=sys.stderr)
    raise RuntimeError(f"child failed for dtype={dtype}")


def main():
    results = [run(None), run("bfloat16")]
    for r in results:
        print(json.dumps(r), flush=True)
    f32, bf16 = results
    print(
        json.dumps(
            {
                "metric": "train512 warm traces/s, bf16 vs f32 matmul policy",
                "f32": f32["train_tps_best"],
                "bf16": bf16["train_tps_best"],
                "bf16_speedup": round(
                    bf16["train_tps_best"] / f32["train_tps_best"], 3
                ),
                "ess_f32": f32["ess_fraction"],
                "ess_bf16": bf16["ess_fraction"],
            }
        )
    )


if __name__ == "__main__":
    main()
