"""Lockstep GIL-domain scaling proof (VERDICT r4 #6).

The r4 component profile pinned the lockstep interpreter's residual
cost to ~50 us/site of GIL-serialized worker python x 64 workers: on
this 2-core host no round-structure change can beat it, and the
designed lever (PYPROB_TPU_LOCKSTEP_GROUPS > 1) was measured
neutral-to-negative HERE because a second group's python competes for
the same two cores.  This script measures the honest multi-core
simulation the verdict asked for: TWO independent lockstep pools in SEPARATE
PROCESSES (separate GILs — exactly what G=2 groups become on a host
with spare cores), each serving half the trace budget from the same
trained network checkpoint, against the single-process run of the same
total budget.

  aggregate_2proc > single  ==> the group knob's many-core claim holds
                                (per-process pools scale with GIL
                                domains; groups are the in-process
                                version of the same split)

Run: python tests/extra/lockstep_two_process.py
"""

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRAIN_TRACES = 12800
MEASURE = 12000

_CHILD = r"""
import json, sys, time
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, %(repo)r)
import pyprob_tpu as pp
from pyprob_tpu.models import GaussianUnknownMeanMarsaglia

pp.set_verbosity(0)
pp.seed(%(seed)d)
OBS = {"obs0": 8.0, "obs1": 9.0}
ENGINE = pp.InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK
m = GaussianUnknownMeanMarsaglia()
m.load_inference_network(%(net)r)
m.posterior_results(1000, observe=OBS, vectorized=False,
                    inference_engine=ENGINE)  # warm jitted programs
sys.stdout.write("READY\n"); sys.stdout.flush()
sys.stdin.readline()  # start barrier
t0 = time.time()
post = m.posterior_results(%(n)d, observe=OBS, vectorized=False,
                           inference_engine=ENGINE)
print(json.dumps({"tps": %(n)d / (time.time() - t0),
                  "ess": post.effective_sample_size / %(n)d,
                  "mean": float(post.mean)}))
"""


def _spawn(net_path, n, seed):
    code = _CHILD % {"repo": REPO, "net": net_path, "n": n, "seed": seed}
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    return subprocess.Popen(
        [sys.executable, "-c", code], env=env, stdin=subprocess.PIPE,
        stdout=subprocess.PIPE, text=True,
    )


def _run(children):
    for c in children:  # wait for warmup
        line = c.stdout.readline()
        assert "READY" in line, line
    t0 = time.time()
    for c in children:
        c.stdin.write("go\n")
        c.stdin.flush()
    outs = []
    for c in children:
        outs.append(json.loads(c.stdout.readline()))
        c.wait()
    wall = time.time() - t0
    return outs, wall


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, REPO)
    import pyprob_tpu as pp
    from pyprob_tpu.models import GaussianUnknownMeanMarsaglia

    pp.set_verbosity(0)
    pp.seed(123)
    m = GaussianUnknownMeanMarsaglia()
    m.learn_inference_network(
        num_traces=TRAIN_TRACES,
        observe_embeddings={"obs0": {"dim": 32}, "obs1": {"dim": 32}},
        inference_network=pp.InferenceNetwork.LSTM,
        batch_size=256,
        learning_rate_init=0.002,
        lstm_dim=128,
        ema_decay=0.9,
    )
    net_path = os.path.join(tempfile.mkdtemp(), "net.network")
    m.save_inference_network(net_path)

    results = {}
    # single process, full budget
    outs, wall = _run([_spawn(net_path, MEASURE, 7)])
    results["single"] = {
        "tps": round(outs[0]["tps"], 1),
        "ess": round(outs[0]["ess"], 4),
    }
    # two processes, half budget each, started simultaneously
    outs, wall = _run(
        [_spawn(net_path, MEASURE // 2, 8), _spawn(net_path, MEASURE // 2, 9)]
    )
    results["two_proc"] = {
        "aggregate_tps": round(MEASURE / wall, 1),
        "per_proc_tps": [round(o["tps"], 1) for o in outs],
        "ess": [round(o["ess"], 4) for o in outs],
    }
    results["speedup"] = round(
        results["two_proc"]["aggregate_tps"] / results["single"]["tps"], 3
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
