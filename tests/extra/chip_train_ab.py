"""train128/train512 throughput A/B: r3-tagged code vs HEAD (VERDICT r4 #3).

BENCH_r03 recorded train128 = 15,150 traces/s (13-16k band); BENCH_r04's
best-of-4 band was 9,879-10,841 — a ~25% drop in the band floor with no
attribution.  This script runs the controlled same-session A/B the
verdict prescribed: the SAME fused-online training measurement against
the r3 code (a git worktree at 517dd07) and HEAD, interleaved, REPS
repetitions each, in fresh subprocesses (one backend per process; the
persistent XLA cache serves both sides after their first compile).

HEAD is measured twice: ema=none (pure fused-step throughput, the
apples-to-apples vs r3) and ema=0.9 (the shipped bench condition), so
an EMA cost would be visible separately from a code regression.

Run on the chip:
    python tests/extra/chip_train_ab.py            # lstm128/b256
    ARCH=512 python tests/extra/chip_train_ab.py   # lstm512/b512
Requires: git worktree add /tmp/r3ref 517dd07
"""

import json
import os
import subprocess
import sys
import time

HEAD_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
R3_REPO = os.environ.get("R3_REPO", "/tmp/r3ref")

ARCH = int(os.environ.get("ARCH", "128"))
BATCH = {128: 256, 512: 512}[ARCH]
LR = {128: 0.01, 512: 0.005}[ARCH]
REPS = int(os.environ.get("REPS", "3"))
WARM = 12800
SEGMENTS = 2
SEG = 12800

_CHILD = r"""
import json, math, sys, time
sys.path.insert(0, %(repo)r)
import pyprob_tpu as pp
from pyprob_tpu.distributions import Normal

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
    batch_size=%(batch)d,
    learning_rate_init=%(lr)r,
    lstm_dim=%(arch)d,
)
ema = %(ema)r
if ema is not None:
    kw["ema_decay"] = ema
model.learn_inference_network(num_traces=%(warm)d, **kw)  # compile + warm
segs = []
for _ in range(%(segments)d):
    t0 = time.time()
    model.learn_inference_network(num_traces=%(seg)d, **kw)
    segs.append(%(seg)d / (time.time() - t0))
print(json.dumps({"best": max(segs), "segs": [round(s, 1) for s in segs]}))
"""


def run_one(repo, ema):
    code = _CHILD % {
        "repo": repo, "batch": BATCH, "lr": LR, "arch": ARCH,
        "warm": WARM, "segments": SEGMENTS, "seg": SEG, "ema": ema,
    }
    env = dict(os.environ)
    env.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    r = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True,
        text=True, timeout=1200,
    )
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-1500:])
        return None
    return json.loads(r.stdout.strip().splitlines()[-1])


def main():
    conds = [
        ("r3", R3_REPO, None),
        ("head", HEAD_REPO, None),
        ("head+ema", HEAD_REPO, 0.9),
    ]
    results = {name: [] for name, _, _ in conds}
    print(f"# arch=lstm{ARCH}/b{BATCH} lr={LR} reps={REPS}", flush=True)
    for rep in range(REPS):
        for name, repo, ema in conds:
            out = run_one(repo, ema)
            print(json.dumps({"rep": rep, "cond": name, **(out or {})}),
                  flush=True)
            if out:
                results[name].append(out["best"])
    summary = {
        name: {"best": max(v) if v else None,
               "all": [round(x, 1) for x in v]}
        for name, v in results.items()
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
