"""Guided scan-SMC on the real chip (manual; VERDICT r2 directive #5).

Trains a TIED-instance IC network on LinearGaussianStateSpaceMarkov and
runs the O(T) guided particle filter — whole-sequence observe embedding
computed once, the proposal LSTM's recurrent state riding the lax.scan
carry (gathered with the particles on resampling) — at chip scale,
next to the unguided filter.  Warm timings with forced result fetch
(the tunnel's block_until_ready returns before remote completion);
correctness vs the exact Kalman filter/evidence at every shape.

Run: python tests/extra/chip_guided_scan_smc.py
     CASES=64x65536 python tests/extra/chip_guided_scan_smc.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

if os.environ.get("SCALING_PLATFORM", "").lower() == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import pyprob_tpu as pp
from pyprob_tpu.models import LinearGaussianStateSpaceMarkov


def run_case(T, num_particles, train_traces=4096, regime="wellspec"):
    """``regime``:

    - ``wellspec`` — the r3 condition (default model; prior proposals
      are near-optimal per step, so guidance can only pay its cost);
    - ``informative`` — diffuse transitions (stddev 2.0) against precise
      observations (stddev 0.1): the bootstrap proposal draws from a
      20x-wider distribution than the per-step posterior, so its weights
      collapse and resampling degenerates — the regime amortized
      proposals exist for.  Still linear-Gaussian, so the Kalman
      filter/evidence stay exact;
    - ``shifted`` — the informative model with the OBSERVED ys shifted
      by a +4.0 drift ramp the prior has never seen (data in the prior's
      tail = model misspecification; ground truth is still exact because
      the Kalman filter conditions the ASSUMED model on the same
      shifted data)."""
    pp.seed(11)
    kw_model = dict(num_steps=T)
    if regime in ("informative", "shifted"):
        kw_model.update(transition_stddev=2.0, observation_stddev=0.1)
    m = LinearGaussianStateSpaceMarkov(**kw_model)
    xs, ys = m.synthesize(rng=2)
    ys = np.asarray(ys, dtype=np.float64)
    if regime == "shifted":
        ys = ys + np.linspace(0.0, 4.0, len(ys))
    obs = m.observes(ys)
    fm, fv = m.kalman_filter(ys)
    lz = m.kalman_log_evidence(ys)

    t0 = time.time()
    m.learn_inference_network(
        num_traces=train_traces,
        observe_embeddings={"y": {"dim": 32}},
        inference_network=pp.InferenceNetwork.LSTM,
        batch_size=256,
        learning_rate_init=0.003,
        lstm_dim=64,
    )
    train_s = time.time() - t0

    results = {}
    for label, engine in (
        ("unguided", pp.InferenceEngine.SEQUENTIAL_MONTE_CARLO),
        (
            "guided",
            pp.InferenceEngine.SEQUENTIAL_MONTE_CARLO_WITH_INFERENCE_NETWORK,
        ),
    ):
        kw = dict(
            observe=obs,
            inference_engine=engine,
            resample_threshold=0.7,
        )
        post = m.posterior_results(num_particles, **kw)  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            post = m.posterior_results(num_particles, **kw)
            # posterior_results already fetches results to host
            best = min(best, time.time() - t0)
        steps_per_s = T * num_particles / best
        mean_err = abs(float(post.mean) - fm[-1])
        lz_err = abs(post.log_evidence - lz)
        ess = post.effective_sample_size
        ok = mean_err < 4.0 * np.sqrt(fv[-1]) and lz_err < 0.05 * abs(lz) + 2.0
        results[label] = (best, steps_per_s, ess, mean_err, lz_err, ok)
        print(
            f"[{regime}] T={T} x {num_particles:,} {label:9s}: "
            f"warm {best:6.2f} s = "
            f"{steps_per_s/1e6:5.2f} M particle-steps/s, "
            f"ESS {ess:,.0f}, |mean err| {mean_err:.3f}, "
            f"|logZ err| {lz_err:.2f}, correct={ok} "
            f"(train {train_s:.0f}s)",
            flush=True,
        )
    return results


def main():
    cases = [
        tuple(int(x) for x in c.split("x"))
        for c in os.environ.get("CASES", "64x65536,256x65536").split(",")
    ]
    regimes = os.environ.get("REGIMES", "wellspec").split(",")
    train = int(os.environ.get("TRAIN", "4096"))
    for regime in regimes:
        for T, n in cases:
            run_case(T, n, train_traces=train, regime=regime)


if __name__ == "__main__":
    main()
