"""Cross-language inference at batch economics: a pool of C++ PPX
simulators driven in lockstep, with the IC proposal network answering
every simulator's site in ONE batched device dispatch.

The classic PPX deployment (reference: pyprob/remote.py) services one
simulator with one synchronous round-trip per random choice and one
proposal-network evaluation per site per trace.  LockstepRemoteModel
drives K simulators from a single event loop and buckets same-site
requests, so the per-site device cost is one dispatch for the whole pool.

Run:  make -C cpp -j4  &&  python examples/lockstep_simulators.py
"""

import math
import os
import subprocess
import sys
import time
import uuid

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pyprob_tpu as pp

NUM_SIMULATORS = 8
GUM_BINARY = os.path.join(
    os.path.dirname(__file__), "..", "cpp", "build", "test_gum"
)


def main():
    pp.set_verbosity(0)
    pp.seed(1)
    if not os.path.exists(GUM_BINARY):
        print("C++ simulators not built; run: make -C cpp -j4")
        return

    procs, addresses = [], []
    for _ in range(NUM_SIMULATORS):
        address = f"ipc://@pyprob_tpu_example_{uuid.uuid4()}"
        procs.append(
            subprocess.Popen([GUM_BINARY, address], stdout=subprocess.DEVNULL)
        )
        addresses.append(address)
    time.sleep(0.5)

    model = pp.LockstepRemoteModel(addresses, timeout_sec=120)
    try:
        observe = {"obs0": 8.0, "obs1": 9.0}

        t0 = time.time()
        post_is = model.posterior_results(num_traces=4000, observe=observe)
        t_is = time.time() - t0
        print(
            f"IS  ({NUM_SIMULATORS} C++ sims, lockstep): mean "
            f"{float(post_is.mean):.3f} (true 7.250), "
            f"ESS {post_is.effective_sample_size:,.0f}, "
            f"{4000 / t_is:,.0f} traces/s"
        )

        # inference compilation: training traces ALSO stream through the
        # lockstep pool; guided IS then answers each site for all K
        # simulators with one jitted proposal-network step
        model.learn_inference_network(
            num_traces=8192,
            observe_embeddings={"obs0": {"dim": 16}, "obs1": {"dim": 16}},
            inference_network=pp.InferenceNetwork.LSTM,
            batch_size=256,
            learning_rate_init=0.01,
            lstm_dim=64,
        )
        t0 = time.time()
        post_ic = model.posterior_results(
            num_traces=4000,
            observe=observe,
            inference_engine=pp.InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK,
        )
        t_ic = time.time() - t0
        print(
            f"IC  ({NUM_SIMULATORS} C++ sims, lockstep): mean "
            f"{float(post_ic.mean):.3f} (true 7.250), "
            f"ESS {post_ic.effective_sample_size:,.0f}, "
            f"{4000 / t_ic:,.0f} traces/s, "
            f"std {float(post_ic.stddev):.3f} (true {math.sqrt(1 / 1.2):.3f})"
        )
    finally:
        model.close()
        for p in procs:
            p.terminate()
        for p in procs:
            p.wait(timeout=10)


if __name__ == "__main__":
    main()
