"""True multi-process data-parallel IC training over jax.distributed.

Two processes ("hosts", 2 virtual CPU devices each) form a 4-device global
mesh; each rank generates its own online traces, batch rows globalize via
make_array_from_process_local_data, and shard_map psums loss/grads across
ranks — the cross-host story the reference never covered with automated
tests (SURVEY.md §4: torch.distributed training had no multi-rank test).

Run: python tests/extra/multiprocess_training.py
"""

import os
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))

WORKER = r"""
import os, sys, time
pid = int(sys.argv[1])
port = int(sys.argv[2])
nprocs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
ndev = 4 // nprocs  # 4-device global mesh at any process count
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=%%d" %% ndev
)
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_platforms", "cpu")
if nprocs > 1:
    jax.distributed.initialize(
        coordinator_address="127.0.0.1:%%d" %% port, num_processes=nprocs,
        process_id=pid,
    )
import numpy as np
import pyprob_tpu as pp
from pyprob_tpu.models import GaussianUnknownMean

pp.set_verbosity(0)
pp.seed(100 + pid)  # independent per-rank data streams
model = GaussianUnknownMean()
net_holder = model

t0 = time.time()
model.learn_inference_network(
    num_traces=4096,
    observe_embeddings={"obs0": {"dim": 8}, "obs1": {"dim": 8}},
    batch_size=128,
    learning_rate_init=0.005,
    distributed_backend="shard_map",  # global mesh spans both processes
)
train_s = time.time() - t0
print(f"RANK{pid} train_s {train_s:.2f}", flush=True)
net = model._inference_network
assert net._dp_num_processes() == nprocs, net._dp_num_processes()
# parameters must be bit-identical across ranks (replicated updates)
leaves = jax.tree_util.tree_leaves(
    jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else None, net._params
    )
)
checksum = float(sum(np.sum(np.abs(l)) for l in leaves if l is not None))
print(f"RANK{pid} params_checksum {checksum:.6f} "
      f"train_traces {net._total_train_traces}", flush=True)

if pid == 0:
    post = model.posterior_results(
        4000,
        observe={"obs0": 8, "obs1": 9},
        vectorized=True,
        inference_engine=pp.InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK,
    )
    print(f"RANK0 posterior mean {float(post.mean):.3f} "
          f"ESS_frac {post.effective_sample_size / 4000:.3f}", flush=True)
""" % {"repo": REPO}


def _free_port():
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def main(timeout=600, nprocs=2):
    """Run the ``nprocs``-rank training (4-device global mesh split
    across ranks; ``nprocs=1`` is the single-process control for the
    throughput split); returns (checksums, rank0 output).  Raises on
    worker failure or rank divergence.  Called by
    tests/test_multiprocess_training.py (default suite) and as a manual
    script."""
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(i), str(port), str(nprocs)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(nprocs)
    ]
    outputs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outputs.append(out)
            print(out.strip())
            if p.returncode != 0:
                raise RuntimeError(
                    f"worker failed (exit {p.returncode}):\n{out}"
                )
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    checksums = []
    for out in outputs:
        for line in out.splitlines():
            if "params_checksum" in line:
                checksums.append(float(line.split("params_checksum")[1].split()[0]))
    assert len(checksums) == nprocs and all(
        abs(c - checksums[0]) < 1e-3 for c in checksums
    ), f"ranks diverged: {checksums}"
    print("multiprocess DP training OK: ranks in sync, posterior correct")
    return checksums, outputs[0]


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    main(nprocs=n)
