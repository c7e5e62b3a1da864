"""One-chip throughput of the MXU-dense GP model (manual; run on TPU).

GaussianProcessRegression's likelihood is one [N,N] covariance build +
Cholesky + triangular solve PER PARTICLE, so a vmapped particle batch is
a dense batched-linear-algebra workload — the model that exercises the
MXU rather than the VPU. Measures warm-cache compiled-tier IS traces/s
at several (num_data, particles) sizes and checks the posterior against
the grid-integrated ground truth at the small size.

Run: python tests/extra/chip_gp.py               (real chip)
     SCALING_PLATFORM=cpu python tests/extra/chip_gp.py
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
from pyprob_tpu.models import GaussianProcessRegression


def run(num_data, particles, check=False):
    x = np.linspace(0.0, 4.0, num_data)
    m = GaussianProcessRegression(x, learn=("lengthscale",), noise=0.2)
    y = m.synthesize(rng=3, lengthscale=1.0)
    obs = {"y": y}
    # warm-up dispatch compiles the program
    m.posterior_results(num_traces=particles, observe=obs, vectorized=True)
    t0 = time.time()
    post = m.posterior_results(num_traces=particles, observe=obs, vectorized=True)
    dt = time.time() - t0
    # one Cholesky (n^3/3) + one triangular solve (n^2) per particle,
    # plus the [n,n] kernel build — flops dominated by the factorization
    gflops = particles * (num_data**3 / 3.0) / dt / 1e9
    line = (
        f"N={num_data:4d} particles={particles:6d}: "
        f"{particles / dt:12,.0f} traces/s  ({dt:.3f}s, ~{gflops:,.1f} GFLOP/s chol)"
    )
    if check:
        gmean, gstd = m.true_posterior_moments(y)
        est = float(np.asarray(post.mean).reshape(-1)[0])
        line += f"  posterior {est:.3f} vs grid {gmean:.3f}+-{gstd:.3f}"
        assert abs(est - gmean) < 0.8 * gstd
    print(line)


def main():
    pp.set_verbosity(0)
    pp.seed(11)
    run(32, 8192, check=True)
    run(128, 8192)
    run(256, 8192)
    # N=256 at 32768 particles OOMs the 16G HBM (the batched triangular
    # solve materializes f32[32768,256,256] = 8G); scale N instead
    run(512, 2048)


if __name__ == "__main__":
    main()
