"""A/B of batched MVN quad/logdet paths on the real chip (manual).

Compares, at the GP family's shapes, with forced result fetch (the
tunnel's block_until_ready returns before remote completion):

  xla      — stock jnp.linalg.cholesky + solve_triangular (the expander)
  blocked  — ops/blocked_linalg recursive GEMM formulation (base/precision swept)
  pallas   — ops/mvn_logpdf particle-stacked fused kernel (round-2 study)

Run: python tests/extra/chip_blocked_chol.py
     SCALING_PLATFORM=cpu python tests/extra/chip_blocked_chol.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

if os.environ.get("SCALING_PLATFORM", "").lower() == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
from jax import lax

from pyprob_tpu.ops.blocked_linalg import (
    blocked_cholesky,
    solve_lower_vec,
)
from pyprob_tpu.ops.mvn_logpdf import (
    _quad_logdet_reference,
    mvn_quad_logdet,
    supported_backend,
)


import functools


@functools.partial(jax.jit, static_argnums=(1, 2))
def _mk_dev(key, n, b):
    k1, k2 = jax.random.split(key)
    a = jax.random.normal(k1, (b, n, n), jnp.float32) / np.sqrt(n)
    cov = jnp.matmul(
        a, jnp.swapaxes(a, -1, -2), precision=lax.Precision.HIGHEST
    ) + jnp.eye(n, dtype=jnp.float32)
    diff = jax.random.normal(k2, (b, n), jnp.float32)
    return cov, diff


def _mk(n, b, seed=0):
    # generate ON DEVICE: the host-numpy batched matmul for the SPD
    # build is ~b*n^3*2 FLOPs of CPU work (minutes at these shapes)
    cov, diff = _mk_dev(jax.random.PRNGKey(seed), n, b)
    cov.block_until_ready()
    return cov, diff


def _time(fn, cov, diff, reps=3):
    out = fn(cov, diff)  # compile + warm
    ref = tuple(np.asarray(o) for o in out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(cov, diff)
    got = tuple(np.asarray(o) for o in out)  # forced fetch
    dt = (time.time() - t0) / reps
    err = max(
        float(np.max(np.abs(g - r) / (np.abs(r) + 1.0)))
        for g, r in zip(got, ref)
    )
    return dt, got


def _time_in_program(fn, cov, diff, n, k=4, reps=5):
    """Amortized in-program seconds per factorization: jit a chain of
    ``k`` data-dependent copies of ``fn``, best-of-``reps`` with forced
    scalar fetch, differenced against the 1-chain time."""

    def chain(c, d, kk):
        tot = 0.0
        for i in range(kk):
            q, h = fn(c + (1e-6 * i) * jnp.eye(n, dtype=c.dtype), d)
            tot = tot + jnp.sum(q) + jnp.sum(h)
        return tot

    def best(kk):
        f = jax.jit(lambda c, d: chain(c, d, kk))
        np.asarray(f(cov, diff))  # compile + warm
        b = 1e9
        for _ in range(reps):
            t0 = time.time()
            np.asarray(f(cov, diff))
            b = min(b, time.time() - t0)
        return b

    return (best(k) - best(1)) / (k - 1)


def main():
    xla = jax.jit(_quad_logdet_reference)
    cases = [
        tuple(int(x) for x in c.split("x"))
        for c in os.environ.get("CASES", "256x8192,512x2048").split(",")
    ]
    import itertools

    bases = tuple(
        int(x) for x in os.environ.get("BASES", "32").split(",")
    )
    precs = {
        "HIGHEST": lax.Precision.HIGHEST,
        "HIGH": lax.Precision.HIGH,
    }
    prec_names = os.environ.get("PRECS", "HIGHEST,HIGH").split(",")
    for n, b in cases:
        cov, diff = _mk(n, b)
        flops = b * n**3 / 3.0
        ref_dt, ref_out = _time(xla, cov, diff)
        print(
            f"N={n} B={b}  xla: {ref_dt*1e3:8.1f} ms  "
            f"{flops/ref_dt/1e9:8.1f} GFLOP/s",
            flush=True,
        )
        for base in bases:
            for prec_name in prec_names:
                prec = precs[prec_name]
                fn = jax.jit(
                    lambda c, d, base=base, prec=prec: (
                        lambda l: (
                            jnp.sum(
                                jnp.square(solve_lower_vec(l, d, base, prec)),
                                -1,
                            ),
                            jnp.sum(
                                jnp.log(
                                    jnp.diagonal(l, axis1=-2, axis2=-1)
                                ),
                                -1,
                            ),
                        )
                    )(blocked_cholesky(c, base, prec))
                )
                dt, out = _time(fn, cov, diff)
                err = max(
                    float(np.max(np.abs(g - r) / (np.abs(r) + 1.0)))
                    for g, r in zip(out, ref_out)
                )
                print(
                    f"    blocked base={base} {prec_name:8s}:"
                    f" {dt*1e3:8.1f} ms  {flops/dt/1e9:8.1f} GFLOP/s"
                    f"  maxrelerr {err:.2e}",
                    flush=True,
                )
        panels = tuple(
            int(x) for x in os.environ.get("PANELS", "64,128").split(",")
        )
        from pyprob_tpu.ops.blocked_linalg import (
            chol_panels,
            solve_lower_vec_panels,
        )

        for panel in panels:
            for prec_name in prec_names:
                prec = precs[prec_name]

                def panel_fn(c, d, panel=panel, prec=prec):
                    strips, minvs = chol_panels(c, panel, prec)
                    z = solve_lower_vec_panels(strips, minvs, d, prec)
                    hld = sum(
                        jnp.sum(
                            jnp.log(
                                jnp.diagonal(
                                    s[..., : m.shape[-1], :],
                                    axis1=-2,
                                    axis2=-1,
                                )
                            ),
                            -1,
                        )
                        for s, m in zip(strips, minvs)
                    )
                    return jnp.sum(jnp.square(z), -1), hld

                dt, out = _time(jax.jit(panel_fn), cov, diff)
                err = max(
                    float(np.max(np.abs(g - r) / (np.abs(r) + 1.0)))
                    for g, r in zip(out, ref_out)
                )
                # amortized IN-PROGRAM cost: chain K data-dependent
                # factorizations inside ONE jit and difference the chain
                # lengths, removing the per-dispatch tunnel/fetch floor
                # (~16-23 ms here) that no deployed caller pays — the
                # factorization runs inside larger jitted particle
                # programs (GP family), not as its own dispatch.
                dt_prog = _time_in_program(panel_fn, cov, diff, n)
                print(
                    f"    panels P={panel:3d} {prec_name:8s}:"
                    f" {dt*1e3:8.1f} ms  {flops/dt/1e9:8.1f} GFLOP/s"
                    f"  maxrelerr {err:.2e}"
                    f"  | in-program {dt_prog*1e3:6.1f} ms"
                    f"  {flops/dt_prog/1e9:8.1f} GFLOP/s",
                    flush=True,
                )
        if supported_backend() and os.environ.get("PALLAS", "0") == "1":
            dt, out = _time(lambda c, d: mvn_quad_logdet(c, d), cov, diff)
            err = max(
                float(np.max(np.abs(g - r) / (np.abs(r) + 1.0)))
                for g, r in zip(out, ref_out)
            )
            print(
                f"    pallas stacked      : {dt*1e3:8.1f} ms"
                f"  {flops/dt/1e9:8.1f} GFLOP/s  maxrelerr {err:.2e}"
            )


if __name__ == "__main__":
    main()
