"""Per-particle one-row matmul lowering A/B (VERDICT r4 #5).

The r3 bisect found that vmapped degenerate [1,in]@[in,out] dots (the
per-particle LSTM/embedding step inside guided scan-SMC) SIGILL the
remote TPU compiler; the shipped workaround (`nn/layers.py:_row_dot`)
lowers them as broadcast-multiply + reduce — a VPU op doing N*in*out
elementwise work.  This probe tests the OTHER safe formulation:
squeeze the row dim first and take a vector-matrix product, which
under vmap becomes a clean [N,in]@[in,out] matmul with NO batch
dimension — MXU-eligible and (hypothesis) free of the degenerate
batched-dot pattern that crashes libtpu.

Measures a vmapped multi-cell LSTM chain (the shape class that
triggered the crash) under three lowerings:
  bcast   — current broadcast-multiply+reduce
  vecmat  — squeezed vector-matrix (the candidate)
  rawdot  — the original crasher (opt-in: RAWDOT=1; may kill the
            remote compiler session)

Run on the chip:  python tests/extra/chip_row_dot.py
"""

import os
import sys
import time

sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)

import jax
import jax.numpy as jnp
import numpy as np

N = int(os.environ.get("N", "65536"))
IN = int(os.environ.get("IN_DIM", "128"))
H = int(os.environ.get("H", "64"))
SITES = int(os.environ.get("SITES", "8"))
REPS = int(os.environ.get("REPS", "3"))


def make_chain(row_dot):
    """A vmapped per-particle chain of SITES lstm cells, mimicking the
    guided scan-SMC per-stage proposal step."""

    def cell(w_ih, w_hh, x, h, c):
        gates = row_dot(x, w_ih) + row_dot(h, w_hh)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return h, c

    def single(params, x0):
        # x0: [1, IN]; per-site input re-projected from h (keeps the
        # one-row shape class alive through the chain)
        w_in, w_ih, w_hh = params
        h = jnp.zeros((1, H), jnp.float32)
        c = jnp.zeros((1, H), jnp.float32)
        x = x0
        for _ in range(SITES):
            xi = row_dot(x, w_in)  # [1, IN] @ [IN, IN]
            h, c = cell(w_ih, w_hh, xi[:, :IN], h, c)
            x = jnp.concatenate([h, h, x], axis=-1)[:, :IN]
        return jnp.sum(h)

    def program(params, xs):
        return jnp.sum(jax.vmap(lambda x: single(params, x))(xs))

    return jax.jit(program)


def bcast(x, w):
    if x.ndim >= 2 and x.shape[-2] == 1:
        return jnp.sum(x[..., 0, :, None] * w, axis=-2)[..., None, :]
    return jnp.dot(x, w)


def vecmat(x, w):
    if x.ndim >= 2 and x.shape[-2] == 1:
        return jnp.matmul(x[..., 0, :], w)[..., None, :]
    return jnp.dot(x, w)


def rawdot(x, w):
    return jnp.dot(x, w)


def pad8(x, w):
    """Tile the single row to the native 8-sublane M dim: under vmap the
    batched [8,in]@[in,out] dot is non-degenerate (MXU tile-shaped)."""
    if x.ndim >= 2 and x.shape[-2] == 1:
        xt = jnp.broadcast_to(x, x.shape[:-2] + (8,) + x.shape[-1:])
        return jnp.matmul(xt, w)[..., :1, :]
    return jnp.dot(x, w)


def bench(name, row_dot):
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    params = (
        jax.random.normal(k1, (IN, IN), jnp.float32) * 0.05,
        jax.random.normal(k2, (IN, 4 * H), jnp.float32) * 0.05,
        jax.random.normal(k3, (H, 4 * H), jnp.float32) * 0.05,
    )
    xs = jax.random.normal(k4, (N, 1, IN), jnp.float32)
    prog = make_chain(row_dot)
    t0 = time.time()
    out = np.asarray(prog(params, xs))  # forced fetch (tunnel semantics)
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(REPS):
        t0 = time.time()
        out = np.asarray(prog(params, xs))
        best = min(best, time.time() - t0)
    macs = N * SITES * (IN * IN + IN * 4 * H + H * 4 * H)
    print(
        f"{name}: compile {compile_s:.1f}s, best {best*1e3:.1f} ms, "
        f"{2*macs/best/1e12:.2f} TFLOP/s, out={float(out):.4f}",
        flush=True,
    )


def main():
    print(f"# N={N} IN={IN} H={H} SITES={SITES}", flush=True)
    bench("bcast ", bcast)
    bench("vecmat", vecmat)
    bench("pad8  ", pad8)
    if os.environ.get("RAWDOT"):
        bench("rawdot", rawdot)


if __name__ == "__main__":
    main()
