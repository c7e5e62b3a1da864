"""Stein variational gradient descent over the program's continuous
latents (SVGD, Liu & Wang 2016, arXiv:1608.04471).

Beyond parity: the reference's engines (pyprob/util.py:49-53) are
simulation-based only.  SVGD is a deterministic *particle* approximation:
an ensemble of N particles is transported along the Stein variational
direction

    phi(z_i) = 1/N sum_j [ k(z_j, z_i) grad_{z_j} log p(z_j)
                           + grad_{z_j} k(z_j, z_i) ]

which is steepest descent of KL(q || p) in the RKHS of the kernel k.
The attraction term drives particles to high density; the kernel
repulsion term keeps them spread out, so the *ensemble* matches the
posterior — including correlations and non-Gaussian shape that a
meanfield VI guide cannot represent — without ever writing down a
density for q.

TPU mapping: with Z [N, D] the whole update is dense linear algebra —
the RBF kernel matrix is one Gram computation, attraction is K @ G and
repulsion is (2/h) * (rowsum(K) * Z - K @ Z), all [N,N]@[N,D] matmuls
that tile straight onto the MXU.  The per-particle score G is a vmapped
`jax.grad` of the same functionalized potential that powers HMC/NUTS/
PT/VI (pyprob_tpu/inference/hmc.py:_functionalize), so transforms to
unconstrained space and discrete-site enumeration are inherited.  The
full optimization (adam on the particles, median-heuristic bandwidth
per step) runs inside ONE `lax.scan` = one compiled dispatch.

The returned posterior is the decoded ensemble with uniform weights;
discrete sites are drawn from their exact conditional p(d | z, obs).
When ``num_traces`` exceeds the ensemble size the particles are tiled
with fresh decode keys (fresh discrete conditionals per copy).
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from .. import util
from ..vectorized import _TraceabilityCache
from .hmc import _functionalize

_svgd_cache = {}


def vectorized_svgd_posterior(
    model,
    num_traces,
    observe=None,
    map_func=None,
    file_name=None,
    svgd_steps=None,
    svgd_particles=None,
    learning_rate=None,
    likelihood_importance=1.0,
    mesh=None,
    args=(),
    kwargs=None,
):
    """Transport an N-particle ensemble by SVGD, then return it as a
    uniform-weight Empirical of ``num_traces`` decoded draws.  Returns
    None if the model is not jax-traceable (SVGD has no interpreter
    tier)."""
    if _TraceabilityCache.known_untraceable(model):
        return None
    if not observe:
        raise RuntimeError(
            "STEIN_VARIATIONAL_GRADIENT_DESCENT requires observe={...} values"
        )
    if any(v is None for v in observe.values()):
        raise RuntimeError(f"Observe has missing value(s): {observe}")
    t0 = time.time()
    if svgd_steps is None:
        svgd_steps = 500
    if svgd_particles is None:
        svgd_particles = int(min(max(num_traces, 64), 1024))
    if learning_rate is None:
        learning_rate = 0.05

    obs_arrays = {k: jnp.asarray(v, util.dtype()) for k, v in observe.items()}
    results_only = getattr(map_func, "__name__", "") == "trace_result"
    cacheable = not args and not kwargs
    cache_key = (
        id(model),
        tuple(sorted(observe.keys())),
        likelihood_importance,
        int(svgd_particles),
        results_only,
    )

    try:
        if cacheable and cache_key in _svgd_cache:
            built = _svgd_cache[cache_key]
        else:
            built = _build_svgd(
                model,
                obs_arrays,
                likelihood_importance,
                int(svgd_particles),
                results_only,
                args,
                kwargs,
            )
            if cacheable:
                _svgd_cache[cache_key] = built
        fit_fn, decode_fn, init_fn, sites, dim = built

        n = int(svgd_particles)
        z0 = init_fn(util.next_keys(n), obs_arrays)
        z, phi_hist = fit_fn(int(svgd_steps), float(learning_rate), z0,
                             obs_arrays)

        # tile the ensemble up to num_traces with fresh decode keys (each
        # copy redraws any discrete sites from their exact conditionals)
        reps = -(-num_traces // n)  # ceil
        idx = jnp.tile(jnp.arange(n), reps)[: max(num_traces, n)]
        decode_keys = util.next_keys(int(idx.shape[0]))
        if mesh is None and len(jax.devices()) > 1:
            from ..parallel import data_parallel_mesh

            mesh = data_parallel_mesh()
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from ..parallel import pad_to_multiple

            n_pad = pad_to_multiple(int(idx.shape[0]), mesh.size)
            idx = jnp.concatenate([idx, jnp.tile(idx[:1], n_pad - idx.shape[0])]) \
                if n_pad != idx.shape[0] else idx
            decode_keys = util.next_keys(n_pad)
            sharding = NamedSharding(mesh, P("dp"))
            idx = jax.device_put(idx, sharding)
            decode_keys = jax.device_put(decode_keys, sharding)
        outputs = decode_fn(z, idx, decode_keys, obs_arrays)
        host = jax.device_get(outputs)
        phi_hist = np.asarray(jax.device_get(phi_hist), dtype=np.float64)
    except NotImplementedError:
        raise
    except (
        jax.errors.ConcretizationTypeError,
        jax.errors.TracerArrayConversionError,
        jax.errors.TracerBoolConversionError,
        jax.errors.TracerIntegerConversionError,
    ) as e:
        util.log_print(
            f"[pyprob_tpu] model {model.name!r} is not jax-traceable "
            f"({type(e).__name__}); STEIN_VARIATIONAL_GRADIENT_DESCENT "
            f"has no interpreter tier."
        )
        _TraceabilityCache.mark(model, False)
        return None
    _TraceabilityCache.mark(model, True)

    from ..vectorized import materialize_empirical

    emp = materialize_empirical(
        sites, host, num_traces, map_func, results_only, file_name,
        log_weights=None,
    )

    duration = time.time() - t0
    final_phi = float(phi_hist[-1]) if len(phi_hist) else float("nan")
    emp.rename(
        f"Posterior, SVGD ({svgd_particles} particles, D={dim}, "
        f"{svgd_steps} steps), draws: {emp.length:,}"
    )
    emp.add_metadata(
        op="posterior",
        num_traces=num_traces,
        inference_engine="InferenceEngine.STEIN_VARIATIONAL_GRADIENT_DESCENT",
        latent_dim=dim,
        svgd_particles=int(svgd_particles),
        svgd_steps=int(svgd_steps),
        learning_rate=float(learning_rate),
        final_mean_update_norm=final_phi,
        vectorized=True,
    )
    if util.verbosity() > 1:
        util.log_print(
            f"[SVGD] {svgd_particles} particles over {dim} latent dim(s): "
            f"final mean |phi| {final_phi:.2e} after {svgd_steps} steps, "
            f"{emp.length:,} draws in {duration:.3f}s"
        )
    return emp


def _build_svgd(model, obs_arrays, likelihood_importance, n_particles,
                results_only, args, kwargs):
    """Build (fit_fn, decode_fn, init_fn, sites, dim).

    fit_fn(steps, lr, Z [N,D], obs) -> (Z [N,D], mean |phi| history)
    decode_fn(Z, idx [M], keys [M], obs) -> decoded outputs, one per idx
    init_fn(keys [N], obs) -> Z [N,D] of encoded prior draws
    """
    fm = _functionalize(
        model, obs_arrays, likelihood_importance, results_only,
        "STEIN_VARIATIONAL_GRADIENT_DESCENT", args, kwargs,
    )
    sites, dim = fm.sites, fm.dim
    n = int(n_particles)

    def log_joint(z_vec, obs):
        return -fm.potential(z_vec, obs)

    score = jax.vmap(jax.grad(log_joint), in_axes=(0, None))

    def stein_phi(z, obs):
        """The Stein variational direction for the whole ensemble: three
        [N,N]@[N,D]-shaped contractions (MXU-tiled on TPU)."""
        g = score(z, obs)  # [N, D]
        sq = jnp.sum(z * z, axis=-1)
        d2 = sq[:, None] + sq[None, :] - 2.0 * (z @ z.T)  # Gram trick
        d2 = jnp.maximum(d2, 0.0)
        # median heuristic: h = med(d2) / log(N+1), floored for stability
        h = jnp.median(d2) / np.log(n + 1.0)
        h = jnp.maximum(h, 1e-6)
        k = jnp.exp(-d2 / h)  # [N, N], symmetric
        attract = k @ g
        repulse = (2.0 / h) * (jnp.sum(k, axis=1)[:, None] * z - k @ z)
        return (attract + repulse) / n

    _fit_cache = {}

    def fit_fn(steps, lr, z, obs):
        sig = (int(steps), float(lr))
        if sig not in _fit_cache:
            opt = optax.adam(float(lr))

            def run(z, obs):
                # body defined inside run: lax.scan caches jaxprs by body
                # identity, so it must be a fresh object per trace
                def step(carry, _):
                    zc, opt_state = carry
                    phi = stein_phi(zc, obs)
                    # adam MINIMIZES: feed -phi to ascend the Stein flow
                    updates, opt_state = opt.update(
                        jax.tree.map(jnp.negative, phi), opt_state, zc
                    )
                    zc = optax.apply_updates(zc, updates)
                    return (zc, opt_state), jnp.mean(jnp.abs(phi))

                (zf, _), hist = jax.lax.scan(
                    step, (z, opt.init(z)), None, length=int(steps)
                )
                return zf, hist

            _fit_cache[sig] = jax.jit(run)
        return _fit_cache[sig](z, obs)

    @jax.jit
    def init_fn(keys, obs):
        return jax.vmap(fm.encode_single, in_axes=(0, None))(keys, obs)

    def decode_one(z, i, key, obs):
        return fm.decode_single(z[i], key, obs)

    decode_fn = jax.jit(
        jax.vmap(decode_one, in_axes=(None, 0, 0, None))
    )
    return fit_fn, decode_fn, init_fn, sites, dim
