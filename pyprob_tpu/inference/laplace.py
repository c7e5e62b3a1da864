"""MAP estimation and the Laplace approximation over the program's
continuous latents.

Beyond parity: the reference's engines (pyprob/util.py:49-53) are
simulation-based only; it has no optimization-based inference at all.
Here the shared functionalized-replay machinery (pyprob_tpu/inference/
hmc.py:_functionalize) makes the joint density a pure differentiable
function of one flat unconstrained latent vector, so the posterior mode
is found by multi-start gradient descent and the curvature at the mode
gives a Gaussian approximation:

- **MAP** (``map_estimate``): S independent adam descents on
  -log p(x(z), obs) WITHOUT the Jacobian adjustment (Stan ``optimizing``
  convention — the mode is the constrained-space posterior mode),
  enumerable discrete sites marginalized out, all starts vmapped, the
  whole optimization ONE ``lax.scan`` dispatch; best final value wins.
- **Laplace** (engine): the Gaussian is fit in unconstrained space, so
  its own mode search uses the full potential
  U(z) = -log p(x(z), obs) - log|dx/dz|.  H = ∇²U(z_map) via
  ``jax.hessian``; eigen-floored on the
  host in float64 (saddle/flat directions get a small positive floor);
  q = N(z_map, H⁻¹).  The returned posterior is importance-reweighted
  draws from q — ``log w = -U(z) - log q(z)`` — so, like the VI engine,
  it is a self-normalized importance sampler that stays asymptotically
  exact even where the Gaussian is wrong.  Two evidence estimates ride
  along: ``log_evidence`` (IS, from the weights) and
  ``log_evidence_laplace`` = -U(z_map) + D/2·log 2π + ½·log det H⁻¹.
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from .. import util
from ..vectorized import _TraceabilityCache, materialize_empirical
from .hmc import _functionalize

_LOG_2PI = float(np.log(2.0 * np.pi))

_laplace_cache = {}


class MAPResult:
    """Posterior-mode summary returned by ``Model.map_estimate``.

    Attributes: ``values`` ({site name-or-address: constrained value}),
    ``result`` (forward() return at the mode), ``log_joint``
    (log p(x, obs) + log|J| at the mode, i.e. -potential),
    ``z`` (flat unconstrained mode), ``num_starts``, ``map_steps``.
    """

    def __init__(self, values, result, log_joint, z, num_starts, map_steps):
        self.values = values
        self.result = result
        self.log_joint = log_joint
        self.z = z
        self.num_starts = num_starts
        self.map_steps = map_steps

    def __repr__(self):
        return (
            f"MAPResult(log_joint={self.log_joint:.4f}, "
            f"values={self.values})"
        )


def _build_laplace(model, obs_arrays, likelihood_importance, results_only,
                   args, kwargs):
    """Build (fit_fn_cacheable, hessian_fn, draw_fn, fm).

    fit(z0s [S,D], key, obs, steps, lr) -> (z_finals [S,D], pots [S])
    hessian(z [D], obs) -> [D,D]
    draw(z_map, scale [D,D], logdet_cov, keys [N], obs)
        -> (outputs, log_w [N])
    """
    fm = _functionalize(
        model, obs_arrays, likelihood_importance, results_only,
        "LAPLACE", args, kwargs,
    )
    dim = fm.dim

    _fit_cache = {}

    def fit_fn(z0s, obs, steps, lr, jac=True):
        # jac=True: the Laplace potential (log|J| included — the Gaussian
        # is fit in unconstrained space).  jac=False: MAP convention (no
        # Jacobian adjustment, Stan `optimizing`): the mode maximizes the
        # constrained-space posterior density.
        pot = fm.potential if jac else fm.potential_nojac
        sig = (int(steps), float(lr), bool(jac))
        if sig not in _fit_cache:
            opt = optax.adam(float(lr))

            def run(z0s, obs):
                # the scan body is defined inside run: lax.scan caches
                # jaxprs by body identity, so it must be fresh per trace
                def one(z0):
                    def step(carry, _):
                        z, st = carry
                        u, g = jax.value_and_grad(pot)(z, obs)
                        upd, st = opt.update(g, st, z)
                        return (optax.apply_updates(z, upd), st), u

                    (z, _), _ = jax.lax.scan(
                        step, (z0, opt.init(z0)), None, length=int(steps)
                    )
                    return z, pot(z, obs)

                return jax.vmap(one)(z0s)

            _fit_cache[sig] = jax.jit(run)
        return _fit_cache[sig](z0s, obs)

    hessian_fn = jax.jit(jax.hessian(fm.potential))

    def draw_one(z_map, scale, logdet_cov, key, obs):
        k_eps, k_dec = jax.random.split(key)
        eps = jax.random.normal(k_eps, (dim,), util.dtype())
        z = z_map + scale @ eps
        log_q = (
            -0.5 * jnp.sum(eps * eps)
            - 0.5 * dim * _LOG_2PI
            - 0.5 * logdet_cov
        )
        out = fm.decode_single(z, k_dec, obs)
        log_w = -fm.potential(z, obs) - log_q
        return out, log_w

    draw_fn = jax.jit(jax.vmap(draw_one, in_axes=(None, None, None, 0, None)))
    return fit_fn, hessian_fn, draw_fn, fm


def _get_built(model, observe, likelihood_importance, results_only, args,
               kwargs):
    obs_arrays = {k: jnp.asarray(v, util.dtype()) for k, v in observe.items()}
    cacheable = not args and not kwargs
    cache_key = (
        id(model),
        tuple(sorted(observe.keys())),
        likelihood_importance,
        results_only,
    )
    if cacheable and cache_key in _laplace_cache:
        return _laplace_cache[cache_key], obs_arrays
    built = _build_laplace(
        model, obs_arrays, likelihood_importance, results_only, args, kwargs
    )
    if cacheable:
        _laplace_cache[cache_key] = built
    return built, obs_arrays


def _find_map(built, obs_arrays, map_steps, num_starts, learning_rate,
              jac=True):
    fit_fn, _, _, fm = built
    z0s = jnp.stack(
        [fm.encode_single(k, obs_arrays) for k in util.next_keys(num_starts)]
    )
    z_finals, pots = fit_fn(z0s, obs_arrays, map_steps, learning_rate, jac=jac)
    pots_host = np.asarray(jax.device_get(pots), np.float64)
    if not np.isfinite(pots_host).any():
        raise RuntimeError(
            "MAP optimization diverged from every start (non-finite "
            "potential); try a smaller learning_rate or more map_steps."
        )
    best = int(np.nanargmin(pots_host))
    return jnp.asarray(np.asarray(jax.device_get(z_finals))[best]), float(
        pots_host[best]
    )


def map_estimate(model, observe=None, map_steps=None, num_starts=None,
                 learning_rate=None, likelihood_importance=1.0, args=(),
                 kwargs=None):
    """Posterior mode of the program's continuous latents (discrete
    enumerable sites marginalized, then drawn from their exact
    conditional at the mode).  Returns a ``MAPResult``.

    The mode is the CONSTRAINED-space posterior mode: optimization runs
    in unconstrained space but without the transform's log-Jacobian
    adjustment (Stan ``optimizing`` convention) — so for a
    Gamma-posterior latent this returns the familiar (α−1)/β, not the
    log-space mode.  ``log_joint`` is log p(x, obs) at that mode."""
    if not observe:
        raise RuntimeError("map_estimate requires observe={...} values")
    if any(v is None for v in observe.values()):
        raise RuntimeError(f"Observe has missing value(s): {observe}")
    map_steps = 400 if map_steps is None else int(map_steps)
    num_starts = 8 if num_starts is None else int(num_starts)
    learning_rate = 0.05 if learning_rate is None else float(learning_rate)
    built, obs_arrays = _get_built(
        model, observe, likelihood_importance, False, args, kwargs
    )
    _, _, _, fm = built
    z_map, pot = _find_map(
        built, obs_arrays, map_steps, num_starts, learning_rate, jac=False
    )
    out = jax.device_get(
        jax.jit(fm.decode_single)(z_map, util.next_key(), obs_arrays)
    )
    by_addr = {s.address: s for s in fm.sites}
    values = {}
    for addr, v in out["values"].items():
        s = by_addr.get(addr)
        if s is not None and s.control and not s.observed:
            values[s.name or addr] = np.asarray(v)
    return MAPResult(
        values=values,
        result=out["result"],
        log_joint=-pot,
        z=np.asarray(jax.device_get(z_map)),
        num_starts=num_starts,
        map_steps=map_steps,
    )


def vectorized_laplace_posterior(
    model,
    num_traces,
    observe=None,
    map_func=None,
    file_name=None,
    map_steps=None,
    num_starts=None,
    learning_rate=None,
    likelihood_importance=1.0,
    mesh=None,
    args=(),
    kwargs=None,
):
    """Laplace-approximate posterior: N(z_map, H⁻¹) in unconstrained
    space, returned as importance-reweighted draws (asymptotically exact).
    Returns None if the model is not jax-traceable."""
    if _TraceabilityCache.known_untraceable(model):
        return None
    if not observe:
        raise RuntimeError("LAPLACE requires observe={...} values")
    if any(v is None for v in observe.values()):
        raise RuntimeError(f"Observe has missing value(s): {observe}")
    t0 = time.time()
    map_steps = 400 if map_steps is None else int(map_steps)
    num_starts = 8 if num_starts is None else int(num_starts)
    learning_rate = 0.05 if learning_rate is None else float(learning_rate)
    results_only = getattr(map_func, "__name__", "") == "trace_result"

    try:
        built, obs_arrays = _get_built(
            model, observe, likelihood_importance, results_only, args, kwargs
        )
        _, hessian_fn, draw_fn, fm = built
        dim = fm.dim
        z_map, pot = _find_map(
            built, obs_arrays, map_steps, num_starts, learning_rate
        )

        # curvature at the mode; eigen-floor on host in float64 so saddle
        # or flat directions become a (wide) proper Gaussian instead of a
        # crash — the IS reweighting absorbs the approximation either way
        H = np.asarray(
            jax.device_get(hessian_fn(z_map, obs_arrays)), np.float64
        )
        H = 0.5 * (H + H.T)
        w, V = np.linalg.eigh(H)
        floor = max(1e-8, 1e-6 * float(np.max(np.abs(w))) if w.size else 0.0)
        w = np.maximum(w, floor)
        # cov = V diag(1/w) Vᵀ; scale scaleᵀ = cov
        scale = V @ np.diag(1.0 / np.sqrt(w))
        logdet_cov = float(-np.sum(np.log(w)))
        log_evidence_laplace = float(
            -pot + 0.5 * dim * _LOG_2PI + 0.5 * logdet_cov
        )

        draw_keys = util.next_keys(num_traces)
        if mesh is None and len(jax.devices()) > 1:
            from ..parallel import data_parallel_mesh

            mesh = data_parallel_mesh()
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from ..parallel import pad_to_multiple

            n_pad = pad_to_multiple(num_traces, mesh.size)
            draw_keys = util.next_keys(n_pad)
            draw_keys = jax.device_put(draw_keys, NamedSharding(mesh, P("dp")))
        outputs, log_w = draw_fn(
            z_map,
            jnp.asarray(scale, util.dtype()),
            jnp.asarray(logdet_cov, util.dtype()),
            draw_keys,
            obs_arrays,
        )
        host = jax.device_get(outputs)
        log_w = np.asarray(jax.device_get(log_w), np.float64)[:num_traces]
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
            f"({type(e).__name__}); LAPLACE has no interpreter tier."
        )
        _TraceabilityCache.mark(model, False)
        return None
    _TraceabilityCache.mark(model, True)

    with np.errstate(over="ignore"):
        m = np.max(log_w) if log_w.size else float("-inf")
        log_evidence = (
            float(m + np.log(np.mean(np.exp(log_w - m))))
            if np.isfinite(m)
            else float("-inf")
        )

    emp = materialize_empirical(
        fm.sites, host, num_traces, map_func, results_only, file_name,
        log_weights=log_w,
    )
    duration = time.time() - t0
    emp.log_evidence = log_evidence
    emp.log_evidence_laplace = log_evidence_laplace
    ess = float(emp.effective_sample_size)
    emp.rename(
        f"Posterior, Laplace (D={dim}, {num_starts} starts x "
        f"{map_steps} steps), IS-reweighted draws: {emp.length:,}, "
        f"ESS: {ess:,.2f}"
    )
    emp.add_metadata(
        op="posterior",
        num_traces=num_traces,
        inference_engine="InferenceEngine.LAPLACE",
        latent_dim=dim,
        map_steps=map_steps,
        num_starts=num_starts,
        learning_rate=learning_rate,
        log_joint_at_mode=-pot,
        log_evidence=log_evidence,
        log_evidence_laplace=log_evidence_laplace,
        effective_sample_size=ess,
        vectorized=True,
    )
    if util.verbosity() > 1:
        util.log_print(
            f"[Laplace] mode over {dim} latent dim(s): log joint {-pot:.3f},"
            f" Laplace evidence {log_evidence_laplace:.3f}, {emp.length:,} "
            f"reweighted draws (ESS {ess:,.1f}) in {duration:.3f}s"
        )
    return emp
