"""O(T) scan-native SMC for :class:`pyprob_tpu.markov.MarkovModel`.

The universal staged-replay filter (pyprob_tpu.inference.smc) re-executes
the entire ``forward`` per stage — O(T^2) program work over T observes.
Models that declare their scan structure via the markov protocol
(markov_init / markov_step / markov_finalize) get the filter nature
intended: ONE ``lax.scan`` over the steps, each stage one vmapped
``markov_step`` per particle, resampling a batched gather on the carry.
Per-stage cost is independent of T, and the whole filter — every
transition, adaptive resampling, weight bookkeeping, and the
marginal-likelihood estimate — compiles to a single XLA program and
runs as one device dispatch.

This path is results-only (the Empirical holds ``markov_finalize``
outputs, not Trace objects): full-trace materialization would stack
every step's sites to [T, N, ...] and negate the memory win.  Callers
that need Traces (``posterior()`` / custom ``map_func``) fall back to
staged replay automatically.

The reference has no SMC engine at all (its engines:
reference: pyprob/util.py:49-53); within this repo the staged filter is
the universality baseline this one beats — see BASELINE.md for the
measured O(T^2) -> O(T) separation.
"""

from __future__ import annotations

import time
import warnings

import numpy as np
import jax
import jax.numpy as jnp

from .. import state, util
from ..util import TraceMode, InferenceEngine
from ..distributions import Empirical
from ..parallel.collectives import (
    RESAMPLING_SCHEMES,
    resample_indices,
    sharded_effective_sample_size,
)

_scan_smc_cache = {}


def _handler_run(fn, key, observed, likelihood_importance, fn_args):
    """Execute one protocol hook under a fresh VectorizedHandler; returns
    (hook result, accumulated log importance weight)."""
    from ..vectorized import VectorizedHandler

    handler = VectorizedHandler(
        key=key,
        trace_mode=TraceMode.POSTERIOR,
        inference_engine=InferenceEngine.IMPORTANCE_SAMPLING,
        observed=observed,
        root_function_name=fn.__code__.co_name,
        likelihood_importance=likelihood_importance,
    )
    prev = state._set_handler(handler)
    try:
        out = fn(*fn_args)
    finally:
        state._set_handler(prev)
    return out, handler.log_importance_weight, handler


def _probe_step_names(model, obs_arrays, likelihood_importance,
                      args, kwargs):
    """Abstractly evaluate init + one step to learn which observe names
    belong to markov_step (their arrays are per-step, leading dim T)."""
    names_box = []

    def probe(key, obs):
        k_init, k_step = jax.random.split(key)
        carry, _, _ = _handler_run(
            lambda: model.markov_init(*tuple(args), **(kwargs or {})),
            k_init, obs, likelihood_importance, (),
        )
        from ..markov import _StepObserves

        step_obs = _StepObserves(obs, 0)
        _, _, handler = _handler_run(
            model.markov_step, k_step, step_obs, likelihood_importance,
            (carry, jnp.zeros((), jnp.int32)),
        )
        if not names_box:
            names_box.append(
                {
                    s.name
                    for s in handler.sites
                    if s.observed and s.name is not None
                }
            )
        return 0

    jax.eval_shape(probe, jax.random.PRNGKey(0), obs_arrays)
    return names_box[0]


def _build_scan_smc(model, obs_arrays, likelihood_importance,
                    resample_threshold, resampling, args, kwargs):
    """Build (jitted program, step_names).  The program takes
    (init_keys [N], step_keys [T,N], resample_keys [T], obs_init dict,
    obs_step dict of [T,...]) and returns
    (results [N,...], final log-weights [N], log_evidence,
    (ess history [T], resampled flags [T]))."""
    T = int(model.num_steps)
    if T < 1:
        raise RuntimeError("MarkovModel.num_steps must be >= 1 for SMC")
    step_names = _probe_step_names(
        model, obs_arrays, likelihood_importance, args, kwargs
    )
    fn_args = tuple(args)
    fn_kwargs = kwargs or {}

    def run_init(key, obs_init):
        carry, w, _ = _handler_run(
            lambda: model.markov_init(*fn_args, **fn_kwargs),
            key, obs_init, likelihood_importance, (),
        )
        return carry, w

    def run_step(key, carry, t, obs_t):
        new_carry, w, _ = _handler_run(
            model.markov_step, key, obs_t, likelihood_importance, (carry, t)
        )
        return new_carry, w

    vinit = jax.vmap(run_init, in_axes=(0, None))
    vstep = jax.vmap(run_step, in_axes=(0, 0, None, None))

    def program(init_keys, step_keys, resample_keys, obs_init, obs_step):
        n = init_keys.shape[0]
        log_n = jnp.log(jnp.asarray(n, util.dtype()))
        carry0, w0 = vinit(init_keys, obs_init)

        # body built fresh per program trace: lax.scan caches jaxprs by
        # body identity (CLAUDE.md invariant)
        def body(sc, xs):
            carry, w, log_z = sc
            key_t, rkey_t, t = xs[:3]
            obs_t = xs[3]
            new_carry, incr = vstep(key_t, carry, t, obs_t)
            w = w + incr
            ess = sharded_effective_sample_size(w)
            do_resample = jnp.logical_and(
                ess < resample_threshold * n, t < T - 1
            )
            idx = jnp.where(
                do_resample,
                resample_indices(rkey_t, w, n, scheme=resampling),
                jnp.arange(n),
            )
            log_z = log_z + jnp.where(
                do_resample, jax.scipy.special.logsumexp(w) - log_n, 0.0
            )
            new_carry = jax.tree_util.tree_map(
                lambda x: x[idx], new_carry
            )
            w = jnp.where(do_resample, jnp.zeros_like(w), w)
            return (new_carry, w, log_z), (ess, do_resample)

        xs = (
            step_keys,
            resample_keys,
            jnp.arange(T, dtype=jnp.int32),
            obs_step,
        )
        (carry_f, w, log_z), (ess_hist, resampled) = jax.lax.scan(
            body, (carry0, w0, jnp.zeros((), util.dtype())), xs
        )
        log_z = log_z + jax.scipy.special.logsumexp(w) - log_n
        results = jax.vmap(model.markov_finalize)(carry_f)
        return results, w, log_z, (ess_hist, resampled)

    return jax.jit(program), step_names


def scan_smc_posterior(
    model,
    num_traces,
    observe=None,
    file_name=None,
    resample_threshold=0.5,
    resampling="systematic",
    likelihood_importance=1.0,
    mesh=None,
    args=(),
    kwargs=None,
):
    """O(T) particle filter over a MarkovModel; returns a results-only
    Empirical (with ``log_evidence``), or None when the model is not
    jax-traceable (the caller falls back to staged replay)."""
    from ..vectorized import _TraceabilityCache

    if _TraceabilityCache.known_untraceable(model):
        return None
    if not observe:
        raise RuntimeError(
            "SEQUENTIAL_MONTE_CARLO requires observe={...} values"
        )
    if any(v is None for v in observe.values()):
        raise RuntimeError(f"Observe has missing value(s): {observe}")
    if resampling not in RESAMPLING_SCHEMES:
        raise ValueError(
            f"Unknown resampling scheme {resampling!r}; choose one of "
            f"{sorted(RESAMPLING_SCHEMES)}"
        )
    if mesh is None and len(jax.devices()) > 1:
        from ..parallel import data_parallel_mesh

        mesh = data_parallel_mesh()
    if mesh is not None:
        from ..parallel import pad_to_multiple

        num_traces = pad_to_multiple(num_traces, mesh.size)

    t0 = time.time()
    T = int(model.num_steps)
    cacheable = not args and not kwargs
    cache_key = (
        id(model),
        tuple(sorted(observe.keys())),
        likelihood_importance,
        float(resample_threshold),
        str(resampling),
        T,
    )
    try:
        obs_arrays = {
            k: jnp.asarray(v, util.dtype()) for k, v in observe.items()
        }
        cached = _scan_smc_cache.get(cache_key) if cacheable else None
        if cached is not None:
            program, step_names = cached
        else:
            program, step_names = _build_scan_smc(
                model,
                obs_arrays,
                likelihood_importance,
                resample_threshold,
                resampling,
                args,
                kwargs,
            )
            if cacheable:
                _scan_smc_cache[cache_key] = program, step_names
        obs_step = {k: obs_arrays[k] for k in step_names if k in obs_arrays}
        obs_init = {
            k: v for k, v in obs_arrays.items() if k not in step_names
        }
        for name, v in obs_step.items():
            shape = jnp.shape(v)
            if not shape or int(shape[0]) != T:
                raise RuntimeError(
                    f"per-step observation {name!r} must have leading dim "
                    f"num_steps={T}, got shape {shape}"
                )
        init_keys = util.next_keys(num_traces)
        flat = util.next_keys(T * num_traces)
        step_keys = flat.reshape((T, num_traces) + flat.shape[1:])
        resample_keys = util.next_keys(T)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            init_keys = jax.device_put(
                init_keys, NamedSharding(mesh, P("dp"))
            )
            step_keys = jax.device_put(
                step_keys, NamedSharding(mesh, P(None, "dp"))
            )
            repl = NamedSharding(mesh, P())
            resample_keys = jax.device_put(resample_keys, repl)
            obs_init = {
                k: jax.device_put(v, repl) for k, v in obs_init.items()
            }
            obs_step = {
                k: jax.device_put(v, repl) for k, v in obs_step.items()
            }
        results, w, log_z, stats = program(
            init_keys, step_keys, resample_keys, obs_init, obs_step
        )
        results_host = jax.device_get(results)
        log_weights = np.asarray(jax.device_get(w), dtype=np.float64)
        log_evidence = float(jax.device_get(log_z))
        stage_ess = [float(e) for e in jax.device_get(stats[0])]
        resampled_stages = [bool(b) for b in jax.device_get(stats[1])]
    except (
        jax.errors.ConcretizationTypeError,
        jax.errors.TracerArrayConversionError,
        jax.errors.TracerBoolConversionError,
        jax.errors.TracerIntegerConversionError,
        NotImplementedError,
    ) as e:
        util.log_print(
            f"[pyprob_tpu] markov model {model.name!r} is not "
            f"jax-traceable ({type(e).__name__}); falling back to staged "
            "replay."
        )
        return None

    bad = ~np.isfinite(log_weights)
    if bad.any():
        warnings.warn(
            f"Discarding {bad.sum()} particles with nan/inf log_weight."
        )
        log_weights[bad] = -np.inf

    keep = np.isfinite(log_weights)
    if file_name is None and isinstance(results_host, np.ndarray):
        emp = Empirical.from_arrays(
            np.asarray(results_host)[keep], log_weights[keep]
        )
    else:
        leaves, treedef = jax.tree_util.tree_flatten(results_host)
        leaves = [np.asarray(l) for l in leaves]
        emp = Empirical(file_name=file_name)
        for i in range(num_traces):
            if keep[i]:
                emp.add(
                    jax.tree_util.tree_unflatten(
                        treedef, [l[i] for l in leaves]
                    ),
                    log_weight=float(log_weights[i]),
                )
        emp.finalize()

    duration = time.time() - t0
    emp.log_evidence = log_evidence
    emp.rename(
        f"Posterior, SMC (scan, {T} steps), particles: {emp.length:,}, "
        f"ESS: {emp.effective_sample_size:,.2f}"
    )
    emp.add_metadata(
        op="posterior",
        num_traces=num_traces,
        inference_engine="InferenceEngine.SEQUENTIAL_MONTE_CARLO",
        effective_sample_size=emp.effective_sample_size,
        log_evidence=log_evidence,
        resample_threshold=resample_threshold,
        resampling=resampling,
        stages=T,
        stage_ess=stage_ess,
        resampled_stages=resampled_stages,
        vectorized=True,
        scan=True,
    )
    if util.verbosity() > 1:
        util.log_print(
            f"[SMC scan] {num_traces:,} particles x {T} steps in "
            f"{duration:.3f}s, ESS {emp.effective_sample_size:,.1f}, "
            f"log Z {log_evidence:.4f}"
        )
    return emp
