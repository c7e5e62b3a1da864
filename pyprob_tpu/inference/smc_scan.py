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

Results-only callers get an Empirical of ``markov_finalize`` outputs
with nothing materialized.  Trace callers (``posterior()`` / custom
``map_func``) get full Trace objects too, still in O(T) program work:
the scan additionally stacks each stage's site values/log-probs AND the
flattened per-site distribution parameters plus the per-stage resampling
indices as scan outputs ([T, N, ...] — the inherent size of a
trace-mode answer), and the genealogy is reconstructed host-side by
walking the ancestor indices backwards (O(T N) gathers, no
re-execution).  Materialized Variables carry value/log_prob/address/
name/observed and a REBUILT per-particle distribution object
(pytree-unflattened from the stacked parameters), so
``Empirical.reobserve`` (reference: pyprob/distributions/empirical.py:469-544)
and distribution-dependent diagnostics work identically on scan and
staged-replay posteriors.

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


def _local_vec(observed):
    """Flattened per-stage observation vector for the proposal's local
    slot, in sorted-name order (matches the training-side packing of
    observes-following-each-site for single-sample-per-step models)."""
    if not observed:
        return None
    import jax.numpy as jnp

    return jnp.concatenate(
        [
            jnp.reshape(jnp.asarray(observed[k], util.dtype()), (-1,))
            for k in sorted(observed)
        ]
    )


def _handler_run(fn, key, observed, likelihood_importance, fn_args,
                 proposal_step=None, ps_state=None, ps_emb=None):
    """Execute one protocol hook under a fresh VectorizedHandler; returns
    (hook result, accumulated log importance weight, handler,
    proposal dynamic state)."""
    from ..vectorized import VectorizedHandler

    handler = VectorizedHandler(
        key=key,
        trace_mode=TraceMode.POSTERIOR,
        inference_engine=(
            InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK
            if proposal_step is not None
            else InferenceEngine.IMPORTANCE_SAMPLING
        ),
        observed=observed,
        root_function_name=fn.__code__.co_name,
        likelihood_importance=likelihood_importance,
        proposal_step=proposal_step,
    )
    if proposal_step is not None:
        # the handler's __init__ reset the network closure; restore the
        # precomputed whole-sequence embedding (step handlers only see
        # per-step observation slices) and the carried recurrent state
        if ps_emb is not None:
            proposal_step.set_embedding(ps_emb)
        if ps_state is not None:
            proposal_step.set_state(ps_state)
        # per-stage LOCAL observations: nets trained with the
        # tied-Markov local slot see this stage's observe values
        # directly at every site (the filtering-proposal input a
        # whole-sequence embedding cannot localize at large T)
        if getattr(proposal_step, "local_observe_dim", 0):
            proposal_step.set_local(_local_vec(observed))
    prev = state._set_handler(handler)
    try:
        out = fn(*fn_args)
    finally:
        state._set_handler(prev)
    new_ps = (
        proposal_step.get_state() if proposal_step is not None else None
    )
    return out, handler.log_importance_weight, handler, new_ps


def _probe_step_names(model, obs_arrays, likelihood_importance,
                      args, kwargs):
    """Abstractly evaluate init + one step to learn which observe names
    belong to markov_step (their arrays are per-step, leading dim T)."""
    names_box = []

    def probe(key, obs):
        k_init, k_step = jax.random.split(key)
        carry, _, _, _ = _handler_run(
            lambda: model.markov_init(*tuple(args), **(kwargs or {})),
            k_init, obs, likelihood_importance, (),
        )
        from ..markov import _StepObserves

        step_obs = _StepObserves(obs, 0, int(model.num_steps))
        _, _, handler, _ = _handler_run(
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
                    resample_threshold, resampling, args, kwargs,
                    proposal_step=None, materialize=False):
    """Build (jitted program, step_names).  The program takes
    (init_keys [N], step_keys [T,N], resample_keys [T], obs_init dict,
    obs_step dict of [T,...], obs_all dict) and returns
    (results [N,...], final log-weights [N], log_evidence,
    (ess history [T], resampled flags [T])).

    With ``proposal_step`` (a TIED-instance IC network's vectorized
    step, see InferenceNetwork tie_address_instances), every stage
    proposes from the network: the whole-sequence observe embedding is
    computed ONCE at the top of the program, the network's recurrent
    state rides the scan carry via get_state/set_state (and is gathered
    with the particles on resampling), and each stage's incremental
    weight carries its sites' prior-proposal deltas — the O(T)
    amortized particle filter."""
    T = int(model.num_steps)
    if T < 1:
        raise RuntimeError("MarkovModel.num_steps must be >= 1 for SMC")
    step_names = _probe_step_names(
        model, obs_arrays, likelihood_importance, args, kwargs
    )
    fn_args = tuple(args)
    fn_kwargs = kwargs or {}
    guided = proposal_step is not None
    # static parts of the proposal state (and, when materializing, the
    # per-hook site metadata), captured at trace time (the python loop
    # below executes during jit tracing, so the boxes fill before the
    # code that reads them traces)
    statics_box = {}
    sites_box = {}

    def _rec(handler, sites_key):
        """Per-stage trace record (traced arrays; metadata to the box)."""
        if not materialize:
            return ()
        sites_box.setdefault(sites_key, list(handler.sites))
        return {
            "values": {
                s.address: v
                for s, v in zip(handler.sites, handler.values)
                if v is not None
            },
            "log_probs": {
                s.address: lp
                for s, lp in zip(handler.sites, handler.log_probs)
                if lp is not None
            },
            # flattened distribution params (leaf lists are pytrees, so
            # they ride the scan as stacked [T, N, ...] outputs); the
            # static treedef lives on the SiteRecord — together they
            # rebuild per-particle distribution objects on the host
            "dist_leaves": {
                s.address: list(leaves)
                for s, leaves in zip(handler.sites, handler.dist_leaves)
                if leaves is not None
            },
            "lpt": handler.log_prob_total,
            "lpo": handler.log_prob_observed,
        }

    def run_init(key, obs_init, emb):
        carry, w, handler, ps = _handler_run(
            lambda: model.markov_init(*fn_args, **fn_kwargs),
            key, obs_init, likelihood_importance, (),
            proposal_step=proposal_step, ps_emb=emb,
        )
        rec = _rec(handler, "init")
        if guided:
            dyn, static = ps
            statics_box.setdefault("init", static)
            return carry, w, dyn, rec
        return carry, w, (), rec

    def run_step_with(static_key):
        def run_step(key, carry, ps_dyn, t, obs_t, emb):
            ps_state = (
                (ps_dyn, statics_box[static_key]) if guided else None
            )
            new_carry, w, handler, ps = _handler_run(
                model.markov_step, key, obs_t, likelihood_importance,
                (carry, t),
                proposal_step=proposal_step, ps_state=ps_state,
                ps_emb=emb,
            )
            rec = _rec(handler, "step")
            if guided:
                dyn, static = ps
                statics_box.setdefault("step", static)
                return new_carry, w, dyn, rec
            return new_carry, w, (), rec
        return run_step

    vinit = jax.vmap(run_init, in_axes=(0, None, None))
    vstep0 = jax.vmap(
        run_step_with("init"), in_axes=(0, 0, 0, None, None, None)
    )
    vstep = jax.vmap(
        run_step_with("step"), in_axes=(0, 0, 0, None, None, None)
    )

    def program(init_keys, step_keys, resample_keys, obs_init, obs_step,
                obs_all):
        n = init_keys.shape[0]
        log_n = jnp.log(jnp.asarray(n, util.dtype()))
        emb = (
            proposal_step.compute_embedding(obs_all) if guided else None
        )
        carry0, w0, ps0, init_rec = vinit(init_keys, obs_init, emb)

        def stage(vstep_fn, carry, w, log_z, ps_dyn, key_t, rkey_t, t,
                  obs_t):
            new_carry, incr, new_ps, rec = vstep_fn(
                key_t, carry, ps_dyn, t, obs_t, emb
            )
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
            gather = lambda x: x[idx]
            new_carry = jax.tree_util.tree_map(gather, new_carry)
            new_ps = jax.tree_util.tree_map(gather, new_ps)
            # ``rec`` is NOT gathered: records stay in pre-resample
            # order and the host walks ``idx`` genealogy backwards
            w = jnp.where(do_resample, jnp.zeros_like(w), w)
            return new_carry, w, log_z, new_ps, ess, do_resample, idx, rec

        log_z0 = jnp.zeros((), util.dtype())
        if guided:
            # step 0 unrolled: the proposal state after markov_init may
            # differ structurally from the steady per-step state (e.g.
            # the LSTM's previous-site record), so the scan carries the
            # post-step-0 structure
            carry0, w0, log_z0, ps0, ess0, res0, idx0, rec0 = stage(
                vstep0, carry0, w0, log_z0, ps0,
                step_keys[0], resample_keys[0],
                jnp.zeros((), jnp.int32),
                jax.tree_util.tree_map(lambda x: x[0], obs_step),
            )
            scan_lo = 1
        else:
            scan_lo = 0

        # body built fresh per program trace: lax.scan caches jaxprs by
        # body identity (CLAUDE.md invariant)
        def body(sc, xs):
            carry, w, log_z, ps_dyn = sc
            key_t, rkey_t, t = xs[:3]
            obs_t = xs[3]
            carry, w, log_z, ps_dyn, ess, res, idx, rec = stage(
                vstep, carry, w, log_z, ps_dyn, key_t, rkey_t, t, obs_t
            )
            return (carry, w, log_z, ps_dyn), (ess, res, idx, rec)

        if T - scan_lo > 0:
            xs = (
                step_keys[scan_lo:],
                resample_keys[scan_lo:],
                jnp.arange(scan_lo, T, dtype=jnp.int32),
                jax.tree_util.tree_map(lambda x: x[scan_lo:], obs_step),
            )
            (carry_f, w, log_z, _), (
                ess_hist, resampled, idx_hist, rec_hist
            ) = jax.lax.scan(body, (carry0, w0, log_z0, ps0), xs)
        else:
            carry_f, w, log_z = carry0, w0, log_z0
            ess_hist = jnp.zeros((0,), util.dtype())
            resampled = jnp.zeros((0,), jnp.bool_)
            idx_hist = jnp.zeros((0, n), jnp.int32)
            rec_hist = ()
        if guided:
            ess_hist = jnp.concatenate([ess0[None], ess_hist])
            resampled = jnp.concatenate([res0[None], resampled])
        log_z = log_z + jax.scipy.special.logsumexp(w) - log_n
        results = jax.vmap(model.markov_finalize)(carry_f)
        if materialize:
            head = (
                (idx0, rec0) if guided else None
            )
            extras = (init_rec, head, idx_hist, rec_hist)
        else:
            extras = ()
        return results, w, log_z, (ess_hist, resampled), extras

    return jax.jit(program), step_names, sites_box


def _materialize_scan_traces(sites_box, extras_host, results_host,
                             log_weights, num, T, guided):
    """Rebuild per-particle Trace objects from the scan's stacked site
    records + resampling indices.

    Records are stored PRE-resample per stage; a particle's trajectory is
    reconstructed by walking the ancestor indices backwards (standard
    genealogy tracing — O(T N) gathers, no re-execution).  Instances are
    renumbered per address base in execution order so addresses match the
    interpreter tier's sequential numbering (same invariant the staged
    replay keeps).  Per-site distribution objects are rebuilt from the
    stacked parameter leaves + each site's static treedef — the same
    per-particle distributions the staged-replay path records."""
    from ..trace import Trace, Variable

    init_rec, head, idx_hist, rec_hist = extras_host
    idx_hist = np.asarray(idx_hist)
    scan_lo = 1 if guided else 0
    if guided:
        idx0, rec0 = head
        idx_all = np.concatenate([np.asarray(idx0)[None], idx_hist], 0)
    else:
        rec0 = None
        idx_all = idx_hist
    # lineage matrix: B[t, j] = index of final-slot j's ancestor in the
    # PRE-resample records of stage t
    B = np.zeros((T, num), np.int64)
    B[T - 1] = idx_all[T - 1]
    for t in range(T - 1, 0, -1):
        B[t - 1] = idx_all[t - 1][B[t]]

    def stage_rec(t):
        if guided and t == 0:
            return rec0, None  # already [N, ...]
        return rec_hist, t - scan_lo  # stacked [Ts, N, ...]

    def rows(arr, t, lineage):
        a = np.asarray(arr)
        if t is None:
            return a[lineage]
        return a[t][lineage]

    # per-particle scalar aggregates summed over the lineage
    lpt = rows(init_rec["lpt"], None, B[0]).astype(np.float64)
    lpo = rows(init_rec["lpo"], None, B[0]).astype(np.float64)
    for t in range(T):
        rec, trow = stage_rec(t)
        lpt += rows(rec["lpt"], trow, B[t])
        lpo += rows(rec["lpo"], trow, B[t])

    # pre-gather every site array along its lineage once (vectorized),
    # then the per-trace loop only indexes rows
    init_sites = sites_box.get("init", [])
    step_sites = sites_box.get("step", [])
    init_vals = {
        a: rows(v, None, B[0]) for a, v in init_rec["values"].items()
    }
    init_lps = {
        a: rows(v, None, B[0]) for a, v in init_rec["log_probs"].items()
    }
    init_dls = {
        a: [rows(l, None, B[0]) for l in ls]
        for a, ls in init_rec.get("dist_leaves", {}).items()
    }
    stage_vals, stage_lps, stage_dls = [], [], []
    for t in range(T):
        rec, trow = stage_rec(t)
        stage_vals.append(
            {a: rows(v, trow, B[t]) for a, v in rec["values"].items()}
        )
        stage_lps.append(
            {a: rows(v, trow, B[t]) for a, v in rec["log_probs"].items()}
        )
        stage_dls.append(
            {
                a: [rows(l, trow, B[t]) for l in ls]
                for a, ls in rec.get("dist_leaves", {}).items()
            }
        )

    result_leaves, result_treedef = jax.tree_util.tree_flatten(
        results_host
    )
    result_leaves = [np.asarray(l) for l in result_leaves]

    traces = []
    for i in range(num):
        tr = Trace()
        counters = {}

        def add_site(s, vals, lps, dls):
            inst = counters.get(s.address_base, 0) + 1
            counters[s.address_base] = inst
            v = vals.get(s.address)
            lp = lps.get(s.address)
            ls = dls.get(s.address)
            dist = None
            if ls is not None and s.dist_treedef is not None:
                dist = jax.tree_util.tree_unflatten(
                    s.dist_treedef, [l[i] for l in ls]
                )
            tr.add(
                Variable(
                    distribution=dist,
                    value=None if v is None else v[i],
                    address_base=s.address_base,
                    address=s.address_base + "__" + str(inst),
                    instance=inst,
                    log_prob=None if lp is None else lp[i],
                    log_importance_weight=None,
                    control=s.control,
                    name=s.name,
                    observed=s.observed,
                    tagged=s.tagged,
                )
            )

        for s in init_sites:
            add_site(s, init_vals, init_lps, init_dls)
        for t in range(T):
            for s in step_sites:
                add_site(s, stage_vals[t], stage_lps[t], stage_dls[t])
        tr.end(
            jax.tree_util.tree_unflatten(
                result_treedef, [l[i] for l in result_leaves]
            ),
            None,
        )
        tr.log_importance_weight = float(log_weights[i])
        tr.log_prob_observed = float(lpo[i])
        tr.log_prob = float(lpt[i])
        traces.append(tr)
    return traces


def scan_smc_posterior(
    model,
    num_traces,
    observe=None,
    map_func=None,
    file_name=None,
    resample_threshold=0.5,
    resampling="systematic",
    likelihood_importance=1.0,
    mesh=None,
    proposal_step=None,
    args=(),
    kwargs=None,
):
    """O(T) particle filter over a MarkovModel; returns an Empirical
    (with ``log_evidence``) of results (``map_func`` named
    ``trace_result``), of full genealogy-correct Trace objects
    (``map_func=None``), or of ``map_func(trace)`` values — or None when
    the model is not jax-traceable (the caller falls back to staged
    replay)."""
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
    results_only = (
        map_func is not None
        and getattr(map_func, "__name__", "") == "trace_result"
    )
    materialize = not results_only
    cacheable = not args and not kwargs
    cache_key = (
        id(model),
        tuple(sorted(observe.keys())),
        likelihood_importance,
        float(resample_threshold),
        str(resampling),
        T,
        materialize,
    )
    # proposal_step identity is a freshness check, not part of the key
    # (retraining creates a new closure; see inference/smc.py)
    ps_id = id(proposal_step) if proposal_step is not None else None
    try:
        obs_arrays = {
            k: jnp.asarray(v, util.dtype()) for k, v in observe.items()
        }
        cached = _scan_smc_cache.get(cache_key) if cacheable else None
        if cached is not None and cached[0] == ps_id:
            _, program, step_names, sites_box = cached
        else:
            program, step_names, sites_box = _build_scan_smc(
                model,
                obs_arrays,
                likelihood_importance,
                resample_threshold,
                resampling,
                args,
                kwargs,
                proposal_step=proposal_step,
                materialize=materialize,
            )
            if cacheable:
                _scan_smc_cache[cache_key] = (
                    ps_id, program, step_names, sites_box
                )
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
        obs_all = {**obs_init, **obs_step}
        results, w, log_z, stats, extras = program(
            init_keys, step_keys, resample_keys, obs_init, obs_step,
            obs_all
        )
        results_host = jax.device_get(results)
        extras_host = jax.device_get(extras) if materialize else None
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
    if materialize:
        values = _materialize_scan_traces(
            sites_box, extras_host, results_host, log_weights,
            num_traces, T, proposal_step is not None,
        )
        if map_func is not None:
            values = [map_func(t) for t in values]
        emp = Empirical(file_name=file_name)
        for v, lw in zip(values, log_weights):
            if np.isfinite(lw):
                emp.add(v, log_weight=float(lw))
        emp.finalize()
    elif file_name is None and isinstance(results_host, np.ndarray):
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
    kind = "guided SMC" if proposal_step is not None else "SMC"
    emp.rename(
        f"Posterior, {kind} (scan, {T} steps), particles: {emp.length:,}, "
        f"ESS: {emp.effective_sample_size:,.2f}"
    )
    emp.add_metadata(
        op="posterior",
        num_traces=num_traces,
        inference_engine=(
            "InferenceEngine.SEQUENTIAL_MONTE_CARLO_WITH_INFERENCE_NETWORK"
            if proposal_step is not None
            else "InferenceEngine.SEQUENTIAL_MONTE_CARLO"
        ),
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
