"""Sequential Monte Carlo (particle filter) over the observe sequence.

Beyond parity: the reference has no SMC engine (its four engines are listed
at pyprob/util.py:49-53).  This one is TPU-native by construction — the
whole filter (every stage's forward pass, adaptive systematic resampling
between observes, weight bookkeeping, and the marginal-likelihood
estimate) compiles to ONE XLA program and runs as a single device dispatch.

Design: a universal-PPL program cannot be paused mid-trace, so resampling
uses **staged replay**: stage r re-executes the whole ``forward`` under
``jax.vmap`` with the controlled sample sites *before* observe r replayed
from the (possibly resampled) previous stage and every later site drawn
fresh.  Replayed prefixes make the re-execution statistically equivalent
to resuming each particle at its checkpoint; suffix sites have not yet
been weighted, so redrawing them is exact.  Cost is n_obs forward passes
— all batched, fused, and free of host round-trips.

Resampling is adaptive: systematic resampling (parallel.collectives)
triggers only when ESS drops below ``resample_threshold * num_particles``,
accumulating the standard stratified log-evidence estimate either way.

Caveat on the reported ESS: ``posterior.effective_sample_size`` is the
standard 1/sum(w^2) of the FINAL weights, which does not see genealogy
correlation — after a resampling step many particles share ancestors, so
the statistical accuracy of posterior expectations is lower than the
final-weight ESS suggests (estimates remain unbiased/consistent; the
run-to-run spread is what shrinks more slowly).  Use more particles, or
``Empirical.combine_duplicates`` to inspect support collapse.
"""

from __future__ import annotations

import time
import warnings

import numpy as np
import jax
import jax.numpy as jnp

from .. import util
from ..util import TraceMode, InferenceEngine
from ..distributions import Empirical
from ..parallel.collectives import (
    RESAMPLING_SCHEMES,
    resample_indices,
    sharded_effective_sample_size,
)


_smc_cache = {}


def _build_smc(model, obs_arrays, likelihood_importance, resample_threshold,
               results_only, args, kwargs, proposal_step=None,
               resampling="systematic"):
    """Build (jitted_program, sites, observe_addrs).  The program takes
    (run_keys [n_obs, N], resample_keys [n_obs-1], obs_arrays dict) and
    returns (final outputs, final log-weights [N], log_evidence scalar).

    With ``proposal_step`` (a trained IC network's vectorized step), every
    stage proposes from the network instead of the prior (amortized SMC);
    per-site prior-proposal corrections enter the incremental weight of
    the stage that commits the site."""
    from ..vectorized import run_traced

    sites_box = []
    engine = (
        InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK
        if proposal_step is not None
        else InferenceEngine.IMPORTANCE_SAMPLING
    )

    def single(key, obs, replay):
        outputs, handler = run_traced(
            model,
            key,
            obs,
            TraceMode.POSTERIOR,
            engine,
            likelihood_importance=likelihood_importance,
            proposal_step=proposal_step,
            replay_values=replay if replay else None,
            record_site_log_iws=proposal_step is not None,
            args=args,
            kwargs=kwargs,
        )
        if not sites_box:
            sites_box.append(handler.sites)
        return outputs

    vsingle = jax.vmap(single, in_axes=(0, None, 0))

    # one abstract evaluation (real observed shapes) to learn the static
    # site structure
    probe_keys = jax.random.split(jax.random.PRNGKey(0), 2)
    jax.eval_shape(vsingle, probe_keys, obs_arrays, {})
    sites = sites_box[0]

    observe_addrs = [s.address for s in sites if s.observed]
    n_obs = len(observe_addrs)
    if n_obs == 0:
        raise RuntimeError(
            "SEQUENTIAL_MONTE_CARLO requires at least one observed site"
        )
    # stage_of[addr] = number of observes executed before the site; run r
    # replays every controlled site with stage_of < r
    stage_of = {}
    seen = 0
    for s in sites:
        if s.observed:
            seen += 1
        elif s.control:
            stage_of[s.address] = seen

    def program(run_keys, resample_keys, obs_arrays):
        n_particles = run_keys.shape[1]
        outputs = vsingle(run_keys[0], obs_arrays, {})
        w = jnp.zeros((n_particles,), util.dtype())
        log_z = jnp.zeros((), util.dtype())
        log_n = jnp.log(jnp.asarray(n_particles, util.dtype()))
        ess_hist = []
        resampled = []
        for r in range(1, n_obs + 1):
            incr = outputs["log_probs"][observe_addrs[r - 1]]
            if proposal_step is not None:
                # prior-proposal correction for the sites this stage
                # commits (fresh in run r-1, replayed from run r on); the
                # final stage also commits everything after the last observe
                liws = outputs.get("site_log_iws", {})
                for a, st in stage_of.items():
                    commits = st == r - 1 or (r == n_obs and st >= r - 1)
                    if commits and a in liws:
                        incr = incr + liws[a]
            w = w + incr
            ess = sharded_effective_sample_size(w)
            ess_hist.append(ess)
            if r == n_obs:
                break
            do_resample = ess < resample_threshold * n_particles
            resampled.append(do_resample)
            idx = jnp.where(
                do_resample,
                resample_indices(
                    resample_keys[r - 1], w, n_particles, scheme=resampling
                ),
                jnp.arange(n_particles),
            )
            log_z = log_z + jnp.where(
                do_resample, jax.scipy.special.logsumexp(w) - log_n, 0.0
            )
            replay = {
                a: outputs["values"][a][idx]
                for a, st in stage_of.items()
                if st < r
            }
            w = jnp.where(do_resample, jnp.zeros_like(w), w)
            outputs = vsingle(run_keys[r], obs_arrays, replay)
        log_z = log_z + jax.scipy.special.logsumexp(w) - log_n
        if results_only:
            outputs = {"result": outputs["result"]}
        stats = (
            jnp.stack(ess_hist),
            jnp.stack(resampled)
            if resampled
            else jnp.zeros((0,), jnp.bool_),
        )
        return outputs, w, log_z, stats

    return jax.jit(program), sites, n_obs


def vectorized_smc_posterior(
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
    """SMC posterior over ``num_traces`` particles.  Returns an Empirical
    (with ``log_evidence`` metadata and attribute), or None if the model is
    not jax-traceable (caller falls back / raises).

    Unlike the IS path there is no chunking: resampling couples all
    particles, so they live in one on-device batch.  With a ``mesh`` the
    particle axis is sharded over the devices; the SPMD partitioner turns
    the ESS reduction and the cross-shard resampling gather into mesh
    collectives (the scaling-book recipe: annotate shardings, let XLA
    insert the collectives)."""
    from ..vectorized import _TraceabilityCache, _materialize_traces

    if _TraceabilityCache.known_untraceable(model):
        return None
    if not observe:
        raise RuntimeError(
            "SEQUENTIAL_MONTE_CARLO requires observe={...} values"
        )
    if any(v is None for v in observe.values()):
        raise RuntimeError(f"Observe has missing value(s): {observe}")
    if mesh is None and len(jax.devices()) > 1:
        from ..parallel import data_parallel_mesh

        mesh = data_parallel_mesh()
    if mesh is not None:
        from ..parallel import pad_to_multiple

        num_traces = pad_to_multiple(num_traces, mesh.size)

    results_only = getattr(map_func, "__name__", "") == "trace_result"

    # Scan-structured models get the O(T) lax.scan filter instead of the
    # O(T^2) staged replay — results-only callers get finalize outputs,
    # Trace/map_func callers get genealogy-reconstructed Traces (stacked
    # scan records + host ancestor walk; see smc_scan).  Guided filtering
    # requires a TIED-instance network (the scan program sees one static
    # address per step site; see InferenceNetwork tie_address_instances)
    # — untied networks fall back to staged replay.
    from ..markov import MarkovModel

    scan_ok = isinstance(model, MarkovModel)
    if scan_ok and proposal_step is not None:
        net = getattr(model, "_inference_network", None)
        scan_ok = net is not None and getattr(
            net, "_tie_address_instances", False
        )
    if scan_ok:
        from .smc_scan import scan_smc_posterior

        emp = scan_smc_posterior(
            model,
            num_traces,
            observe=observe,
            map_func=map_func,
            file_name=file_name,
            resample_threshold=resample_threshold,
            resampling=resampling,
            likelihood_importance=likelihood_importance,
            mesh=mesh,
            proposal_step=proposal_step,
            args=args,
            kwargs=kwargs,
        )
        if emp is not None:
            return emp

    t0 = time.time()
    cacheable = not args and not kwargs
    # proposal_step identity is a freshness check, not part of the key:
    # retraining creates a new closure, and keeping the old id keyed would
    # pin the stale compiled program (and its parameter pytree) forever
    if resampling not in RESAMPLING_SCHEMES:
        raise ValueError(
            f"Unknown resampling scheme {resampling!r}; choose one of "
            f"{sorted(RESAMPLING_SCHEMES)}"
        )
    cache_key = (
        id(model),
        tuple(sorted(observe.keys())),
        likelihood_importance,
        float(resample_threshold),
        str(resampling),
        results_only,
    )
    ps_id = id(proposal_step) if proposal_step is not None else None
    try:
        obs_arrays = {
            k: jnp.asarray(v, util.dtype()) for k, v in observe.items()
        }
        cached = _smc_cache.get(cache_key) if cacheable else None
        if cached is not None and cached[0] == ps_id:
            _, program, sites, n_obs = cached
        else:
            program, sites, n_obs = _build_smc(
                model,
                obs_arrays,
                likelihood_importance,
                resample_threshold,
                results_only,
                args,
                kwargs,
                proposal_step=proposal_step,
                resampling=resampling,
            )
            if cacheable:
                _smc_cache[cache_key] = ps_id, program, sites, n_obs
        flat_keys = util.next_keys(n_obs * num_traces)
        run_keys = flat_keys.reshape(
            (n_obs, num_traces) + flat_keys.shape[1:]
        )
        resample_keys = util.next_keys(max(n_obs - 1, 1))
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            run_keys = jax.device_put(
                run_keys, NamedSharding(mesh, P(None, "dp"))
            )
            repl = NamedSharding(mesh, P())
            resample_keys = jax.device_put(resample_keys, repl)
            obs_arrays = {
                k: jax.device_put(v, repl) for k, v in obs_arrays.items()
            }
        outputs, w, log_z, stats = program(
            run_keys, resample_keys, obs_arrays
        )
        host = jax.device_get(outputs)
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
            f"[pyprob_tpu] model {model.name!r} is not jax-traceable "
            f"({type(e).__name__}); SMC has no interpreter tier."
        )
        _TraceabilityCache.mark(model, False)
        return None
    _TraceabilityCache.mark(model, True)

    bad = ~np.isfinite(log_weights)
    if bad.any():
        warnings.warn(
            f"Discarding {bad.sum()} particles with nan/inf log_weight."
        )
        log_weights[bad] = -np.inf

    results_host = host["result"]
    if results_only and file_name is None and isinstance(results_host, np.ndarray):
        keep = np.isfinite(log_weights)
        emp = Empirical.from_arrays(
            np.asarray(results_host)[keep], log_weights[keep]
        )
    else:
        emp = Empirical(file_name=file_name)
        if map_func is None:
            values = _materialize_traces(
                sites, host, num_traces, None, results_host
            )
        elif results_only:
            leaves, treedef = jax.tree_util.tree_flatten(results_host)
            leaves = [np.asarray(l) for l in leaves]
            values = [
                jax.tree_util.tree_unflatten(treedef, [l[i] for l in leaves])
                for i in range(num_traces)
            ]
        else:
            values = [
                map_func(t)
                for t in _materialize_traces(
                    sites, host, num_traces, None, results_host
                )
            ]
        for v, lw in zip(values, log_weights):
            if np.isfinite(lw):
                emp.add(v, log_weight=float(lw))
        emp.finalize()

    duration = time.time() - t0
    emp.log_evidence = log_evidence
    kind = "guided SMC" if proposal_step is not None else "SMC"
    engine_name = (
        "InferenceEngine.SEQUENTIAL_MONTE_CARLO_WITH_INFERENCE_NETWORK"
        if proposal_step is not None
        else "InferenceEngine.SEQUENTIAL_MONTE_CARLO"
    )
    emp.rename(
        f"Posterior, {kind} (compiled, {n_obs} stages), particles: "
        f"{emp.length:,}, ESS: {emp.effective_sample_size:,.2f}"
    )
    emp.add_metadata(
        op="posterior",
        num_traces=num_traces,
        inference_engine=engine_name,
        effective_sample_size=emp.effective_sample_size,
        log_evidence=log_evidence,
        resample_threshold=resample_threshold,
        resampling=resampling,
        stages=n_obs,
        stage_ess=stage_ess,
        resampled_stages=resampled_stages,
        vectorized=True,
    )
    if util.verbosity() > 1:
        util.log_print(
            f"[SMC] {num_traces:,} particles x {n_obs} stages in "
            f"{duration:.3f}s, ESS {emp.effective_sample_size:,.1f}, "
            f"log Z {log_evidence:.4f}"
        )
    return emp


def _host_resample_indices(rng, log_weights, num_samples, scheme):
    """Host (numpy, float64) mirror of parallel.collectives.resample_indices
    for the interpreter tier."""
    w = np.exp(log_weights - log_weights.max())
    w = w / w.sum()
    n = num_samples
    if scheme == "systematic":
        points = (rng.random() + np.arange(n)) / n
    elif scheme == "stratified":
        points = (rng.random(n) + np.arange(n)) / n
    elif scheme == "multinomial":
        points = rng.random(n)
    elif scheme == "residual":
        counts = np.floor(n * w).astype(np.int64)
        det = np.repeat(np.arange(w.size), counts)
        rem = n - det.size
        resid = n * w - counts
        resid_sum = resid.sum()
        if rem == 0:
            return det[:n]
        if resid_sum <= 0.0:
            # Pathological underflow: every residual vanished but floor
            # counts fell short of n.  Pad deterministically so the result
            # always has exactly n indices (a short return would silently
            # shrink the particle set out of sync with the weight array).
            return np.concatenate([det, np.full(rem, int(np.argmax(w)))])
        resid_cdf = np.cumsum(resid / resid_sum)
        extra = np.minimum(
            np.searchsorted(resid_cdf, rng.random(rem)), w.size - 1
        )
        return np.concatenate([det, extra])
    else:
        raise ValueError(
            f"Unknown resampling scheme {scheme!r}; choose one of "
            f"{sorted(RESAMPLING_SCHEMES)}"
        )
    return np.minimum(np.searchsorted(np.cumsum(w), points), w.size - 1)


def interpreter_smc_posterior(
    model,
    num_traces,
    observe=None,
    map_func=None,
    file_name=None,
    resample_threshold=0.5,
    resampling="systematic",
    likelihood_importance=1.0,
    args=(),
    kwargs=None,
):
    """Host (interpreter-tier) SMC for models that are not jax-traceable —
    the universal-PPL fallback, mirroring the compiled filter's staged
    prefix-replay design one trace at a time.  Each stage re-runs every
    particle's forward with the controlled sites before the stage's observe
    replayed from its (resampled) ancestor via ``ctx.smc_replay_values``;
    control flow up to that observe is deterministic given those values, so
    divergent programs stay on their ancestor's path through the committed
    prefix.  Weight math is float64 on host.

    Executions may pass DIFFERENT numbers of observes (a universal-PPL
    possibility with no reference counterpart): the filter runs
    max-observes stages, and a particle past its last observe carries a
    zero weight increment — it has already reached the final target, so
    later stages leave its weight (and its fully-committed replay)
    unchanged while it keeps participating in resampling."""
    from scipy.special import logsumexp

    from .. import state
    from ..model import trace_id

    if not observe:
        raise RuntimeError(
            "SEQUENTIAL_MONTE_CARLO requires observe={...} values"
        )
    if resampling not in RESAMPLING_SCHEMES:
        raise ValueError(
            f"Unknown resampling scheme {resampling!r}; choose one of "
            f"{sorted(RESAMPLING_SCHEMES)}"
        )
    t0 = time.time()
    n = num_traces
    generator = model._trace_generator(
        trace_mode=TraceMode.POSTERIOR,
        inference_engine=InferenceEngine.IMPORTANCE_SAMPLING,
        observe=observe,
        likelihood_importance=likelihood_importance,
        *args,
        **(kwargs or {}),
    )

    def run_particle(replay):
        state._set_smc_replay(replay)
        try:
            return next(generator)
        finally:
            state._set_smc_replay(None)

    traces = [run_particle(None) for _ in range(n)]
    n_obs = max(len(t.variables_observed) for t in traces)
    if n_obs == 0:
        raise RuntimeError(
            "SEQUENTIAL_MONTE_CARLO requires at least one observed site"
        )

    rng = util.get_rng()
    w = np.zeros(n, dtype=np.float64)
    log_z = 0.0
    log_n = np.log(n)
    stage_ess = []
    resampled_stages = []
    for r in range(1, n_obs + 1):
        for i, t in enumerate(traces):
            # a particle past its last observe has reached the final
            # target: zero increment, weight carried forward unchanged
            if r <= len(t.variables_observed):
                w[i] += float(t.variables_observed[r - 1].log_prob)
        w[~np.isfinite(w)] = -np.inf
        ess = float(util.effective_sample_size(w))
        stage_ess.append(ess)
        if r == n_obs:
            break
        resampled_stages.append(ess < resample_threshold * n)
        if resampled_stages[-1]:
            log_z += float(logsumexp(w)) - log_n
            idx = _host_resample_indices(rng, w, n, resampling)
            ancestors = [traces[j] for j in idx]
            w[:] = 0.0
        else:
            ancestors = list(traces)
        new_traces = []
        for a in ancestors:
            replay = {}
            seen_obs = 0
            committed = True  # fully-committed traces replay whole
            for v in a.variables:
                if v.observed:
                    seen_obs += 1
                    if seen_obs >= r:
                        committed = False
                        break
                elif v.control:
                    replay[v.address] = v.value
            if committed:
                # no observe r: the trace is final — keep it verbatim
                # (re-running would re-randomize committed sites)
                new_traces.append(a)
            else:
                new_traces.append(run_particle(replay))
        traces = new_traces
    log_z += float(logsumexp(w)) - log_n

    if map_func is None:
        map_func = trace_id
    emp = Empirical(file_name=file_name)
    for t, lw in zip(traces, w):
        if np.isfinite(lw):
            emp.add(map_func(t), log_weight=float(lw))
    emp.finalize()
    duration = time.time() - t0
    emp.log_evidence = log_z
    emp.rename(
        f"Posterior, SMC (interpreter, {n_obs} stages), particles: "
        f"{emp.length:,}, ESS: {emp.effective_sample_size:,.2f}"
    )
    emp.add_metadata(
        op="posterior",
        num_traces=num_traces,
        inference_engine="InferenceEngine.SEQUENTIAL_MONTE_CARLO",
        effective_sample_size=emp.effective_sample_size,
        log_evidence=log_z,
        resample_threshold=resample_threshold,
        resampling=resampling,
        stages=n_obs,
        stage_ess=stage_ess,
        resampled_stages=resampled_stages,
        vectorized=False,
    )
    if util.verbosity() > 1:
        util.log_print(
            f"[SMC interp] {num_traces:,} particles x {n_obs} stages in "
            f"{duration:.3f}s, ESS {emp.effective_sample_size:,.1f}, "
            f"log Z {log_z:.4f}"
        )
    return emp
