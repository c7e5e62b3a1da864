"""Vectorized single-site Metropolis-Hastings: many parallel chains per chip.

The reference's LMH/RMH runs one strictly sequential chain in Python
(reference: pyprob/model.py:118-177).  Here, for models with static trace
structure, the whole chain step — site selection, program replay with value
substitution, acceptance test — is a jitted function ``lax.scan``-ed over
steps and ``vmap``-ed over chains, so hundreds of chains advance in
lockstep on one TPU chip.  Cross-chip chain sharding just shards the chain
axis over the mesh (see pyprob_tpu.parallel).

Because the structure is static, the reference's acceptance formula
(reference: model.py:151-162) simplifies: the trace-length terms cancel and
every controlled site except the perturbed one is "reused", giving

    log a = sum_{k != j} (lp_k' - lp_k) + t_j + (obs' - obs)

with t_j the RMH forward/reverse transition correction
(reference: state.py:235-256), zero for LMH.
"""

from __future__ import annotations

import math
import time
import warnings

import numpy as np
import jax
import jax.numpy as jnp

from .. import state, util
from ..util import TraceMode, InferenceEngine
from ..address import extract_address
from ..distributions import Normal, Uniform, TruncatedNormal, Empirical, Factor
from ..vectorized import VectorizedHandler, SiteRecord, run_traced, _TraceabilityCache
from ..trace import Variable, Trace

_RMH_ALPHA = 0.5


class ChainState:
    """Complete per-chain state of a vectorized MCMC run: every chain's
    current values, per-site log-probs, observed log-likelihood, and result.

    Returned on the posterior Empirical as ``.final_chain_state`` and
    accepted back via ``posterior(initial_trace=chain_state)``, so a C-chain
    run resumes every chain independently — the reference can only resume
    its one sequential chain via ``initial_trace=posterior[-1]``
    (reference: pyprob/model.py:122-127).  If the observation changed
    between runs, all chains are rescored by one replay pass before
    stepping."""

    def __init__(
        self,
        values,
        log_probs,
        log_prob_observed,
        result,
        inference_engine,
        observe_fingerprint,
    ):
        self.values = values  # {address: np [C, ...]}
        self.log_probs = log_probs  # {address: np [C]}
        self.log_prob_observed = log_prob_observed  # np [C]
        self.result = result  # pytree of np [C, ...]
        self.inference_engine = inference_engine
        self.observe_fingerprint = observe_fingerprint

    @property
    def num_chains(self):
        return int(np.asarray(self.log_prob_observed).shape[0])

    def save(self, file_name):
        import pickle

        with open(file_name, "wb") as f:
            pickle.dump(self, f, protocol=pickle.HIGHEST_PROTOCOL)

    @staticmethod
    def load(file_name):
        import pickle

        with open(file_name, "rb") as f:
            state_obj = pickle.load(f)
        if not isinstance(state_obj, ChainState):
            raise TypeError(
                f"{file_name} does not contain a ChainState "
                f"(got {type(state_obj).__name__})"
            )
        return state_obj

    def __repr__(self):
        return (
            f"ChainState(num_chains={self.num_chains}, "
            f"addresses={list(self.values.keys())})"
        )


def _observe_fingerprint(observe):
    return tuple(
        sorted(
            (k, np.asarray(v, np.float64).tobytes())
            for k, v in (observe or {}).items()
        )
    )


def _rmh_kernel(distribution, x):
    if isinstance(distribution, Normal):
        return Normal(x, distribution.stddev)
    if isinstance(distribution, Uniform):
        return TruncatedNormal(
            x,
            0.1 * (distribution.high - distribution.low),
            low=distribution.low,
            high=distribution.high,
        )
    return None


class ReplayHandler(VectorizedHandler):
    """Replays forward() substituting stored chain values at every
    controlled site except the perturbed one."""

    def __init__(
        self,
        key,
        observed,
        root_function_name,
        engine,
        current_values,
        current_log_probs,
        perturb_index,
    ):
        super().__init__(
            key=key,
            trace_mode=TraceMode.POSTERIOR,
            inference_engine=engine,
            observed=observed,
            root_function_name=root_function_name,
        )
        self.current_values = current_values
        self.current_log_probs = current_log_probs
        self.perturb_index = perturb_index  # traced int
        self.controlled_counter = 0
        self.reused_log_prob_diff = jnp.zeros((), util.dtype())
        self.transition_term = jnp.zeros((), util.dtype())

    def rejection_sample(self, attempt_fn, max_attempts=None):
        """Block-atomic MH kernel for rejection blocks.

        Block sites keep single-site granularity: when the perturbed index
        falls on block site i, the loop redraws ONLY site i fresh (others
        keep their stored values) until the acceptance predicate holds — a
        draw from site i's prior truncated to the acceptance region given
        the other values, whose normalizer is identical for the current
        and candidate states and cancels in the MH ratio.  This mirrors
        the interpreter tier's retry-with-reuse kernel and mixes far
        better than rerunning the whole block (an independence sampler).
        When the perturbed index is outside the block, the stored values
        replay and the acceptance indicator is recomputed under the
        candidate's outer latents: a violated indicator sends the ratio
        to -inf.

        Like pyprob_cpp's replace=true mode, replacement semantics target
        the unnormalized-indicator density: exact when the acceptance
        region depends only on values sampled inside the block (e.g.
        Marsaglia), biased by the truncation normalizer otherwise (IS and
        SMC stay exact either way — they sample the generative process).
        """
        from ..vectorized import (
            _RejectionAttemptHandler,
            _REJECTION_MAX_ATTEMPTS,
        )

        max_attempts = (
            int(max_attempts) if max_attempts else _REJECTION_MAX_ATTEMPTS
        )
        base_counts = dict(self.instance_counts)
        i0 = self.controlled_counter
        idx = jnp.asarray(self.perturb_index)
        j_rel = idx - i0  # within-block index of the perturbed site

        def run_attempt(key, selective):
            sub = _RejectionAttemptHandler(
                self, key, base_counts, use_proposal=False
            )
            if selective:
                sub.selective_fresh_idx = j_rel
            prev_rv = self.replay_values
            self.replay_values = self.current_values
            prev = state._set_handler(sub)
            try:
                out, accept = attempt_fn()
            finally:
                state._set_handler(prev)
                self.replay_values = prev_rv
            return out, jnp.asarray(accept).astype(bool).reshape(()), sub

        # candidate A: redraw the perturbed site only, retrying until the
        # acceptance predicate holds with the other stored values
        outA, accA, subA = run_attempt(self._next_key(), selective=True)
        K = len(subA.sites)
        out_leavesA, out_treedef = jax.tree_util.tree_flatten(outA)

        def cond(c):
            return jnp.logical_and(~c[2], c[1] < max_attempts)

        def body(c):
            key = c[0]
            key, sk = jax.random.split(key)
            out, acc, sub = run_attempt(sk, selective=True)
            return (
                key,
                c[1] + 1,
                acc,
                tuple(jax.tree_util.tree_leaves(out)),
                tuple(sub.values),
                tuple(sub.log_probs),
                tuple(sub.dist_leaves),
            )

        carry0 = (
            self.key,
            jnp.asarray(1, jnp.int32),
            accA,
            tuple(out_leavesA),
            tuple(subA.values),
            tuple(subA.log_probs),
            tuple(subA.dist_leaves),
        )
        fin = jax.lax.while_loop(cond, body, carry0)
        self.key = fin[0]
        fresh_ok = fin[2]
        fresh_out_leaves, fresh_vals, fresh_lps, fresh_leaves = (
            fin[3],
            fin[4],
            fin[5],
            fin[6],
        )

        # candidate B: replay stored values, recompute the indicator
        outB, accB, subB = run_attempt(self._next_key(), selective=False)

        self.controlled_counter += K
        in_block = jnp.logical_and(idx >= i0, idx < i0 + K)

        def sel(a, b):
            return jnp.where(in_block, a, b)

        final_vals = [sel(fresh_vals[i], subB.values[i]) for i in range(K)]
        final_lps = [sel(fresh_lps[i], subB.log_probs[i]) for i in range(K)]
        final_leaves = [
            tuple(
                sel(x, y)
                for x, y in zip(fresh_leaves[i], subB.dist_leaves[i])
            )
            for i in range(K)
        ]
        final_out_leaves = [
            sel(a, b)
            for a, b in zip(
                fresh_out_leaves, jax.tree_util.tree_leaves(outB)
            )
        ]

        cur_lps = [self.current_log_probs[s.address] for s in subA.sites]
        replay_lp_sum = sum(subB.log_probs)
        indicator = jnp.where(accB, 0.0, -jnp.inf)
        # in-block move on site j: the perturbed site's prior factor
        # cancels against the truncated-conditional proposal (forward and
        # reverse normalizers are equal — companions unchanged), but the
        # COMPANION sites keep their stored values under possibly-changed
        # parameters (e.g. p(b | a_new) when b's prior depends on a), so
        # their rescore deltas enter the ratio like any reused site
        in_block_diff = sum(
            jnp.where(
                jnp.asarray(i) == j_rel, 0.0, fresh_lps[i] - cur_lps[i]
            )
            for i in range(K)
        )
        self.reused_log_prob_diff = self.reused_log_prob_diff + jnp.where(
            in_block,
            # an overflowed loop (never accepted) invalidates the candidate
            in_block_diff + jnp.where(fresh_ok, 0.0, -jnp.inf),
            replay_lp_sum - sum(cur_lps) + indicator,
        )

        self.instance_counts = dict(subA.instance_counts)
        for i, site in enumerate(subA.sites):
            site.distribution = jax.tree_util.tree_unflatten(
                subA.treedefs[i], list(final_leaves[i])
            )
            self.log_prob_total = self.log_prob_total + final_lps[i]
            self._record(site, final_vals[i], final_lps[i])
        return jax.tree_util.tree_unflatten(
            out_treedef, list(final_out_leaves)
        )

    def sample(self, distribution, name=None, address=None, control=True,
               mask=None):
        # sample(mask=) is ignored here: scoring a masked-off site against
        # its prior is exact marginalization (the padded chain targets a
        # joint whose marginal over padding dims is the true posterior), so
        # the MH kernel needs no mask-specific terms
        control = True  # MCMC engines control every site (reference: state.py:165-166)
        if name is not None and name in self.observed:
            return super().sample(distribution, name=name, address=address,
                                  mask=mask)

        base, full, instance = self._make_address(
            address, distribution.address_suffix
        )
        i = self.controlled_counter
        self.controlled_counter += 1
        is_site = jnp.asarray(i) == self.perturb_index

        cur_value = self.current_values[full]
        cur_lp = self.current_log_probs[full]

        key = self._next_key()
        if self.inference_engine == InferenceEngine.RANDOM_WALK_METROPOLIS_HASTINGS:
            kernel_fwd = _rmh_kernel(distribution, cur_value)
        else:
            kernel_fwd = None

        if kernel_fwd is None:
            proposed = distribution._sample_jax(key, ())
            t_term = jnp.zeros((), util.dtype())
        else:
            k1, k2, k3 = jax.random.split(key, 3)
            walk = kernel_fwd._sample_jax(k1, ())
            fresh = distribution._sample_jax(k2, ())
            use_walk = jax.random.uniform(k3, ()) < _RMH_ALPHA
            proposed = jnp.where(use_walk, walk, fresh)
            prop_lp = distribution.log_prob(proposed, sum=True)
            kernel_rev = _rmh_kernel(distribution, proposed)
            # log q(old|new) + log p(new) - log q(new|old) - log p(old)
            # with q(.|x) = alpha k(.|x) + (1-alpha) p(.)
            log_q_rev = jnp.logaddexp(
                jnp.log(_RMH_ALPHA) + kernel_rev.log_prob(cur_value, sum=True),
                jnp.log(1 - _RMH_ALPHA) + cur_lp,
            )
            log_q_fwd = jnp.logaddexp(
                jnp.log(_RMH_ALPHA) + kernel_fwd.log_prob(proposed, sum=True),
                jnp.log(1 - _RMH_ALPHA) + prop_lp,
            )
            t_term = log_q_rev + prop_lp - log_q_fwd - cur_lp

        value = jnp.where(is_site, proposed, cur_value)
        log_prob = distribution.log_prob(value, sum=True)
        self.transition_term = self.transition_term + jnp.where(
            is_site, t_term, 0.0
        )
        # reused sites: accumulate candidate-vs-current log-prob difference
        self.reused_log_prob_diff = self.reused_log_prob_diff + jnp.where(
            is_site, 0.0, log_prob - cur_lp
        )
        self.log_prob_total = self.log_prob_total + log_prob
        self._record(
            SiteRecord(
                address_base=base,
                address=full,
                instance=instance,
                name=name,
                control=True,
                observed=False,
                tagged=False,
                distribution_name=distribution.name,
                distribution=distribution,
            ),
            value,
            log_prob,
        )
        return value


def _discover_structure(model, observe, engine, args, kwargs):
    """Trace forward() once to learn the static site list and shapes.
    Uses the shared jitted-run cache so repeated MCMC calls reuse the
    compiled warm-start program."""
    from ..vectorized import _get_jitted_run

    obs_arrays = {
        k: jnp.asarray(v, util.dtype()) for k, v in (observe or {}).items()
    }
    from ..util import PriorInflation

    init_fn, sites_box, _ = _get_jitted_run(
        model,
        TraceMode.POSTERIOR,
        engine,
        PriorInflation.DISABLED,
        1.0,
        args=args,
        kwargs=kwargs,
        obs_names=tuple((observe or {}).keys()),
    )
    return init_fn, obs_arrays, sites_box


# compiled chain programs, keyed so repeated posterior calls with the same
# model/engine/observe-names/shape reuse the scan executable (observed
# values are traced arguments, per the compiled-program invariants)
_chain_fn_cache = {}
_rescore_fn_cache = {}


def vectorized_mcmc_posterior(
    model,
    num_traces,
    inference_engine,
    map_func=None,
    observe=None,
    file_name=None,
    initial_trace=None,
    thinning_steps=None,
    num_chains=None,
    burn_in=None,
    mesh=None,
    return_chains=False,
    args=(),
    kwargs=None,
):
    """Run C parallel chains x S steps with C*S ~= num_traces.

    Chains shard over the device mesh (the chain axis is data-parallel, so
    XLA partitions the vmapped scan across chips with no collectives in
    the hot loop); step statistics aggregate on the host after the run.
    Returns an Empirical over post-burn-in states of all chains, or None if
    the model is not traceable (caller falls back to the interpreter tier).
    """
    kwargs = kwargs or {}
    resume_state = (
        initial_trace if isinstance(initial_trace, ChainState) else None
    )
    if _TraceabilityCache.known_untraceable(model):
        if resume_state is not None:
            raise ValueError(
                "ChainState resume requires the compiled MCMC tier, but "
                f"model {model.name!r} is not jax-traceable; resume the "
                "interpreter chain with a Trace instead."
            )
        return None
    observe_fp = _observe_fingerprint(observe)
    resume_obs_changed = (
        resume_state is not None
        and resume_state.observe_fingerprint != observe_fp
    )
    if resume_state is not None:
        initial_trace = None
    if mesh is None and len(jax.devices()) > 1:
        from ..parallel import data_parallel_mesh

        mesh = data_parallel_mesh()
    if num_chains is None:
        if resume_state is not None:
            num_chains = resume_state.num_chains
        else:
            # enough chains to fill the chip, but >= ~256 steps per chain so
            # each chain actually burns in and mixes
            num_chains = int(min(max(1, num_traces // 256), 1024))
    if mesh is not None:
        from ..parallel import pad_to_multiple

        num_chains = pad_to_multiple(num_chains, mesh.size)
    if thinning_steps is None:
        thinning_steps = 1
    # transition budget matches the interpreter tier: ~num_traces MCMC
    # transitions total, thinned to ~num_traces/thinning_steps samples
    # (reference: model.py:169-170); burn-in steps are run in addition so
    # the post-burn count is not eaten by warmup
    transitions_per_chain = max(1, -(-num_traces // num_chains))
    if burn_in is None:
        if resume_state is not None and not resume_obs_changed:
            # resumed chains are already at posterior states
            burn_in = 0
        else:
            # fresh run, or a resume under a CHANGED observation (chains sit
            # at the OLD posterior and must walk to the new one):
            # chains are warm-started from importance-resampled prior draws
            # (approximate posterior samples), so only short burn-in needed
            burn_in = max(8, transitions_per_chain // 10)
    num_steps = transitions_per_chain + burn_in
    t0 = time.time()

    init_fn, obs_arrays, sites_box = _discover_structure(
        model, observe, inference_engine, args, kwargs
    )
    # Warm-start pool: much larger than the chain count so the resampled
    # initial states are diverse approximate posterior draws.  On resume the
    # init pass is only needed to discover the site structure, so one row
    # per chain suffices.
    if resume_state is not None:
        init_pool = num_chains
    else:
        init_pool = int(max(num_chains, min(16384, 64 * num_chains)))
    try:
        init_keys = util.next_keys(init_pool)
        init_out = init_fn(init_keys, obs_arrays)
    except (
        jax.errors.ConcretizationTypeError,
        jax.errors.TracerArrayConversionError,
        jax.errors.TracerBoolConversionError,
        jax.errors.TracerIntegerConversionError,
        NotImplementedError,
        TypeError,
    ) as e:
        util.log_print(
            f"[pyprob_tpu] model {model.name!r} is not jax-traceable "
            f"({type(e).__name__}); falling back to sequential MCMC."
        )
        _TraceabilityCache.mark(model, False)
        if resume_state is not None:
            raise ValueError(
                "ChainState resume requires the compiled MCMC tier, but "
                f"model {model.name!r} is not jax-traceable; resume the "
                "interpreter chain with a Trace instead."
            ) from e
        return None
    sites = sites_box[0]
    # MCMC controls every sample site (the handler forces control=True for
    # MCMC engines); valueless observe sites (observed=False, control=False)
    # are predictive outputs and must NOT enter the perturbation set.
    controlled_addresses = [
        s.address
        for s in sites
        if s.control and (not s.observed) and (not s.tagged)
    ]
    K = len(controlled_addresses)
    if K == 0:
        raise RuntimeError(
            "Cannot run MCMC with no controlled sample sites in the model."
        )

    root_name = model.forward.__code__.co_name

    def _build_chain_fn():
        def chain(init_values, init_lps, init_obs, init_result, chain_key, obs):
            def step(carry, step_key):
                values, lps, obs_lp, result = carry
                k_site, k_run, k_accept = jax.random.split(step_key, 3)
                j = jax.random.randint(k_site, (), 0, K)
                handler = ReplayHandler(
                    key=k_run,
                    observed=obs,
                    root_function_name=root_name,
                    engine=inference_engine,
                    current_values=values,
                    current_log_probs=lps,
                    perturb_index=j,
                )
                prev = state._set_handler(handler)
                try:
                    cand_result = model.forward(*args, **kwargs)
                finally:
                    state._set_handler(prev)
                cand_values = {
                    s.address: v
                    for s, v in zip(handler.sites, handler.values)
                    if s.address in lps
                }
                cand_lps = {
                    s.address: lp
                    for s, lp in zip(handler.sites, handler.log_probs)
                    if s.address in lps
                }
                log_alpha = (
                    handler.reused_log_prob_diff
                    + handler.transition_term
                    + handler.log_prob_observed
                    - obs_lp
                )
                accept = jnp.log(
                    jax.random.uniform(k_accept, (), minval=1e-38)
                ) < log_alpha
                sel = lambda a, b: jax.tree_util.tree_map(
                    lambda x, y: jnp.where(accept, x, y), a, b
                )
                new_values = sel(cand_values, values)
                new_lps = sel(cand_lps, lps)
                new_obs = jnp.where(accept, handler.log_prob_observed, obs_lp)
                new_result = sel(cand_result, result)
                return (
                    (new_values, new_lps, new_obs, new_result),
                    (new_result, accept),
                )

            step_keys = jax.random.split(chain_key, num_steps)
            carry = (init_values, init_lps, init_obs, init_result)
            final, (results, accepts) = jax.lax.scan(step, carry, step_keys)
            return results, accepts, final

        # observed values are a traced (unbatched) argument: same compiled
        # program serves any observation with these names/shapes
        return jax.jit(jax.vmap(chain, in_axes=(0, 0, 0, 0, 0, None)))

    chain_cache_key = (
        id(model),
        inference_engine,
        K,
        num_steps,
        tuple(sorted((observe or {}).keys())),
    )
    cacheable = not args and not kwargs
    if cacheable and chain_cache_key in _chain_fn_cache:
        chain_fn = _chain_fn_cache[chain_cache_key]
    else:
        chain_fn = _build_chain_fn()
        if cacheable:
            _chain_fn_cache[chain_cache_key] = chain_fn

    need_rescore = False
    if resume_state is not None:
        # per-chain resume: every chain continues from its own final state
        # (ChainState from a previous run's .final_chain_state)
        missing = [
            a for a in controlled_addresses if a not in resume_state.values
        ]
        if missing:
            raise ValueError(
                f"ChainState does not cover controlled addresses {missing}; "
                "it was recorded for a different model or observe names."
            )
        take = np.arange(num_chains) % resume_state.num_chains
        init_values = {
            a: jnp.asarray(np.asarray(resume_state.values[a])[take])
            for a in controlled_addresses
        }
        init_lps = {
            a: jnp.asarray(np.asarray(resume_state.log_probs[a])[take])
            for a in controlled_addresses
        }
        init_obs = jnp.asarray(
            np.asarray(resume_state.log_prob_observed)[take]
        )
        init_result = jax.tree_util.tree_map(
            lambda r: jnp.asarray(np.asarray(r)[take]), resume_state.result
        )
        # a changed observation invalidates the stored likelihoods
        need_rescore = resume_obs_changed
    else:
        # Importance-resampled warm start: the init pass drew each chain's
        # state from the prior and scored the observations, which is exactly
        # an IS run with prior proposals — resampling chains by those
        # weights initializes every chain with an approximate posterior draw
        # (a capability the batch tier makes free; no reference counterpart).
        init_log_w = np.asarray(
            init_out["log_prob_observed"], dtype=np.float64
        )
        probs = util.log_weights_to_probs(init_log_w)
        resample_idx = util.get_rng().choice(
            init_pool, size=num_chains, p=probs
        )

        # chain resume from a single Trace: (e.g. posterior[-1] from an
        # interpreter-tier run, reference: model.py:122-127) seeds every
        # chain's state with its values; the warm-start pool is bypassed
        # for addresses it covers
        initial_values = {}
        if initial_trace is not None:
            if not hasattr(initial_trace, "variables_dict_address"):
                raise TypeError(
                    "initial_trace must be a Trace or a ChainState (e.g. "
                    "posterior.final_chain_state from a previous vectorized "
                    f"run), got {type(initial_trace).__name__}."
                )
            for addr in controlled_addresses:
                v = initial_trace.variables_dict_address.get(addr)
                if v is not None and v.value is not None:
                    initial_values[addr] = np.asarray(v.value)

        def _init_value(a):
            base = np.asarray(init_out["values"][a])
            if a in initial_values:
                return jnp.asarray(
                    np.broadcast_to(
                        initial_values[a], (num_chains,) + base.shape[1:]
                    ).copy()
                )
            return jnp.asarray(base[resample_idx])

        init_values = {a: _init_value(a) for a in controlled_addresses}
        init_lps = {
            a: jnp.asarray(np.asarray(init_out["log_probs"][a])[resample_idx])
            for a in controlled_addresses
        }
        init_obs = jnp.asarray(
            np.asarray(init_out["log_prob_observed"])[resample_idx]
        )
        init_result = jax.tree_util.tree_map(
            lambda r: jnp.asarray(np.asarray(r)[resample_idx]),
            init_out["result"],
        )
        need_rescore = bool(initial_values)

    if need_rescore:
        # substituted values invalidate the stored per-site log-probs and
        # observed likelihood; one replay pass with no site perturbed
        # (perturb_index=-1 never matches) rescores everything consistently.
        # Observed values are a traced ARGUMENT and the jitted fn is cached,
        # so repeated resumes under new observations reuse the executable
        # (the compiled-program invariant, CLAUDE.md).
        def rescore(values, lps, key, obs):
            handler = ReplayHandler(
                key=key,
                observed=obs,
                root_function_name=root_name,
                engine=InferenceEngine.LIGHTWEIGHT_METROPOLIS_HASTINGS,
                current_values=values,
                current_log_probs=lps,
                perturb_index=jnp.asarray(-1),
            )
            prev = state._set_handler(handler)
            try:
                result = model.forward(*args, **kwargs)
            finally:
                state._set_handler(prev)
            new_values = {
                s.address: v
                for s, v in zip(handler.sites, handler.values)
                if s.address in lps
            }
            new_lps = {
                s.address: lp
                for s, lp in zip(handler.sites, handler.log_probs)
                if s.address in lps
            }
            return new_values, new_lps, handler.log_prob_observed, result

        rescore_key = (
            id(model),
            K,
            tuple(sorted((observe or {}).keys())),
        )
        if cacheable and rescore_key in _rescore_fn_cache:
            rescore_fn = _rescore_fn_cache[rescore_key]
        else:
            rescore_fn = jax.jit(jax.vmap(rescore, in_axes=(0, 0, 0, None)))
            if cacheable:
                _rescore_fn_cache[rescore_key] = rescore_fn
        init_values, init_lps, init_obs, init_result = rescore_fn(
            init_values, init_lps, util.next_keys(num_chains), obs_arrays
        )
    chain_keys = util.next_keys(num_chains)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        shard = NamedSharding(mesh, P("dp"))
        put = lambda tree: jax.tree_util.tree_map(
            lambda a: jax.device_put(a, shard), tree
        )
        init_values = put(init_values)
        init_lps = put(init_lps)
        init_obs = jax.device_put(init_obs, shard)
        init_result = put(init_result)
        chain_keys = jax.device_put(chain_keys, shard)

    results, accepts, final_carry = chain_fn(
        init_values, init_lps, init_obs, init_result, chain_keys, obs_arrays
    )
    results = jax.device_get(results)  # [C, S, ...]
    accepts = np.asarray(jax.device_get(accepts))
    accept_rate = float(accepts.mean())
    fin_values, fin_lps, fin_obs, fin_result = jax.device_get(final_carry)
    final_state = ChainState(
        values={a: np.asarray(v) for a, v in fin_values.items()},
        log_probs={a: np.asarray(v) for a, v in fin_lps.items()},
        log_prob_observed=np.asarray(fin_obs),
        result=jax.tree_util.tree_map(np.asarray, fin_result),
        inference_engine=inference_engine,
        observe_fingerprint=observe_fp,
    )

    if return_chains:
        # one Empirical of kept values per chain — feeds convergence
        # diagnostics (R-hat across chains, diagnostics.gelman_rubin_values)
        chains_out = []
        kept = list(range(burn_in, num_steps, thinning_steps))
        for c in range(num_chains):
            vals = [
                jax.tree_util.tree_map(lambda r: np.asarray(r[c][s]), results)
                for s in kept
            ]
            chain_emp = Empirical.from_arrays(vals)
            chain_emp.final_chain_state = final_state
            chains_out.append(chain_emp)
        return chains_out

    # post-burn-in, thinned, chains interleaved
    if map_func is not None and getattr(map_func, "__name__", "") != "trace_result":
        warnings.warn(
            "Vectorized MCMC returns result values; custom map_func over "
            "full traces requires the interpreter tier."
        )
    emp = Empirical(file_name=file_name)
    kept_steps = range(burn_in, num_steps, thinning_steps)
    is_single_array = isinstance(results, np.ndarray)
    for s_idx in kept_steps:
        for c in range(num_chains):
            if is_single_array:
                value = results[c, s_idx]
            else:
                value = jax.tree_util.tree_map(
                    lambda r: np.asarray(r[c][s_idx]), results
                )
            emp.add(value, log_weight=0.0)
    emp.finalize()
    duration = time.time() - t0
    engine_name = (
        "LMH"
        if inference_engine == InferenceEngine.LIGHTWEIGHT_METROPOLIS_HASTINGS
        else "RMH"
    )
    total_steps = num_chains * num_steps
    if util.verbosity() > 1:
        util.log_print(
            f"[compiled tier] {engine_name}: {num_chains} chains x {num_steps} "
            f"steps = {total_steps:,} transitions in {duration:.3f}s "
            f"({total_steps / max(duration, 1e-9):,.0f} transitions/s), "
            f"accept {100 * accept_rate:.1f}%"
        )
    emp.rename(
        f"Posterior, {engine_name} (compiled, {num_chains} chains), "
        f"samples: {emp.length:,}, accepted: {100 * accept_rate:,.2f}%"
    )
    emp.add_metadata(
        op="posterior",
        num_traces=num_traces,
        inference_engine=str(inference_engine),
        num_chains=num_chains,
        num_steps=num_steps,
        burn_in=burn_in,
        thinning_steps=thinning_steps,
        acceptance_rate=accept_rate,
        resumed=resume_state is not None,
        vectorized=True,
    )
    emp.final_chain_state = final_state
    return emp
