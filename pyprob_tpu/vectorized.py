"""Compiled execution tier: batched trace execution under jax.vmap/jit.

This is the TPU-native replacement for the reference's one-trace-at-a-time
Python loop (reference: pyprob/model.py:47-88 hot loop).  The user's
``Model.forward`` is traced **once** under ``jax.vmap``; every
``pyprob_tpu.sample`` / ``observe`` call inside it is intercepted by a
handler installed in ``pyprob_tpu.state`` and becomes a batched device op.
N particles then execute as a single XLA program: per-site sampling and
log-pdf scoring fuse onto the VPU/MXU, importance weights accumulate as a
[N] vector on device, and ESS/normalization are single fused reductions.

Models with data-dependent Python control flow (e.g. unbounded rejection
loops) raise under tracing; callers fall back to the interpreter tier
automatically, preserving the universal-PPL contract.
"""

from __future__ import annotations

import math
import os
import time
import warnings

import numpy as np
import jax
import jax.numpy as jnp

from . import state, util
from .util import TraceMode, PriorInflation, InferenceEngine
from .address import extract_address
from .distributions import Normal, Categorical, Empirical, Factor
from .trace import Variable, Trace


class SiteRecord:
    """Static (host-side) record of one sample/observe site encountered
    while tracing forward()."""

    __slots__ = (
        "address_base",
        "address",
        "instance",
        "name",
        "control",
        "observed",
        "tagged",
        "distribution_name",
        "distribution",
        "dist_treedef",
        "rejection",  # True for sites inside a rejection_sample block
    )

    def __init__(self, **kw):
        for k in self.__slots__:
            setattr(self, k, kw.get(k))


class VectorizedHandler:
    """Effect handler active while forward() is being traced.

    Holds traced values (rng key, accumulating log-probs) as attributes —
    mutation is fine because tracing is single-threaded and happens once.
    """

    def __init__(
        self,
        key,
        trace_mode,
        inference_engine,
        observed,
        root_function_name,
        prior_inflation=PriorInflation.DISABLED,
        likelihood_importance=1.0,
        address_dictionary=None,
        proposal_step=None,
        replay_values=None,
        record_site_log_iws=False,
    ):
        self.key = key
        self.trace_mode = trace_mode
        self.inference_engine = inference_engine
        self.observed = observed or {}
        self.root_function_name = root_function_name
        self.prior_inflation = prior_inflation
        self.likelihood_importance = likelihood_importance
        self.address_dictionary = address_dictionary
        self.proposal_step = proposal_step  # callable(site, dist, key) -> (value, proposal_log_prob) for IC
        # replay_values: {full_address: traced value} — controlled sites in
        # the dict take the given value instead of sampling (SMC prefix
        # replay after resampling; pyprob_tpu.inference.smc)
        self.replay_values = replay_values or None
        # per-site prior-proposal deltas are extra [N] outputs only guided
        # SMC consumes; keep them out of guided-IS transfers
        self.record_site_log_iws = record_site_log_iws
        if proposal_step is not None and hasattr(proposal_step, "reset"):
            proposal_step.reset()  # fresh per-trace state (LSTM hidden etc.)
        self.sites = []  # [SiteRecord]
        self.values = []  # traced value per site
        self.log_probs = []  # traced scalar log_prob per site (None for tags)
        self.site_log_iws = []  # per-site prior-proposal delta (IC sites)
        self.site_masks = []  # per-site 1/0 activity (sample(mask=) sites)
        self.dist_leaves = []  # flattened distribution params per site
        self.instance_counts = {}
        self.log_importance_weight = jnp.zeros((), util.dtype())
        self.log_prob_observed = jnp.zeros((), util.dtype())
        self.log_prob_total = jnp.zeros((), util.dtype())

    # -- internals ---------------------------------------------------------
    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def _make_address(self, address, suffix):
        if address is None:
            base = extract_address(self.root_function_name) + "__" + suffix
        else:
            base = address + "__" + suffix
        if self.address_dictionary is not None:
            base = self.address_dictionary.address_to_id(base)
        instance = self.instance_counts.get(base, 0) + 1
        self.instance_counts[base] = instance
        return base, base + "__" + str(instance), instance

    def _inflate(self, distribution):
        if self.prior_inflation == PriorInflation.ENABLED:
            if isinstance(distribution, Categorical):
                n = distribution.num_categories
                return Categorical(probs=jnp.full((n,), 1.0 / n, util.dtype()))
            if isinstance(distribution, Normal):
                return Normal(distribution.mean, distribution.stddev * 3)
        return None

    def _record(self, site, value, log_prob, log_iw=None, mask=None):
        # flatten the site's distribution so per-trace parameter values can
        # be rebuilt on the host (pruned training traces need prior params)
        if site.distribution is not None:
            leaves, treedef = jax.tree_util.tree_flatten(site.distribution)
            site.dist_treedef = treedef
            self.dist_leaves.append(leaves)
        else:
            site.dist_treedef = None
            self.dist_leaves.append(None)
        self.sites.append(site)
        self.values.append(value)
        self.log_probs.append(log_prob)
        self.site_log_iws.append(log_iw)
        self.site_masks.append(mask)

    # -- the effect API ----------------------------------------------------
    def sample(self, distribution, name=None, address=None, control=True,
               mask=None):
        # mask=False marks the site structurally inactive (fixed-bound
        # variable-structure programs): the value is still drawn and
        # prior-scored — exact marginalization for every likelihood-based
        # engine — but IC proposes it from the PRIOR with zero weight
        # correction (a q-vs-p delta at an irrelevant site is pure weight
        # variance) and the training loss excludes it.  Reduced with all()
        # like observe(mask=) (both tiers in lockstep).
        m = None if mask is None else jnp.all(jnp.asarray(mask))
        # MCMC engines control every sample site (reference: state.py:165-166)
        if self.inference_engine in (
            InferenceEngine.LIGHTWEIGHT_METROPOLIS_HASTINGS,
            InferenceEngine.RANDOM_WALK_METROPOLIS_HASTINGS,
        ):
            control = True
        base, full, instance = self._make_address(
            address, distribution.address_suffix
        )
        if name is not None and name in self.observed:
            value = jnp.asarray(self.observed[name], util.dtype())
            log_prob = self.likelihood_importance * distribution.log_prob(
                value, sum=True
            )
            if m is not None:
                # observed-by-name: the mask gates the likelihood term,
                # exactly like observe(mask=)
                log_prob = jnp.where(m, log_prob, jnp.zeros((), util.dtype()))
            if self.inference_engine in (
                InferenceEngine.IMPORTANCE_SAMPLING,
                InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK,
            ):
                self.log_importance_weight = self.log_importance_weight + log_prob
            self.log_prob_observed = self.log_prob_observed + log_prob
            self.log_prob_total = self.log_prob_total + log_prob
            self._record(
                SiteRecord(
                    address_base=base,
                    address=full,
                    instance=instance,
                    name=name,
                    control=False,
                    observed=True,
                    tagged=False,
                    distribution_name=distribution.name,
                    distribution=distribution,
                ),
                value,
                log_prob,
                mask=m,
            )
            return value

        if (
            self.replay_values is not None
            and control
            and full in self.replay_values
        ):
            value = self.replay_values[full]
            site = SiteRecord(
                address_base=base,
                address=full,
                instance=instance,
                name=name,
                control=True,
                observed=False,
                tagged=False,
                distribution_name=distribution.name,
                distribution=distribution,
            )
            if self.proposal_step is not None:
                # advance the proposal network's recurrent state through
                # the replayed site (guided SMC keeps the LSTM chain intact)
                self.proposal_step(
                    site,
                    distribution,
                    self._next_key(),
                    self.observed,
                    forced_value=value,
                )
            log_prob = distribution.log_prob(value, sum=True)
            self.log_prob_total = self.log_prob_total + log_prob
            self._record(site, value, log_prob, mask=m)
            return value

        key = self._next_key()
        if (
            self.trace_mode == TraceMode.POSTERIOR
            and self.inference_engine
            == InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK
            and control
            and self.proposal_step is not None
        ):
            site = SiteRecord(
                address_base=base,
                address=full,
                instance=instance,
                name=name,
                control=True,
                observed=False,
                tagged=False,
                distribution_name=distribution.name,
                distribution=distribution,
            )
            # observed dict passed through so the network's observe
            # embedding is computed from traced values — the compiled
            # program is reused across different observations
            if m is not None and getattr(
                self.proposal_step, "supports_mask", False
            ):
                # masked-off lanes draw from the PRIOR (matches training
                # traces) and carry no q-vs-p correction
                value, proposal_log_prob = self.proposal_step(
                    site, distribution, key, self.observed, mask=m
                )
                log_prob = distribution.log_prob(value, sum=True)
                delta = jnp.where(
                    m,
                    log_prob - proposal_log_prob,
                    jnp.zeros((), util.dtype()),
                )
            else:
                value, proposal_log_prob = self.proposal_step(
                    site, distribution, key, self.observed
                )
                log_prob = distribution.log_prob(value, sum=True)
                delta = log_prob - proposal_log_prob
            self.log_importance_weight = self.log_importance_weight + delta
            self.log_prob_total = self.log_prob_total + log_prob
            self._record(
                site,
                value,
                log_prob,
                log_iw=(delta if self.record_site_log_iws else None),
                mask=m,
            )
            return value

        inflated = self._inflate(distribution) if control else None
        proposal = inflated if inflated is not None else distribution
        value = proposal._sample_jax(key, ())
        log_prob = distribution.log_prob(value, sum=True)
        if inflated is not None:
            self.log_importance_weight = (
                self.log_importance_weight
                + log_prob
                - inflated.log_prob(value, sum=True)
            )
        if control:
            self.log_prob_total = self.log_prob_total + log_prob
        self._record(
            SiteRecord(
                address_base=base,
                address=full,
                instance=instance,
                name=name,
                control=control,
                observed=False,
                tagged=False,
                distribution_name=distribution.name,
                distribution=distribution,
            ),
            value,
            log_prob,
            mask=m,
        )
        return value

    def observe(self, distribution, value=None, name=None, address=None, mask=None):
        # mask may be a traced per-particle boolean: a masked-off
        # observation contributes zero log-density/weight, so
        # variable-length observation sequences compile as fixed-bound
        # loops (one program per bound, not per data size)
        base, full, instance = self._make_address(
            address, distribution.address_suffix
        )
        if name is not None and name in self.observed:
            value = jnp.asarray(self.observed[name], util.dtype())
        elif value is not None:
            value = jnp.asarray(value, util.dtype())
        elif (
            self.trace_mode == TraceMode.PRIOR_FOR_INFERENCE_NETWORK
            and not isinstance(distribution, Factor)
        ):
            value = distribution._sample_jax(self._next_key(), ())

        if value is None and not isinstance(distribution, Factor):
            self._record(
                SiteRecord(
                    address_base=base,
                    address=full,
                    instance=instance,
                    name=name,
                    control=False,
                    observed=False,
                    tagged=False,
                    distribution_name=distribution.name,
                    distribution=distribution,
                ),
                None,
                None,
            )
            return None

        log_prob = self.likelihood_importance * distribution.log_prob(
            value, sum=True
        )
        if mask is not None:
            # reduce like the interpreter tier (np.all): the mask gates the
            # whole observation, and log_prob is already summed to a scalar
            log_prob = jnp.where(
                jnp.all(jnp.asarray(mask)),
                log_prob,
                jnp.zeros((), util.dtype()),
            )
        if self.inference_engine in (
            InferenceEngine.IMPORTANCE_SAMPLING,
            InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK,
        ):
            self.log_importance_weight = self.log_importance_weight + log_prob
        self.log_prob_observed = self.log_prob_observed + log_prob
        self.log_prob_total = self.log_prob_total + log_prob
        self._record(
            SiteRecord(
                address_base=base,
                address=full,
                instance=instance,
                name=name,
                control=False,
                observed=True,
                tagged=False,
                distribution_name=distribution.name,
                distribution=distribution,
            ),
            value,
            log_prob,
        )
        return value

    def factor(self, log_prob=None, log_prob_func=None, name=None, address=None, mask=None):
        dist = Factor(log_prob=log_prob, log_prob_func=log_prob_func)
        return self.observe(dist, name=name, address=address, mask=mask)

    def tag(self, value, name=None, address=None):
        if address is None:
            base = extract_address(self.root_function_name) + "__None"
        else:
            base = address + "__None"
        instance = self.instance_counts.get(base, 0) + 1
        self.instance_counts[base] = instance
        self._record(
            SiteRecord(
                address_base=base,
                address=base + "__" + str(instance),
                instance=instance,
                name=name,
                control=False,
                observed=False,
                tagged=True,
                distribution_name=None,
                distribution=None,
            ),
            jnp.asarray(value),
            None,
        )

    def rejection_sample(self, attempt_fn, max_attempts=None):
        """Compiled rejection loop: the attempt body becomes a
        ``lax.while_loop`` with replacement semantics, so Marsaglia-style
        models execute as full particle batches (vmap batches the loop —
        lanes that accepted early are masked while stragglers retry).

        Inference-network proposals drive EVERY attempt when the engine is
        guided IS: the proposal network's recurrent state (LSTM hidden,
        previous-site embedding inputs) threads through the while_loop
        carry — each retry restarts from the pre-block snapshot, and the
        accepted attempt's end state continues the outer trace, matching
        what training saw (training traces record only accepted attempts).
        Retries propose from the defensive mixture ``π·q + (1−π)·prior``
        (π=0.5, Hesterberg 1995) so a rejected attempt's weight factor is
        bounded by ``1/(1−π)``.
        The importance weight accumulates the prior−proposal correction of
        every attempt *executed* — exact by the extended-space argument:
        both the target process (attempts from p until accept) and the
        proposal process (attempts from q until accept) define densities
        over the sequence of executed attempts, whose ratio is
        ``Π_i p(x_i)/q(x_i)``.  Under guided SMC (replay / per-site weight
        attribution) retries fall back to the prior with the first
        attempt's correction counted unconditionally — also exact, by the
        same argument with q = p on retries.  Particles unaccepted after
        ``max_attempts`` get weight -inf and are discarded.
        """
        max_attempts = int(max_attempts) if max_attempts else _REJECTION_MAX_ATTEMPTS
        base_counts = dict(self.instance_counts)
        # guided-IS retries re-run the proposal network inside the loop
        # body; needs snapshot/restore of its recurrent state (stateless
        # steps expose trivial get/set) and exclusive weight accounting
        # (guided SMC attributes per-site deltas to stages, so it keeps
        # the first-attempt-only scheme)
        ic_retry = (
            self.proposal_step is not None
            and self.trace_mode == TraceMode.POSTERIOR
            and self.inference_engine
            == InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK
            and self.replay_values is None
            and not self.record_site_log_iws
            and hasattr(self.proposal_step, "get_state")
            and hasattr(self.proposal_step, "set_state")
        )
        s0 = self.proposal_step.get_state() if ic_retry else None

        def run_attempt(key, use_proposal, defensive=None):
            sub = _RejectionAttemptHandler(
                self, key, base_counts, use_proposal, defensive=defensive
            )
            prev = state._set_handler(sub)
            try:
                out, accept = attempt_fn()
            finally:
                state._set_handler(prev)
            return out, jnp.asarray(accept).astype(bool).reshape(()), sub

        # first attempt runs inline: discovers the (static) site set and is
        # the only attempt that may use a learned proposal
        out0, accept0, sub0 = run_attempt(self._next_key(), use_proposal=True)
        if not sub0.sites:
            raise RuntimeError(
                "rejection_sample block contains no sample sites"
            )
        for iw in sub0.log_iws:
            if iw is not None:
                self.log_importance_weight = self.log_importance_weight + iw
        self.instance_counts = dict(sub0.instance_counts)
        if ic_retry:
            s1_dyn, s1_static = self.proposal_step.get_state()
            s1_leaves, s1_treedef = jax.tree_util.tree_flatten(s1_dyn)

        replay_all = self.replay_values is not None and all(
            s.address in self.replay_values for s in sub0.sites
        )
        out_leaves0, out_treedef = jax.tree_util.tree_flatten(out0)

        if replay_all or max_attempts <= 1:
            # replayed values were accepted when first produced; no loop
            accept = accept0
            final_out_leaves = tuple(out_leaves0)
            final_values = tuple(sub0.values)
            final_lps = tuple(sub0.log_probs)
            final_dist_leaves = tuple(sub0.dist_leaves)
            if not replay_all:
                # max_attempts=1: unaccepted lanes must still be discarded
                # (every mode — prior/training traces included, matching
                # the interpreter tier)
                self.log_importance_weight = (
                    self.log_importance_weight
                    + jnp.where(accept, 0.0, -jnp.inf)
                )
        else:
            def cond(carry):
                return jnp.logical_and(~carry[2], carry[1] < max_attempts)

            def body(carry):
                key = carry[0]
                key, sub_key = jax.random.split(key)
                if ic_retry:
                    # each attempt restarts the proposal network from the
                    # pre-block snapshot (training saw only accepted
                    # attempts, so retries must not see rejected ones)
                    self.proposal_step.set_state(s0)
                out, acc, sub = run_attempt(
                    sub_key,
                    use_proposal=ic_retry,
                    # retries propose from the defensive mixture
                    # π·q + (1−π)·prior: a REJECTED attempt's p/q enters
                    # the weight with no compensating likelihood, and the
                    # mixture caps that factor at 1/(1−π)
                    defensive=(
                        _REJECTION_DEFENSIVE_PI
                        if ic_retry
                        and getattr(
                            self.proposal_step, "supports_defensive", False
                        )
                        else None
                    ),
                )
                delta = jnp.zeros((), util.dtype())
                for iw in sub.log_iws:
                    if iw is not None:
                        delta = delta + iw
                if ic_retry:
                    dyn, static = self.proposal_step.get_state()
                    if static != s1_static:
                        raise RuntimeError(
                            "proposal state structure changed across "
                            "rejection attempts"
                        )
                    pstate = tuple(jax.tree_util.tree_leaves(dyn))
                else:
                    pstate = ()
                return (
                    key,
                    carry[1] + 1,
                    acc,
                    tuple(jax.tree_util.tree_leaves(out)),
                    tuple(sub.values),
                    tuple(sub.log_probs),
                    tuple(sub.dist_leaves),
                    carry[7] + delta,
                    pstate,
                )

            carry0 = (
                self.key,
                jnp.asarray(1, jnp.int32),
                accept0,
                tuple(out_leaves0),
                tuple(sub0.values),
                tuple(sub0.log_probs),
                tuple(sub0.dist_leaves),
                jnp.zeros((), util.dtype()),
                tuple(s1_leaves) if ic_retry else (),
            )
            final = jax.lax.while_loop(cond, body, carry0)
            self.key = final[0]
            accept = final[2]
            final_out_leaves = final[3]
            final_values = final[4]
            final_lps = final[5]
            final_dist_leaves = final[6]
            # retries' prior−proposal corrections (0 for lanes that
            # accepted on the first attempt, and whenever ic_retry is off)
            self.log_importance_weight = (
                self.log_importance_weight
                + final[7]
                + jnp.where(accept, 0.0, -jnp.inf)
            )
            if ic_retry:
                # continue the outer trace from the accepted attempt's
                # proposal-network state (per-lane select done by the loop)
                self.proposal_step.set_state(
                    (
                        jax.tree_util.tree_unflatten(
                            s1_treedef, list(final[8])
                        ),
                        s1_static,
                    )
                )

        for i, site in enumerate(sub0.sites):
            dist = jax.tree_util.tree_unflatten(
                sub0.treedefs[i], list(final_dist_leaves[i])
            )
            site.distribution = dist
            lp = final_lps[i]
            if site.control:
                self.log_prob_total = self.log_prob_total + lp
            self._record(
                site,
                final_values[i],
                lp,
                log_iw=(
                    sub0.log_iws[i] if self.record_site_log_iws else None
                ),
            )
        return jax.tree_util.tree_unflatten(
            out_treedef, list(final_out_leaves)
        )


_REJECTION_MAX_ATTEMPTS = 64
# mixture weight on the learned proposal for rejection-retry attempts
# (defensive importance sampling, Hesterberg 1995)
_REJECTION_DEFENSIVE_PI = 0.5


class _RejectionAttemptHandler:
    """Handler installed while one rejection attempt is traced.  Records
    the attempt's sites/values/log-probs without touching the outer
    handler's accumulators; the outer ``rejection_sample`` commits the
    accepted attempt's records."""

    _make_address = VectorizedHandler._make_address

    def __init__(self, outer, key, base_counts, use_proposal, defensive=None):
        self.outer = outer
        self.key = key
        self.root_function_name = outer.root_function_name
        self.address_dictionary = outer.address_dictionary
        self.instance_counts = dict(base_counts)
        self.use_proposal = use_proposal
        self.defensive = defensive  # mixture weight on q for retry proposals
        # traced within-block site index to redraw fresh even when the
        # outer replay dict pins the address (single-site MCMC moves inside
        # a block, pyprob_tpu.inference.mcmc.ReplayHandler.rejection_sample)
        self.selective_fresh_idx = None
        self._site_counter = 0
        self.sites = []
        self.values = []
        self.log_probs = []
        self.dist_leaves = []
        self.treedefs = []
        self.log_iws = []

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def sample(self, distribution, name=None, address=None, control=True,
               mask=None):
        outer = self.outer
        if mask is not None:
            raise RuntimeError(
                "sample(mask=) inside rejection_sample is not supported "
                "(the block's acceptance indicator already gates attempts)"
            )
        if outer.inference_engine in (
            InferenceEngine.LIGHTWEIGHT_METROPOLIS_HASTINGS,
            InferenceEngine.RANDOM_WALK_METROPOLIS_HASTINGS,
        ):
            control = True  # MCMC controls every site (reference: state.py:165-166)
        if name is not None and name in outer.observed:
            raise RuntimeError(
                "observed sample sites inside rejection_sample are not "
                "supported"
            )
        base, full, instance = self._make_address(
            address, distribution.address_suffix
        )
        site = SiteRecord(
            address_base=base,
            address=full,
            instance=instance,
            name=name,
            control=control,
            observed=False,
            tagged=False,
            distribution_name=distribution.name,
            distribution=distribution,
            rejection=True,
        )
        log_iw = None
        if outer.replay_values is not None and full in outer.replay_values:
            value = outer.replay_values[full]
            if self.selective_fresh_idx is not None:
                # single-site MCMC move inside the block: the chosen site
                # redraws fresh while the others keep their stored values
                fresh = distribution._sample_jax(self._next_key(), ())
                value = jnp.where(
                    jnp.asarray(self._site_counter)
                    == self.selective_fresh_idx,
                    fresh,
                    value,
                )
            elif self.use_proposal and outer.proposal_step is not None:
                # keep the proposal network's recurrent chain intact through
                # replayed block sites (guided SMC prefix replay)
                outer.proposal_step(
                    site,
                    distribution,
                    self._next_key(),
                    outer.observed,
                    forced_value=value,
                )
        elif (
            self.use_proposal
            and control
            and outer.trace_mode == TraceMode.POSTERIOR
            and outer.inference_engine
            == InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK
            and outer.proposal_step is not None
        ):
            if self.defensive is not None:
                value, proposal_log_prob = outer.proposal_step(
                    site,
                    distribution,
                    self._next_key(),
                    outer.observed,
                    defensive=self.defensive,
                )
            else:
                value, proposal_log_prob = outer.proposal_step(
                    site, distribution, self._next_key(), outer.observed
                )
            log_iw = (
                distribution.log_prob(value, sum=True) - proposal_log_prob
            )
        else:
            inflated = (
                outer._inflate(distribution)
                if (self.use_proposal and control)
                else None
            )
            proposal = inflated if inflated is not None else distribution
            value = proposal._sample_jax(self._next_key(), ())
            if inflated is not None:
                log_iw = distribution.log_prob(
                    value, sum=True
                ) - inflated.log_prob(value, sum=True)
        lp = distribution.log_prob(value, sum=True)
        leaves, treedef = jax.tree_util.tree_flatten(distribution)
        self.sites.append(site)
        self.values.append(value)
        self.log_probs.append(lp)
        self.dist_leaves.append(tuple(leaves))
        self.treedefs.append(treedef)
        self.log_iws.append(log_iw)
        self._site_counter += 1
        return value

    def observe(self, distribution, value=None, name=None, address=None, mask=None):
        raise RuntimeError(
            "observe/factor inside rejection_sample is not supported"
        )

    def factor(self, log_prob=None, log_prob_func=None, name=None, address=None, mask=None):
        raise RuntimeError(
            "observe/factor inside rejection_sample is not supported"
        )

    def tag(self, value, name=None, address=None):
        raise RuntimeError("tag inside rejection_sample is not supported")

    def rejection_sample(self, attempt_fn, max_attempts=None):
        raise RuntimeError(
            "nested rejection_sample is not supported on the compiled tier"
        )


def run_traced(
    model,
    key,
    observed,
    trace_mode,
    inference_engine,
    prior_inflation=PriorInflation.DISABLED,
    likelihood_importance=1.0,
    proposal_step=None,
    replay_values=None,
    record_site_log_iws=False,
    args=(),
    kwargs=None,
):
    """Execute forward() once under the vectorized handler.  Called inside
    jax tracing (vmap/jit); returns (result, outputs pytree, handler)."""
    handler = VectorizedHandler(
        key=key,
        trace_mode=trace_mode,
        inference_engine=inference_engine,
        observed=observed,
        root_function_name=model.forward.__code__.co_name,
        prior_inflation=prior_inflation,
        likelihood_importance=likelihood_importance,
        address_dictionary=model._address_dictionary,
        proposal_step=proposal_step,
        replay_values=replay_values,
        record_site_log_iws=record_site_log_iws,
    )
    prev = state._set_handler(handler)
    try:
        result = model.forward(*args, **(kwargs or {}))
    finally:
        state._set_handler(prev)
    outputs = {
        "result": result,
        "log_importance_weight": handler.log_importance_weight,
        "log_prob_observed": handler.log_prob_observed,
        "log_prob_total": handler.log_prob_total,
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
        "dist_leaves": {
            s.address: leaves
            for s, leaves in zip(handler.sites, handler.dist_leaves)
            if leaves is not None
        },
        "site_log_iws": {
            s.address: liw
            for s, liw in zip(handler.sites, handler.site_log_iws)
            if liw is not None
        },
        # 1.0 = active, 0.0 = masked-off padding (sample(mask=) sites);
        # the IC training loss gates on these per (trace, site)
        "masks": {
            s.address: jnp.asarray(mk, util.dtype())
            for s, mk in zip(handler.sites, handler.site_masks)
            if mk is not None
        },
    }
    return outputs, handler


# Particles per device dispatch: bounds HBM footprint while amortizing
# per-dispatch overhead.  Measured on one chip (guided-IS GUM, warm): 2^16
# -> 0.94M traces/s, 2^17 -> 1.43M, 2^18 -> 1.61M, 2^19+ flat-to-worse
# (BASELINE.md).
_BATCH_LIMIT = 1 << 18

# Learned per-model dispatch caps after an on-device OOM (keyed like
# _jit_run_cache, by model identity): heavy-per-particle programs (e.g.
# a [N,N] Cholesky per particle) can exhaust HBM far below
# _BATCH_LIMIT; once a size OOMs, subsequent calls start from the
# working cap instead of re-hitting the failure.
_oom_batch_limit = {}


def _effective_batch_limit(model, pad_shapes):
    limit = _BATCH_LIMIT
    env = os.environ.get("PYPROB_TPU_BATCH_LIMIT")
    if env:
        limit = min(limit, max(1, int(env)))
    limit = min(limit, _oom_batch_limit.get(id(model), limit))
    if pad_shapes and limit > 1:
        limit = 1 << (limit.bit_length() - 1)  # round DOWN to a power of 2
    return limit


def _is_oom_error(e):
    msg = str(e)
    return (
        "RESOURCE_EXHAUSTED" in msg
        or "Ran out of memory" in msg
        or "out of memory" in msg.lower()
    )


def _next_pow2(n):
    p = 1
    while p < n:
        p *= 2
    return p


class _TraceabilityCache:
    """Remembers per model class whether forward() is jax-traceable."""

    _cache = {}

    @classmethod
    def known_untraceable(cls, model):
        # models with side-effecting forwards (remote PPX sockets, rejection
        # wrappers) must never even be *attempted* under tracing: a partial
        # trace would leave external protocol state desynchronized
        if getattr(model, "_never_vectorize", False):
            return True
        return cls._cache.get(type(model)) is False

    @classmethod
    def mark(cls, model, ok):
        cls._cache[type(model)] = ok


def materialize_empirical(sites, host, num, map_func, results_only,
                          file_name, log_weights=None):
    """Build an Empirical from decoded batched outputs: bulk
    ``from_arrays`` fast path for array-valued results-only output, else
    per-trace materialization honoring ``map_func``.  ``log_weights``
    None means uniform.  Shared by the engines that decode whole sample
    batches at once (gradient MCMC driver, VI, tempered SMC)."""
    from .distributions import Empirical

    results_host = host["result"]
    lw = (
        np.zeros(num)
        if log_weights is None
        else np.asarray(log_weights, np.float64)[:num]
    )
    if (
        results_only
        and file_name is None
        and isinstance(results_host, np.ndarray)
    ):
        return Empirical.from_arrays(np.asarray(results_host)[:num], lw)
    emp = Empirical(file_name=file_name)
    if map_func is None:
        values = _materialize_traces(sites, host, num, None, results_host)
    elif results_only:
        leaves, treedef = jax.tree_util.tree_flatten(results_host)
        leaves = [np.asarray(l) for l in leaves]
        values = [
            jax.tree_util.tree_unflatten(treedef, [l[i] for l in leaves])
            for i in range(num)
        ]
    else:
        values = [
            map_func(t)
            for t in _materialize_traces(
                sites, host, num, None, results_host
            )
        ]
    for v, w in zip(values, lw):
        emp.add(v, log_weight=float(w))
    emp.finalize()
    return emp


def _materialize_traces(sites, outputs_host, num, map_func, results_host):
    """Build per-trace Python Trace objects from batched site arrays.

    Only used when the caller wants full traces (map_func=None); the
    results-only path skips this entirely.
    """
    traces = []
    values = outputs_host["values"]
    log_probs = outputs_host["log_probs"]
    dist_leaves = outputs_host.get("dist_leaves", {})
    masks = outputs_host.get("masks", {})

    # forward() may return any pytree; every leaf is batched over traces —
    # convert leaves once, index per trace
    result_leaves, result_treedef = jax.tree_util.tree_flatten(results_host)
    result_leaves = [np.asarray(l) for l in result_leaves]

    def result_at(i):
        return jax.tree_util.tree_unflatten(
            result_treedef, [l[i] for l in result_leaves]
        )

    for i in range(num):
        tr = Trace()
        for s in sites:
            v = values.get(s.address)
            lp = log_probs.get(s.address)
            dist = None
            if s.dist_treedef is not None and s.address in dist_leaves:
                # constant (unbatched) leaves pass through as-is
                leaves_i = [
                    np.asarray(leaf)[i]
                    if np.ndim(leaf) >= 1 and np.shape(leaf)[0] == num
                    else np.asarray(leaf)
                    for leaf in dist_leaves[s.address]
                ]
                try:
                    dist = jax.tree_util.tree_unflatten(
                        s.dist_treedef, leaves_i
                    )
                except Exception:
                    dist = None
            mk = masks.get(s.address)
            variable = Variable(
                distribution=dist,
                value=None if v is None else v[i],
                address_base=s.address_base,
                address=s.address,
                instance=s.instance,
                log_prob=None if lp is None else lp[i],
                log_importance_weight=None,
                control=s.control,
                name=s.name,
                observed=s.observed,
                tagged=s.tagged,
                masked=bool(mk is not None and float(mk[i]) == 0.0),
            )
            tr.add(variable)
        tr.end(result_at(i), None)
        # overwrite aggregates with the device-accumulated ones
        tr.log_importance_weight = float(
            outputs_host["log_importance_weight"][i]
        )
        tr.log_prob_observed = outputs_host["log_prob_observed"][i]
        tr.log_prob = outputs_host["log_prob_total"][i]
        traces.append(tr)
    return traces


# jitted-run cache: without it every vectorized_traces call would re-trace
# and re-compile the whole particle program.  Keyed by model identity plus
# all trace-semantics arguments; entries hold (jitted_fn, sites_box).
_jit_run_cache = {}


def _get_jitted_run(
    model,
    trace_mode,
    inference_engine,
    prior_inflation,
    likelihood_importance,
    proposal_step=None,
    args=(),
    kwargs=None,
    obs_names=(),
):
    cacheable = not args and not kwargs
    # obs_names is part of the key: a different observe name-set changes
    # which sites are observed, so the captured static site list (and the
    # compiled program) must be distinct
    cache_key = (
        id(model),
        trace_mode,
        inference_engine,
        prior_inflation,
        likelihood_importance,
        id(proposal_step) if proposal_step is not None else None,
        tuple(sorted(obs_names)),
    )
    if cacheable and cache_key in _jit_run_cache:
        return _jit_run_cache[cache_key]
    sites_box = []

    def single(key, obs):
        outputs, handler = run_traced(
            model,
            key,
            obs,
            trace_mode,
            inference_engine,
            prior_inflation,
            likelihood_importance,
            proposal_step=proposal_step,
            args=args,
            kwargs=kwargs,
        )
        if not sites_box:
            sites_box.append(handler.sites)
        return outputs

    util.relieve_compile_pressure()
    run = jax.jit(jax.vmap(single, in_axes=(0, None)))
    entry = (run, sites_box, model)
    if cacheable:
        _jit_run_cache[cache_key] = entry
    return entry


def run_training_batch(model, batch_size, prior_inflation=PriorInflation.DISABLED):
    """Device-resident training batch for the IC training loop: one jitted
    dispatch generating batch_size traces in PRIOR_FOR_INFERENCE_NETWORK
    mode, with outputs left on device (no materialization).  Raises the
    usual tracing errors if the model is not traceable."""
    if _TraceabilityCache.known_untraceable(model):
        raise NotImplementedError("model is not jax-traceable")
    run, sites_box, _ = _get_jitted_run(
        model,
        TraceMode.PRIOR_FOR_INFERENCE_NETWORK,
        InferenceEngine.IMPORTANCE_SAMPLING,
        prior_inflation,
        1.0,
    )
    keys = util.next_keys(batch_size)
    out = run(keys, {})
    return out, sites_box[0]


def _run_batched(
    model,
    num_traces,
    observed,
    trace_mode,
    inference_engine,
    prior_inflation,
    likelihood_importance,
    proposal_step=None,
    args=(),
    kwargs=None,
    fetch=None,
    mesh=None,
):
    """vmap+jit forward() over particle batches; returns host-side outputs
    stacked to num_traces, plus the static site list.

    ``fetch``: optional list of top-level output keys to pull to the host
    (results-only paths skip transferring per-site arrays entirely —
    that device->host traffic otherwise dominates large runs).

    ``mesh``: optional ``jax.sharding.Mesh`` with a ``dp`` axis; particle
    keys shard over it (observations replicate) so each chunk runs SPMD
    across the mesh instead of on the default device."""
    run, sites_box, _ = _get_jitted_run(
        model,
        trace_mode,
        inference_engine,
        prior_inflation,
        likelihood_importance,
        proposal_step=proposal_step,
        args=args,
        kwargs=kwargs,
        obs_names=tuple((observed or {}).keys()),
    )
    obs_arrays = {
        k: jnp.asarray(v, util.dtype()) for k, v in (observed or {}).items()
    }
    key_sharding = None
    if mesh is not None and mesh.size > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        key_sharding = NamedSharding(mesh, P("dp"))
        repl = NamedSharding(mesh, P())
        obs_arrays = {
            k: jax.device_put(v, repl) for k, v in obs_arrays.items()
        }

    # Pipelined chunks: JAX dispatch is async, so keeping a bounded number
    # of chunk computations in flight overlaps chunk k's device->host
    # transfer with chunk k+1's compute — the serial
    # dispatch/wait/fetch loop pays one full RTT per chunk over a remote
    # (tunneled) device, which dominates multi-chunk runs.
    #
    # On accelerators the chunk size is padded to a power of two (excess
    # particles dropped after fetch): compilation cost dwarfs the <2x
    # redundant compute, and padding bounds the set of compiled shapes a
    # long-lived service ever sees to log2(_BATCH_LIMIT).  On CPU (tests)
    # compute dominates and compilation is cheap, so shapes stay exact.
    _PIPELINE_DEPTH = 2
    pad_shapes = jax.default_backend() != "cpu"
    limit = _effective_batch_limit(model, pad_shapes)
    chunks = []
    in_flight = []  # (pending outputs, rows to keep)
    remaining = num_traces

    def _shrink_after_oom(failed_size):
        # halve the dispatch size and remember it for this model — the
        # program's per-particle HBM footprint won't change between calls.
        # Returns False when there is nothing left to back off (OOM at a
        # single particle is genuine); the caller re-raises then.
        nonlocal limit
        if failed_size <= 1:
            return False
        limit = max(1, failed_size // 2)
        _oom_batch_limit[id(model)] = limit
        warnings.warn(
            f"device OOM at {failed_size} particles/dispatch; retrying "
            f"with chunks of {limit} (set PYPROB_TPU_BATCH_LIMIT to pin)"
        )
        return True

    while remaining > 0 or in_flight:
        if remaining > 0 and len(in_flight) < _PIPELINE_DEPTH:
            n = min(remaining, limit)
            n_padded = _next_pow2(n) if pad_shapes else n
            if key_sharding is not None:
                from .parallel.mesh import pad_to_multiple

                n_padded = pad_to_multiple(n_padded, mesh.size)
            keys = util.next_keys(n_padded)
            if key_sharding is not None:
                keys = jax.device_put(keys, key_sharding)
            try:
                out = run(keys, obs_arrays)
            except Exception as e:  # compile-time OOM surfaces here
                if not _is_oom_error(e) or not _shrink_after_oom(n_padded):
                    raise
                continue  # remaining unchanged: retry this span smaller
            if fetch is not None:
                out = {k: out[k] for k in fetch}
            in_flight.append((out, n))
            remaining -= n
        else:
            out, n = in_flight.pop(0)
            try:
                host_chunk = jax.device_get(out)
            except Exception as e:  # async execution OOM surfaces here
                failed = _next_pow2(n) if pad_shapes else n
                if not _is_oom_error(e) or not _shrink_after_oom(failed):
                    raise
                remaining += n  # chunk lost: re-run it at the new size
                continue
            if pad_shapes or key_sharding is not None:
                host_chunk = jax.tree_util.tree_map(
                    lambda x: x[:n], host_chunk
                )
            chunks.append(host_chunk)
    if len(chunks) == 1:
        host = chunks[0]
    else:
        host = jax.tree_util.tree_map(
            lambda *xs: np.concatenate(xs, axis=0), *chunks
        )
    return host, sites_box[0]


def vectorized_traces(
    model,
    num_traces,
    trace_mode,
    inference_engine=InferenceEngine.IMPORTANCE_SAMPLING,
    prior_inflation=PriorInflation.DISABLED,
    map_func=None,
    observe=None,
    file_name=None,
    likelihood_importance=1.0,
    proposal_step=None,
    rename=None,
    args=(),
    kwargs=None,
    mesh=None,
):
    """Vectorized counterpart of Model._traces.  Returns an Empirical, or
    None if the model is not jax-traceable (caller falls back)."""
    if _TraceabilityCache.known_untraceable(model):
        return None
    if observe is not None and any(v is None for v in observe.values()):
        raise RuntimeError(f"Observe has missing value(s): {observe}")
    t0 = time.time()
    results_only = getattr(map_func, "__name__", "") == "trace_result"
    try:
        host, sites = _run_batched(
            model,
            num_traces,
            observe,
            trace_mode,
            inference_engine,
            prior_inflation,
            likelihood_importance,
            proposal_step=proposal_step,
            args=args,
            kwargs=kwargs,
            fetch=["result", "log_importance_weight"] if results_only else None,
            mesh=mesh,
        )
    except (
        jax.errors.ConcretizationTypeError,
        jax.errors.TracerArrayConversionError,
        jax.errors.TracerBoolConversionError,
        jax.errors.TracerIntegerConversionError,
        NotImplementedError,
    ) as e:
        util.log_print(
            f"[pyprob_tpu] model {model.name!r} is not jax-traceable "
            f"({type(e).__name__}); falling back to the interpreter tier."
        )
        _TraceabilityCache.mark(model, False)
        return None
    except TypeError as e:
        # likely a bad input (e.g. a non-numeric observed value) rather
        # than inherent untraceability — fall back THIS call only, don't
        # poison the model class
        util.log_print(
            f"[pyprob_tpu] compiled tier failed with TypeError ({e}); "
            f"falling back to the interpreter tier for this call."
        )
        return None
    _TraceabilityCache.mark(model, True)

    if trace_mode == TraceMode.PRIOR:
        log_weights = np.ones(num_traces)
        # rejection_sample overflow marks lanes -inf even in prior mode;
        # those traces hold predicate-violating values and must not enter
        # the prior Empirical (tier lockstep with state.rejection_sample)
        iw = np.asarray(host["log_importance_weight"], dtype=np.float64)
        bad = ~np.isfinite(iw)
        if bad.any():
            warnings.warn(
                f"Discarding {bad.sum()} prior traces with nan/inf "
                "log_importance_weight (rejection overflow)."
            )
            log_weights[bad] = -np.inf
    else:
        log_weights = np.asarray(
            host["log_importance_weight"], dtype=np.float64
        )
        bad = ~np.isfinite(log_weights)
        if bad.any():
            warnings.warn(
                f"Discarding {bad.sum()} traces with nan/inf log_weight."
            )
            log_weights[bad] = -np.inf

    results_host = host["result"]
    if results_only and file_name is None and isinstance(results_host, np.ndarray):
        # bulk path: no per-add overhead, no trace materialization
        keep = np.isfinite(log_weights)
        values_arr = np.asarray(results_host)[keep]
        emp = Empirical.from_arrays(values_arr, log_weights[keep])
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
    if util.verbosity() > 1:
        util.log_print(
            f"[compiled tier] {num_traces:,} traces in {duration:.3f}s "
            f"({num_traces / max(duration, 1e-9):,.0f} traces/s), "
            f"ESS {emp.effective_sample_size:,.1f}"
        )
    if rename:
        emp.rename(rename)
    return emp


def vectorized_prior(
    model,
    num_traces,
    prior_inflation=PriorInflation.DISABLED,
    map_func=None,
    file_name=None,
    *args,
    **kwargs,
):
    emp = vectorized_traces(
        model,
        num_traces,
        TraceMode.PRIOR,
        prior_inflation=prior_inflation,
        map_func=map_func,
        file_name=file_name,
        args=args,
        kwargs=kwargs,
    )
    if emp is not None:
        emp.rename(f"Prior, traces: {emp.length:,}")
        emp.add_metadata(
            op="prior",
            num_traces=num_traces,
            prior_inflation=str(prior_inflation),
            vectorized=True,
        )
    return emp


def vectorized_posterior(
    model,
    num_traces,
    inference_engine=InferenceEngine.IMPORTANCE_SAMPLING,
    map_func=None,
    observe=None,
    file_name=None,
    initial_trace=None,
    thinning_steps=None,
    likelihood_importance=1.0,
    num_chains=None,
    burn_in=None,
    return_chains=False,
    mesh=None,
    resample_threshold=0.5,
    resampling="systematic",
    vi_steps=None,
    vi_particles=None,
    guide=None,
    learning_rate=None,
    leapfrog_steps=None,
    target_accept=None,
    step_size=None,
    max_tree_depth=None,
    num_temperatures=None,
    rejuvenation_steps=None,
    svgd_steps=None,
    svgd_particles=None,
    map_steps=None,
    num_starts=None,
    *args,
    **kwargs,
):
    """Vectorized posterior.  IS and IC run as full particle batches; MCMC
    engines run as vmapped parallel chains (pyprob_tpu.inference.mcmc);
    SMC runs as a one-dispatch particle filter (pyprob_tpu.inference.smc);
    VI fits a Gaussian guide by ADVI (pyprob_tpu.inference.vi); SVGD
    transports a kernelized particle ensemble (pyprob_tpu.inference.svgd);
    LAPLACE fits a Gaussian at the MAP (pyprob_tpu.inference.laplace)."""
    if inference_engine == InferenceEngine.LAPLACE:
        from .inference.laplace import vectorized_laplace_posterior

        return vectorized_laplace_posterior(
            model,
            num_traces=num_traces,
            observe=observe,
            map_func=map_func,
            file_name=file_name,
            map_steps=map_steps,
            num_starts=num_starts,
            learning_rate=learning_rate,
            likelihood_importance=likelihood_importance,
            mesh=mesh,
            args=args,
            kwargs=kwargs,
        )
    if inference_engine == InferenceEngine.STEIN_VARIATIONAL_GRADIENT_DESCENT:
        from .inference.svgd import vectorized_svgd_posterior

        return vectorized_svgd_posterior(
            model,
            num_traces=num_traces,
            observe=observe,
            map_func=map_func,
            file_name=file_name,
            svgd_steps=svgd_steps,
            svgd_particles=svgd_particles,
            learning_rate=learning_rate,
            likelihood_importance=likelihood_importance,
            mesh=mesh,
            args=args,
            kwargs=kwargs,
        )
    if inference_engine == InferenceEngine.VARIATIONAL_INFERENCE:
        from .inference.vi import vectorized_vi_posterior

        return vectorized_vi_posterior(
            model,
            num_traces=num_traces,
            observe=observe,
            map_func=map_func,
            file_name=file_name,
            vi_steps=vi_steps,
            vi_particles=vi_particles,
            guide=guide,
            learning_rate=learning_rate,
            likelihood_importance=likelihood_importance,
            mesh=mesh,
            args=args,
            kwargs=kwargs,
        )
    if inference_engine == InferenceEngine.TEMPERED_SMC:
        from .inference.tempered_smc import vectorized_tempered_smc_posterior

        return vectorized_tempered_smc_posterior(
            model,
            num_traces=num_traces,
            observe=observe,
            map_func=map_func,
            file_name=file_name,
            resample_threshold=resample_threshold,
            resampling=resampling,
            rejuvenation_steps=rejuvenation_steps,
            leapfrog_steps=leapfrog_steps,
            target_accept=target_accept,
            step_size=step_size,
            likelihood_importance=likelihood_importance,
            mesh=mesh,
            args=args,
            kwargs=kwargs,
        )
    if inference_engine == InferenceEngine.PARALLEL_TEMPERING:
        from .inference.pt import vectorized_pt_posterior

        pt_state = None
        if initial_trace is not None:
            from .inference.hmc import GradientChainState

            if not isinstance(initial_trace, GradientChainState):
                raise RuntimeError(
                    "PARALLEL_TEMPERING resumes from a GradientChainState "
                    "(posterior.final_gradient_state), got "
                    f"{type(initial_trace).__name__}"
                )
            pt_state = initial_trace
        return vectorized_pt_posterior(
            model,
            num_traces=num_traces,
            observe=observe,
            map_func=map_func,
            file_name=file_name,
            num_chains=num_chains,
            burn_in=burn_in,
            thinning_steps=thinning_steps,
            num_temperatures=num_temperatures,
            leapfrog_steps=leapfrog_steps,
            target_accept=target_accept,
            step_size=step_size,
            likelihood_importance=likelihood_importance,
            mesh=mesh,
            return_chains=return_chains,
            initial_state=pt_state,
            args=args,
            kwargs=kwargs,
        )
    if inference_engine in (
        InferenceEngine.NO_U_TURN_SAMPLER,
        InferenceEngine.HAMILTONIAN_MONTE_CARLO,
    ):
        # initial_trace doubles as the warm-start slot for the gradient
        # engines: a GradientChainState from final_gradient_state
        gradient_state = None
        if initial_trace is not None:
            from .inference.hmc import GradientChainState

            if not isinstance(initial_trace, GradientChainState):
                raise RuntimeError(
                    f"{inference_engine.name} resumes from a "
                    "GradientChainState (posterior.final_gradient_state), "
                    f"got {type(initial_trace).__name__}"
                )
            gradient_state = initial_trace
        if inference_engine == InferenceEngine.NO_U_TURN_SAMPLER:
            from .inference.nuts import vectorized_nuts_posterior

            return vectorized_nuts_posterior(
                model,
                num_traces=num_traces,
                observe=observe,
                map_func=map_func,
                file_name=file_name,
                num_chains=num_chains,
                burn_in=burn_in,
                thinning_steps=thinning_steps,
                max_tree_depth=max_tree_depth,
                target_accept=target_accept,
                step_size=step_size,
                likelihood_importance=likelihood_importance,
                mesh=mesh,
                return_chains=return_chains,
                initial_state=gradient_state,
                args=args,
                kwargs=kwargs,
            )
        from .inference.hmc import vectorized_hmc_posterior

        return vectorized_hmc_posterior(
            model,
            num_traces=num_traces,
            observe=observe,
            map_func=map_func,
            file_name=file_name,
            num_chains=num_chains,
            burn_in=burn_in,
            thinning_steps=thinning_steps,
            leapfrog_steps=leapfrog_steps,
            target_accept=target_accept,
            step_size=step_size,
            likelihood_importance=likelihood_importance,
            mesh=mesh,
            return_chains=return_chains,
            initial_state=gradient_state,
            args=args,
            kwargs=kwargs,
        )
    if inference_engine in (
        InferenceEngine.SEQUENTIAL_MONTE_CARLO,
        InferenceEngine.SEQUENTIAL_MONTE_CARLO_WITH_INFERENCE_NETWORK,
    ):
        from .inference.smc import vectorized_smc_posterior

        proposal_step = None
        if (
            inference_engine
            == InferenceEngine.SEQUENTIAL_MONTE_CARLO_WITH_INFERENCE_NETWORK
        ):
            network = model._inference_network
            if network is None:
                raise RuntimeError(
                    "No inference network available. Use "
                    "learn_inference_network or load_inference_network first."
                )
            proposal_step = network.cached_vectorized_proposal_step(observe)
            if proposal_step is None:
                raise RuntimeError(
                    f"{type(network).__name__} does not support vectorized "
                    "proposal steps (make_vectorized_proposal_step returned "
                    "None), so it cannot drive guided SMC."
                )
        return vectorized_smc_posterior(
            model,
            num_traces=num_traces,
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
    if inference_engine == InferenceEngine.IMPORTANCE_SAMPLING:
        emp = vectorized_traces(
            model,
            num_traces,
            TraceMode.POSTERIOR,
            inference_engine=inference_engine,
            map_func=map_func,
            observe=observe,
            file_name=file_name,
            likelihood_importance=likelihood_importance,
            args=args,
            kwargs=kwargs,
            mesh=mesh,
        )
        if emp is not None:
            emp.rename(
                f"Posterior, IS (compiled), traces: {emp.length:,}, "
                f"ESS: {emp.effective_sample_size:,.2f}"
            )
            emp.add_metadata(
                op="posterior",
                num_traces=num_traces,
                inference_engine=str(inference_engine),
                effective_sample_size=emp.effective_sample_size,
                vectorized=True,
            )
        return emp
    if (
        inference_engine
        == InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK
    ):
        network = model._inference_network
        if network is None:
            raise RuntimeError(
                "No inference network available. Use learn_inference_network "
                "or load_inference_network first."
            )
        proposal_step = network.cached_vectorized_proposal_step(observe)
        if proposal_step is None:
            return None
        emp = vectorized_traces(
            model,
            num_traces,
            TraceMode.POSTERIOR,
            inference_engine=inference_engine,
            map_func=map_func,
            observe=observe,
            file_name=file_name,
            likelihood_importance=likelihood_importance,
            proposal_step=proposal_step,
            args=args,
            kwargs=kwargs,
            mesh=mesh,
        )
        if emp is not None:
            emp.rename(
                f"Posterior, IC (compiled), traces: {emp.length:,}, "
                f"ESS: {emp.effective_sample_size:,.2f}"
            )
            emp.add_metadata(
                op="posterior",
                num_traces=num_traces,
                inference_engine=str(inference_engine),
                effective_sample_size=emp.effective_sample_size,
                vectorized=True,
            )
        return emp
    # MCMC: vmapped parallel chains
    from .inference.mcmc import vectorized_mcmc_posterior

    return vectorized_mcmc_posterior(
        model,
        num_traces=num_traces,
        inference_engine=inference_engine,
        map_func=map_func,
        observe=observe,
        file_name=file_name,
        initial_trace=initial_trace,
        thinning_steps=thinning_steps,
        num_chains=num_chains,
        burn_in=burn_in,
        return_chains=return_chains,
        mesh=mesh,
        args=args,
        kwargs=kwargs,
    )
