"""Trace-recording execution core (interpreter tier).

Counterpart of the reference runtime (reference: pyprob/state.py:96-354):
module-level ``sample`` / ``observe`` / ``factor`` / ``tag`` called from
arbitrary user model programs, with per-engine behavior:

* PRIOR / PRIOR_FOR_INFERENCE_NETWORK — draw from (optionally inflated) prior
* POSTERIOR + IMPORTANCE_SAMPLING — prior proposals, weight from observes
* POSTERIOR + IC — proposal from the inference network, per-site importance
  weight = prior logpdf - proposal logpdf
* POSTERIOR + LMH/RMH — single-site resample (RMH: Normal / TruncatedNormal
  random-walk kernel mixed with the prior at alpha=0.5, with forward/reverse
  transition correction), value reuse with rescoring fallback elsewhere

The interpreter tier runs distribution math on the host (numpy backend) so a
random choice costs microseconds, not a device round-trip.  The compiled
tier installs a handler (``pyprob_tpu.vectorized``) that intercepts these
same entry points during ``jax.vmap`` tracing.
"""

from __future__ import annotations

import math
import threading
import time
import warnings

import numpy as np

from . import util
from .util import TraceMode, PriorInflation, InferenceEngine
from .address import extract_address
from .distributions import Normal, Categorical, Uniform, TruncatedNormal, Factor
from .trace import Variable, Trace


class _Context:
    def __init__(self):
        self.trace_mode = TraceMode.PRIOR
        self.inference_engine = InferenceEngine.IMPORTANCE_SAMPLING
        self.prior_inflation = PriorInflation.DISABLED
        self.likelihood_importance = 1.0
        self.current_trace = None
        self.root_function_name = None
        self.inference_network = None
        self.previous_variable = None
        self.observed_variables = {}
        self.execution_start = None
        self.metropolis_hastings_trace = None
        self.metropolis_hastings_site_address = None
        self.metropolis_hastings_site_transition_log_prob = 0
        self.address_dictionary = None
        self.rng = None  # per-context host RNG (None -> the global one)
        # True while re-running a rejection_sample attempt after the first:
        # retries draw from the defensive mixture (no inflation) and the
        # per-attempt importance corrections accumulate exactly
        self.rejection_retry = False
        # True while any rejection_sample attempt runs (first or retry):
        # sample(mask=) is rejected inside blocks on both tiers
        self.in_rejection_block = False
        # {full_address: value} — controlled sites take the given value
        # instead of sampling (interpreter-tier SMC prefix replay,
        # pyprob_tpu.inference.smc)
        self.smc_replay_values = None


class _ContextLocal(threading.local):
    """One interpreter context per thread: concurrent trace executions
    (e.g. a pool of remote simulators, model.pool()) each get isolated
    trace state — the reference's module globals (reference: state.py:13-27)
    forbid this."""

    def __init__(self):
        self.value = _Context()


_ctx_local = _ContextLocal()


class _CtxProxy:
    """Attribute proxy so the module body can keep saying ``_ctx.field``."""

    def __getattr__(self, name):
        return getattr(_ctx_local.value, name)

    def __setattr__(self, name, value):
        setattr(_ctx_local.value, name, value)


_ctx = _CtxProxy()


def _get_rng():
    return _ctx.rng if _ctx.rng is not None else util.get_rng()


def _set_smc_replay(replay_values):
    """Install/clear the interpreter SMC replay dict for the next forward."""
    _ctx.smc_replay_values = replay_values


def _swap_context(ctx):
    """Install ``ctx`` as the current thread's interpreter context and
    return the previous one.  Lets a single-threaded event loop interleave
    many trace executions (pyprob_tpu.remote_lockstep drives K simulators
    this way); the reference's module-global trace state cannot
    (reference: state.py:13-27)."""
    prev = _ctx_local.value
    _ctx_local.value = ctx
    return prev


# Handler installed by the compiled (vmap) tier; when set, sample/observe/
# factor/tag delegate to it instead of the interpreter context.  Tracing is
# single-threaded per handler, but pools may trace in parallel threads.
_handler_local = threading.local()


def _set_handler(handler):
    prev = getattr(_handler_local, "value", None)
    _handler_local.value = handler
    return prev


def _get_handler():
    return getattr(_handler_local, "value", None)


def _inflate(distribution):
    """Prior inflation for IS proposal spreading
    (reference: state.py:87-93)."""
    if _ctx.prior_inflation == PriorInflation.ENABLED:
        if isinstance(distribution, Categorical):
            n = distribution.num_categories
            return Categorical(probs=np.full(n, 1.0 / n, dtype=util.dtype()))
        elif isinstance(distribution, Normal):
            return Normal(distribution.mean, distribution.stddev * 3)
    return None


def _build_address(address, distribution, trace):
    ctx = _ctx_local.value  # bind once: hot path
    if address is None:
        address_base = (
            extract_address(ctx.root_function_name)
            + "__"
            + distribution.address_suffix
        )
    else:
        address_base = address + "__" + distribution.address_suffix
    if ctx.address_dictionary is not None:
        address_base = ctx.address_dictionary.address_to_id(address_base)
    instance = trace.last_instance(address_base) + 1
    return address_base, address_base + "__" + str(instance), instance


def tag(value, name=None, address=None):
    handler = _get_handler()
    if handler is not None:
        return handler.tag(value, name=name, address=address)
    trace = _ctx.current_trace
    if trace is None:
        return
    if address is None:
        address_base = extract_address(_ctx.root_function_name) + "__None"
    else:
        address_base = address + "__None"
    if _ctx.address_dictionary is not None:
        address_base = _ctx.address_dictionary.address_to_id(address_base)
    instance = trace.last_instance(address_base) + 1
    full_address = address_base + "__" + str(instance)
    variable = Variable(
        distribution=None,
        value=value,
        address_base=address_base,
        address=full_address,
        instance=instance,
        log_prob=0.0,
        tagged=True,
        name=name,
    )
    trace.add(variable)


def factor(log_prob=None, log_prob_func=None, name=None, address=None, mask=None):
    dist = Factor(log_prob=log_prob, log_prob_func=log_prob_func)
    return observe(dist, name=name, address=address, mask=mask)


def observe(distribution, value=None, name=None, address=None, mask=None):
    """``mask`` (beyond parity): when given and false, the observation
    contributes nothing to the trace density or importance weight — the
    masking primitive that lets variable-length observation sequences be
    written as fixed-bound loops, which is what makes them compilable on
    the vectorized tier (one program per bound instead of one trace-shape
    per data size).  On this interpreter tier the mask is a concrete
    boolean."""
    ctx = _ctx_local.value  # bind once: hot path
    handler = _get_handler()
    if handler is not None:
        return handler.observe(
            distribution, value=value, name=name, address=address, mask=mask
        )
    trace = ctx.current_trace
    if trace is None:
        return
    distribution = distribution.to_numpy() if _needs_host(distribution) else distribution
    address_base, full_address, instance = _build_address(
        address, distribution, trace
    )

    if name in ctx.observed_variables:
        value = ctx.observed_variables[name]
    elif value is not None:
        pass
    elif (
        ctx.trace_mode == TraceMode.PRIOR_FOR_INFERENCE_NETWORK
        and distribution is not None
    ):
        value = distribution.sample(_get_rng())
    else:
        value = None

    if value is None and not isinstance(distribution, Factor):
        observed = False
        log_prob = None
        log_importance_weight = None
    else:
        observed = True
        if value is not None:
            value = util.to_array(value)
        if mask is not None and not bool(np.all(mask)):
            log_prob = 0.0
        else:
            log_prob = ctx.likelihood_importance * distribution.log_prob(
                value, sum=True
            )
        if ctx.inference_engine in (
            InferenceEngine.IMPORTANCE_SAMPLING,
            InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK,
        ):
            log_importance_weight = float(log_prob)
        else:
            log_importance_weight = None

    variable = Variable(
        distribution=distribution,
        value=value,
        address_base=address_base,
        address=full_address,
        instance=instance,
        log_prob=log_prob,
        log_importance_weight=log_importance_weight,
        observed=observed,
        name=name,
    )
    trace.add(variable)
    return variable.value


def _needs_host(distribution):
    """True if the distribution carries device arrays that should be pulled
    to the host for fast interpreter-tier math."""
    import jax

    for leaf in distribution._leaves():
        if isinstance(leaf, jax.Array):
            return True
    return False


def sample(distribution, name=None, address=None, control=True, mask=None):
    # mask=False marks the site structurally inactive (variable-structure
    # programs written as fixed-bound loops): the value is still drawn and
    # prior-scored — exact marginalization for every likelihood-based
    # engine — but IC proposes it from the PRIOR with no weight correction
    # and the training loss excludes it.  Reduced with all() like
    # observe(mask=); both tiers in lockstep.
    ctx = _ctx_local.value  # bind once: hot path
    handler = _get_handler()
    if handler is not None:
        return handler.sample(
            distribution, name=name, address=address, control=control,
            mask=mask,
        )
    trace = ctx.current_trace
    if trace is None:
        return distribution.sample(_get_rng())
    if mask is not None and ctx.in_rejection_block:
        raise RuntimeError(
            "sample(mask=) inside rejection_sample is not supported "
            "(the block's acceptance indicator already gates attempts)"
        )
    active = mask is None or bool(np.all(np.asarray(mask)))
    distribution = distribution.to_numpy() if _needs_host(distribution) else distribution
    rng = _get_rng()

    # MCMC engines control every sample site (reference: state.py:165-166)
    if ctx.inference_engine in (
        InferenceEngine.LIGHTWEIGHT_METROPOLIS_HASTINGS,
        InferenceEngine.RANDOM_WALK_METROPOLIS_HASTINGS,
    ):
        control = True

    address_base, full_address, instance = _build_address(
        address, distribution, trace
    )

    if name in ctx.observed_variables:
        # Sample site overridden by a named observation
        value = util.to_array(ctx.observed_variables[name])
        log_prob = ctx.likelihood_importance * distribution.log_prob(value, sum=True)
        if not active:
            # the mask gates the likelihood term, like observe(mask=)
            log_prob = 0.0
        if ctx.inference_engine in (
            InferenceEngine.IMPORTANCE_SAMPLING,
            InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK,
        ):
            log_importance_weight = float(log_prob)
        else:
            log_importance_weight = None
        variable = Variable(
            distribution=distribution,
            value=value,
            address_base=address_base,
            address=full_address,
            instance=instance,
            log_prob=log_prob,
            log_importance_weight=log_importance_weight,
            observed=True,
            name=name,
            masked=not active,
        )
        trace.add(variable)
        return variable.value

    reused = False
    observed = False
    if ctx.trace_mode == TraceMode.POSTERIOR:
        engine = ctx.inference_engine
        if engine == InferenceEngine.IMPORTANCE_SAMPLING:
            if (
                control
                and ctx.smc_replay_values is not None
                and full_address in ctx.smc_replay_values
            ):
                # SMC prefix replay: reuse the (resampled) ancestor's value
                value = ctx.smc_replay_values[full_address]
                log_prob = distribution.log_prob(value, sum=True)
                log_importance_weight = None
                reused = True
            else:
                value, log_prob, log_importance_weight = _sample_from_prior(
                    distribution, rng
                )
        elif engine == InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK:
            # proposals drive retried rejection attempts too:
            # rejection_sample restores the network's recurrent state per
            # retry and accumulates every executed attempt's correction
            # (exact by the extended-space argument)
            if control:
                stub = Variable(
                    distribution=distribution,
                    value=None,
                    address_base=address_base,
                    address=full_address,
                    instance=instance,
                    log_prob=0.0,
                    control=True,
                    name=name,
                )
                proposal = ctx.inference_network._infer_step(
                    stub, prev_variable=ctx.previous_variable
                )
                if not active:
                    # masked-off: draw from the PRIOR (matching training
                    # traces) with no correction; the network's recurrent
                    # state already advanced through the site
                    value = distribution.sample(rng)
                    value = np.asarray(value).reshape(
                        tuple(distribution.batch_shape)
                        + tuple(getattr(distribution, "event_shape", ()))
                    )
                    log_prob = distribution.log_prob(value, sum=True)
                    proposal_log_prob = None
                elif ctx.rejection_retry and proposal is not distribution:
                    # rejection retry: defensive mixture π·q + (1−π)·prior —
                    # a REJECTED attempt's p/q correction enters the weight
                    # with no compensating likelihood term, and the mixture
                    # caps that factor at 1/(1−π) (Hesterberg 1995); exact
                    # because the weight scores against the mixture density
                    pi = 0.5
                    if float(rng.random()) < pi:
                        value = proposal.sample(rng)
                    else:
                        value = distribution.sample(rng)
                    value = np.asarray(value).reshape(
                        tuple(distribution.batch_shape)
                        + tuple(getattr(distribution, "event_shape", ()))
                    )
                    log_prob = distribution.log_prob(value, sum=True)
                    proposal_log_prob = np.logaddexp(
                        math.log(pi) + float(proposal.log_prob(value, sum=True)),
                        math.log1p(-pi) + float(log_prob),
                    )
                else:
                    value = proposal.sample(rng)
                    value = np.asarray(value).reshape(
                        tuple(distribution.batch_shape)
                        + tuple(getattr(distribution, "event_shape", ()))
                    )
                    # lockstep proposals precompute BOTH log-pdfs of the
                    # sampled value in the same batched device step
                    # (pyprob_tpu.interpreter_lockstep._ProposalShim);
                    # host per-site numpy log-pdfs are the interpreter
                    # tier's hot spot
                    pre = getattr(proposal, "pair_of", None)
                    pair = pre(value) if pre is not None else None
                    if pair is not None:
                        log_prob, proposal_log_prob = pair
                    else:
                        log_prob = distribution.log_prob(value, sum=True)
                        proposal_log_prob = proposal.log_prob(
                            value, sum=True
                        )
                if util.has_nan_or_inf(log_prob):
                    warnings.warn(
                        f"Prior log_prob has NaN/inf. dist: {distribution} value: {value}"
                    )
                if proposal_log_prob is not None and util.has_nan_or_inf(
                    proposal_log_prob
                ):
                    warnings.warn(
                        f"Proposal log_prob has NaN/inf. dist: {proposal} value: {value}"
                    )
                log_importance_weight = (
                    None
                    if proposal_log_prob is None
                    else float(log_prob) - float(proposal_log_prob)
                )
                # reuse the stub as the trace record (hot path: one
                # Variable construction per site, not two)
                variable = stub
                variable.value = value
                variable.log_prob = log_prob
                variable.log_importance_weight = log_importance_weight
                variable.masked = not active
                ctx.previous_variable = variable
                trace.add(variable)
                return variable.value
            else:
                value = distribution.sample(rng)
                log_prob = distribution.log_prob(value, sum=True)
                log_importance_weight = None
        else:  # LMH / RMH
            log_importance_weight = None
            mh_trace = ctx.metropolis_hastings_trace
            if mh_trace is None:
                value = distribution.sample(rng)
                log_prob = distribution.log_prob(value, sum=True)
            elif full_address == ctx.metropolis_hastings_site_address:
                value, log_prob = _mh_site_resample(distribution, rng, full_address)
            elif full_address not in mh_trace.variables_dict_address:
                value = distribution.sample(rng)
                log_prob = distribution.log_prob(value, sum=True)
            else:
                value = mh_trace.variables_dict_address[full_address].value
                reused = True
                try:
                    # Rescoring fallback: changed parameters/shape may make
                    # the reused value unscorable (reference: state.py:271-276)
                    log_prob = distribution.log_prob(value, sum=True)
                    if util.has_nan_or_inf(log_prob):
                        raise ValueError("nan/inf rescore")
                except Exception:
                    value = distribution.sample(rng)
                    log_prob = distribution.log_prob(value, sum=True)
                    reused = False
    else:  # PRIOR / PRIOR_FOR_INFERENCE_NETWORK
        if (
            control
            and ctx.smc_replay_values is not None
            and full_address in ctx.smc_replay_values
        ):
            # posterior-predictive replay: pin the latent to a posterior
            # draw while observes sample fresh (Model.posterior_predictive)
            value = ctx.smc_replay_values[full_address]
            log_prob = distribution.log_prob(value, sum=True)
            log_importance_weight = None
            reused = True
        else:
            value, log_prob, log_importance_weight = _sample_from_prior(
                distribution, rng
            )

    variable = Variable(
        distribution=distribution,
        value=value,
        address_base=address_base,
        address=full_address,
        instance=instance,
        log_prob=log_prob,
        log_importance_weight=log_importance_weight,
        control=control,
        name=name,
        observed=observed,
        reused=reused,
        masked=not active,
    )
    trace.add(variable)
    return variable.value


def rejection_sample(attempt_fn, max_attempts=None):
    """Trace-aware rejection sampling with replacement semantics.

    ``attempt_fn()`` runs arbitrary model code containing ``sample`` calls
    and returns ``(output, accept)``; attempts repeat until ``accept`` is
    true.  A retried attempt *replaces* the previous one in the trace, so
    site addresses are stable across attempts (the pyprob_cpp family's
    ``replace=true`` mode; the reference's Python tier instead grows a new
    address instance per attempt, producing variable-length traces —
    reference: tests/test_inference.py:249-310 GUM-Marsaglia).

    Stable addresses are what make rejection loops executable on the
    compiled tier: under ``jax.vmap`` tracing the block becomes a
    ``lax.while_loop`` with a static site set (see
    ``VectorizedHandler.rejection_sample``), so Marsaglia-style models run
    as full particle batches instead of falling back to the interpreter.

    Inference-network proposals drive every attempt under guided IS: the
    network's recurrent state is restored to the pre-block snapshot per
    retry (training traces record only accepted attempts, so retries must
    not condition on rejected ones) and the accepted attempt's end state
    continues the trace.  Retries propose from the defensive mixture
    ``π·q + (1−π)·prior`` (π=0.5) so a rejected attempt's correction is
    bounded by ``1/(1−π)``.  The importance weight accumulates the
    prior−proposal correction of every attempt *executed*, accepted or not
    — exact by the extended-space argument: target (attempts from p) and
    proposal (attempts from q) processes both define densities over the
    executed-attempt sequence, with ratio ``Π_i p(x_i)/q(x_i)``.

    ``observe``/``factor``/``tag`` inside ``attempt_fn`` are not supported.
    ``max_attempts`` bounds the loop (default 64 on the compiled tier,
    1e6 here); exhausting it marks the trace invalid — importance engines
    give it weight -inf (discarded), MCMC engines reject the candidate —
    matching the compiled tier's semantics.
    """
    handler = _get_handler()
    if handler is not None:
        return handler.rejection_sample(attempt_fn, max_attempts=max_attempts)
    ctx = _ctx_local.value
    trace = ctx.current_trace
    cap = int(max_attempts) if max_attempts else 1_000_000
    if trace is None:
        for _ in range(cap):
            out, accept = attempt_fn()
            if bool(np.all(np.asarray(accept))):
                return out
        raise RuntimeError(
            f"rejection_sample exceeded {cap:,} attempts without acceptance"
        )
    if ctx.rejection_retry:
        raise RuntimeError(
            "nested rejection_sample is not supported inside a retried "
            "attempt"
        )
    prev_attempts_iw = 0.0
    prev_variable = ctx.previous_variable
    # guided IS proposes on every attempt: snapshot the network's
    # recurrent state so each retry restarts the block from the pre-block
    # state (see docstring)
    network = (
        ctx.inference_network
        if ctx.trace_mode == TraceMode.POSTERIOR
        and ctx.inference_engine
        == InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK
        else None
    )
    network_state = (
        getattr(network, "_infer_lstm_state", None)
        if network is not None
        else None
    )
    out, new_vars = None, []
    try:
        for i in range(cap):
            marker = len(trace.variables)
            ctx.in_rejection_block = True
            try:
                out, accept = attempt_fn()
            finally:
                ctx.in_rejection_block = False
            new_vars = trace.variables[marker:]
            if any(v.observed or v.tagged for v in new_vars):
                trace.rollback(marker)
                raise RuntimeError(
                    "observe/factor/tag inside rejection_sample is not "
                    "supported"
                )
            if i == 0 and not new_vars:
                raise RuntimeError(
                    "rejection_sample block contains no sample sites"
                )
            if bool(np.all(np.asarray(accept))):
                if i > 0 and prev_attempts_iw != 0.0:
                    # rejected attempts' corrections (proposal/inflation
                    # deltas of every executed attempt) enter the weight
                    # alongside the accepted attempt's own — extended-space
                    # exactness (see docstring)
                    for v in new_vars:
                        if v.control:
                            v.log_importance_weight = (
                                v.log_importance_weight or 0.0
                            ) + prev_attempts_iw
                            break
                return out
            if all(getattr(v, "reused", False) for v in new_vars):
                # every block value came from MH-trace / replay reuse: the
                # retry is deterministic and can never accept — the stored
                # values violate the predicate under the candidate's outer
                # latents (acceptance indicator 0)
                break
            if i == cap - 1:
                # keep the final attempt recorded so the invalid-trace
                # marking below has variables to attach to
                break
            prev_attempts_iw += sum(
                float(v.log_importance_weight)
                for v in new_vars
                if v.log_importance_weight is not None
            )
            trace.rollback(marker)
            ctx.previous_variable = prev_variable
            if network is not None and hasattr(network, "_infer_lstm_state"):
                network._infer_lstm_state = network_state
            ctx.rejection_retry = True
    finally:
        ctx.rejection_retry = False
    # no acceptance: mark the trace invalid (indicator 0), mirroring the
    # compiled tier — importance weight -inf discards the trace; the MH
    # transition term -inf rejects the candidate
    warnings.warn(
        "rejection_sample: the acceptance predicate cannot be satisfied "
        f"(cap {cap:,} attempts, or deterministic replayed values violate "
        "it); trace marked invalid."
    )
    if ctx.trace_mode == TraceMode.POSTERIOR and ctx.inference_engine in (
        InferenceEngine.LIGHTWEIGHT_METROPOLIS_HASTINGS,
        InferenceEngine.RANDOM_WALK_METROPOLIS_HASTINGS,
    ):
        t = ctx.metropolis_hastings_site_transition_log_prob
        ctx.metropolis_hastings_site_transition_log_prob = (
            0.0 if t is None else t
        ) + float("-inf")
    else:
        marked = next((v for v in new_vars if v.control), None)
        if marked is None and new_vars:
            # uncontrolled blocks still need the trace discarded
            marked = new_vars[0]
        if marked is not None:
            marked.log_importance_weight = float("-inf")
    return out


def _sample_from_prior(distribution, rng):
    inflated = None if _ctx.rejection_retry else _inflate(distribution)
    if inflated is None:
        value = distribution.sample(rng)
        log_prob = distribution.log_prob(value, sum=True)
        return value, log_prob, None
    value = inflated.sample(rng)
    log_prob = distribution.log_prob(value, sum=True)
    log_importance_weight = float(log_prob) - float(
        inflated.log_prob(value, sum=True)
    )
    return value, log_prob, log_importance_weight


def _mh_site_resample(distribution, rng, address):
    """Resample the chosen MH site.

    LMH: fresh draw from the prior.  RMH: alpha=0.5 mixture of a local
    random-walk kernel (Normal / TruncatedNormal for Uniform priors) and the
    prior, with the forward/reverse transition log-ratio accumulated for the
    acceptance test (reference: state.py:235-262).
    """
    _ctx.metropolis_hastings_site_transition_log_prob = 0.0
    engine = _ctx.inference_engine
    if engine == InferenceEngine.RANDOM_WALK_METROPOLIS_HASTINGS:
        if isinstance(distribution, Normal):
            kernel = lambda x: Normal(x, distribution.stddev)
        elif isinstance(distribution, Uniform):
            kernel = lambda x: TruncatedNormal(
                x,
                0.1 * (distribution.high - distribution.low),
                low=distribution.low,
                high=distribution.high,
            )
        else:
            kernel = None

        if kernel is not None:
            old_variable = _ctx.metropolis_hastings_trace.variables_dict_address[
                address
            ]
            old_value = old_variable.value
            old_log_prob = old_variable.log_prob
            forward = kernel(old_value)
            alpha = 0.5
            if rng.random() < alpha:
                value = forward.sample(rng)
            else:
                value = distribution.sample(rng)
            log_prob = distribution.log_prob(value, sum=True)
            reverse = kernel(value)
            # transition log-ratio: log q(old|new) - log q(new|old) with the
            # alpha-mixture kernel q(.|x) = alpha k(.|x) + (1-alpha) p(.)
            t = (
                np.log(
                    alpha * np.exp(reverse.log_prob(old_value, sum=True))
                    + (1 - alpha) * np.exp(old_log_prob)
                )
                + log_prob
            )
            t = t - (
                np.log(
                    alpha * np.exp(forward.log_prob(value, sum=True))
                    + (1 - alpha) * np.exp(log_prob)
                )
                + old_log_prob
            )
            _ctx.metropolis_hastings_site_transition_log_prob = t
            return value, log_prob
    # LMH, or RMH with no kernel for this distribution type
    value = distribution.sample(rng)
    log_prob = distribution.log_prob(value, sum=True)
    return value, log_prob


def _init_traces(
    func,
    trace_mode=TraceMode.PRIOR,
    prior_inflation=PriorInflation.DISABLED,
    inference_engine=InferenceEngine.IMPORTANCE_SAMPLING,
    inference_network=None,
    observe=None,
    metropolis_hastings_trace=None,
    address_dictionary=None,
    likelihood_importance=1.0,
):
    _ctx.trace_mode = trace_mode
    _ctx.inference_engine = inference_engine
    _ctx.prior_inflation = prior_inflation
    _ctx.likelihood_importance = likelihood_importance
    _ctx.address_dictionary = address_dictionary
    _ctx.root_function_name = func.__code__.co_name
    _ctx.smc_replay_values = None
    if observe is None:
        _ctx.observed_variables = {}
    else:
        if any(v is None for v in observe.values()):
            raise RuntimeError(f"Observe has missing value(s): {observe}")
        _ctx.observed_variables = observe
    _ctx.inference_network = inference_network
    if inference_network is None:
        if (
            inference_engine
            == InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK
        ):
            raise ValueError(
                "Cannot run IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK without an inference network."
            )
    else:
        inference_network._infer_init(_ctx.observed_variables)

    if inference_engine in (
        InferenceEngine.LIGHTWEIGHT_METROPOLIS_HASTINGS,
        InferenceEngine.RANDOM_WALK_METROPOLIS_HASTINGS,
    ):
        _ctx.metropolis_hastings_trace = metropolis_hastings_trace
        _ctx.metropolis_hastings_site_transition_log_prob = None
        if metropolis_hastings_trace is not None:
            rng = _get_rng()
            variables = metropolis_hastings_trace.variables_controlled
            variable = variables[int(rng.integers(len(variables)))]
            _ctx.metropolis_hastings_site_address = variable.address


def _begin_trace():
    _ctx.execution_start = time.time()
    _ctx.current_trace = Trace()
    _ctx.previous_variable = None


def _end_trace(result):
    execution_time_sec = time.time() - _ctx.execution_start
    _ctx.current_trace.end(result, execution_time_sec)
    trace = _ctx.current_trace
    _ctx.current_trace = None
    return trace
