"""Model API and inference engines.

Counterpart of the reference Model / RemoteModel / ConditionalModel /
ParallelModel (reference: pyprob/model.py:23-406).  The user subclasses
``Model`` and implements ``forward`` calling ``pyprob_tpu.sample`` /
``observe`` / ``factor`` / ``tag``; inference engines replay the program.

Two execution tiers:

* interpreter tier (this file) — per-trace host execution, universal, used
  for arbitrary Python / remote PPX models and for MCMC over dynamic
  control flow;
* compiled tier (``pyprob_tpu.vectorized``) — the same ``forward`` traced
  under ``jax.vmap`` to run thousands of particles per TPU chip; enabled
  via ``Model.posterior(..., vectorized=True)`` or auto-detection.
"""

from __future__ import annotations

import math
import multiprocessing
import os
import sys
import time
import uuid
import warnings

import numpy as np

from . import state, util
from .util import TraceMode, PriorInflation, InferenceEngine, InferenceNetwork, Optimizer, LearningRateScheduler
from .address import AddressDictionary
from .distributions import Empirical


def trace_result(trace):
    return trace.result


def trace_id(trace):
    return trace


class Model:
    def __init__(self, name="Unnamed pyprob_tpu model", address_dict_file_name=None):
        super().__init__()
        self.name = name
        self._inference_network = None
        if address_dict_file_name is None:
            self._address_dictionary = None
        else:
            self._address_dictionary = AddressDictionary(address_dict_file_name)

    def __repr__(self):
        return f"Model(name:{self.name})"

    def forward(self):
        raise RuntimeError("Model instances must provide a forward method.")

    # ------------------------------------------------------------------
    # trace generation (interpreter tier)
    # ------------------------------------------------------------------
    def _trace_generator(
        self,
        trace_mode=TraceMode.PRIOR,
        prior_inflation=PriorInflation.DISABLED,
        inference_engine=InferenceEngine.IMPORTANCE_SAMPLING,
        inference_network=None,
        observe=None,
        metropolis_hastings_trace=None,
        likelihood_importance=1.0,
        *args,
        **kwargs,
    ):
        state._init_traces(
            func=self.forward,
            trace_mode=trace_mode,
            prior_inflation=prior_inflation,
            inference_engine=inference_engine,
            inference_network=inference_network,
            observe=observe,
            metropolis_hastings_trace=metropolis_hastings_trace,
            address_dictionary=self._address_dictionary,
            likelihood_importance=likelihood_importance,
        )
        while True:
            state._begin_trace()
            result = self.forward(*args, **kwargs)
            trace = state._end_trace(result)
            yield trace

    def _traces(
        self,
        num_traces=10,
        trace_mode=TraceMode.PRIOR,
        prior_inflation=PriorInflation.DISABLED,
        inference_engine=InferenceEngine.IMPORTANCE_SAMPLING,
        inference_network=None,
        map_func=None,
        silent=False,
        observe=None,
        file_name=None,
        likelihood_importance=1.0,
        *args,
        **kwargs,
    ):
        generator = self._trace_generator(
            trace_mode=trace_mode,
            prior_inflation=prior_inflation,
            inference_engine=inference_engine,
            inference_network=inference_network,
            observe=observe,
            likelihood_importance=likelihood_importance,
            *args,
            **kwargs,
        )
        traces = Empirical(file_name=file_name)
        if map_func is None:
            map_func = trace_id
        log_weights = np.zeros(num_traces)
        time_start = time.time()
        prev_duration = 0.0
        for i in range(num_traces):
            trace = next(generator)
            if trace_mode == TraceMode.PRIOR:
                log_weight = 1.0
            else:
                log_weight = trace.log_importance_weight
            if util.has_nan_or_inf(log_weight):
                warnings.warn(
                    "Encountered trace with nan/inf log_weight. Discarding trace."
                )
                if i > 0:
                    log_weights[i] = log_weights[i - 1]
            else:
                traces.add(map_func(trace), log_weight)
                log_weights[i] = log_weight
            if not silent and util.verbosity() > 1:
                duration = time.time() - time_start
                if duration - prev_duration > util._print_refresh_rate or (
                    i == num_traces - 1
                ):
                    prev_duration = duration
                    tps = (i + 1) / max(duration, 1e-9)
                    ess = util.effective_sample_size(log_weights[: i + 1])
                    util.progress_update(
                        f"{util.days_hours_mins_secs_str(duration)} | "
                        f"{i + 1}/{num_traces} | ESS: {ess:,.2f} | {tps:,.2f} traces/s"
                    )
        if not silent and util.verbosity() > 1:
            util.progress_end()
        traces.finalize()
        return traces

    def get_trace(self, *args, **kwargs):
        warnings.warn("Model.get_trace is deprecated. Use Model.sample instead.")
        return next(self._trace_generator(*args, **kwargs))

    def sample(self, *args, **kwargs):
        return next(self._trace_generator(*args, **kwargs))

    # ------------------------------------------------------------------
    # prior
    # ------------------------------------------------------------------
    def prior(
        self,
        num_traces=10,
        prior_inflation=PriorInflation.DISABLED,
        map_func=None,
        file_name=None,
        likelihood_importance=1.0,
        vectorized=None,
        *args,
        **kwargs,
    ):
        if self._use_vectorized(vectorized):
            from .vectorized import vectorized_prior

            prior = vectorized_prior(
                self,
                num_traces=num_traces,
                prior_inflation=prior_inflation,
                map_func=map_func,
                file_name=file_name,
                *args,
                **kwargs,
            )
            if prior is not None:
                return prior
        prior = self._traces(
            num_traces=num_traces,
            trace_mode=TraceMode.PRIOR,
            prior_inflation=prior_inflation,
            map_func=map_func,
            file_name=file_name,
            likelihood_importance=likelihood_importance,
            *args,
            **kwargs,
        )
        prior.rename(f"Prior, traces: {prior.length:,}")
        prior.add_metadata(
            op="prior",
            num_traces=num_traces,
            prior_inflation=str(prior_inflation),
            likelihood_importance=likelihood_importance,
        )
        return prior

    def prior_results(
        self,
        num_traces=10,
        prior_inflation=PriorInflation.DISABLED,
        map_func=trace_result,
        file_name=None,
        likelihood_importance=1.0,
        *args,
        **kwargs,
    ):
        return self.prior(
            num_traces=num_traces,
            prior_inflation=prior_inflation,
            map_func=map_func,
            file_name=file_name,
            likelihood_importance=likelihood_importance,
            *args,
            **kwargs,
        )

    # ------------------------------------------------------------------
    # posterior
    # ------------------------------------------------------------------
    def _use_vectorized(self, vectorized):
        """Whether to attempt the compiled tier.  None means auto: try once
        and cache whether the model's forward is jax-traceable."""
        if vectorized is not None:
            return vectorized
        return getattr(self, "vectorize", False)

    def posterior(
        self,
        num_traces=10,
        inference_engine=InferenceEngine.IMPORTANCE_SAMPLING,
        initial_trace=None,
        map_func=None,
        observe=None,
        file_name=None,
        thinning_steps=None,
        likelihood_importance=1.0,
        vectorized=None,
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
        lockstep=None,
        *args,
        **kwargs,
    ):
        """initial_trace resumes chains: a Trace or ChainState for LMH/RMH
        (pyprob_tpu.inference.mcmc) or a GradientChainState
        (posterior.final_gradient_state) for HMC/NUTS — gradient resumes
        skip warmup and rescore automatically when the observation
        changed.  num_chains / burn_in / return_chains configure the
        compiled MCMC tier (vmapped parallel chains,
        pyprob_tpu.inference.mcmc);
        resample_threshold and resampling ('systematic' | 'stratified' |
        'residual' | 'multinomial') configure the SMC engines
        (pyprob_tpu.inference.smc); vi_steps / vi_particles / guide /
        learning_rate configure the VARIATIONAL_INFERENCE engine
        (pyprob_tpu.inference.vi); leapfrog_steps / target_accept /
        step_size configure HAMILTONIAN_MONTE_CARLO
        (pyprob_tpu.inference.hmc) and max_tree_depth / target_accept /
        step_size NO_U_TURN_SAMPLER (pyprob_tpu.inference.nuts); mesh
        shards MCMC chains, SMC particles
        or VI draws over devices.  None of them apply to the
        reference-style sequential interpreter chain."""
        is_smc = inference_engine in (
            InferenceEngine.SEQUENTIAL_MONTE_CARLO,
            InferenceEngine.SEQUENTIAL_MONTE_CARLO_WITH_INFERENCE_NETWORK,
        )
        is_hmc = inference_engine in (
            InferenceEngine.HAMILTONIAN_MONTE_CARLO,
            InferenceEngine.NO_U_TURN_SAMPLER,
            InferenceEngine.PARALLEL_TEMPERING,
            InferenceEngine.TEMPERED_SMC,
        )
        is_vi = inference_engine in (
            InferenceEngine.VARIATIONAL_INFERENCE,
            InferenceEngine.STEIN_VARIATIONAL_GRADIENT_DESCENT,
            InferenceEngine.LAPLACE,
        )
        # SMC/HMC/NUTS/VI exist only on the compiled tier (SMC has an
        # interpreter fallback): attempt it regardless of the vectorized
        # default, and fail loudly when the model can't compile
        if self._use_vectorized(vectorized) or (
            (is_smc or is_hmc or is_vi) and vectorized is not False
        ):
            from .vectorized import vectorized_posterior

            result = vectorized_posterior(
                self,
                num_traces=num_traces,
                inference_engine=inference_engine,
                map_func=map_func,
                observe=observe,
                file_name=file_name,
                initial_trace=initial_trace,
                thinning_steps=thinning_steps,
                likelihood_importance=likelihood_importance,
                num_chains=num_chains,
                burn_in=burn_in,
                return_chains=return_chains,
                mesh=mesh,
                resample_threshold=resample_threshold,
                resampling=resampling,
                vi_steps=vi_steps,
                vi_particles=vi_particles,
                guide=guide,
                learning_rate=learning_rate,
                leapfrog_steps=leapfrog_steps,
                target_accept=target_accept,
                step_size=step_size,
                max_tree_depth=max_tree_depth,
                num_temperatures=num_temperatures,
                rejuvenation_steps=rejuvenation_steps,
                svgd_steps=svgd_steps,
                svgd_particles=svgd_particles,
                map_steps=map_steps,
                num_starts=num_starts,
                *args,
                **kwargs,
            )
            if result is not None:
                return result
        if is_vi:
            raise RuntimeError(
                f"{inference_engine.name} requires a jax-traceable model "
                "(gradients need XLA); this model fell back to the "
                "interpreter tier. Use LMH/RMH or SMC instead."
            )
        if is_hmc:
            raise RuntimeError(
                f"{inference_engine.name} requires a jax-traceable model "
                "(gradients need XLA); this model fell back to the "
                "interpreter tier. Use LMH/RMH or SMC instead."
            )
        if is_smc:
            if (
                inference_engine
                == InferenceEngine.SEQUENTIAL_MONTE_CARLO_WITH_INFERENCE_NETWORK
            ):
                raise RuntimeError(
                    "SEQUENTIAL_MONTE_CARLO_WITH_INFERENCE_NETWORK requires "
                    "a jax-traceable model (compiled tier); for this model "
                    "use plain SEQUENTIAL_MONTE_CARLO (interpreter filter) "
                    "or IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK."
                )
            from .inference.smc import interpreter_smc_posterior

            return interpreter_smc_posterior(
                self,
                num_traces=num_traces,
                observe=observe,
                map_func=map_func,
                file_name=file_name,
                resample_threshold=resample_threshold,
                resampling=resampling,
                likelihood_importance=likelihood_importance,
                args=args,
                kwargs=kwargs,
            )
        if num_chains is not None or burn_in is not None or return_chains or mesh is not None:
            warnings.warn(
                "num_chains/burn_in/return_chains/mesh only apply to the "
                "compiled MCMC/SMC tiers (vectorized=True on a "
                "jax-traceable model); the sequential interpreter chain "
                "ignores them."
            )

        if inference_engine == InferenceEngine.IMPORTANCE_SAMPLING:
            posterior = self._traces(
                num_traces=num_traces,
                trace_mode=TraceMode.POSTERIOR,
                inference_engine=inference_engine,
                inference_network=None,
                map_func=map_func,
                observe=observe,
                file_name=file_name,
                likelihood_importance=likelihood_importance,
                *args,
                **kwargs,
            )
            posterior.rename(
                f"Posterior, IS, traces: {posterior.length:,}, "
                f"ESS: {posterior.effective_sample_size:,.2f}"
            )
            posterior.add_metadata(
                op="posterior",
                num_traces=num_traces,
                inference_engine=str(inference_engine),
                effective_sample_size=posterior.effective_sample_size,
                likelihood_importance=likelihood_importance,
            )
        elif (
            inference_engine
            == InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK
        ):
            if self._inference_network is None:
                raise RuntimeError(
                    "No inference network available. Use learn_inference_network "
                    "or load_inference_network first."
                )
            # interpreter-tier guided IS defaults to the lockstep thread
            # pool: K particles in flight, one batched network dispatch
            # per (site, structure) bucket instead of one per particle —
            # the local analogue of LockstepRemoteModel
            # (pyprob_tpu.interpreter_lockstep).  lockstep=False forces
            # the sequential reference-style loop; an int sets the pool
            # size.  Subclasses whose forward is not thread-safe
            # (RemoteModel sockets, ConditionalModel wrappers) opt out
            # via _local_lockstep_ok.
            use_lockstep = (
                lockstep is not False
                and getattr(self, "_local_lockstep_ok", True)
                and num_traces >= 8
                # duck-typed stand-in networks (tests, user experiments)
                # lack the param tables the batched step gathers from —
                # they keep the sequential per-site path
                and hasattr(self._inference_network, "_params")
                and hasattr(
                    self._inference_network, "_embed_observe_pure"
                )
            )
            if use_lockstep:
                from .interpreter_lockstep import (
                    lockstep_interpreter_traces,
                )

                posterior = lockstep_interpreter_traces(
                    self,
                    num_traces=num_traces,
                    inference_network=self._inference_network,
                    observe=observe,
                    map_func=map_func,
                    file_name=file_name,
                    likelihood_importance=likelihood_importance,
                    num_workers=(
                        lockstep
                        if isinstance(lockstep, int)
                        and not isinstance(lockstep, bool)
                        else None
                    ),
                    args=args,
                    kwargs=kwargs,
                )
            else:
                posterior = self._traces(
                    num_traces=num_traces,
                    trace_mode=TraceMode.POSTERIOR,
                    inference_engine=inference_engine,
                    inference_network=self._inference_network,
                    map_func=map_func,
                    observe=observe,
                    file_name=file_name,
                    likelihood_importance=likelihood_importance,
                    *args,
                    **kwargs,
                )
            posterior.rename(
                f"Posterior, IC, traces: {posterior.length:,}, "
                f"train. traces: {self._inference_network._total_train_traces:,}, "
                f"ESS: {posterior.effective_sample_size:,.2f}"
            )
            posterior.add_metadata(
                op="posterior",
                num_traces=num_traces,
                inference_engine=str(inference_engine),
                effective_sample_size=posterior.effective_sample_size,
                likelihood_importance=likelihood_importance,
                train_traces=self._inference_network._total_train_traces,
            )
        else:  # LMH / RMH
            posterior = self._mcmc_posterior(
                num_traces=num_traces,
                inference_engine=inference_engine,
                initial_trace=initial_trace,
                map_func=map_func,
                observe=observe,
                file_name=file_name,
                thinning_steps=thinning_steps,
                *args,
                **kwargs,
            )
        return posterior

    def _mcmc_posterior(
        self,
        num_traces,
        inference_engine,
        initial_trace=None,
        map_func=None,
        observe=None,
        file_name=None,
        thinning_steps=None,
        *args,
        **kwargs,
    ):
        """Single-site Metropolis-Hastings chain with the reference's
        acceptance formula (reference: model.py:118-177)."""
        from .inference import ChainState

        if isinstance(initial_trace, ChainState):
            raise TypeError(
                "ChainState resume requires the compiled MCMC tier "
                "(posterior(..., vectorized=True) on a jax-traceable "
                "model); the interpreter chain resumes from a Trace."
            )
        posterior = Empirical(file_name=file_name)
        if map_func is None:
            map_func = trace_id
        if initial_trace is None:
            initial_trace = next(
                self._trace_generator(
                    trace_mode=TraceMode.POSTERIOR,
                    inference_engine=inference_engine,
                    observe=observe,
                    *args,
                    **kwargs,
                )
            )
        if len(initial_trace) == 0:
            raise RuntimeError(
                "Cannot run MCMC with an empty initial trace. The model needs "
                "at least one sample statement."
            )
        current_trace = initial_trace
        rng = util.get_rng()
        time_start = time.time()
        traces_accepted = 0
        samples_reused = 0
        samples_all = 0
        prev_duration = 0.0
        if thinning_steps is None:
            thinning_steps = 1

        for i in range(num_traces):
            candidate_trace = next(
                self._trace_generator(
                    trace_mode=TraceMode.POSTERIOR,
                    inference_engine=inference_engine,
                    metropolis_hastings_trace=current_trace,
                    observe=observe,
                    *args,
                    **kwargs,
                )
            )
            log_acceptance_ratio = (
                math.log(current_trace.length_controlled)
                - math.log(candidate_trace.length_controlled)
                + candidate_trace.log_prob_observed
                - current_trace.log_prob_observed
            )
            for variable in candidate_trace.variables_controlled:
                if variable.reused:
                    log_acceptance_ratio += np.sum(variable.log_prob)
                    log_acceptance_ratio -= np.sum(
                        current_trace.variables_dict_address[
                            variable.address
                        ].log_prob
                    )
                    samples_reused += 1
            samples_all += candidate_trace.length_controlled

            if state._ctx.metropolis_hastings_site_transition_log_prob is None:
                warnings.warn(
                    "Trace did not hit the Metropolis-Hastings site; ensure the "
                    "model is deterministic apart from sample calls"
                )
            else:
                log_acceptance_ratio += np.sum(
                    state._ctx.metropolis_hastings_site_transition_log_prob
                )

            if math.log(max(rng.random(), 1e-300)) < float(log_acceptance_ratio):
                traces_accepted += 1
                current_trace = candidate_trace
            if i % thinning_steps == 0:
                posterior.add(map_func(current_trace))

            if util.verbosity() > 1:
                duration = time.time() - time_start
                if duration - prev_duration > util._print_refresh_rate or (
                    i == num_traces - 1
                ):
                    prev_duration = duration
                    tps = (i + 1) / max(duration, 1e-9)
                    util.progress_update(
                        f"{util.days_hours_mins_secs_str(duration)} | "
                        f"{i + 1}/{num_traces} | accepted {100 * traces_accepted / (i + 1):,.2f}% | "
                        f"reuse {100 * samples_reused / max(1, samples_all):,.2f}% | "
                        f"{tps:,.2f} traces/s"
                    )
        if util.verbosity() > 1:
            util.progress_end()
        posterior.finalize()
        engine_name = (
            "LMH"
            if inference_engine == InferenceEngine.LIGHTWEIGHT_METROPOLIS_HASTINGS
            else "RMH"
        )
        posterior.rename(
            f"Posterior, {engine_name}, traces: {posterior.length:,}, "
            f"accepted: {100 * traces_accepted / num_traces:,.2f}%, "
            f"sample reuse: {100 * samples_reused / max(1, samples_all):,.2f}%"
        )
        posterior.add_metadata(
            op="posterior",
            num_traces=num_traces,
            inference_engine=str(inference_engine),
            thinning_steps=thinning_steps,
            num_traces_accepted=traces_accepted,
            num_samples_reused=samples_reused,
            num_samples=samples_all,
        )
        return posterior

    def posterior_results(
        self,
        num_traces=10,
        inference_engine=InferenceEngine.IMPORTANCE_SAMPLING,
        initial_trace=None,
        map_func=trace_result,
        observe=None,
        file_name=None,
        thinning_steps=None,
        *args,
        **kwargs,
    ):
        return self.posterior(
            num_traces=num_traces,
            inference_engine=inference_engine,
            initial_trace=initial_trace,
            map_func=map_func,
            observe=observe,
            file_name=file_name,
            thinning_steps=thinning_steps,
            *args,
            **kwargs,
        )

    def map_estimate(
        self,
        observe=None,
        map_steps=None,
        num_starts=None,
        learning_rate=None,
        likelihood_importance=1.0,
        *args,
        **kwargs,
    ):
        """Posterior mode of the continuous latents (beyond parity — no
        reference counterpart): multi-start gradient descent on the
        unconstrained-space potential, enumerable discrete sites
        marginalized and drawn from their exact conditional at the mode.
        Returns a ``pyprob_tpu.inference.laplace.MAPResult`` with
        ``values`` (constrained-space mode per latent site), ``result``
        (forward() at the mode) and ``log_joint``.  Requires a
        jax-traceable model."""
        from .inference.laplace import map_estimate as _map_estimate

        return _map_estimate(
            self,
            observe=observe,
            map_steps=map_steps,
            num_starts=num_starts,
            learning_rate=learning_rate,
            likelihood_importance=likelihood_importance,
            args=args,
            kwargs=kwargs,
        )

    def posterior_predictive(
        self,
        posterior,
        num_traces=1000,
        map_func=None,
        file_name=None,
        *args,
        **kwargs,
    ):
        """Posterior-predictive distribution (beyond parity — no reference
        counterpart): each draw samples a trace from ``posterior`` (a
        trace-valued Empirical from ``posterior()``), pins the controlled
        latents to that trace's values, and re-runs forward() with every
        observe SAMPLED fresh from its likelihood.  Returns an Empirical
        over map_func(trace) (default: the full trace)."""
        from .trace import Trace

        generator = self._trace_generator(
            trace_mode=TraceMode.PRIOR_FOR_INFERENCE_NETWORK,
            inference_engine=InferenceEngine.IMPORTANCE_SAMPLING,
            *args,
            **kwargs,
        )
        emp = Empirical(file_name=file_name)
        for _ in range(num_traces):
            src = posterior.sample()
            if not isinstance(src, Trace):
                raise RuntimeError(
                    "posterior_predictive needs a trace-valued posterior "
                    "(use posterior(...), not posterior_results(...))"
                )
            replay = {
                v.address: v.value for v in src.variables_controlled
            }
            state._set_smc_replay(replay)
            try:
                t = next(generator)
            finally:
                state._set_smc_replay(None)
            emp.add(t if map_func is None else map_func(t), log_weight=0.0)
        emp.finalize()
        emp.rename(f"Posterior predictive, traces: {emp.length:,}")
        emp.add_metadata(op="posterior_predictive", num_traces=num_traces)
        return emp

    def posterior_predictive_results(self, posterior, num_traces=1000,
                                     *args, **kwargs):
        """Posterior-predictive distribution over forward()'s return
        value."""
        return self.posterior_predictive(
            posterior, num_traces=num_traces, map_func=trace_result,
            *args, **kwargs,
        )

    # ------------------------------------------------------------------
    # inference compilation
    # ------------------------------------------------------------------
    def reset_inference_network(self):
        self._inference_network = None

    def learn_inference_network(
        self,
        num_traces,
        num_traces_end=1e9,
        inference_network=InferenceNetwork.FEEDFORWARD,
        prior_inflation=PriorInflation.DISABLED,
        dataset_dir=None,
        dataset_valid_dir=None,
        observe_embeddings={},
        batch_size=64,
        valid_size=None,
        valid_every=None,
        optimizer_type=Optimizer.ADAM,
        learning_rate_init=0.001,
        learning_rate_end=1e-6,
        learning_rate_scheduler_type=LearningRateScheduler.NONE,
        momentum=0.9,
        weight_decay=0.0,
        save_file_name_prefix=None,
        save_every_sec=600,
        pre_generate_layers=False,
        distributed_backend=None,
        distributed_params_sync_every_iter=10000,
        distributed_num_buckets=None,
        dataloader_offline_num_workers=0,
        stop_with_bad_loss=True,
        log_file_name=None,
        lstm_dim=512,
        lstm_depth=1,
        proposal_mixture_components=10,
        tie_address_instances=None,
        ema_decay=None,
        keep_best=False,
        keep_best_every=None,
        keep_best_metric=None,
        keep_best_observe=None,
        keep_best_num_traces=100000,
    ):
        """``tie_address_instances``: key proposal heads (and per-address
        embeddings) on the address base instead of the full
        instance-numbered address, sharing ONE set of weights across
        every occurrence of a repeated site — amortization across time,
        and the requirement for guided scan-SMC.  Default: automatic
        (enabled for MarkovModel subclasses, whose step sites repeat by
        construction; disabled otherwise).

        ``ema_decay``: Polyak/EMA parameter averaging per optimizer step
        (e.g. 0.98); proposals are served from the average — stabilizes
        late constant-lr training (BASELINE.md r5).  ``keep_best``:
        validation-based checkpoint selection — probe every
        ``keep_best_every`` traces and restore the best checkpoint at
        the end.  The metric is ``keep_best_metric`` (callable
        ``net -> float``, higher is better); or, given
        ``keep_best_observe`` (an observe dict), the guided-IS
        effective-sample-size fraction over ``keep_best_num_traces``
        traces of THIS model; or, given ``dataset_valid_dir``, the
        negative validation loss."""
        from .nn import (
            InferenceNetworkFeedForward,
            InferenceNetworkLSTM,
            OnlineDataset,
            OfflineDataset,
        )

        if tie_address_instances is None:
            from .markov import MarkovModel

            tie_address_instances = isinstance(self, MarkovModel)

        if dataset_dir is None:
            dataset = OnlineDataset(model=self, prior_inflation=prior_inflation)
        else:
            dataset = OfflineDataset(dataset_dir=dataset_dir)
        if dataset_valid_dir is None:
            dataset_valid = None
        else:
            dataset_valid = OfflineDataset(dataset_dir=dataset_valid_dir)

        if self._inference_network is None:
            util.log_print("Creating new inference network...")
            if inference_network == InferenceNetwork.FEEDFORWARD:
                self._inference_network = InferenceNetworkFeedForward(
                    model=self,
                    observe_embeddings=observe_embeddings,
                    proposal_mixture_components=proposal_mixture_components,
                    tie_address_instances=tie_address_instances,
                )
            elif inference_network == InferenceNetwork.LSTM:
                self._inference_network = InferenceNetworkLSTM(
                    model=self,
                    observe_embeddings=observe_embeddings,
                    lstm_dim=lstm_dim,
                    lstm_depth=lstm_depth,
                    proposal_mixture_components=proposal_mixture_components,
                    tie_address_instances=tie_address_instances,
                )
            else:
                raise ValueError(f"Unknown inference_network: {inference_network}")
            if pre_generate_layers:
                if dataset_valid_dir is not None:
                    self._inference_network._pre_generate_layers(dataset_valid)
                if dataset_dir is not None:
                    self._inference_network._pre_generate_layers(dataset)
        else:
            util.log_print("Continuing to train existing inference network...")

        if keep_best and keep_best_metric is None and (
            keep_best_observe is not None
        ):
            # guided-IS ESS probe on this model: the bench-validated
            # checkpoint-selection recipe, now a library surface
            engine = InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK

            def keep_best_metric(net):
                probe = self.posterior_results(
                    num_traces=keep_best_num_traces,
                    observe=keep_best_observe,
                    vectorized=True,
                    inference_engine=engine,
                )
                return probe.effective_sample_size / keep_best_num_traces

        self._inference_network.optimize(
            num_traces=num_traces,
            dataset=dataset,
            dataset_valid=dataset_valid,
            num_traces_end=num_traces_end,
            batch_size=batch_size,
            valid_every=valid_every,
            optimizer_type=optimizer_type,
            learning_rate_init=learning_rate_init,
            learning_rate_end=learning_rate_end,
            learning_rate_scheduler_type=learning_rate_scheduler_type,
            momentum=momentum,
            weight_decay=weight_decay,
            save_file_name_prefix=save_file_name_prefix,
            save_every_sec=save_every_sec,
            distributed_backend=distributed_backend,
            distributed_params_sync_every_iter=distributed_params_sync_every_iter,
            distributed_num_buckets=distributed_num_buckets,
            stop_with_bad_loss=stop_with_bad_loss,
            log_file_name=log_file_name,
            ema_decay=ema_decay,
            keep_best=keep_best,
            keep_best_every=keep_best_every,
            keep_best_metric=keep_best_metric,
        )

    def save_inference_network(self, file_name):
        if self._inference_network is None:
            raise RuntimeError("The model has no trained inference network.")
        self._inference_network._save(file_name)

    def load_inference_network(self, file_name):
        from .nn import InferenceNetwork as InferenceNetworkBase

        self._inference_network = InferenceNetworkBase._load(file_name)
        self._inference_network._model = self

    def save_dataset(
        self,
        dataset_dir,
        num_traces,
        num_traces_per_file,
        prior_inflation=PriorInflation.DISABLED,
        *args,
        **kwargs,
    ):
        from .nn import OnlineDataset

        if not os.path.exists(dataset_dir):
            util.log_print(f"Directory does not exist, creating: {dataset_dir}")
            os.makedirs(dataset_dir)
        dataset = OnlineDataset(self, prior_inflation=prior_inflation)
        dataset.save_dataset(
            dataset_dir=dataset_dir,
            num_traces=num_traces,
            num_traces_per_file=num_traces_per_file,
            *args,
            **kwargs,
        )

    # ------------------------------------------------------------------
    def condition(self, criterion, criterion_timeout=1e6):
        return ConditionalModel(
            self, criterion=criterion, criterion_timeout=criterion_timeout
        )

    def filter(self, *args, **kwargs):
        warnings.warn("Model.filter is deprecated. Use Model.condition instead.")
        return self.condition(*args, **kwargs)

    def parallel(self, num_workers=None):
        return ParallelModel(self, num_workers=num_workers)


class RemoteModel(Model):
    """Model whose forward delegates to a PPX model server
    (reference: pyprob/model.py:245-267).

    Never enters the compiled tier: tracing forward() would abandon the
    ZMQ REQ/REP exchange mid-protocol and desynchronize the simulator."""

    _never_vectorize = True
    # one socket, strictly sequential protocol: the local lockstep thread
    # pool cannot run this forward concurrently (use LockstepRemoteModel)
    _local_lockstep_ok = False

    def __init__(
        self,
        server_address="tcp://127.0.0.1:5555",
        before_forward_func=None,
        after_forward_func=None,
        timeout_sec=None,
        *args,
        **kwargs,
    ):
        self._server_address = server_address
        self._model_server = None
        self._before_forward_func = before_forward_func
        self._after_forward_func = after_forward_func
        self._timeout_sec = timeout_sec
        super().__init__(*args, **kwargs)

    def close(self):
        if self._model_server is not None:
            self._model_server.close()

    def forward(self, payload=None):
        # payload: optional per-run input tensor shipped to the simulator
        # inside the Run message (pyprob_tpu PPX extension) — lets callers
        # parameterize the simulator per inference call without named
        # observes: model.posterior(..., payload=np.array([...]))
        if self._model_server is None:
            from .remote import ModelServer

            self._model_server = ModelServer(
                self._server_address, timeout_sec=self._timeout_sec
            )
            self.name = "{} running on {}".format(
                self._model_server.model_name, self._model_server.system_name
            )
        if self._before_forward_func is not None:
            self._before_forward_func()
        ret = self._model_server.forward(payload=payload)
        if self._after_forward_func is not None:
            self._after_forward_func()
        return ret


class RemoteModelPool(Model):
    """Drive a pool of PPX simulators concurrently from one engine.

    Each worker thread owns one simulator connection and an isolated
    interpreter context (trace state is thread-local), so simulator compute
    and wire latency overlap across the pool.  The reference cannot do this
    (its ParallelModel refuses remote models and its trace state is module
    globals, reference: model.py:332-333, state.py:13-27).  MCMC engines
    are rejected (sequential-chain semantics, as in ParallelModel).  The
    IC engine works across the pool: proposal-network per-trace state
    (observe embedding, LSTM carry) is thread-local on the network, so K
    workers run guided traces against the shared parameters concurrently.
    """

    _never_vectorize = True
    _local_lockstep_ok = False  # owns its own per-connection threading

    def __init__(self, server_addresses, timeout_sec=None, *args, **kwargs):
        self._server_addresses = list(server_addresses)
        self._timeout_sec = timeout_sec
        super().__init__(*args, **kwargs)
        self.name = f"RemoteModelPool({len(self._server_addresses)} simulators)"

    def posterior(
        self,
        num_traces=10,
        inference_engine=InferenceEngine.IMPORTANCE_SAMPLING,
        *args,
        **kwargs,
    ):
        if inference_engine in (
            InferenceEngine.LIGHTWEIGHT_METROPOLIS_HASTINGS,
            InferenceEngine.RANDOM_WALK_METROPOLIS_HASTINGS,
        ):
            raise ValueError(
                f"{inference_engine} not supported by RemoteModelPool "
                "(sequential chain semantics)"
            )
        return Model.posterior(
            self, num_traces, inference_engine=inference_engine, *args, **kwargs
        )

    def _traces(self, num_traces=10, file_name=None, silent=False, map_func=None, **kwargs):
        import threading

        from . import state as state_module

        k = len(self._server_addresses)
        per = num_traces // k
        counts = [per + (1 if i < num_traces - per * k else 0) for i in range(k)]
        results = [None] * k
        errors = []
        base_seed = int(util.get_rng().integers(2**31))

        def worker(i):
            try:
                # isolated per-thread RNG stream (trace state is already
                # thread-local via state._ctx)
                state_module._ctx.rng = np.random.default_rng(base_seed + i)
                model = RemoteModel(
                    self._server_addresses[i], timeout_sec=self._timeout_sec
                )
                try:
                    results[i] = model._traces(
                        num_traces=counts[i],
                        silent=True,
                        map_func=map_func,
                        **kwargs,
                    )
                finally:
                    model.close()
            except Exception as e:  # surfaced after join
                errors.append((i, e))

        threads = [
            threading.Thread(target=worker, args=(i,), daemon=True)
            for i in range(k)
        ]
        t0 = time.time()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        if errors:
            raise RuntimeError(f"RemoteModelPool worker failures: {errors}")
        merged = Empirical(concat_empiricals=results)
        out = merged.copy(file_name=file_name)
        if not silent and util.verbosity() > 1:
            dt = time.time() - t0
            util.log_print(
                f"[pool] {num_traces:,} traces over {k} simulators in "
                f"{dt:.2f}s ({num_traces / max(dt, 1e-9):,.1f} traces/s)"
            )
        return out


class ConditionalModel(Model):
    """Hard rejection conditioning on a trace criterion
    (reference: pyprob/model.py:270-298).  Interpreter tier only (the
    criterion consumes whole host-side traces)."""

    _never_vectorize = True
    _local_lockstep_ok = False  # wraps the base model's trace generator

    def __init__(self, base_model, criterion, criterion_timeout=1e6):
        self._base_model = base_model
        self._criterion = criterion
        self._criterion_timeout = int(criterion_timeout)
        self._traces_total = 1.0
        self._traces_accepted = 1.0
        super().__init__(name=f"ConditionalModel({base_model.name})")

    def __repr__(self):
        return f"ConditionalModel({self._base_model})"

    @property
    def acceptance_ratio(self):
        return self._traces_accepted / self._traces_total

    def _trace_generator(self, *args, **kwargs):
        i = 0
        while True:
            i += 1
            if i > self._criterion_timeout:
                raise RuntimeError(
                    f"ConditionalModel could not satisfy the criterion. "
                    f"Timeout ({self._criterion_timeout}) reached."
                )
            trace = next(self._base_model._trace_generator(*args, **kwargs))
            self._traces_total += 1.0
            if self._criterion(trace):
                self._traces_accepted += 1.0
                yield trace


def _parallel_worker_init():
    """Pool initializer (runs in the spawned child BEFORE any task
    unpickles): pin the jax backend to host CPU so K children never
    contend for a remote accelerator over its tunnel."""
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass


class _ParallelModelWorker:
    def __init__(self, model, kwargs):
        self._model = model
        self._kwargs = kwargs

    def run(self, args):
        seed, num_traces, file_name = args
        # spawned child: force the CPU backend before first jax use (the
        # parent may hold the chip; K children contending for it over the
        # tunnel would serialize, and the interpreter tier's batched
        # steps are latency-bound host work)
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass  # backend already initialized (in-process pool reuse)
        util.seed(seed)
        kwargs = dict(self._kwargs)
        kwargs.update(file_name=file_name, num_traces=num_traces, silent=True)
        net = kwargs.get("inference_network")
        if net is not None and getattr(net, "_model", None) is None:
            net._model = self._model  # back-reference dropped by pickling
        if (
            net is not None
            and kwargs.get("inference_engine")
            == InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK
            and getattr(self._model, "_local_lockstep_ok", True)
        ):
            # guided IC: run the thread-lockstep pool inside this process
            # (one batched network dispatch per site round) — processes
            # multiply what a single GIL can do
            from .interpreter_lockstep import lockstep_interpreter_traces

            traces = lockstep_interpreter_traces(
                self._model,
                num_traces=num_traces,
                inference_network=net,
                observe=kwargs.get("observe"),
                map_func=kwargs.get("map_func"),
                file_name=file_name,
                likelihood_importance=kwargs.get(
                    "likelihood_importance", 1.0
                ),
                silent=True,
            )
        else:
            traces = self._model._traces(**kwargs)
        log_weights = traces.log_weights_numpy()
        traces.close()
        return log_weights


class ParallelModel(Model):
    """Data-parallel trace generation over a process pool, merging per-worker
    Empirical chunk files (reference: pyprob/model.py:301-406).

    On TPU the compiled tier already fills a chip with vmapped particles;
    this class parallelizes the *interpreter tier* across host cores for
    models that cannot be vectorized.
    """

    # processes are this class's parallelism; the thread-lockstep runs
    # INSIDE each worker process for IC (see _ParallelModelWorker.run)
    _local_lockstep_ok = False

    def __init__(self, base_model, num_workers=None):
        self._base_model = base_model
        self._num_workers = num_workers or multiprocessing.cpu_count()
        super().__init__(name=f"ParallelModel({base_model.name})")

    def __repr__(self):
        return f"ParallelModel({self._base_model})"

    @property
    def _inference_network(self):
        # the trained proposal network lives on the base model; sharing it
        # lets posterior(..., IC) fan guided traces across the pool (the
        # reference's ParallelModel cannot run IC at all)
        return self._base_model._inference_network

    @_inference_network.setter
    def _inference_network(self, v):
        # Model.__init__ assigns None before meaning it; the network
        # lives on the base model, so only real assignments pass through
        if v is not None:
            self._base_model._inference_network = v

    def posterior(
        self,
        num_traces=10,
        inference_engine=InferenceEngine.IMPORTANCE_SAMPLING,
        *args,
        **kwargs,
    ):
        if inference_engine in (
            InferenceEngine.LIGHTWEIGHT_METROPOLIS_HASTINGS,
            InferenceEngine.RANDOM_WALK_METROPOLIS_HASTINGS,
        ):
            raise ValueError(
                f"{inference_engine} currently not supported by ParallelModel"
            )
        return Model.posterior(
            self, num_traces, inference_engine=inference_engine, *args, **kwargs
        )

    def _trace_generator(self, *args, **kwargs):
        return self._base_model._trace_generator(*args, **kwargs)

    def _traces(self, num_traces=10, file_name=None, silent=False, **kwargs):
        if file_name is None:
            file_mode = False
            file_name = os.path.join(
                os.environ.get("TMPDIR", "/tmp"), "pyprob_tpu_" + str(uuid.uuid4())
            )
        else:
            file_mode = True

        num_chunks = self._num_workers
        num_traces_per_chunk = num_traces // num_chunks
        left_over = num_traces - num_traces_per_chunk * num_chunks
        chunks, file_names = [], []
        seed = int(time.time()) % (2**31)
        for i in range(num_chunks):
            chunk = num_traces_per_chunk + (
                left_over if (i == num_chunks - 1 and left_over > 0) else 0
            )
            fn = f"{file_name}_chunk_{i + 1}_of_{num_chunks}"
            file_names.append(fn)
            chunks.append((seed + i, chunk, fn))

        time_start = time.time()
        prev_duration = 0.0
        all_log_weights = np.zeros(num_traces)
        lwi = 0
        # spawn (not fork): a forked child of a JAX-initialized process is
        # unsafe even if the child only uses the host numpy path.
        ctx = multiprocessing.get_context("spawn")
        with ctx.Pool(
            self._num_workers, initializer=_parallel_worker_init
        ) as pool:
            worker = _ParallelModelWorker(self._base_model, kwargs)
            for j, lw in enumerate(pool.imap(worker.run, chunks)):
                chunk_len = chunks[j][1]
                lw = np.asarray(lw)[-chunk_len:]
                all_log_weights[lwi : lwi + chunk_len] = lw
                lwi += chunk_len
                if not silent and util.verbosity() > 1:
                    duration = time.time() - time_start
                    if duration - prev_duration > util._print_refresh_rate:
                        prev_duration = duration
                        tps = lwi / max(duration, 1e-9)
                        ess = util.effective_sample_size(all_log_weights[:lwi])
                        util.progress_update(
                            f"{util.days_hours_mins_secs_str(duration)} | "
                            f"{lwi}/{num_traces} | ESS: {ess:,.2f} | {tps:,.2f} traces/s"
                        )
        if not silent and util.verbosity() > 1:
            util.progress_end()

        if file_mode:
            traces = Empirical(
                concat_empirical_file_names=file_names, file_name=file_name
            )
        else:
            cat = Empirical(concat_empirical_file_names=file_names)
            traces = cat.copy()
            cat.close()
            for fn in file_names:
                if os.path.exists(fn):
                    os.remove(fn)
        return traces
