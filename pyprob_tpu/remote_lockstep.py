"""Lockstep PPX: drive K simulators with batched device-side inference.

The reference services one simulator per process, one synchronous ZMQ
round-trip per random choice (reference: pyprob/remote.py:171-393), and its
IC engine evaluates the proposal network once per site *per trace*
(reference: pyprob/nn/inference_network_lstm.py:82-134).  Neither scales on
an accelerator whose per-dispatch latency dominates small ops.

``LockstepRemoteModel`` instead drives a pool of K PPX simulators from one
single-threaded event loop: Run is issued to all K, their Sample/Observe/Tag
callbacks are collected with a ZMQ poller, and requests that land on the
same site are answered with ONE batched operation — for the IC engine, one
jitted proposal-network step (LSTM carry rows gathered/scattered per
simulator) answers the whole pool, turning K host->device dispatches per
site into one.  Simulators with divergent control flow (different
addresses) simply form separate buckets within the same round, so
variable-structure models keep full semantics.

This is the remote-model counterpart of the compiled tier's batched guided
IS (pyprob_tpu/vectorized.py): the simulators hold the program counters,
the TPU answers every pool member's random choice in lockstep.  No
reference counterpart exists (its ParallelModel refuses remote models,
reference: pyprob/model.py:332-333).

Wire compatibility: standard PPX, byte-identical to the reference's
generated bindings — existing simulators (including the C++ ones in cpp/)
work unchanged.
"""

from __future__ import annotations

import time
import warnings

import numpy as np
import zmq

from . import state, util
from .util import TraceMode, PriorInflation, InferenceEngine
from .distributions import Empirical
from .model import Model, trace_id
from .ppx import wire
from .ppx.wire import MessageBody
from .remote import ZMQRequester, distribution_from_spec
from .trace import Variable


def _next_pow2(n):
    p = 1
    while p < n:
        p *= 2
    return p


class _BatchedProposer:
    """Answers IC proposal requests for a pool of simulators with one
    jitted network step per (site, structure) bucket.

    Per-simulator LSTM carries live as stacked device rows [depth, K, H];
    a bucket's rows are gathered, stepped, and scattered back inside the
    jitted function (scatter mode='drop' ignores padding rows).  A
    simulator's carry is implicitly reset at trace start: its first site
    uses the fresh-zero-state branch instead of the gathered rows.
    """

    def __init__(self, network, observed, num_sims):
        import jax.numpy as jnp

        self._net = network
        self._params = network._serving_params()
        self._num_sims = num_sims
        self._is_lstm = network._network_type == "InferenceNetworkLSTM"
        missing = [
            name
            for name in self._params["observe"].keys()
            if name not in observed
        ]
        if missing:
            raise RuntimeError(
                f"Observe embedding names missing from observe dict: {missing}"
            )
        obs = {
            name: jnp.reshape(
                jnp.asarray(observed[name], util.dtype()), (1, -1)
            )
            for name in self._params["observe"].keys()
        }
        self._emb = network._embed_observe_pure(self._params, obs)  # [1, O]
        if self._is_lstm:
            from .nn.layers import lstm_zero_state

            self._carry = lstm_zero_state(self._params["lstm"], (num_sims,))
        else:
            self._carry = ()
        # per-sim previous controlled variable: (address, flat np value,
        # dist name); None marks trace start (fresh LSTM state)
        self._prev = [None] * num_sims
        if not hasattr(network, "_lockstep_jit_cache"):
            network._lockstep_jit_cache = {}
        self._jit_cache = network._lockstep_jit_cache

    def begin_trace(self, sim_idx):
        self._prev[sim_idx] = None

    def knows(self, address):
        return self._net._head_key(address) in self._net._head_meta

    # ------------------------------------------------------------------
    def _make_step_fn(self, addr, dist_name, prev_addr, prev_dist_name):
        """Jitted batched proposal step for one bucket signature.

        Mirrors InferenceNetworkLSTM.make_vectorized_proposal_step
        (per-particle) and InferenceNetwork*._infer_step (per-trace,
        reference: inference_network_lstm.py:82-134) but with the simulator
        pool as the batch dimension.
        """
        import jax
        import jax.numpy as jnp
        from .nn.layers import mlp_apply, lstm_step
        from .nn.proposals import head_apply

        is_lstm = self._is_lstm
        if is_lstm:
            S = self._net._sample_embedding_dim
            A = self._net._address_embedding_dim
            D = self._net._distribution_type_embedding_dim

        def fn(params, emb, carry, gather_idx, scatter_idx, prev_values, prior, key):
            B = gather_idx.shape[0]
            emb_b = jnp.broadcast_to(emb[0], (B,) + emb.shape[1:])
            if is_lstm:
                if prev_addr is None:
                    prev_sample_emb = jnp.zeros((B, S), util.dtype())
                    prev_addr_emb = jnp.zeros((B, A), util.dtype())
                    prev_dist_emb = jnp.zeros((B, D), util.dtype())
                    h, c = carry
                    rows = (
                        jnp.zeros((h.shape[0], B, h.shape[2]), h.dtype),
                        jnp.zeros((c.shape[0], B, c.shape[2]), c.dtype),
                    )
                else:
                    # _prev only ever records head-served sites, whose
                    # polymorph pass created the sample/address embeddings
                    prev_sample_emb = mlp_apply(
                        params["sample_embedding"][prev_addr], prev_values
                    )
                    prev_addr_emb = jnp.broadcast_to(
                        params["address_embedding"][prev_addr], (B, A)
                    )
                    prev_dist_emb = jnp.broadcast_to(
                        params["dist_type_embedding"][prev_dist_name], (B, D)
                    )
                    rows = jax.tree_util.tree_map(
                        lambda x: x[:, gather_idx], carry
                    )
                x = jnp.concatenate(
                    [
                        emb_b,
                        prev_sample_emb,
                        prev_dist_emb,
                        prev_addr_emb,
                        jnp.broadcast_to(
                            params["dist_type_embedding"][dist_name], (B, D)
                        ),
                        jnp.broadcast_to(
                            params["address_embedding"][addr], (B, A)
                        ),
                    ],
                    axis=1,
                )
                feats, new_rows = lstm_step(params["lstm"], x, rows)
                new_carry = jax.tree_util.tree_map(
                    lambda full, nr: full.at[:, scatter_idx].set(
                        nr, mode="drop"
                    ),
                    carry,
                    new_rows,
                )
            else:
                feats = emb_b
                new_carry = carry
            d = head_apply(params["proposal"][addr], feats, prior)
            value = d._sample_jax(key, ())
            plp = jnp.reshape(d.log_prob(value), (B,))
            return value, plp, new_carry

        return jax.jit(fn)

    # ------------------------------------------------------------------
    def propose(self, requests):
        """requests: list of (sim_idx, full_address, distribution) for sites
        the network has a head for.  Returns {sim_idx: (np value, float
        proposal_log_prob)} and advances the per-sim carries/prev state.

        One device dispatch per bucket of simulators sharing
        (address, dist type, previous-site signature)."""
        import jax.numpy as jnp

        buckets = {}
        for sim_idx, address, dist in requests:
            prev = self._prev[sim_idx]
            if self._is_lstm and prev is not None:
                prev_key = (prev[0], prev[2])
            else:
                prev_key = (None, None)
            buckets.setdefault(
                (address, dist.name) + prev_key, []
            ).append((sim_idx, dist))

        from .nn.proposals import prior_param_arrays

        out = {}
        for (address, dist_name, prev_addr, prev_dist_name), items in buckets.items():
            B = len(items)
            Bp = _next_pow2(B)
            gather_idx = np.zeros(Bp, np.int32)
            scatter_idx = np.full(Bp, self._num_sims, np.int32)  # pad: dropped
            for r, (sim_idx, _) in enumerate(items):
                gather_idx[r] = sim_idx
                scatter_idx[r] = sim_idx
            prior_rows = [
                prior_param_arrays(dist) for _, dist in items
            ]
            prior = {}
            if prior_rows and prior_rows[0]:
                for k in prior_rows[0]:
                    col = np.asarray(
                        [np.asarray(pr[k], util.dtype()).reshape(()) for pr in prior_rows]
                    )
                    prior[k] = jnp.asarray(
                        np.concatenate([col, np.repeat(col[:1], Bp - B)])
                    )
            if prev_addr is not None:
                pv = np.stack(
                    [self._prev[sim_idx][1] for sim_idx, _ in items]
                )
                pv = np.concatenate([pv, np.repeat(pv[:1], Bp - B, axis=0)])
                prev_values = jnp.asarray(pv, util.dtype())
            else:
                prev_values = jnp.zeros((Bp, 1), util.dtype())

            address = self._net._head_key(address)
            prev_addr = (
                None if prev_addr is None
                else self._net._head_key(prev_addr)
            )
            sig = (address, dist_name, prev_addr, prev_dist_name, Bp)
            fn = self._jit_cache.get(sig)
            if fn is None:
                fn = self._make_step_fn(
                    address, dist_name, prev_addr, prev_dist_name
                )
                self._jit_cache[sig] = fn
            values, plps, new_carry = fn(
                self._params,
                self._emb,
                self._carry,
                jnp.asarray(gather_idx),
                jnp.asarray(scatter_idx),
                prev_values,
                prior,
                util.next_key(),
            )
            if self._is_lstm:
                self._carry = new_carry
            values = np.asarray(values)
            plps = np.asarray(plps, np.float64)
            for r, (sim_idx, dist) in enumerate(items):
                v = np.asarray(values[r])
                out[sim_idx] = (v, float(plps[r]))
                self._prev[sim_idx] = (address, v.reshape(-1), dist_name)
        return out


class LockstepRemoteModel(Model):
    """Pool of PPX simulators driven in lockstep with batched site handling.

    Engines: PRIOR, IS, and IC (guided IS with one batched network dispatch
    per site bucket).  MCMC engines are rejected — chains are sequential
    (as the reference's ParallelModel also refuses, model.py:332-333)."""

    _never_vectorize = True
    # this class IS a lockstep pool (over ZMQ simulators); the local
    # thread-lockstep path must not intercept its posterior calls
    _local_lockstep_ok = False

    def __init__(self, server_addresses, timeout_sec=None, *args, **kwargs):
        self._server_addresses = list(server_addresses)
        self._timeout_sec = timeout_sec
        self._requesters = None
        super().__init__(*args, **kwargs)
        self.name = (
            f"LockstepRemoteModel({len(self._server_addresses)} simulators)"
        )

    # ------------------------------------------------------------------
    def _connect(self):
        if self._requesters is not None:
            return
        self._requesters = []
        for addr in self._server_addresses:
            r = ZMQRequester(addr, timeout_sec=self._timeout_sec)
            r.send_request(
                wire.build_handshake(f"pyprob_tpu {util.__version__}")
            )
            reply = wire.decode_message(r.receive_reply())
            if reply.body_type != MessageBody.HandshakeResult:
                raise RuntimeError(
                    f"Expected HandshakeResult from {addr}, got body type "
                    f"{reply.body_type}"
                )
            self._requesters.append(r)
            if len(self._requesters) == 1:
                self.name = "{} running on {} (lockstep x{})".format(
                    reply.fields["model_name"],
                    reply.fields["system_name"],
                    len(self._server_addresses),
                )

    def close(self):
        if self._requesters is not None:
            for r in self._requesters:
                r.close()
            self._requesters = None

    # ------------------------------------------------------------------
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
                f"{inference_engine} not supported by LockstepRemoteModel "
                "(sequential chain semantics); use RemoteModel"
            )
        return Model.posterior(
            self, num_traces, inference_engine=inference_engine, *args, **kwargs
        )

    def sample(self, *args, **kwargs):
        emp = self._traces(*args, num_traces=1, silent=True, **kwargs)
        return emp.get_values()[0]

    def _trace_generator(self, *args, **kwargs):
        raise RuntimeError(
            "LockstepRemoteModel has no sequential trace generator; use "
            "sample() / prior() / posterior(), or RemoteModel for "
            "one-simulator sequential semantics."
        )

    # ------------------------------------------------------------------
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
        payload=None,
        *args,
        **kwargs,
    ):
        self._connect()
        if (
            inference_engine
            == InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK
            and inference_network is None
        ):
            # Model.posterior passes the trained network; direct _traces
            # callers may rely on the model's own
            inference_network = self._inference_network
            if inference_network is None:
                raise ValueError(
                    "Cannot run IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK "
                    "without an inference network."
                )
        K = len(self._requesters)
        if map_func is None:
            map_func = trace_id
        observed = observe or {}
        if any(v is None for v in observed.values()):
            raise RuntimeError(f"Observe has missing value(s): {observed}")

        ic = (
            inference_engine
            == InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK
        )
        proposer = (
            _BatchedProposer(inference_network, observed, K) if ic else None
        )

        # one isolated interpreter context per simulator (the compiled-tier
        # analogue keeps per-particle state in arrays; here each simulator's
        # trace state is an explicit context swapped in around state.* calls)
        ctxs = []
        for _ in range(K):
            ctx = state._Context()
            ctx.trace_mode = trace_mode
            ctx.inference_engine = inference_engine
            ctx.prior_inflation = prior_inflation
            ctx.likelihood_importance = likelihood_importance
            ctx.observed_variables = observed
            ctx.root_function_name = "forward"
            ctx.inference_network = None  # proposals go through the proposer
            ctx.address_dictionary = self._address_dictionary
            ctxs.append(ctx)

        traces = Empirical(file_name=file_name)
        log_weights = np.zeros(num_traces)
        issued = 0
        completed = 0
        time_start = time.time()
        prev_duration = 0.0

        sockets = [r._socket for r in self._requesters]
        sock_to_idx = {id(s): i for i, s in enumerate(sockets)}
        poller = zmq.Poller()
        for s in sockets:
            poller.register(s, zmq.POLLIN)

        def begin(i):
            nonlocal issued
            prev = state._swap_context(ctxs[i])
            try:
                state._begin_trace()
            finally:
                state._swap_context(prev)
            if proposer is not None:
                proposer.begin_trace(i)
            # payload: optional per-run input tensor (PPX extension)
            self._requesters[i].send_request(wire.build_run(payload))
            issued += 1

        live = set()
        for i in range(min(K, num_traces)):
            begin(i)
            live.add(i)

        pending = {}
        timeout_ms = (
            int(self._timeout_sec * 1000) if self._timeout_sec else None
        )

        while live:
            # wait until every live simulator has one pending message
            waiting = live - pending.keys()
            wait_start = time.time()
            while waiting:
                events = poller.poll(timeout_ms)
                for sock, _ in events:
                    i = sock_to_idx.get(id(sock))
                    if i is None or i not in waiting:
                        continue
                    pending[i] = wire.decode_message(sock.recv())
                    waiting.discard(i)
                if waiting and not events:
                    raise TimeoutError(
                        f"PPX simulators {sorted(waiting)} did not reply "
                        f"within the receive timeout "
                        f"({time.time() - wait_start:.1f}s)"
                    )

            # ---- process one lockstep round ---------------------------
            ic_requests = []  # (sim_idx, msg) answered by the proposer
            finished = []
            for i in sorted(pending.keys()):
                msg = pending[i]
                bt = msg.body_type
                if bt == MessageBody.RunResult:
                    finished.append(i)
                    continue
                if bt == MessageBody.Sample:
                    f = msg.fields
                    dist = distribution_from_spec(f["distribution"])
                    name = f["name"] or None
                    control = f.get("control", True)
                    if ic and control and name not in observed:
                        base, full, instance = self._build_address_in(
                            ctxs[i], f, dist
                        )
                        if dist.batch_shape in ((), (1,)) and proposer.knows(
                            full
                        ):
                            ic_requests.append(
                                (i, (base, full, instance), dist, name)
                            )
                            continue
                        # proposal = prior when the network has no head for
                        # the site (unseen address or non-scalar site):
                        # per-site weight contribution is zero, exactly as
                        # _infer_step returning the prior distribution
                        # (reference: state.py:203-224)
                        warnings.warn(
                            f"Using prior. No proposal for address: {full}"
                        )
                        value = dist.sample(util.get_rng())
                        log_prob = dist.log_prob(value, sum=True)
                        ctxs[i].current_trace.add(
                            Variable(
                                distribution=dist,
                                value=value,
                                address_base=base,
                                address=full,
                                instance=instance,
                                log_prob=log_prob,
                                log_importance_weight=0.0,
                                control=True,
                                name=name,
                            )
                        )
                        self._requesters[i].send_request(
                            wire.build_sample_result(
                                np.asarray(value, np.float64)
                            )
                        )
                        continue
                    # per-sim interpreter path (PRIOR/IS branches, observed
                    # -name overrides, uncontrolled sites)
                    prev = state._swap_context(ctxs[i])
                    try:
                        value = state.sample(
                            dist,
                            name=name,
                            address=f["address"] or None,
                            control=control,
                        )
                    finally:
                        state._swap_context(prev)
                    self._requesters[i].send_request(
                        wire.build_sample_result(
                            np.asarray(value, np.float64)
                        )
                    )
                elif bt == MessageBody.Observe:
                    f = msg.fields
                    dist = (
                        distribution_from_spec(f["distribution"])
                        if f["distribution"] is not None
                        else None
                    )
                    prev = state._swap_context(ctxs[i])
                    try:
                        state.observe(
                            dist,
                            value=f["value"],
                            name=f["name"] or None,
                            address=f["address"] or None,
                        )
                    finally:
                        state._swap_context(prev)
                    self._requesters[i].send_request(wire.build_observe_result())
                elif bt == MessageBody.Tag:
                    f = msg.fields
                    prev = state._swap_context(ctxs[i])
                    try:
                        state.tag(
                            f["value"],
                            name=f["name"] or None,
                            address=f["address"] or None,
                        )
                    finally:
                        state._swap_context(prev)
                    self._requesters[i].send_request(wire.build_tag_result())
                else:
                    raise RuntimeError(
                        f"Unexpected PPX message body type: {bt}"
                    )

            if ic_requests:
                proposals = proposer.propose(
                    [(i, binfo[1], dist) for i, binfo, dist, _ in ic_requests]
                )
                for i, (base, full, instance), dist, name in ic_requests:
                    v, plp = proposals[i]
                    value = np.asarray(v).reshape(dist.batch_shape or ())
                    # prior log-pdf on host; weight = prior - proposal
                    # (reference: state.py:203-224)
                    log_prob = dist.log_prob(value, sum=True)
                    if util.has_nan_or_inf(log_prob):
                        warnings.warn(
                            f"Prior log_prob has NaN/inf. dist: {dist} "
                            f"value: {value}"
                        )
                    if util.has_nan_or_inf(plp):
                        warnings.warn(
                            f"Proposal log_prob has NaN/inf at {full}"
                        )
                    variable = Variable(
                        distribution=dist,
                        value=value,
                        address_base=base,
                        address=full,
                        instance=instance,
                        log_prob=log_prob,
                        log_importance_weight=float(log_prob) - plp,
                        control=True,
                        name=name,
                    )
                    ctxs[i].current_trace.add(variable)
                    self._requesters[i].send_request(
                        wire.build_sample_result(np.asarray(value, np.float64))
                    )

            for i in finished:
                result = pending[i].fields["result"]
                prev = state._swap_context(ctxs[i])
                try:
                    trace = state._end_trace(result)
                finally:
                    state._swap_context(prev)
                if trace_mode == TraceMode.PRIOR:
                    log_weight = 1.0
                else:
                    log_weight = trace.log_importance_weight
                if util.has_nan_or_inf(log_weight):
                    warnings.warn(
                        "Encountered trace with nan/inf log_weight. "
                        "Discarding trace."
                    )
                    if completed > 0:
                        log_weights[completed] = log_weights[completed - 1]
                else:
                    traces.add(map_func(trace), log_weight)
                    log_weights[completed] = log_weight
                completed += 1
                if issued < num_traces:
                    begin(i)
                else:
                    live.discard(i)

                if not silent and util.verbosity() > 1:
                    duration = time.time() - time_start
                    if duration - prev_duration > util._print_refresh_rate or (
                        completed == num_traces
                    ):
                        prev_duration = duration
                        tps = completed / max(duration, 1e-9)
                        ess = util.effective_sample_size(
                            log_weights[:completed]
                        )
                        util.progress_update(
                            f"{util.days_hours_mins_secs_str(duration)} | "
                            f"{completed}/{num_traces} | ESS: {ess:,.2f} | "
                            f"{tps:,.2f} traces/s | lockstep x{K}"
                        )
            pending.clear()

        if not silent and util.verbosity() > 1:
            util.progress_end()
        traces.finalize()
        return traces

    # ------------------------------------------------------------------
    @staticmethod
    def _build_address_in(ctx, fields, dist):
        prev = state._swap_context(ctx)
        try:
            return state._build_address(
                fields["address"] or None, dist, ctx.current_trace
            )
        finally:
            state._swap_context(prev)
