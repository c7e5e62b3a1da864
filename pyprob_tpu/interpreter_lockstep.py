"""Lockstep guided inference for LOCAL interpreter-tier models.

The universality fallback runs models whose control flow cannot trace
under jax (divergent host loops, data-dependent trace shapes) one trace
at a time, evaluating the proposal network once per site per trace
(reference hot loop: pyprob/state.py:203-224) — each site costs one
device dispatch, which dominates at small layer sizes.

This module generalizes the PPX pool's one-dispatch-per-site event loop
(pyprob_tpu.remote_lockstep) to K in-process interpreter "particles":
K worker THREADS each run ``model.forward()`` under their own
thread-local interpreter context (contexts are already thread-local,
pyprob_tpu.state._ContextLocal); at every proposal-network site the
worker parks on the coordinator, and once every live worker is parked
(or done) the coordinator answers all same-signature sites with ONE
jitted batched network step — per-worker LSTM carries stacked
[depth, K, H], proposal distributions returned as a batched pytree and
row-sliced back to each worker.  Threads interleave the pure-Python
model code on the GIL; the win is collapsing K device dispatches per
site into one, exactly like the compiled tier does for traceable
models.  Divergent control flow (different addresses) fragments buckets
within a round, preserving universal semantics.

Feedforward networks need no lockstep at all: a head's proposal depends
only on (observe embedding, prior params), so proposals are computed
once per distinct (site, prior) and served from a cache — workers never
block.

Everything else about the interpreter tier is untouched: workers call
the stock ``state.sample`` (masks, defensive rejection retries, MCMC
value reuse all keep working) and only ``InferenceNetwork._infer_step``
is intercepted by a per-worker proxy, so statistical results match the
sequential tier exactly (same per-site math, independent RNG streams).

No reference counterpart: pyprob's ParallelModel forks processes and
refuses anything needing shared network state
(reference: pyprob/model.py:332-333).
"""

from __future__ import annotations

import threading
import time
import warnings

import numpy as np

from . import state, util
from .util import TraceMode, InferenceEngine
from .distributions import Empirical
from .trace import Trace


def _next_pow2(n):
    p = 1
    while p < n:
        p *= 2
    return p


class _WorkerNet:
    """Per-worker inference-network facade installed as the context's
    ``inference_network``.  Forwards ``_infer_step`` to the coordinator.

    The worker's recurrent state lives as COLUMNS of the coordinator's
    shared [depth, W, H] carry buffers (gathered/scattered with one fancy
    index per round instead of per-worker concatenations);
    ``_infer_lstm_state`` stays exposed as a property so
    ``state.rejection_sample``'s snapshot/restore works verbatim —
    snapshots copy the columns, restores write them back."""

    def __init__(self, coordinator, idx):
        self._coordinator = coordinator
        self._idx = idx
        self._fresh = True  # True = trace start (zero recurrent state)

    @property
    def _infer_lstm_state(self):
        if self._fresh:
            return None
        return self._coordinator.get_carry(self._idx)

    @_infer_lstm_state.setter
    def _infer_lstm_state(self, v):
        if v is None:
            self._fresh = True
        else:
            self._coordinator.set_carry(self._idx, v)
            self._fresh = False

    def _infer_init(self, observe=None):
        pass  # embedding precomputed by the coordinator

    def _infer_begin_trace(self):
        self._fresh = True

    def _infer_step(self, variable, prev_variable=None,
                    proposal_min_train_iterations=None):
        return self._coordinator.infer_step(
            self._idx, self, variable, prev_variable
        )


class _Request:
    __slots__ = (
        "idx", "proxy", "variable", "prev_variable", "seed", "event",
        "out", "_prior_row",
    )

    def __init__(self, idx, proxy, variable, prev_variable, seed):
        self.idx = idx
        self.proxy = proxy
        self.variable = variable
        self.prev_variable = prev_variable
        self.seed = seed
        self.event = threading.Event()
        self.out = None
        self._prior_row = None


class _ProposalShim:
    """Stands in for the proposal distribution returned by ``_infer_step``:
    the batched device step already sampled the proposal value and scored
    it, so the worker-side ``proposal.sample``/``log_prob`` calls (the
    interpreter tier's per-site host hot spot — a 10-component mixture
    costs ~1.4 ms per site in numpy) just return the precomputed pair.
    Scoring any OTHER value (rejection-retry defensive mixtures draw from
    the prior half the time) lazily materializes the real row
    distribution."""

    __slots__ = (
        "_value", "_scalar", "_plp", "_prior_lp", "_dist_batch", "_row",
        "_dist", "name",
    )

    def __init__(self, value, plp, prior_lp, dist_batch, row, name):
        self._value = value
        self._scalar = value.item() if value.size == 1 else None
        self._plp = plp
        self._prior_lp = prior_lp
        self._dist_batch = dist_batch  # numpy-leaved batched dist pytree
        self._row = row
        self._dist = None
        self.name = name

    def sample(self, rng):
        return self._value

    def _is_mine(self, value):
        # numeric equality suffices: log_prob depends only on the value,
        # so any value equal to the precomputed sample has its density
        if self._scalar is not None:
            try:
                return float(value) == self._scalar
            except (TypeError, ValueError):
                return False
        v = np.asarray(value)
        mine = self._value
        return v.size == mine.size and np.array_equal(
            v.reshape(-1), mine.reshape(-1)
        )

    def pair_of(self, value):
        """(prior log-pdf, proposal log-pdf) of ``value`` when it is the
        precomputed proposal sample (both computed on device in the same
        batched step), else None — state.sample's fast path."""
        if self._is_mine(value):
            return self._prior_lp, self._plp
        return None

    def _materialize(self):
        if self._dist is None:
            import jax

            r = self._row
            self._dist = jax.tree_util.tree_map(
                lambda x: x[r : r + 1], self._dist_batch
            )
        return self._dist

    def log_prob(self, value, sum=False):
        if self._is_mine(value):
            return self._plp
        return self._materialize().log_prob(value, sum=sum)

    def __repr__(self):
        return f"ProposalShim({self.name})"


class LockstepCoordinator:
    """Barrier + batched-proposal engine for one posterior run."""

    def __init__(self, network, observed, num_workers):
        import jax.numpy as jnp

        self._net = network
        self._params = network._params
        self._is_lstm = network._network_type == "InferenceNetworkLSTM"
        missing = [
            name
            for name in self._params["observe"].keys()
            if name not in observed
        ]
        if missing:
            raise RuntimeError(
                f"Observe embedding names missing from observe dict: "
                f"{missing}"
            )
        obs = {
            name: jnp.reshape(
                jnp.asarray(observed[name], util.dtype()), (1, -1)
            )
            for name in self._params["observe"].keys()
        }
        self._emb = network._embed_observe_pure(self._params, obs)  # [1, O]
        self._num_workers = num_workers
        self._lock = threading.Lock()
        self._cond = threading.Condition(self._lock)
        self._running = 0
        self._done = 0
        self._requests = []
        self._error = None
        # one base key per run; per-request worker seeds fold into it, so
        # sampled values are deterministic per (global seed, ticket)
        # regardless of thread scheduling / bucket composition
        self._base_key = util.next_key()
        # jit caches live on the network so repeated posterior calls reuse
        # compiled programs (jitted-run-cache invariant)
        if not hasattr(network, "_lockstep_local_jit"):
            network._lockstep_local_jit = {}
        self._jit = network._lockstep_local_jit
        if self._is_lstm:
            depth, H = network._lstm_depth, network._lstm_dim
            self._hbuf = np.zeros((depth, num_workers, H), np.float32)
            self._cbuf = np.zeros((depth, num_workers, H), np.float32)
            self._zero_rows = {}
        self._zero_idx = None
        self._build_registries()

    def get_carry(self, idx):
        if not self._is_lstm:
            return None
        return (
            self._hbuf[:, idx : idx + 1].copy(),
            self._cbuf[:, idx : idx + 1].copy(),
        )

    def set_carry(self, idx, v):
        if self._is_lstm:
            self._hbuf[:, idx : idx + 1] = v[0]
            self._cbuf[:, idx : idx + 1] = v[1]

    def _build_registries(self):
        """Stack per-address parameters into gatherable tables (SURVEY
        hard part #2's padded address-table design): heads and sample
        embeddings grouped by pytree structure, address/dist-type
        embeddings as [G, A]/[K, D] tables.  One jitted step per round
        then GATHERS per-item parameters by index instead of running one
        program per address bucket — the address set an inference run
        touches is frozen, so these build once."""
        import jax
        import jax.numpy as jnp

        params = self._params

        def grouped(param_dict):
            groups = {}
            of = {}
            for addr, p in param_dict.items():
                leaves, treedef = jax.tree_util.tree_flatten(p)
                key = (treedef, tuple(l.shape for l in leaves))
                g = groups.setdefault(key, {"addrs": [], "params": []})
                of[addr] = (key, len(g["addrs"]))
                g["addrs"].append(addr)
                g["params"].append(p)
            for g in groups.values():
                plist = g["params"]
                # pad the group axis to pow2 so growth across runs (new
                # polymorphs) reuses log2-many compiled shapes
                gp = _next_pow2(len(plist))
                plist = plist + [plist[0]] * (gp - len(plist))
                g["stacked"] = jax.tree_util.tree_map(
                    lambda *xs: jnp.stack(xs), *plist
                )
                del g["params"]
            return groups, of

        self._head_groups, self._head_of = grouped(params["proposal"])
        if self._is_lstm:
            self._semb_groups, self._semb_of = grouped(
                params["sample_embedding"]
            )
            addrs = list(params["address_embedding"].keys())
            self._a_of = {a: i for i, a in enumerate(addrs)}
            ap = addrs + [addrs[0]] * (_next_pow2(len(addrs)) - len(addrs))
            self._aemb = jnp.stack(
                [params["address_embedding"][a] for a in ap]
            )
            names = list(params["dist_type_embedding"].keys())
            self._d_of = {n: i for i, n in enumerate(names)}
            np_ = names + [names[0]] * (_next_pow2(len(names)) - len(names))
            self._demb = jnp.stack(
                [params["dist_type_embedding"][n] for n in np_]
            )

    # -- worker side ---------------------------------------------------
    def infer_step(self, idx, proxy, variable, prev_variable):
        net = self._net
        params = self._params
        distribution = variable.distribution
        addr_key = net._head_key(variable.address)
        if self._is_lstm:
            # mirror InferenceNetworkLSTM._infer_step's early-outs so the
            # statistical semantics match the sequential tier exactly
            if prev_variable is not None:
                prev_key = net._head_key(prev_variable.address)
                if prev_key not in params["address_embedding"]:
                    warnings.warn(
                        f"Address of previous variable unknown by "
                        f"inference network: {prev_key}"
                    )
                    return distribution
            if addr_key not in params["address_embedding"]:
                if prev_variable is None:
                    # the sequential tier zeroes the recurrent state at
                    # trace start before discovering the unknown address
                    proxy._infer_lstm_state = None
                warnings.warn(
                    f"Using prior. No proposal for address: {addr_key}"
                )
                return distribution
        else:
            if addr_key not in params["proposal"]:
                warnings.warn(
                    f"Using prior. No proposal for address: {addr_key}"
                )
                return distribution

        # per-request sampling seed from the worker's own per-trace RNG:
        # results are deterministic per (seed, ticket) no matter which
        # round/bucket the request lands in
        rng = state._ctx_local.value.rng
        seed = int(
            rng.integers(2**31) if rng is not None
            else util.get_rng().integers(2**31)
        )
        req = _Request(idx, proxy, variable, prev_variable, seed)
        with self._cond:
            if self._error is not None:
                raise RuntimeError("lockstep run already failed") from None
            self._requests.append(req)
            self._running -= 1
            self._cond.notify_all()
        req.event.wait()
        if isinstance(req.out, BaseException):
            raise req.out
        return req.out

    def worker_done(self):
        with self._cond:
            self._running -= 1
            self._done += 1
            self._cond.notify_all()

    def worker_failed(self, exc):
        with self._cond:
            if self._error is None:
                self._error = exc
            self._running -= 1
            self._done += 1
            self._cond.notify_all()

    # -- coordinator side ----------------------------------------------
    def run(self, workers):
        """Start worker threads and answer site batches until all done."""
        with self._cond:
            self._running = len(workers)
        for w in workers:
            w.start()
        while True:
            with self._cond:
                while self._running > 0:
                    self._cond.wait()
                if self._error is not None:
                    # unblock any parked workers so threads exit
                    for r in self._requests:
                        r.out = RuntimeError("lockstep run failed")
                        r.event.set()
                    self._requests = []
                    break
                if not self._requests:
                    if self._done >= len(workers):
                        break
                    continue
                batch = self._requests
                self._requests = []
            try:
                self._answer(batch)
            except BaseException as e:  # propagate to workers + caller
                with self._cond:
                    self._error = e
                for r in batch:
                    r.out = e
                    r.event.set()
                continue
            with self._cond:
                self._running += len(batch)
            for r in batch:
                r.event.set()
        for w in workers:
            w.join()
        if self._error is not None:
            raise self._error

    def _make_step_fn(self):
        import jax
        import jax.numpy as jnp
        from .nn.layers import mlp_apply, lstm_step
        from .nn.proposals import head_apply

        net = self._net
        is_lstm = self._is_lstm
        if is_lstm:
            S = net._sample_embedding_dim
            D = net._distribution_type_embedding_dim
            A = net._address_embedding_dim

        def fn(lstm_p, heads, sembs, aemb, demb, obs_emb, rows,
               cur_head_idx, cur_a_idx, cur_d_idx,
               prev_semb_idx, prev_a_idx, prev_d_idx, prev_values,
               prior, prior_dist, seeds, base_key):
            B = seeds.shape[0]
            emb_b = jnp.broadcast_to(obs_emb[0], (B, obs_emb.shape[1]))
            if is_lstm:
                if sembs is None:  # trace-start bucket
                    prev_sample_emb = jnp.zeros((B, S), util.dtype())
                    prev_a = jnp.zeros((B, A), util.dtype())
                    prev_d = jnp.zeros((B, D), util.dtype())
                else:
                    prev_sample_emb = jax.vmap(
                        lambda i, v: mlp_apply(
                            jax.tree_util.tree_map(lambda p: p[i], sembs),
                            v[None],
                        )[0]
                    )(prev_semb_idx, prev_values)
                    prev_sample_emb = prev_sample_emb.reshape(B, -1)
                    prev_a = aemb[prev_a_idx]
                    prev_d = demb[prev_d_idx]
                x = jnp.concatenate(
                    [
                        emb_b,
                        prev_sample_emb,
                        prev_d,
                        prev_a,
                        demb[cur_d_idx],
                        aemb[cur_a_idx],
                    ],
                    axis=1,
                )
                feats, new_rows = lstm_step(lstm_p, x, rows)
            else:
                feats = emb_b
                new_rows = ()
            # per-item head gather: ONE program per round serves every
            # address (their parameters stacked on a group axis)
            d = jax.vmap(
                lambda i, f, pr: head_apply(
                    jax.tree_util.tree_map(lambda p: p[i], heads),
                    f[None],
                    jax.tree_util.tree_map(lambda a: a[None], pr),
                )
            )(cur_head_idx, feats, prior)
            # proposal sampling + scoring AND the prior's log-pdf of the
            # sampled value stay on device (the worker-side numpy mixture
            # ops are the interpreter tier's hot spot); per-row keys fold
            # the workers' own seeds into one base key
            keys = jax.vmap(lambda s: jax.random.fold_in(base_key, s))(
                seeds
            )
            values = jax.vmap(
                lambda dd, k: dd._sample_jax(k, ()), in_axes=(0, 0)
            )(d, keys)
            plps = jax.vmap(
                lambda dd, v: jnp.sum(dd.log_prob(v)), in_axes=(0, 0)
            )(d, values)
            prior_lps = jax.vmap(
                lambda pd, v: jnp.sum(pd.log_prob(v)), in_axes=(0, 0)
            )(prior_dist, values)
            return values, plps, prior_lps, d, new_rows

        return jax.jit(fn)

    def _answer(self, batch):
        import jax
        import jax.numpy as jnp
        from .nn.proposals import prior_param_arrays

        net = self._net
        params = self._params
        is_lstm = self._is_lstm
        if is_lstm:
            depth = net._lstm_depth
            H = net._lstm_dim

        # bucket by STRUCTURE only (head/sample-embedding pytree groups +
        # prior signature + trace-start-vs-steady); addresses and dist
        # types within a bucket become per-item gather indices, so a
        # typical round needs one or two device calls total
        buckets = {}
        for r in batch:
            dist = r.variable.distribution
            pp = {
                k: np.asarray(v, util.dtype()).reshape(-1)
                for k, v in prior_param_arrays(dist).items()
            }
            r._prior_row = pp
            head_group, _ = self._head_of[net._head_key(r.variable.address)]
            prev = r.prev_variable if is_lstm else None
            if prev is None:
                prev_group = None
            else:
                prev_group = self._semb_of[net._head_key(prev.address)][0]
            prior_sig = (
                dist.name,
                tuple(sorted((k, v.shape) for k, v in pp.items())),
            )
            buckets.setdefault(
                (head_group, prev_group, prior_sig), []
            ).append(r)

        fn = self._jit.get("step")
        if fn is None:
            fn = self._jit["step"] = self._make_step_fn()

        # fixed pad size (pool width): ONE compiled shape per bucket
        # signature — per-bucket-size padding would mint a fresh XLA
        # program whenever a rare (signature, size) pair first appeared,
        # and those mid-run compiles dominate; padded compute is trivial
        Bp = _next_pow2(self._num_workers)

        zero_idx = self._zero_idx
        if zero_idx is None or zero_idx.shape[0] != Bp:
            zero_idx = self._zero_idx = np.zeros((Bp,), np.int32)

        for (head_group, prev_group, _prior_sig), items in buckets.items():
            B = len(items)

            def pad(a):
                if Bp == B:
                    return a
                reps = np.repeat(a[-1:], Bp - B, axis=0)
                return np.concatenate([a, reps], axis=0)

            # ONE pass over the bucket fills every per-item index array
            # (repeated dict/_head_key lookups were a measurable cost)
            hg = self._head_groups[head_group]
            seeds = np.empty(Bp, np.uint32)
            cur_head_idx = np.empty(Bp, np.int32)
            worker_idx = np.empty(B, np.intp)
            steady = prev_group is not None
            if is_lstm:
                cur_a_idx = np.empty(Bp, np.int32)
                cur_d_idx = np.empty(Bp, np.int32)
            else:
                cur_a_idx = cur_d_idx = zero_idx
            if steady:
                prev_semb_idx = np.empty(Bp, np.int32)
                prev_a_idx = np.empty(Bp, np.int32)
                prev_d_idx = np.empty(Bp, np.int32)
                pv_rows = []
            else:
                prev_semb_idx = prev_a_idx = prev_d_idx = zero_idx
            head_of, a_of, d_of = self._head_of, None, None
            semb_of = None
            if is_lstm:
                a_of, d_of = self._a_of, self._d_of
                semb_of = self._semb_of
            head_key = net._head_key
            for row, r in enumerate(items):
                seeds[row] = r.seed
                worker_idx[row] = r.idx
                ak = head_key(r.variable.address)
                cur_head_idx[row] = head_of[ak][1]
                if is_lstm:
                    cur_a_idx[row] = a_of[ak]
                    cur_d_idx[row] = d_of[r.variable.distribution.name]
                if steady:
                    pk = head_key(r.prev_variable.address)
                    prev_semb_idx[row] = semb_of[pk][1]
                    prev_a_idx[row] = a_of[pk]
                    prev_d_idx[row] = d_of[
                        r.prev_variable.distribution.name
                    ]
                    pv_rows.append(
                        np.asarray(
                            r.prev_variable.value, util.dtype()
                        ).reshape(-1)
                    )
            if Bp != B:
                seeds[B:] = seeds[B - 1]
                cur_head_idx[B:] = cur_head_idx[B - 1]
                if is_lstm:
                    cur_a_idx[B:] = cur_a_idx[B - 1]
                    cur_d_idx[B:] = cur_d_idx[B - 1]
                if steady:
                    prev_semb_idx[B:] = prev_semb_idx[B - 1]
                    prev_a_idx[B:] = prev_a_idx[B - 1]
                    prev_d_idx[B:] = prev_d_idx[B - 1]

            if is_lstm:
                # gather recurrent columns from the shared carry buffers
                # with ONE fancy index (trace-start buckets use cached
                # zero rows: prev None <=> fresh state on every member)
                if not steady:
                    zr = self._zero_rows.get(Bp)
                    if zr is None:
                        z = jnp.zeros((depth, Bp, H), util.dtype())
                        zr = self._zero_rows[Bp] = (z, z)
                    rows = zr
                else:
                    h = self._hbuf[:, worker_idx]
                    c = self._cbuf[:, worker_idx]
                    if Bp != B:
                        h = np.concatenate(
                            [h, np.repeat(h[:, -1:], Bp - B, axis=1)],
                            axis=1,
                        )
                        c = np.concatenate(
                            [c, np.repeat(c[:, -1:], Bp - B, axis=1)],
                            axis=1,
                        )
                    rows = (jnp.asarray(h), jnp.asarray(c))
            else:
                rows = ()

            prior = {}
            if items[0]._prior_row:
                for k in items[0]._prior_row:
                    prior[k] = jnp.asarray(
                        pad(np.stack([r._prior_row[k] for r in items]))
                    )
            # batched PRIOR distribution (tree-stacked item dists) so the
            # prior's log-pdf of the sampled value computes on device too
            prior_dist = jax.tree_util.tree_map(
                lambda *xs: jnp.asarray(
                    pad(np.stack([np.asarray(x) for x in xs]))
                ),
                *[r.variable.distribution for r in items],
            )

            if not steady:
                sembs = None
                prev_values = None
            else:
                sembs = self._semb_groups[prev_group]["stacked"]
                prev_values = jnp.asarray(pad(np.stack(pv_rows)))

            values, plps, prior_lps, d, new_rows = fn(
                params["lstm"] if is_lstm else (),
                hg["stacked"],
                sembs,
                self._aemb if is_lstm else (),
                self._demb if is_lstm else (),
                self._emb,
                rows,
                jnp.asarray(cur_head_idx),
                jnp.asarray(cur_a_idx),
                jnp.asarray(cur_d_idx),
                jnp.asarray(prev_semb_idx),
                jnp.asarray(prev_a_idx),
                jnp.asarray(prev_d_idx),
                prev_values,
                prior,
                prior_dist,
                jnp.asarray(seeds),
                self._base_key,
            )
            values_np = np.asarray(values)
            plps_list = np.asarray(plps, np.float64)[:B].tolist()
            prior_lps_list = np.asarray(prior_lps, np.float64)[:B].tolist()
            # the batched dist pytree converts to numpy ONCE; shims slice
            # their row lazily (only rejection retries ever need it)
            d_np = jax.tree_util.tree_map(np.asarray, d)
            if is_lstm:
                # scatter new recurrent rows back into the shared buffers
                # with one fancy index; workers only flip their fresh flag
                self._hbuf[:, worker_idx] = np.asarray(new_rows[0])[:, :B]
                self._cbuf[:, worker_idx] = np.asarray(new_rows[1])[:, :B]
            for row, r in enumerate(items):
                r.out = _ProposalShim(
                    values_np[row],
                    plps_list[row],
                    prior_lps_list[row],
                    d_np,
                    row,
                    r.variable.distribution.name,
                )
                if is_lstm:
                    r.proxy._fresh = False


def lockstep_interpreter_traces(
    model,
    num_traces,
    inference_network,
    observe=None,
    map_func=None,
    file_name=None,
    likelihood_importance=1.0,
    num_workers=None,
    silent=False,
    args=(),
    kwargs=None,
):
    """Guided-IS posterior over the interpreter tier with K lockstep
    worker threads; returns a finalized Empirical.  Semantics identical
    to the sequential ``Model._traces`` IC path (same per-site math via
    ``state.sample``; independent per-trace RNG streams spawned from the
    global seed)."""
    from .model import trace_id

    if map_func is None:
        map_func = trace_id
    kwargs = kwargs or {}
    observed = observe or {}
    if any(v is None for v in observed.values()):
        raise RuntimeError(f"Observe has missing value(s): {observed}")
    import os

    W = num_workers or int(os.environ.get("PYPROB_TPU_LOCKSTEP", "64"))
    W = max(1, min(int(W), num_traces))

    coordinator = LockstepCoordinator(inference_network, observed, W)

    # per-trace RNG streams: deterministic given the global seed, and
    # independent of which worker executes which ticket
    master = int(util.get_rng().integers(0, 2**63 - 1))
    seeds = np.random.SeedSequence(master).spawn(num_traces)

    results = [None] * num_traces
    ticket_lock = threading.Lock()
    ticket_box = [0]

    def worker(widx):
        ctx = state._Context()
        ctx.trace_mode = TraceMode.POSTERIOR
        ctx.inference_engine = (
            InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK
        )
        ctx.likelihood_importance = likelihood_importance
        ctx.observed_variables = observed
        ctx.root_function_name = model.forward.__code__.co_name
        ctx.address_dictionary = model._address_dictionary
        proxy = _WorkerNet(coordinator, widx)
        ctx.inference_network = proxy
        prev_ctx = state._swap_context(ctx)
        try:
            while True:
                with ticket_lock:
                    t = ticket_box[0]
                    if t >= num_traces:
                        break
                    ticket_box[0] = t + 1
                ctx.rng = np.random.Generator(np.random.PCG64(seeds[t]))
                proxy._infer_begin_trace()
                state._begin_trace()
                result = model.forward(*args, **kwargs)
                results[t] = state._end_trace(result)
            coordinator.worker_done()
        except BaseException as e:
            coordinator.worker_failed(e)
        finally:
            state._swap_context(prev_ctx)

    t0 = time.time()
    threads = [
        threading.Thread(target=worker, args=(i,), daemon=True)
        for i in range(W)
    ]
    coordinator.run(threads)
    duration = time.time() - t0

    traces = Empirical(file_name=file_name)
    log_weights = np.zeros(num_traces)
    n_bad = 0
    for i, trace in enumerate(results):
        log_weight = trace.log_importance_weight
        if util.has_nan_or_inf(log_weight):
            n_bad += 1
            log_weights[i] = -np.inf
            continue
        traces.add(map_func(trace), log_weight)
        log_weights[i] = log_weight
    if n_bad:
        warnings.warn(
            f"Discarded {n_bad} traces with nan/inf log_weight."
        )
    if not silent and util.verbosity() > 1:
        ess = util.effective_sample_size(
            log_weights[np.isfinite(log_weights)]
        )
        util.log_print(
            f"[lockstep x{W}] {num_traces:,} traces in {duration:.3f}s "
            f"({num_traces / max(duration, 1e-9):,.1f} traces/s), "
            f"ESS {ess:,.1f}"
        )
    traces.finalize()
    return traces
