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


class _RoundDist:
    """Round-shared holder of the batched proposal-distribution pytree:
    stays a DEVICE pytree until a shim actually needs numpy rows (only
    rejection retries score foreign values), then converts once for the
    whole round."""

    __slots__ = ("_dev", "_np")

    def __init__(self, dev):
        self._dev = dev
        self._np = None

    def numpy(self):
        if self._np is None:
            import jax

            self._np = jax.tree_util.tree_map(np.asarray, self._dev)
        return self._np


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
            db = self._dist_batch
            if isinstance(db, _RoundDist):
                db = db.numpy()
            self._dist = jax.tree_util.tree_map(
                lambda x: x[r : r + 1], db
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
        self._params = network._serving_params()
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
        # worker GROUPS can answer rounds independently: while group A's
        # batched device step runs (GIL released), group B's workers
        # interleave their model python — the r4 profile showed the
        # device step + fetch (~39% of wall) running with EVERY worker
        # parked, pure serialization.  Sampled values are deterministic
        # per (seed, ticket), so statistics are identical at any group
        # count.  Default 1: on this 2-core host the packing python of a
        # second concurrent round competes for the GIL and measured
        # neutral-to-negative (BASELINE.md r4); raise
        # PYPROB_TPU_LOCKSTEP_GROUPS on many-core hosts where worker
        # python has its own cores to overlap with.
        import os

        G = int(os.environ.get("PYPROB_TPU_LOCKSTEP_GROUPS", "1"))
        G = max(1, min(G, num_workers))
        self._num_groups = G
        self._group_of = [i % G for i in range(num_workers)]
        self._Bp = _next_pow2((num_workers + G - 1) // G)
        self._lock = threading.Lock()
        self._cond = threading.Condition(self._lock)
        self._running = [0] * G
        self._done = 0
        self._total = 0
        self._requests = [[] for _ in range(G)]
        self._error = None
        # one base key per run; per-request worker seeds fold into it, so
        # sampled values are deterministic per (global seed, ticket)
        # regardless of thread scheduling / bucket composition
        self._base_key = util.next_key()
        self._carry_mutex = threading.Lock()
        # jit caches live on the network so repeated posterior calls reuse
        # compiled programs (jitted-run-cache invariant)
        if not hasattr(network, "_lockstep_local_jit"):
            network._lockstep_local_jit = {}
        self._jit = network._lockstep_local_jit
        if self._is_lstm:
            depth, H = network._lstm_depth, network._lstm_dim
            # DEVICE-resident recurrent carry: the per-round jitted step
            # gathers/scatters worker columns in-program (host
            # fancy-indexing + per-round transfers were a profiled cost)
            self._hbuf = jnp.zeros((depth, num_workers, H), util.dtype())
            self._cbuf = jnp.zeros((depth, num_workers, H), util.dtype())
        self._build_registries()

    def get_carry(self, idx):
        # rare path (rejection_sample state snapshots): host copies of
        # the worker's device columns
        if not self._is_lstm:
            return None
        with self._carry_mutex:
            return (
                np.asarray(self._hbuf[:, idx : idx + 1]),
                np.asarray(self._cbuf[:, idx : idx + 1]),
            )

    def set_carry(self, idx, v):
        if self._is_lstm:
            # rebinding is read-modify-write on the shared buffers: two
            # workers restoring snapshots concurrently must serialize
            # (they can never race _answer — it only runs with every
            # worker parked)
            with self._carry_mutex:
                self._hbuf = self._hbuf.at[:, idx : idx + 1].set(
                    jnp.asarray(v[0], util.dtype())
                )
                self._cbuf = self._cbuf.at[:, idx : idx + 1].set(
                    jnp.asarray(v[1], util.dtype())
                )

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
        g = self._group_of[idx]
        batch = None
        with self._cond:
            if self._error is not None:
                raise RuntimeError("lockstep run already failed") from None
            self._requests[g].append(req)
            self._running[g] -= 1
            # the LAST parker of the group answers the round ITSELF —
            # no coordinator handoff (2 context switches per round in
            # the r3 breakdown), and the device step it dispatches
            # overlaps the OTHER groups' worker python
            if self._running[g] == 0:
                batch = self._requests[g]
                self._requests[g] = []
        if batch is not None:
            self._answer_round(batch, g)
        req.event.wait()
        if isinstance(req.out, BaseException):
            raise req.out
        return req.out

    def worker_done(self, idx):
        g = self._group_of[idx]
        batch = None
        with self._cond:
            self._running[g] -= 1
            self._done += 1
            if self._done >= self._total:
                self._cond.notify_all()
            if (
                self._running[g] == 0
                and self._requests[g]
                and self._error is None
            ):
                # the finishing worker answers its group's parked round
                batch = self._requests[g]
                self._requests[g] = []
        if batch is not None:
            self._answer_round(batch, g)

    def worker_failed(self, idx, exc):
        unblock = []
        with self._cond:
            if self._error is None:
                self._error = exc
            self._running[self._group_of[idx]] -= 1
            self._done += 1
            # unpark every waiting request with the failure; resumed
            # workers re-raise, land here, and drain the pool
            for gi in range(self._num_groups):
                reqs = self._requests[gi]
                self._requests[gi] = []
                self._running[gi] += len(reqs)
                unblock.extend(reqs)
            if self._done >= self._total:
                self._cond.notify_all()
        err = RuntimeError("lockstep run failed")
        err.__cause__ = exc
        for r in unblock:
            r.out = err
            r.event.set()

    # -- coordinator side ----------------------------------------------
    def _answer_round(self, batch, g):
        """Answer one group's round on the calling WORKER thread."""
        try:
            self._answer(batch)
            out_exc = None
        except BaseException as e:  # propagate to workers + caller
            with self._cond:
                if self._error is None:
                    self._error = e
            out_exc = e
        with self._cond:
            self._running[g] += len(batch)
        for r in batch:
            if out_exc is not None:
                r.out = out_exc
            r.event.set()

    def run(self, workers):
        """Start worker threads and wait for completion (rounds are
        answered worker-driven, see _answer_round)."""
        with self._cond:
            self._total = len(workers)
            for i in range(len(workers)):
                self._running[self._group_of[i]] += 1
        for w in workers:
            w.start()
        with self._cond:
            while self._done < self._total:
                self._cond.wait()
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
            # nets trained with the per-step local-observation slot
            # (tied Markov training): stepwise lockstep inference cannot
            # know the site/observe pairing — zero slot, same as the
            # sequential interpreter (proposals degrade gracefully,
            # weights stay exact)
            W_loc = getattr(net, "_local_observe_dim", 0)

        # Per-round host->device traffic is TWO arrays: ``ipack`` [8, Bp]
        # int32 (seeds + all gather indices + worker columns) and
        # ``fpack`` [Bp, W] float (prior params, prior-dist leaves,
        # previous values) sliced by the STATIC ``meta`` — the previous
        # one-array-per-operand layout cost ~15 device_puts x ~150 us
        # per round on the CPU backend (profiled r4).  The LSTM carry
        # stays DEVICE-RESIDENT: columns gather/scatter inside the jit by
        # worker index instead of host fancy-indexing + 2 transfers + 2
        # fetches per round.
        def fn(lstm_p, heads, sembs, aemb, demb, obs_emb, carry,
               ipack, fpack, prior_dist_arg, base_key, meta):
            (steady, prior_keys, prior_widths, dist_treedef,
             dist_shapes, prev_w) = meta
            seeds = ipack[0]
            cur_head_idx = ipack[1]
            B = ipack.shape[1]
            ofs = 0
            prior = {}
            for k, w in zip(prior_keys, prior_widths):
                prior[k] = fpack[:, ofs : ofs + w]
                ofs += w
            if prior_dist_arg is None:
                leaves = []
                for shp in dist_shapes:
                    w = 1
                    for s in shp:
                        w *= s
                    leaves.append(
                        fpack[:, ofs : ofs + w].reshape((B,) + shp)
                    )
                    ofs += w
                prior_dist = jax.tree_util.tree_unflatten(
                    dist_treedef, leaves
                )
            else:  # non-float dist leaves: passed as its own pytree
                prior_dist = prior_dist_arg
            emb_b = jnp.broadcast_to(obs_emb[0], (B, obs_emb.shape[1]))
            if is_lstm:
                widx = ipack[7]
                if not steady:  # trace-start bucket: zero recurrent state
                    prev_sample_emb = jnp.zeros((B, S), util.dtype())
                    prev_a = jnp.zeros((B, A), util.dtype())
                    prev_d = jnp.zeros((B, D), util.dtype())
                    rows = (
                        jnp.zeros(
                            (carry[0].shape[0], B, carry[0].shape[2]),
                            util.dtype(),
                        ),
                        jnp.zeros(
                            (carry[1].shape[0], B, carry[1].shape[2]),
                            util.dtype(),
                        ),
                    )
                else:
                    prev_values = fpack[:, ofs : ofs + prev_w]
                    prev_sample_emb = jax.vmap(
                        lambda i, v: mlp_apply(
                            jax.tree_util.tree_map(lambda p: p[i], sembs),
                            v[None],
                        )[0]
                    )(ipack[4], prev_values)
                    prev_sample_emb = prev_sample_emb.reshape(B, -1)
                    prev_a = aemb[ipack[5]]
                    prev_d = demb[ipack[6]]
                    rows = (carry[0][:, widx], carry[1][:, widx])
                parts = [emb_b]
                if W_loc:
                    parts.append(jnp.zeros((B, W_loc), util.dtype()))
                parts += [
                    prev_sample_emb,
                    prev_d,
                    prev_a,
                    demb[ipack[3]],
                    aemb[ipack[2]],
                ]
                x = jnp.concatenate(parts, axis=1)
                feats, new_rows = lstm_step(lstm_p, x, rows)
                new_carry = (
                    carry[0].at[:, widx].set(new_rows[0]),
                    carry[1].at[:, widx].set(new_rows[1]),
                )
            else:
                feats = emb_b
                new_carry = carry
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
            # one packed fetch serves both log-pdf vectors
            lp_pack = jnp.stack([plps, prior_lps])
            return values, lp_pack, d, new_carry

        return jax.jit(fn, static_argnames=("meta",))

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

        # fixed pad size (group width): ONE compiled shape per bucket
        # signature — per-bucket-size padding would mint a fresh XLA
        # program whenever a rare (signature, size) pair first appeared,
        # and those mid-run compiles dominate; padded compute is trivial
        Bp = self._Bp

        for (head_group, prev_group, _prior_sig), items in buckets.items():
            B = len(items)
            hg = self._head_groups[head_group]
            steady = prev_group is not None
            # ONE [8, Bp] int array carries seeds + every gather index +
            # worker columns (rows: seed, head, a, d, prev_semb, prev_a,
            # prev_d, widx) — a single device_put per round instead of 7
            ipack = np.zeros((8, Bp), np.int32)
            fparts = []
            pv_rows = [] if steady else None
            head_of, a_of, d_of = self._head_of, None, None
            semb_of = None
            if is_lstm:
                a_of, d_of = self._a_of, self._d_of
                semb_of = self._semb_of
            head_key = net._head_key
            for row, r in enumerate(items):
                ipack[0, row] = r.seed
                ipack[7, row] = r.idx
                ak = head_key(r.variable.address)
                ipack[1, row] = head_of[ak][1]
                if is_lstm:
                    ipack[2, row] = a_of[ak]
                    ipack[3, row] = d_of[r.variable.distribution.name]
                if steady:
                    pk = head_key(r.prev_variable.address)
                    ipack[4, row] = semb_of[pk][1]
                    ipack[5, row] = a_of[pk]
                    ipack[6, row] = d_of[
                        r.prev_variable.distribution.name
                    ]
                    pv_rows.append(
                        np.asarray(
                            r.prev_variable.value, util.dtype()
                        ).reshape(-1)
                    )
            if Bp != B:
                ipack[:, B:] = ipack[:, B - 1 : B]

            # ONE [Bp, W] float array carries prior params + prior-dist
            # leaves + previous values, sliced in-program by the STATIC
            # meta (one device_put instead of one per operand)
            prior_keys = tuple(sorted(items[0]._prior_row))
            prior_widths = tuple(
                items[0]._prior_row[k].shape[0] for k in prior_keys
            )
            for k in prior_keys:
                fparts.append(np.stack([r._prior_row[k] for r in items]))
            dist_leaves0, dist_treedef = jax.tree_util.tree_flatten(
                items[0].variable.distribution
            )
            packable = all(
                np.issubdtype(np.asarray(l).dtype, np.floating)
                for l in dist_leaves0
            )
            dist_shapes = tuple(
                tuple(np.shape(l)) for l in dist_leaves0
            )
            prior_dist_arg = None
            if packable:
                rows_leaves = [dist_leaves0] + [
                    jax.tree_util.tree_leaves(r.variable.distribution)
                    for r in items[1:]
                ]
                for j in range(len(dist_leaves0)):
                    fparts.append(
                        np.stack(
                            [
                                np.asarray(
                                    lv[j], util.dtype()
                                ).reshape(-1)
                                for lv in rows_leaves
                            ]
                        )
                    )
            else:  # integer-leaved dists: own pytree arg (rare)
                def _pad0(a):
                    if Bp == B:
                        return a
                    reps = np.repeat(a[-1:], Bp - B, axis=0)
                    return np.concatenate([a, reps], axis=0)

                prior_dist_arg = jax.tree_util.tree_map(
                    lambda *xs: jnp.asarray(
                        _pad0(np.stack([np.asarray(x) for x in xs]))
                    ),
                    *[r.variable.distribution for r in items],
                )
                dist_shapes = ()
            prev_w = 0
            if steady:
                pv = np.stack(pv_rows)
                prev_w = pv.shape[1]
                fparts.append(pv)
            if fparts:
                fpack = np.concatenate(
                    [p.astype(util.dtype(), copy=False) for p in fparts],
                    axis=1,
                )
                if Bp != B:
                    fpack = np.concatenate(
                        [fpack, np.repeat(fpack[-1:], Bp - B, axis=0)],
                        axis=0,
                    )
            else:
                fpack = np.zeros((Bp, 0), util.dtype())

            meta = (
                steady,
                prior_keys,
                prior_widths,
                dist_treedef if packable else None,
                dist_shapes,
                prev_w,
            )
            sembs = (
                self._semb_groups[prev_group]["stacked"] if steady else ()
            )
            if is_lstm:
                # concurrent group rounds + rejection-snapshot restores
                # both rebind the carry buffers: the read-dispatch-rebind
                # must be atomic (dispatch is async, so the mutex is held
                # only microseconds, not for the device compute)
                with self._carry_mutex:
                    values, lp_pack, d, new_carry = fn(
                        params["lstm"],
                        hg["stacked"],
                        sembs,
                        self._aemb,
                        self._demb,
                        self._emb,
                        (self._hbuf, self._cbuf),
                        jnp.asarray(ipack),
                        jnp.asarray(fpack),
                        prior_dist_arg,
                        self._base_key,
                        meta,
                    )
                    # device-resident carry: the jit gathered/scattered
                    # the worker columns; just rebind the buffers
                    self._hbuf, self._cbuf = new_carry
            else:
                values, lp_pack, d, new_carry = fn(
                    (),
                    hg["stacked"],
                    sembs,
                    (),
                    (),
                    self._emb,
                    (),
                    jnp.asarray(ipack),
                    jnp.asarray(fpack),
                    prior_dist_arg,
                    self._base_key,
                    meta,
                )
            values_np = np.asarray(values)
            lp_np = np.asarray(lp_pack, np.float64)
            plps_list = lp_np[0, :B].tolist()
            prior_lps_list = lp_np[1, :B].tolist()
            # the batched dist pytree stays on device; a shared holder
            # converts to numpy LAZILY (only rejection retries need it)
            d_holder = _RoundDist(d)
            for row, r in enumerate(items):
                r.out = _ProposalShim(
                    values_np[row],
                    plps_list[row],
                    prior_lps_list[row],
                    d_holder,
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
            coordinator.worker_done(widx)
        except BaseException as e:
            coordinator.worker_failed(widx, e)
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
