"""LSTM inference network — the inference-compilation architecture
(arXiv:1610.09900; reference: pyprob/nn/inference_network_lstm.py:11-220).

Per-address sample embeddings + learned address embeddings (64d) +
distribution-type embeddings (8d) feed an LSTM core (512d) whose features
drive per-address proposal heads.  On the compiled tier the *entire*
guided-importance-sampling run — observe embedding, per-site LSTM step,
head, proposal sampling, weight accumulation — is one XLA program vmapped
over particles, eliminating the reference's per-site host round-trips
(SURVEY.md §7 hard part 4)."""

from __future__ import annotations

import warnings

import numpy as np
import jax
import jax.numpy as jnp

from .. import util
from ..distributions import Categorical
from .inference_network import InferenceNetwork
from .layers import (
    mlp_init,
    mlp_apply,
    lstm_init,
    lstm_apply,
    lstm_step,
    lstm_zero_state,
    num_params,
)
from .proposals import (
    head_kind_for,
    event_dim_for,
    head_init,
    head_apply,
    prior_param_arrays,
)


class InferenceNetworkLSTM(InferenceNetwork):
    def __init__(
        self,
        lstm_dim=512,
        lstm_depth=1,
        sample_embedding_dim=4,
        address_embedding_dim=64,
        distribution_type_embedding_dim=8,
        proposal_mixture_components=10,
        *args,
        **kwargs,
    ):
        super().__init__(network_type="InferenceNetworkLSTM", *args, **kwargs)
        self._params["proposal"] = {}
        self._params["sample_embedding"] = {}
        self._params["address_embedding"] = {}
        self._params["dist_type_embedding"] = {}
        self._params["lstm"] = None
        self._head_meta = {}
        self._lstm_dim = lstm_dim
        self._lstm_depth = lstm_depth
        self._lstm_input_dim = None
        # per-step LOCAL observation slot width (tied-instance Markov
        # training): raw values of the observes that FOLLOW each
        # controlled site feed the LSTM input at that site, so filtering
        # proposals see y_t directly instead of having to localize it
        # inside a fixed-width whole-sequence embedding (the measured
        # information bottleneck behind guided scan-SMC's flat ESS at
        # large T, BASELINE.md r4).  0 = feature off (default for
        # untied/non-Markov training).
        self._local_observe_dim = 0
        self._sample_embedding_dim = sample_embedding_dim
        self._address_embedding_dim = address_embedding_dim
        self._distribution_type_embedding_dim = distribution_type_embedding_dim
        self._proposal_mixture_components = proposal_mixture_components

    @property
    def _infer_lstm_state(self):
        return getattr(self._infer_tls, "lstm_state", None)

    @_infer_lstm_state.setter
    def _infer_lstm_state(self, v):
        self._infer_tls.lstm_state = v

    def _subclass_state(self):
        return {
            "head_meta": self._head_meta,
            "lstm_dim": self._lstm_dim,
            "lstm_depth": self._lstm_depth,
            "lstm_input_dim": self._lstm_input_dim,
            "local_observe_dim": self._local_observe_dim,
            "sample_embedding_dim": self._sample_embedding_dim,
            "address_embedding_dim": self._address_embedding_dim,
            "distribution_type_embedding_dim": self._distribution_type_embedding_dim,
            "proposal_mixture_components": self._proposal_mixture_components,
        }

    def _load_subclass_state(self, state):
        self._head_meta = state["head_meta"]
        self._lstm_dim = state["lstm_dim"]
        self._lstm_depth = state["lstm_depth"]
        self._lstm_input_dim = state["lstm_input_dim"]
        # absent in pre-r4 checkpoints: feature off
        self._local_observe_dim = state.get("local_observe_dim", 0)
        self._sample_embedding_dim = state["sample_embedding_dim"]
        self._address_embedding_dim = state["address_embedding_dim"]
        self._distribution_type_embedding_dim = state[
            "distribution_type_embedding_dim"
        ]
        self._proposal_mixture_components = state["proposal_mixture_components"]

    def _init_layers(self):
        """(reference: inference_network_lstm.py:29-32)"""
        self._lstm_input_dim = (
            self._observe_embedding_dim
            + self._local_observe_dim
            + self._sample_embedding_dim
            + 2 * (self._address_embedding_dim + self._distribution_type_embedding_dim)
        )
        self._params["lstm"] = lstm_init(
            util.next_key(), self._lstm_input_dim, self._lstm_dim, self._lstm_depth
        )

    @staticmethod
    def _trailing_observe_positions(trace):
        """Per controlled-site index ``t``: positions (into
        ``trace.variables``) of the OBSERVED variables between controlled
        site ``t`` and controlled site ``t+1`` (or trace end) — the
        observations a filtering proposal for site ``t`` should condition
        on directly (in a MarkovModel's derived trace these are exactly
        the current step's observes)."""
        out = []
        for pos, v in enumerate(trace.variables):
            if v.control and not v.observed:
                out.append([])
            elif v.observed and v.name is not None and out:
                out[-1].append(pos)
        # sorted-name order within each gap, matching the inference-side
        # per-stage flattening (inference only has the observed dict)
        return [
            sorted(g, key=lambda p: trace.variables[p].name) for g in out
        ]

    def _maybe_init_local_observe(self, example_trace):
        """Auto-size the per-step local-observation slot for
        tied-instance (Markov) training; ``PYPROB_TPU_LOCAL_OBS=0``
        opts out."""
        import os

        if not self._tie_address_instances:
            return
        if os.environ.get("PYPROB_TPU_LOCAL_OBS", "1") == "0":
            return
        w = 0
        for positions in self._trailing_observe_positions(example_trace):
            tw = sum(
                int(np.asarray(example_trace.variables[p].value).size)
                for p in positions
            )
            w = max(w, tw)
        self._local_observe_dim = int(w)

    def _local_obs_rows(self, sub_batch):
        """[T, B, W_loc] local-observation values for a sub-batch (all
        traces share the type): step t row b = flattened values of the
        observes following controlled site t in trace b, zero-padded (or
        truncated) to the slot width."""
        W = self._local_observe_dim
        example = sub_batch[0]
        pos_map = self._trailing_observe_positions(example)
        T = example.length_controlled
        B = len(sub_batch)
        out = np.zeros((T, B, W), util.dtype())
        for t in range(min(T, len(pos_map))):
            positions = pos_map[t]
            if not positions:
                continue
            for b, tr in enumerate(sub_batch):
                vals = np.concatenate(
                    [
                        np.asarray(
                            tr.variables[p].value, util.dtype()
                        ).reshape(-1)
                        for p in positions
                    ]
                )
                k = min(W, vals.shape[0])
                out[t, b, :k] = vals[:k]
        return out

    def _polymorph(self, batch):
        """Grow per-address layers (reference: inference_network_lstm.py:34-80)."""
        layers_changed = False
        for sub_batch in batch.sub_batches:
            example_trace = sub_batch[0]
            for variable in example_trace.variables_controlled:
                address = self._head_key(variable.address)
                distribution = variable.distribution
                if address not in self._params["address_embedding"]:
                    self._params["address_embedding"][address] = (
                        jax.random.normal(
                            util.next_key(),
                            (self._address_embedding_dim,),
                            util.dtype(),
                        )
                    )
                    layers_changed = True
                if distribution.name not in self._params["dist_type_embedding"]:
                    self._params["dist_type_embedding"][distribution.name] = (
                        jax.random.normal(
                            util.next_key(),
                            (self._distribution_type_embedding_dim,),
                            util.dtype(),
                        )
                    )
                    layers_changed = True
                if address not in self._params["proposal"]:
                    kind = head_kind_for(distribution)
                    if kind is None:
                        raise RuntimeError(
                            f"Distribution currently unsupported: {distribution.name}"
                        )
                    num_categories = (
                        distribution.num_categories
                        if kind == "categorical"
                        else None
                    )
                    self._params["proposal"][address] = head_init(
                        util.next_key(),
                        kind,
                        self._lstm_dim,
                        mixture_components=self._proposal_mixture_components,
                        num_categories=num_categories,
                        event_dim=event_dim_for(distribution),
                    )
                    value_shape = tuple(np.shape(variable.value)) or (1,)
                    self._params["sample_embedding"][address] = mlp_init(
                        util.next_key(),
                        value_shape,
                        (self._sample_embedding_dim,),
                        num_layers=1,
                        one_hot_dim=num_categories
                        if kind == "categorical"
                        else None,
                    )
                    self._head_meta[address] = {
                        "kind": kind,
                        "num_categories": num_categories,
                        "dist_name": distribution.name,
                    }
                    self._head_train_iterations.setdefault(address, 0)
                    layers_changed = True
                    util.log_print(
                        f"New layers, address: {util.truncate_str(address)}, "
                        f"distribution: {distribution.name}"
                    )
        if layers_changed:
            # stability marker: the fused gather update only compiles its
            # (polymorph-invalidated) program once the layer set stops
            # churning — early-training compiles were a measured net loss
            self._last_layers_change_iter = self._total_train_iterations
            n = num_params(self._params)
            util.log_print(
                f"Total addresses: {len(self._params['address_embedding']):,}, "
                f"distribution types: {len(self._params['dist_type_embedding']):,}, "
                f"parameters: {n:,}"
            )
            self._history_num_params.append(n)
            self._history_num_params_trace.append(self._total_train_traces)
        return layers_changed

    # ------------------------------------------------------------------
    # training loss (reference: inference_network_lstm.py:136-220)
    # ------------------------------------------------------------------
    def _pack_sub_batch(self, sub_batch):
        example = sub_batch[0]
        packed = {"obs": self._pack_observes(sub_batch), "steps": []}
        local = (
            self._local_obs_rows(sub_batch)
            if self._local_observe_dim
            else None
        )
        for t in range(example.length_controlled):
            values = jnp.asarray(
                np.stack(
                    [
                        np.asarray(tr.variables_controlled[t].value)
                        for tr in sub_batch
                    ]
                )
            )
            step = {
                "values": values,
                "prior": self._sub_batch_prior_params(sub_batch, t),
            }
            if local is not None:
                step["local_obs"] = jnp.asarray(local[t])
            sm = self._sub_batch_step_mask(sub_batch, t)
            if sm is not None:
                step["mask"] = sm
            packed["steps"].append(step)
        return packed

    def _make_sub_batch_loss(self, sub_batch):
        example = sub_batch[0]
        addrs = tuple(v.address for v in example.variables_controlled)
        dist_names = tuple(
            v.distribution.name for v in example.variables_controlled
        )
        return self._make_loss_for(addrs, dist_names)

    def _loss_params_subset(self, addrs, dist_names):
        # only the keys the LSTM loss reads — polymorphing a new address
        # elsewhere must not retrace this trace type's compiled loss
        p = self._params
        keys = {self._head_key(a) for a in addrs}
        return {
            "observe": p["observe"],
            "observe_final": p["observe_final"],
            "lstm": p["lstm"],
            "proposal": {a: p["proposal"][a] for a in keys},
            "sample_embedding": {
                a: p["sample_embedding"][a] for a in keys
            },
            "address_embedding": {
                a: p["address_embedding"][a] for a in keys
            },
            "dist_type_embedding": {
                n: p["dist_type_embedding"][n] for n in set(dist_names)
            },
        }

    def _make_loss_for(self, addrs, dist_names):
        addrs = tuple(self._head_key(a) for a in addrs)
        for addr in addrs:
            if addr not in self._params["proposal"]:
                raise RuntimeError(
                    f"Address unknown by inference network: {addr}"
                )
        embed = self._embed_observe_pure
        S = self._sample_embedding_dim
        A = self._address_embedding_dim
        D = self._distribution_type_embedding_dim

        def loss_fn(params, packed):
            emb = embed(params, packed["obs"])  # [B, O]
            B = emb.shape[0]
            inputs = []
            for t, addr in enumerate(addrs):
                cur_addr_emb = jnp.broadcast_to(
                    params["address_embedding"][addr], (B, A)
                )
                cur_dist_emb = jnp.broadcast_to(
                    params["dist_type_embedding"][dist_names[t]], (B, D)
                )
                if t == 0:
                    prev_sample_emb = jnp.zeros((B, S), util.dtype())
                    prev_addr_emb = jnp.zeros((B, A), util.dtype())
                    prev_dist_emb = jnp.zeros((B, D), util.dtype())
                else:
                    prev_addr = addrs[t - 1]
                    prev_sample_emb = mlp_apply(
                        params["sample_embedding"][prev_addr],
                        packed["steps"][t - 1]["values"],
                    )
                    prev_addr_emb = jnp.broadcast_to(
                        params["address_embedding"][prev_addr], (B, A)
                    )
                    prev_dist_emb = jnp.broadcast_to(
                        params["dist_type_embedding"][dist_names[t - 1]],
                        (B, D),
                    )
                parts = [emb]
                lo = packed["steps"][t].get("local_obs")
                if lo is not None:
                    parts.append(lo)
                parts += [
                    prev_sample_emb,
                    prev_dist_emb,
                    prev_addr_emb,
                    cur_dist_emb,
                    cur_addr_emb,
                ]
                inputs.append(jnp.concatenate(parts, axis=1))
            lstm_in = jnp.stack(inputs)  # [T, B, I]
            lstm_out, _ = lstm_apply(params["lstm"], lstm_in)  # [T, B, H]
            mask = packed.get("mask")
            total = jnp.zeros((), util.dtype())
            for t, addr in enumerate(addrs):
                d = head_apply(
                    params["proposal"][addr],
                    lstm_out[t],
                    packed["steps"][t]["prior"],
                )
                lp = d.log_prob(packed["steps"][t]["values"])
                lp = jnp.clip(lp, -1e38, None)  # -inf repair (reference: lstm.py:213)
                smask = packed["steps"][t].get("mask")
                if smask is not None:  # sample(mask=) padding sites
                    lp = lp * smask
                if mask is not None:
                    lp = lp * mask
                total = total - jnp.sum(lp)
            return total

        return ("lstm", addrs), loss_fn

    # ------------------------------------------------------------------
    # gather-table loss: one program per (pow2 length bucket, table
    # structure) serves every trace type (nn/gather_loss.py; the fix for
    # variable-structure compile churn — reference counterpart being
    # replaced: pyprob/nn/inference_network_lstm.py:136-220 +
    # pyprob/nn/dataset.py:21-47)
    # ------------------------------------------------------------------
    def _gather_registry(self):
        from .gather_loss import GatherRegistry

        version = GatherRegistry.version_of(self._params)
        cached = getattr(self, "_gather_reg", None)
        if cached is not None and cached[0] == version:
            return cached[1]
        reg = GatherRegistry(self._params)
        self._gather_reg = (version, reg)
        return reg

    def _prepare_gather(self, batch):
        import os

        if os.environ.get("PYPROB_TPU_GATHER_LOSS", "1") == "0":
            return None
        if not getattr(batch, "traces", None):
            return None
        # single-type batches keep the per-type path (fixed-structure
        # models never need tables) until gather has been engaged once —
        # after that, stay on it so one program family serves the run
        if len(batch.sub_batches) <= 1 and not getattr(
            self, "_gather_used", False
        ):
            return None
        from . import gather_loss as gl

        reg = self._gather_registry()
        prep = gl.pack_batch(self, reg, batch)
        if prep is None:
            return None
        self._gather_used = True
        return (reg,) + prep

    def _gather_loss_fn(self):
        from . import gather_loss as gl

        return gl.make_gather_loss(
            self._embed_observe_pure,
            self._address_embedding_dim,
            self._distribution_type_embedding_dim,
        )

    def _make_gather_update(self, reg, head_gkey, semb_gkey):
        """One jitted program: scatter table grads to the canonical
        per-address structure (static-index slices, fused by XLA) and
        apply the optimizer update.  Replaces a host-side scatter (one
        dispatched slice per address x leaf) plus a 500-leaf grad
        transfer into the update program — measured ~240 ms/step of pure
        overhead on the Marsaglia run."""
        update_raw = self._update_fn_raw
        head_addrs = list(reg.head_groups[head_gkey])
        semb_addrs = list(reg.semb_groups[semb_gkey])
        a_addrs = list(reg.a_addrs)
        d_names = list(reg.d_names)

        def update(params, tgrads, opt_state, lr):
            grads = {
                "observe": tgrads["observe"],
                "observe_final": tgrads["observe_final"],
                "lstm": tgrads["lstm"],
                "proposal": {
                    a: jax.tree_util.tree_map(
                        lambda t, i=i: t[i], tgrads["heads"]
                    )
                    for i, a in enumerate(head_addrs)
                },
                "sample_embedding": {
                    a: jax.tree_util.tree_map(
                        lambda t, i=i: t[i], tgrads["sembs"]
                    )
                    for i, a in enumerate(semb_addrs)
                },
                "address_embedding": {
                    a: tgrads["aemb"][i] for i, a in enumerate(a_addrs)
                },
                "dist_type_embedding": {
                    n: tgrads["demb"][i] for i, n in enumerate(d_names)
                },
            }

            def expand(full, sub):
                if isinstance(full, dict):
                    return {
                        k: (
                            expand(v, sub[k])
                            if isinstance(sub, dict) and k in sub
                            else jax.tree_util.tree_map(
                                jnp.zeros_like, v
                            )
                        )
                        for k, v in full.items()
                    }
                return sub

            grads = expand(params, grads)
            return update_raw(params, grads, opt_state, lr)

        return jax.jit(update)

    def _speculate_gather_compile(self, sig, tables, packed, mean_length):
        """Background-compile the one NEIGHBOR bucket a variable-structure
        run will almost surely hit: the next pow2 bucket DOWN (a batch
        whose longest trace is shorter than this one's — near-certain
        when the mean length sits below half the bucket).  Upward
        speculation is deliberately absent: rare giant traces would burn
        a ~4.5 s compile that is usually never used, and on a small host
        background compiles steal the same cores the training loop runs
        on (measured: cascading speculation REGRESSED the 12.8k run)."""
        import threading

        from . import gather_loss as gl

        T2 = sig[0] // 2
        if T2 < 1 or T2 < gl._next_pow2(max(int(mean_length), 1)):
            return
        nkey = ("gather_lstm", T2) + sig[1:]
        if nkey in self._loss_grad_cache:
            return
        entry = {"fn": None, "event": threading.Event()}
        self._loss_grad_cache[nkey] = entry
        tshapes = gl.table_shapes(tables)
        pshapes = gl.packed_shapes_with_T(packed, T2)
        fn = jax.jit(jax.value_and_grad(self._gather_loss_fn()))

        def _bg():
            try:
                entry["fn"] = fn.lower(tshapes, pshapes).compile()
            except Exception:
                entry["fn"] = None  # waiter falls back to jit-on-call
            finally:
                entry["event"].set()

        threading.Thread(target=_bg, daemon=True).start()

    def _try_gather_loss_and_grad(self, batch):
        import math

        prep = self._prepare_gather(batch)
        if prep is None:
            return None
        reg, sig, packed, head_gkey, semb_gkey, addrs_present = prep
        from . import gather_loss as gl

        tables = gl.stack_tables(self._params, reg, head_gkey, semb_gkey)
        key = ("gather_lstm",) + sig
        fn = self._loss_grad_cache.get(key)
        if isinstance(fn, dict):  # speculative background compile
            fn["event"].wait()
            fn = fn["fn"]
            if fn is None:
                fn = jax.jit(jax.value_and_grad(self._gather_loss_fn()))
            self._loss_grad_cache[key] = fn
        elif fn is None:
            util.relieve_compile_pressure()
            fn = self._loss_grad_cache[key] = jax.jit(
                jax.value_and_grad(self._gather_loss_fn())
            )
        # speculative prefetch: background-compile the NEXT pow2 length
        # bucket's program (variable-structure models climb buckets as
        # longer traces appear; a blocking mid-run compile was the bulk
        # of the 12.8k-trace Marsaglia wall time)
        self._speculate_gather_compile(
            sig, tables, packed, getattr(batch, "mean_length_controlled", 1)
        )
        try:
            loss, tgrads = fn(tables, packed)
        except (TypeError, ValueError):
            # AOT-compiled speculative program rejected the inputs (e.g.
            # weak-type drift): fall back to jit-on-call permanently
            fn = self._loss_grad_cache[key] = jax.jit(
                jax.value_and_grad(self._gather_loss_fn())
            )
            loss, tgrads = fn(tables, packed)
        # loss/grads leave the program per-trace-normalized (the norm is
        # a traced scalar inside packed)
        loss_value = float(loss)
        success = not (math.isnan(loss_value) or math.isinf(loss_value))
        if not success:
            return success, loss_value, None  # caller skips the batch

        # Fused scatter+update (one dispatch; grads=None tells optimize()
        # the step is already taken).  The program retraces whenever
        # polymorph grows the parameter tree, and those ~1.5 s compiles
        # landed ~10x on the critical path of a Marsaglia run (measured:
        # 471 -> 312 traces/s) — so it is compiled in a BACKGROUND thread
        # while the host-scatter path keeps stepping, and swapped in when
        # ready.  Requires a live optimizer (optimize() creates it before
        # the loss call); tests set _gather_fused_update=False to get
        # grads back directly.
        if self._update_fn_raw is not None and getattr(
            self, "_gather_fused_update", True
        ):
            gen = getattr(self, "_optimizer_gen", 0)
            # key on optimizer generation + table structure only (NOT the
            # T/B buckets — the update is bucket-independent)
            ukey = ("gather_update", gen, sig[2], sig[3], sig[8], sig[9],
                    sig[10], sig[11])
            entry = self._loss_grad_cache.get(ukey)
            if entry is not None and entry.get("fn") is not None:
                # lr must be a traced ARRAY: AOT-lowering with a python
                # float would bake it as a compile-time constant
                lr = jnp.asarray(
                    self._current_learning_rate(), util.dtype()
                )
                try:
                    self._params, self._opt_state = entry["fn"](
                        self._params, tgrads, self._opt_state, lr
                    )
                    self._bump_head_iterations(addrs_present)
                    return success, loss_value, None
                except (TypeError, ValueError):
                    # AOT input mismatch: drop the entry, use the host
                    # scatter below this step (a fresh compile restarts
                    # once the layer set is stable again)
                    del self._loss_grad_cache[ukey]
            import os as _os

            stable = (
                self._total_train_iterations
                - getattr(self, "_last_layers_change_iter", 0)
                >= int(_os.environ.get("PYPROB_TPU_GATHER_FUSED_AFTER", "24"))
            )
            if entry is None and stable:
                # kick off the compile off the critical path
                import threading

                entry = {"fn": None}
                self._loss_grad_cache[ukey] = entry
                fn = self._make_gather_update(reg, head_gkey, semb_gkey)
                lr0 = jnp.asarray(
                    self._current_learning_rate(), util.dtype()
                )
                args = (self._params, tgrads, self._opt_state, lr0)

                def _bg_compile():
                    try:
                        compiled = fn.lower(*args).compile()
                        entry["fn"] = compiled
                    except Exception:
                        entry["fn"] = fn  # fall back to jit-on-call

                threading.Thread(target=_bg_compile, daemon=True).start()

        sub = gl.scatter_table_grads(tgrads, reg, head_gkey, semb_gkey)
        grads = self._expand_grads(sub, (), ())
        self._bump_head_iterations(addrs_present)
        return success, loss_value, grads

    def _try_gather_loss(self, batch):
        import math

        prep = self._prepare_gather(batch)
        if prep is None:
            return None
        reg, sig, packed, head_gkey, semb_gkey, _ = prep
        from . import gather_loss as gl

        tables = gl.stack_tables(self._params, reg, head_gkey, semb_gkey)
        key = ("gather_lstm",) + sig
        if key not in self._loss_cache:
            util.relieve_compile_pressure()
            self._loss_cache[key] = jax.jit(self._gather_loss_fn())
        loss_value = float(self._loss_cache[key](tables, packed))
        success = not (math.isnan(loss_value) or math.isinf(loss_value))
        return success, loss_value

    # ------------------------------------------------------------------
    # stepwise inference, interpreter tier
    # (reference: inference_network_lstm.py:82-134)
    # ------------------------------------------------------------------
    def _infer_begin_trace(self):
        self._infer_lstm_state = None

    def _infer_step(self, variable, prev_variable=None, proposal_min_train_iterations=None):
        address = self._head_key(variable.address)
        distribution = variable.distribution
        params = self._serving_params()
        S, A, D = (
            self._sample_embedding_dim,
            self._address_embedding_dim,
            self._distribution_type_embedding_dim,
        )
        if prev_variable is None:
            self._infer_lstm_state = lstm_zero_state(params["lstm"], (1,))
            prev_sample_emb = jnp.zeros((1, S), util.dtype())
            prev_addr_emb = jnp.zeros((A,), util.dtype())
            prev_dist_emb = jnp.zeros((D,), util.dtype())
        else:
            prev_address = self._head_key(prev_variable.address)
            if prev_address not in params["address_embedding"]:
                warnings.warn(
                    f"Address of previous variable unknown by inference "
                    f"network: {prev_address}"
                )
                return distribution
            prev_value = np.asarray(prev_variable.value).reshape(1, -1)
            prev_sample_emb = mlp_apply(
                params["sample_embedding"][prev_address], jnp.asarray(prev_value)
            )
            prev_addr_emb = params["address_embedding"][prev_address]
            prev_dist_emb = params["dist_type_embedding"][
                prev_variable.distribution.name
            ]
        if address not in params["address_embedding"]:
            warnings.warn(
                f"Using prior. No proposal for address: {address}"
            )
            return distribution
        if proposal_min_train_iterations is not None:
            if (
                self._head_train_iterations.get(address, 0)
                < proposal_min_train_iterations
            ):
                warnings.warn(
                    f"Using prior. Proposal not sufficiently trained for "
                    f"address: {address}"
                )
                return distribution
        cur_addr_emb = params["address_embedding"][address]
        cur_dist_emb = params["dist_type_embedding"][distribution.name]
        prior = {
            k: np.asarray(v, util.dtype()).reshape(1, -1)
            for k, v in prior_param_arrays(distribution).items()
        }
        # the whole per-site step (concat + LSTM cell + head) is ONE jitted
        # dispatch; the proposal comes back as a numpy-leaved pytree so the
        # interpreter samples/scores in the numpy backend (dozens of
        # per-op jnp dispatches per site otherwise)
        fn = getattr(self, "_infer_step_jit", None)
        if fn is None:

            W_loc = self._local_observe_dim

            def _site_step(lstm_p, head_p, obs_emb, prev_sample_emb,
                           prev_dist_emb, prev_addr_emb, cur_dist_emb,
                           cur_addr_emb, lstm_state, prior):
                parts = [obs_emb[0]]
                if W_loc:
                    # stepwise interpreter inference cannot know which
                    # future observes pair with this site: the local
                    # slot stays zero (proposal degrades gracefully,
                    # weights stay exact; guided scan-SMC feeds it)
                    parts.append(jnp.zeros((W_loc,), util.dtype()))
                parts += [
                    prev_sample_emb[0],
                    prev_dist_emb,
                    prev_addr_emb,
                    cur_dist_emb,
                    cur_addr_emb,
                ]
                x = jnp.concatenate(parts).reshape(1, -1)
                out, new_state = lstm_step(lstm_p, x, lstm_state)
                return head_apply(head_p, out, prior), new_state

            fn = self._infer_step_jit = jax.jit(_site_step)
        d, self._infer_lstm_state = fn(
            params["lstm"],
            params["proposal"][address],
            self._infer_observe_embedding,
            prev_sample_emb,
            prev_dist_emb,
            prev_addr_emb,
            cur_dist_emb,
            cur_addr_emb,
            self._infer_lstm_state,
            prior,
        )
        return jax.tree_util.tree_map(np.asarray, d)

    # ------------------------------------------------------------------
    # compiled-tier guided inference: whole trace in one XLA program
    # ------------------------------------------------------------------
    def make_vectorized_proposal_step(self, observe=None):
        params = self._serving_params()
        head_meta = self._head_meta
        head_key = self._head_key
        embed = self._embed_observe_pure
        S, A, D = (
            self._sample_embedding_dim,
            self._address_embedding_dim,
            self._distribution_type_embedding_dim,
        )
        state = {}

        W_loc = self._local_observe_dim

        def reset():
            state["lstm"] = lstm_zero_state(params["lstm"], (1,))
            state["prev"] = None  # (address, value, dist_name)
            state["emb"] = None
            state["local"] = None  # per-stage local observation values

        def _emb(observed):
            # observe embedding from the *traced* observed dict — computed
            # once per trace; the compiled program is observation-agnostic
            if state.get("emb") is None:
                obs = {
                    name: jnp.reshape(
                        jnp.asarray(observed[name], util.dtype()), (1, -1)
                    )
                    for name in params["observe"].keys()
                }
                state["emb"] = embed(params, obs)
            return state["emb"]

        def proposal_step(site, distribution, key, observed, forced_value=None,
                          defensive=None, mask=None):
            # forced_value: score/advance-state instead of sampling — used
            # by guided SMC to step the LSTM through replayed prefix sites.
            # defensive=π: sample from the mixture π·q + (1−π)·prior and
            # score against it — used for rejection_sample retries, where a
            # REJECTED attempt's p/q correction enters the weight with no
            # compensating likelihood term; the mixture caps that factor at
            # 1/(1−π) (defensive importance sampling, Hesterberg 1995)
            addr = head_key(site.address)
            if addr not in head_meta:
                if forced_value is not None:
                    return forced_value, distribution.log_prob(
                        forced_value, sum=True
                    )
                value = distribution._sample_jax(key, ())
                return value, distribution.log_prob(value, sum=True)
            emb = _emb(observed)
            prev = state["prev"]
            if prev is None:
                prev_sample_emb = jnp.zeros((1, S), util.dtype())
                prev_addr_emb = jnp.zeros((A,), util.dtype())
                prev_dist_emb = jnp.zeros((D,), util.dtype())
            else:
                prev_addr, prev_value, prev_dist_name = prev
                if prev_addr in params["sample_embedding"]:
                    prev_sample_emb = mlp_apply(
                        params["sample_embedding"][prev_addr],
                        jnp.reshape(prev_value, (1, -1)),
                    )
                    prev_addr_emb = params["address_embedding"][prev_addr]
                    prev_dist_emb = params["dist_type_embedding"][prev_dist_name]
                else:
                    prev_sample_emb = jnp.zeros((1, S), util.dtype())
                    prev_addr_emb = jnp.zeros((A,), util.dtype())
                    prev_dist_emb = jnp.zeros((D,), util.dtype())
            parts = [emb[0]]
            if W_loc:
                # per-stage local observation slot (guided scan-SMC sets
                # it to the current stage's observe values via set_local;
                # paths that cannot know the alignment feed zeros — the
                # proposal degrades gracefully, weights stay exact)
                lo = state.get("local")
                if lo is None:
                    lo = jnp.zeros((W_loc,), util.dtype())
                lo = jnp.reshape(
                    jnp.asarray(lo, util.dtype()), (-1,)
                )
                if lo.shape[0] > W_loc:
                    lo = lo[:W_loc]
                elif lo.shape[0] < W_loc:
                    lo = jnp.concatenate(
                        [
                            lo,
                            jnp.zeros(
                                (W_loc - lo.shape[0],), util.dtype()
                            ),
                        ]
                    )
                parts.append(lo)
            parts += [
                prev_sample_emb[0],
                prev_dist_emb,
                prev_addr_emb,
                params["dist_type_embedding"][distribution.name],
                params["address_embedding"][addr],
            ]
            x = jnp.concatenate(parts).reshape(1, -1)
            out, state["lstm"] = lstm_step(params["lstm"], x, state["lstm"])
            prior = {
                k: jnp.reshape(jnp.asarray(v, util.dtype()), (1, -1))
                for k, v in prior_param_arrays(distribution).items()
            }
            ev = tuple(getattr(distribution, "event_shape", ()))
            d = head_apply(params["proposal"][addr], out, prior)
            if forced_value is not None:
                value = jnp.reshape(forced_value, ev)
                plp = jnp.sum(d.log_prob(value))
            elif defensive is not None:
                kq, kp, ku = jax.random.split(key, 3)
                xq = jnp.reshape(d._sample_jax(kq, ()), ev)
                xp = jnp.reshape(distribution._sample_jax(kp, ()), ev)
                value = jnp.where(
                    jax.random.bernoulli(ku, defensive), xq, xp
                )
                plp = jnp.logaddexp(
                    jnp.log(defensive) + jnp.sum(d.log_prob(value)),
                    jnp.log1p(-defensive)
                    + distribution.log_prob(value, sum=True),
                )
            elif mask is not None:
                # sample(mask=): masked-off lanes draw from the PRIOR
                # (matching training traces, whose masked sites are prior
                # draws); the caller zeroes their weight correction.  The
                # recurrent state still advances with the chosen value.
                kq, kp = jax.random.split(key)
                xq = jnp.reshape(d._sample_jax(kq, ()), ev)
                xp = jnp.reshape(distribution._sample_jax(kp, ()), ev)
                value = jnp.where(mask, xq, xp)
                plp = jnp.sum(d.log_prob(value))
            else:
                value = jnp.reshape(d._sample_jax(key, ()), ev)
                plp = jnp.sum(d.log_prob(value))
            state["prev"] = (addr, value, distribution.name)
            return value, plp

        def get_state():
            # snapshot for rejection_sample retry threading: dynamic
            # (traced) leaves separate from static structure so the
            # compiled tier can carry them through a lax.while_loop
            prev = state["prev"]
            if prev is None:
                return (state["lstm"], None), (None, None)
            addr, value, dist_name = prev
            return (state["lstm"], value), (addr, dist_name)

        def set_state(s):
            (lstm_state, value), (addr, dist_name) = s
            state["lstm"] = lstm_state
            state["prev"] = None if addr is None else (addr, value, dist_name)

        def compute_embedding(observed):
            obs = {
                name: jnp.reshape(
                    jnp.asarray(observed[name], util.dtype()), (1, -1)
                )
                for name in params["observe"].keys()
            }
            return embed(params, obs)

        def set_embedding(e):
            state["emb"] = e

        def set_local(v):
            # current stage's observe values (flattened [W] or None):
            # guided scan-SMC aligns them per stage; other callers leave
            # the slot zero
            state["local"] = v

        proposal_step.reset = reset
        proposal_step.compute_embedding = compute_embedding
        proposal_step.set_embedding = set_embedding
        proposal_step.set_local = set_local
        proposal_step.local_observe_dim = W_loc
        proposal_step.get_state = get_state
        proposal_step.set_state = set_state
        proposal_step.supports_defensive = True
        proposal_step.supports_mask = True
        return proposal_step
