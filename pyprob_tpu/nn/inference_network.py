"""Inference network base: observe embeddings, training loop, checkpointing.

Counterpart of the reference base network and its ``optimize`` loop
(reference: pyprob/nn/inference_network.py:25-599), redesigned TPU-first:

* Parameters are plain dict pytrees (see ``pyprob_tpu.nn.layers``); the
  per-address "polymorphism" grows the dict, and ``jax.jit`` retraces the
  per-trace-type loss automatically because the pytree structure is part
  of the compilation signature.
* Each rectangular sub-batch (same controlled-address sequence) is packed
  once on the host into stacked arrays and consumed by a single jitted
  value-and-grad computation; the optimizer step is a second jitted
  function over the whole parameter tree (optax).
* Data-parallel training shards the packed sub-batch rows over a 1-D
  ``jax.sharding.Mesh`` with ``shard_map`` + ``psum`` — the TPU-native
  replacement for the reference's torch.distributed broadcast/allreduce
  (reference: inference_network.py:290-341), including the sqrt(world)
  learning-rate scaling (reference: inference_network.py:448).
* Checkpoints are tar.gz files holding pickled numpy parameter trees plus
  optimizer/scheduler state and counters, with the same save/load/continue
  semantics as the reference tar.gz format
  (reference: inference_network.py:162-263).
"""

from __future__ import annotations

import math
import os
import pickle
import shutil
import tarfile
import tempfile
import time
import uuid
import warnings
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import optax

from .. import util, __version__
from ..util import Optimizer, LearningRateScheduler, ObserveEmbedding
from .dataset import (
    Batch,
    PackedBatch,
    OfflineDataset,
    TraceBatchSampler,
    DistributedTraceBatchSampler,
)
from .layers import (
    Static,
    mlp_init,
    mlp_apply,
    cnn2d5c_init,
    cnn2d5c_apply,
    cnn3d5c_init,
    cnn3d5c_apply,
    num_params,
)
from .optimizer_larc import larc_scale


def _next_pow2(n):
    p = 1
    while p < n:
        p *= 2
    return p

_CHECKPOINT_MEMBER = "pyprob_tpu_inference_network"


class InferenceNetwork:
    def __init__(self, model, observe_embeddings={}, network_type="",
                 tie_address_instances=False):
        self._model = model
        self._network_type = network_type
        self._observe_embeddings_spec = observe_embeddings
        self._observe_meta = {}  # name -> dict(embedding kind, shapes, depth)
        self._params = {"observe": {}, "observe_final": None}
        self._observe_embedding_dim = None
        self._layers_initialized = False
        self._layers_pre_generated = False
        self._head_train_iterations = {}  # address -> int
        # tie_address_instances: key proposal heads (and per-address
        # embeddings) on the address BASE instead of the full
        # instance-numbered address, so every occurrence of a repeated
        # site (x__1..x__T in a MarkovModel's unrolled forward) shares
        # ONE set of weights — amortization across time.  Required for
        # guided scan-SMC, whose lax.scan program sees one static
        # address per step site.
        self._tie_address_instances = bool(tie_address_instances)
        # per-trace inference state is thread-local so concurrent workers
        # (RemoteModelPool) can run guided traces independently
        import threading as _threading

        self._infer_tls = _threading.local()

        self._optimizer_type = None
        self._opt_state = None
        self._momentum = None
        self._weight_decay = None
        self._learning_rate_scheduler_type = None
        self._learning_rate_init = None
        self._learning_rate_end = None
        # Polyak/EMA parameter averaging (optimize(ema_decay=...)): the
        # averaged pytree is what the serving paths read when present.
        # Late constant-lr training at large widths orbits the optimum
        # (ESS of the last iterate swings 0.38-0.99 run to run at
        # lstm512 — BASELINE.md r4); iterate averaging is the standard
        # fix (Polyak-Ruppert) and costs one fused tree_map per step.
        self._ema_params = None
        self._ema_decay = None
        # number of EMA updates folded into _ema_params: the served
        # average is the DEBIASED ema/(1-d^t) (Adam-style) — without it
        # the init point keeps weight d^t (8% after 125 steps at d=0.98,
        # measured ESS 0.07 vs 0.9+ on chip: averaging-in the random
        # init wrecks the nonlinear net)
        self._ema_steps = 0
        # validation-based checkpoint selection (optimize(keep_best=...))
        self._keep_best_snapshot = None
        self._keep_best_metric = None
        self._keep_best_history = []

        self._total_train_seconds = 0.0
        self._total_train_traces = 0
        self._total_train_traces_end = None
        self._total_train_iterations = 0
        self._loss_init = None
        self._loss_min = float("inf")
        self._loss_max = None
        self._loss_previous = float("inf")
        self._history_train_loss = []
        self._history_train_loss_trace = []
        self._history_valid_loss = []
        self._history_valid_loss_trace = []
        self._history_num_params = []
        self._history_num_params_trace = []
        self._distributed_world_size = None
        self._modified = util.get_time_stamp()
        self._updates = 0

        # jit caches (not checkpointed)
        self._loss_grad_cache = {}
        self._loss_cache = {}
        self._update_fn = None
        self._base_optimizer = None
        self._dp_mesh = None  # jax Mesh for data-parallel training

    # -- pickling (ParallelModel ships the trained network to spawned
    # -- worker processes): drop thread-locals / jit caches / mesh
    # -- handles, recreate them empty on load
    _UNPICKLABLE = (
        "_infer_tls",
        "_loss_grad_cache",
        "_loss_cache",
        "_update_fn",
        "_base_optimizer",
        "_dp_mesh",
        "_infer_step_jit",
        "_lockstep_jit_cache",
        "_lockstep_local_jit",
        "_infer_emb_cache",
        "_fused_step_cache",
        "_update_fn_raw",
        # gather-loss registry holds jax treedefs (unpicklable); rebuilt
        # lazily from params on first use
        "_gather_reg",
        "_ema_update_fn",
        "_ema_debias_fn",
        "_ema_serving_cache",
        # the keep-best snapshot aliases _params/_ema_params trees; it is
        # transient per-optimize state, not worth shipping to workers
        "_keep_best_snapshot",
        # the back-reference to the owning model (training-time dataset
        # plumbing) would recurse; the unpickling side re-links it
        "_model",
    )

    def __getstate__(self):
        state = {
            k: v
            for k, v in self.__dict__.items()
            if k not in self._UNPICKLABLE
        }
        import jax

        # device arrays -> host numpy so the pickle is backend-agnostic
        # (unpickling a jax.Array in a spawned child would initialize
        # whatever backend that process resolves — possibly a remote TPU)
        to_np = lambda x: np.asarray(x) if hasattr(x, "shape") else x
        for k in ("_params", "_opt_state", "_ema_params"):
            if state.get(k) is not None:
                state[k] = jax.tree_util.tree_map(to_np, state[k])
        return state

    def __setstate__(self, state):
        import threading as _threading

        self.__dict__.update(state)
        self._infer_tls = _threading.local()
        self._loss_grad_cache = {}
        self._loss_cache = {}
        self._update_fn = None
        self._update_fn_raw = None
        self._base_optimizer = None
        self._dp_mesh = None
        self._model = None  # re-linked by the unpickling owner if needed
        self._ema_update_fn = None
        self._ema_debias_fn = None
        self._ema_serving_cache = None
        self._keep_best_snapshot = None
        # pre-r5 pickles lack the EMA/keep-best fields
        self.__dict__.setdefault("_ema_params", None)
        self.__dict__.setdefault("_ema_decay", None)
        self.__dict__.setdefault("_ema_steps", 0)
        self.__dict__.setdefault("_keep_best_metric", None)
        self.__dict__.setdefault("_keep_best_history", [])

    # ------------------------------------------------------------------
    # observe embeddings (reference: inference_network.py:80-148)
    # ------------------------------------------------------------------
    def _init_layers_observe_embedding(self, observe_embeddings, example_trace):
        if len(observe_embeddings) == 0:
            raise ValueError(
                "At least one observe embedding is needed to initialize the "
                "inference network."
            )
        if isinstance(observe_embeddings, (set, list, tuple)):
            observe_embeddings = {o: {} for o in observe_embeddings}
        total_dim = 0
        for name, spec in observe_embeddings.items():
            if name not in example_trace.named_variables:
                raise ValueError(
                    f"No observed variable named {name!r} in the example "
                    "trace"
                )
            value = example_trace.named_value(name)
            if "reshape" in spec:
                input_shape = tuple(spec["reshape"])
            else:
                input_shape = tuple(np.shape(value))
                if input_shape == ():
                    input_shape = (1,)
            output_dim = int(spec.get("dim", 256))
            embedding = spec.get("embedding", ObserveEmbedding.FEEDFORWARD)
            depth = int(spec.get("depth", 2))
            # Input squash (beyond parity): heavy-tailed observations (e.g.
            # likelihoods whose scale is itself a latent) reach magnitudes
            # that blow up MLP training — the reference feeds raw values and
            # diverges on such models.  arcsinh is identity near 0 and
            # logarithmic in the tails.  Opt-in ({"input_transform":
            # "arcsinh"}): squashing bounded observations slightly blunts
            # the embedding, so the raw reference behavior stays default.
            transform = spec.get("input_transform", "none")
            if transform not in ("arcsinh", "none"):
                raise ValueError(
                    f"Unknown observe input_transform: {transform!r} "
                    "(expected 'arcsinh' or 'none')"
                )
            key = util.next_key()
            if embedding == ObserveEmbedding.FEEDFORWARD:
                layer = {
                    "kind": Static("feedforward"),
                    "p": mlp_init(key, input_shape, (output_dim,), num_layers=depth),
                }
            elif embedding == ObserveEmbedding.CNN2D5C:
                layer = {
                    "kind": Static("cnn2d5c"),
                    "p": cnn2d5c_init(key, input_shape, (output_dim,)),
                }
            elif embedding == ObserveEmbedding.CNN3D5C:
                layer = {
                    "kind": Static("cnn3d5c"),
                    "p": cnn3d5c_init(key, input_shape, (output_dim,)),
                }
            else:
                raise ValueError(f"Unknown embedding: {embedding}")
            layer["tf"] = Static(transform)
            self._params["observe"][name] = layer
            self._observe_meta[name] = {
                "embedding": embedding,
                "input_shape": input_shape,
                "output_dim": output_dim,
                "depth": depth,
                "input_transform": transform,
            }
            total_dim += output_dim
        self._observe_embedding_dim = total_dim
        util.log_print(f"Observe embedding dimension: {total_dim}")
        self._params["observe_final"] = mlp_init(
            util.next_key(), (total_dim,), (total_dim,), num_layers=2
        )

    @staticmethod
    def _embed_observe_pure(params, obs):
        """obs: {name: [B, ...]} -> [B, O].  Pure; jit-safe."""
        pieces = []
        for name in sorted(params["observe"].keys()):
            layer = params["observe"][name]
            x = obs[name]
            # missing "tf" = checkpoint from before input squashing existed
            tf = layer.get("tf")
            if tf is not None and tf.value == "arcsinh":
                x = jnp.arcsinh(x)
            kind = layer["kind"].value
            if kind == "feedforward":
                pieces.append(mlp_apply(layer["p"], x))
            elif kind == "cnn2d5c":
                pieces.append(cnn2d5c_apply(layer["p"], x))
            else:
                pieces.append(cnn3d5c_apply(layer["p"], x))
        emb = jnp.concatenate(pieces, axis=1)
        return mlp_apply(params["observe_final"], emb)

    def _embed_observe(self, traces):
        obs = self._pack_observes(traces)
        return self._embed_observe_pure(self._params, obs)

    def _pack_observes(self, traces):
        obs = {}
        for name in self._params["observe"].keys():
            # named_value stacks repeated-name observes (per-step sites of
            # a MarkovModel) so training sees the SAME [T]-sequence the
            # user passes at inference time
            obs[name] = jnp.asarray(
                np.stack(
                    [
                        np.asarray(
                            t.named_value(name), dtype=util.dtype()
                        ).reshape(-1)
                        for t in traces
                    ]
                )
            )
        return obs

    @property
    def _infer_observe(self):
        return getattr(self._infer_tls, "observe", None)

    @_infer_observe.setter
    def _infer_observe(self, v):
        self._infer_tls.observe = v

    @property
    def _infer_observe_embedding(self):
        return getattr(self._infer_tls, "observe_embedding", None)

    @_infer_observe_embedding.setter
    def _infer_observe_embedding(self, v):
        self._infer_tls.observe_embedding = v

    def _infer_init(self, observe=None):
        self._infer_observe = observe
        # one posterior run calls _infer_init once per TRACE with the same
        # observe dict: reuse the embedding (holding a reference keeps the
        # id() key valid) instead of re-running the embedding net per trace
        cached = getattr(self, "_infer_emb_cache", None)
        key = (id(observe), self._total_train_iterations)
        if (
            cached is not None
            and cached[0] == key
            and cached[1] is observe
        ):
            self._infer_observe_embedding = cached[2]
        else:
            sp = self._serving_params()
            obs = {
                name: jnp.asarray(
                    np.asarray(observe[name], dtype=util.dtype()).reshape(
                        1, -1
                    )
                )
                for name in sp["observe"].keys()
            }
            emb = self._embed_observe_pure(sp, obs)
            self._infer_emb_cache = (key, observe, emb)
            self._infer_observe_embedding = emb
        self._infer_begin_trace()

    def _infer_begin_trace(self):
        """Hook: reset per-trace inference state (LSTM hidden, etc.)."""

    # ------------------------------------------------------------------
    # subclass hooks
    # ------------------------------------------------------------------
    def _init_layers(self):
        raise NotImplementedError()

    def _polymorph(self, batch):
        raise NotImplementedError()

    def _infer_step(self, variable, prev_variable=None, proposal_min_train_iterations=None):
        raise NotImplementedError()

    def _pack_sub_batch(self, sub_batch):
        raise NotImplementedError()

    def _make_sub_batch_loss(self, sub_batch):
        """Return (static_key, loss_fn(params, packed) -> scalar)."""
        raise NotImplementedError()

    def make_vectorized_proposal_step(self, observe):
        """Return a proposal_step(site, dist, key) callable usable inside the
        compiled tier's traced forward, or None if unsupported."""
        return None

    def to(self, device=None, *args, **kwargs):
        """Migration no-op (reference InferenceNetwork inherits torch's
        ``Module.to(device)``; JAX parameter placement is sharding-managed).
        Returns ``self`` unchanged."""
        return self

    def snapshot_params(self):
        """Snapshot of the current parameter state — pair with
        ``restore_params`` for validation-based checkpoint selection
        during training.  Leaves are copied to host numpy: the fused
        training step donates its parameter buffers to XLA, so a
        reference-only snapshot could be invalidated by the next
        training dispatch on backends that honor donation.  Includes
        the Polyak/EMA average when averaging is active."""
        to_np = lambda tree: jax.tree_util.tree_map(
            lambda x: np.asarray(x) if hasattr(x, "shape") else x, tree
        )
        return {
            "__snapshot__": True,
            "params": to_np(self._params),
            "ema_params": to_np(self._ema_params),
            "ema_steps": self._ema_steps,
        }

    def restore_params(self, snapshot):
        """Restore a parameter snapshot taken with ``snapshot_params``
        (e.g. the best-validation checkpoint).  Invalidates the memoized
        serving closure: ``cached_vectorized_proposal_step`` bakes the
        parameters at closure creation and keys only on the train
        iteration count, which does not change on a restore."""
        to_dev = lambda tree: jax.tree_util.tree_map(
            lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x,
            tree,
        )
        if isinstance(snapshot, dict) and snapshot.get("__snapshot__"):
            self._params = to_dev(snapshot["params"])
            self._ema_params = to_dev(snapshot["ema_params"])
            self._ema_steps = snapshot.get("ema_steps", 0)
        else:  # bare params pytree (pre-r5 snapshot layout)
            self._params = to_dev(snapshot)
        self._vps_cache = None
        self._ema_serving_cache = None
        # the interpreter-tier embedding cache keys on the train-iteration
        # count too, which a restore does not change
        self._infer_emb_cache = None

    def _serving_params(self):
        """Parameters the proposal-serving/evaluation paths read: the
        DEBIASED Polyak/EMA average ``ema/(1-d^t)`` when averaging is
        enabled (``optimize(ema_decay=...)``), else the raw training
        parameters.  Averaged serving is the root fix for late
        constant-lr oscillation at large widths (BASELINE.md r5)."""
        if self._ema_params is None or self._ema_steps == 0:
            return self._params
        key = (self._ema_steps, self._ema_decay)
        cache = getattr(self, "_ema_serving_cache", None)
        if cache is not None and cache[0] == key:
            return cache[1]
        fn = getattr(self, "_ema_debias_fn", None)
        if fn is None:
            fn = self._ema_debias_fn = jax.jit(
                lambda t, s: jax.tree_util.tree_map(lambda x: x * s, t)
            )
        scale = jnp.asarray(
            1.0 / (1.0 - float(self._ema_decay) ** self._ema_steps),
            util.dtype(),
        )
        served = fn(self._ema_params, scale)
        self._ema_serving_cache = (key, served)
        return served

    # ------------------------------------------------------------------
    # Polyak/EMA parameter averaging
    # ------------------------------------------------------------------
    def _ema_sync_structure(self):
        """Initialize the EMA pytree, or graft newly-polymorphed leaves
        into it (new addresses adopt the raw value; existing leaves keep
        their running average)."""
        if self._ema_decay is None:
            return
        # _ema_params is the RAW (biased) accumulator: e_t = d*e + (1-d)p
        # from e_0 = 0; serving debiases by 1/(1-d^t).  Leaves grafted at
        # step t adopt p*(1-d^t) so their debiased value starts at p.
        # All adopted leaves are materialized fresh buffers, never
        # aliases of _params: the fused step donates the params and ema
        # buffers separately ("donate the same buffer twice" otherwise).
        bias = 1.0 - float(self._ema_decay) ** max(self._ema_steps, 0)
        adopt = lambda t: jax.tree_util.tree_map(
            lambda x: x * bias if hasattr(x, "shape") else x, t
        )
        if self._ema_params is None:
            self._ema_params = jax.tree_util.tree_map(
                lambda x: jnp.zeros_like(x) if hasattr(x, "shape") else x,
                self._params,
            )
            return

        def merge(e, p):
            if isinstance(p, dict):
                if not isinstance(e, dict):
                    return adopt(p)
                return {
                    k: merge(e[k], v) if k in e else adopt(v)
                    for k, v in p.items()
                }
            if isinstance(p, (tuple, list)):
                if not isinstance(e, type(p)) or len(e) != len(p):
                    return adopt(p)
                out = [merge(a, b) for a, b in zip(e, p)]
                return tuple(out) if isinstance(p, tuple) else out
            if e is None or p is None:
                return adopt(p)
            if getattr(e, "shape", None) != getattr(p, "shape", None):
                return adopt(p)
            return e

        self._ema_params = merge(self._ema_params, self._params)

    def _ema_update_host(self):
        """One EMA step on the per-dispatch training paths (the fused
        online loop folds the average into its scanned step instead)."""
        if self._ema_decay is None:
            return
        if self._ema_params is None or jax.tree_util.tree_structure(
            self._ema_params
        ) != jax.tree_util.tree_structure(self._params):
            self._ema_sync_structure()
        fn = getattr(self, "_ema_update_fn", None)
        if fn is None or getattr(self, "_ema_update_fn_decay", None) != (
            self._ema_decay
        ):
            d = float(self._ema_decay)
            fn = jax.jit(
                lambda e, p: jax.tree_util.tree_map(
                    lambda a, b: d * a + (1.0 - d) * b, e, p
                )
            )
            self._ema_update_fn = fn
            self._ema_update_fn_decay = self._ema_decay
        self._ema_params = fn(self._ema_params, self._params)
        self._ema_steps += 1

    # ------------------------------------------------------------------
    # validation-based checkpoint selection (keep_best)
    # ------------------------------------------------------------------
    def _keep_best_probe(self, eval_fn):
        """Evaluate the metric (higher is better) on the CURRENT serving
        state, record it, and snapshot if it is the best seen this
        optimize() call."""
        m = float(eval_fn(self))
        self._keep_best_history.append((self._total_train_traces, m))
        if self._keep_best_metric is None or m > self._keep_best_metric:
            self._keep_best_metric = m
            self._keep_best_snapshot = self.snapshot_params()
        return m

    def cached_vectorized_proposal_step(self, observe=None):
        """Memoize the proposal-step closure so repeated posterior calls
        with an unchanged network reuse the compiled program (the closure's
        identity keys the jitted-run cache).  Observed values are traced
        arguments of that program, so the cache is observation-agnostic —
        only retraining invalidates it."""
        key = self._total_train_iterations
        cached = getattr(self, "_vps_cache", None)
        if cached is not None and cached[0] == key:
            return cached[1]
        ps = self.make_vectorized_proposal_step(observe)
        self._vps_cache = (key, ps)
        return ps

    # ------------------------------------------------------------------
    # loss plumbing
    # ------------------------------------------------------------------
    @staticmethod
    def _sub_batch_step_mask(sub_batch, time_step):
        """[B] 1/0 activity vector for one controlled step, or None when no
        trace masked the site (sample(mask=) padding sites are excluded
        from the training loss — their values are prior draws carrying no
        posterior signal)."""
        flags = [
            getattr(tr.variables_controlled[time_step], "masked", False)
            for tr in sub_batch
        ]
        if not any(flags):
            return None
        return jnp.asarray(
            [0.0 if f else 1.0 for f in flags], util.dtype()
        )

    def _sub_batch_prior_params(self, sub_batch, time_step):
        from .proposals import prior_param_arrays

        out = {}
        for t_i, trace in enumerate(sub_batch):
            v = trace.variables_controlled[time_step]
            pp = prior_param_arrays(v.distribution)
            for k, val in pp.items():
                # flattened per-row: scalars become [B, 1], event-shaped
                # params [B, K]; heads reshape to their own layout
                out.setdefault(k, []).append(
                    np.asarray(val, dtype=util.dtype()).reshape(-1)
                )
        return {k: jnp.asarray(np.stack(v)) for k, v in out.items()}

    @staticmethod
    def _pad_packed(packed, target):
        """Pad every [B, ...] leaf of a packed sub-batch up to ``target``
        rows (edge replication) and attach a 1/0 row mask, so the rows
        shard evenly over the mesh."""
        sample = packed["obs"]
        B = next(iter(sample.values())).shape[0] if sample else None
        if B is None:
            for step in packed["steps"]:
                B = step["values"].shape[0]
                break
        pad = target - B
        if pad > 0:
            packed = jax.tree_util.tree_map(
                lambda x: jnp.concatenate(
                    [x, jnp.repeat(x[-1:], pad, axis=0)], axis=0
                ),
                packed,
            )
        packed = dict(packed)
        packed["mask"] = jnp.concatenate(
            [
                jnp.ones((B,), util.dtype()),
                jnp.zeros((max(pad, 0),), util.dtype()),
            ]
        )
        return packed

    def _distributed_sync_parameters(self):
        """Broadcast process-0 parameters (and optimizer state) to all
        ranks — the reference's rank-0 broadcast
        (reference: inference_network.py:290-294).  No-op off-mesh or
        single-process."""
        if self._dp_num_processes() <= 1:
            return
        from jax.experimental import multihost_utils

        self._params = multihost_utils.broadcast_one_to_all(self._params)
        if self._opt_state is not None:
            self._opt_state = multihost_utils.broadcast_one_to_all(
                self._opt_state
            )

    def _dp_num_processes(self):
        if self._dp_mesh is None:
            return 1
        return len({d.process_index for d in self._dp_mesh.devices.flat})

    def _globalize_packed(self, packed):
        """Multi-process meshes: each process contributes its local batch
        rows to one global sharded array (every rank generates independent
        traces, so the global batch is their concatenation)."""
        nprocs = self._dp_num_processes()
        if nprocs <= 1:
            return packed
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(self._dp_mesh, P("dp"))
        local_devices = [
            d
            for d in self._dp_mesh.devices.flat
            if d.process_index == jax.process_index()
        ]

        def conv(x):
            if isinstance(x, jax.Array):
                # device-resident local rows (PackedBatch fast path):
                # split across this process's mesh devices and stitch the
                # global array from the shards directly — device-to-device
                # only, no host round-trip
                n_local = len(local_devices)
                rows = x.shape[0]
                if rows % n_local == 0:
                    per = rows // n_local
                    shards = [
                        jax.device_put(x[i * per : (i + 1) * per], d)
                        for i, d in enumerate(local_devices)
                    ]
                    global_shape = (rows * nprocs,) + tuple(x.shape[1:])
                    return jax.make_array_from_single_device_arrays(
                        global_shape, sharding, shards
                    )
            # host rows (interpreter-tier batches): one gather per step
            x = np.asarray(x)
            global_shape = (x.shape[0] * nprocs,) + x.shape[1:]
            return jax.make_array_from_process_local_data(
                sharding, x, global_shape
            )

        return jax.tree_util.tree_map(conv, packed)

    def _make_dp_loss_grad(self, loss_fn):
        """Data-parallel loss+grad: rows shard over the 'dp' mesh axis,
        loss and grads psum back — the TPU-native replacement for the
        reference's grad allreduce (reference: inference_network.py:296-325)."""
        from jax.sharding import PartitionSpec as P

        mesh = self._dp_mesh

        def fn(params, packed):
            loss, grads = jax.value_and_grad(loss_fn)(params, packed)
            loss = jax.lax.psum(loss, "dp")
            grads = jax.lax.psum(grads, "dp")
            return loss, grads

        return jax.jit(
            jax.shard_map(
                fn,
                mesh=mesh,
                in_specs=(P(), P("dp")),
                out_specs=(P(), P()),
                check_vma=False,
            )
        )

    def _pack_arrays_from_outputs(self, outputs, sites, batch_size):
        """Pure packing: compiled-tier outputs -> packed dict.  Safe to call
        with traced values (used inside the fused training step)."""
        from .proposals import prior_param_arrays

        controlled = [s for s in sites if s.control]
        name_addresses = {}
        for s in sites:
            if s.name is not None:
                name_addresses.setdefault(s.name, []).append(s.address)
        obs = {}
        for name in self._params["observe"].keys():
            addrs_n = name_addresses[name]
            if len(addrs_n) == 1:
                arr = jnp.asarray(outputs["values"][addrs_n[0]])
            else:
                # repeated-name observes (MarkovModel per-step sites):
                # stack the sequence, matching Trace.named_value
                arr = jnp.stack(
                    [jnp.asarray(outputs["values"][a]) for a in addrs_n],
                    axis=1,
                )
            obs[name] = jnp.reshape(arr, (batch_size, -1))
        # per-step local-observation slot (tied Markov training): the
        # values of NAMED observe sites between each controlled site and
        # the next, sorted by name (mirrors
        # InferenceNetworkLSTM._trailing_observe_positions)
        W_loc = getattr(self, "_local_observe_dim", 0)
        gaps = []
        if W_loc:
            for s in sites:
                if s.control and not s.observed:
                    gaps.append([])
                elif s.observed and s.name is not None and gaps:
                    gaps[-1].append(s)
            gaps = [
                sorted(g, key=lambda s: s.name) for g in gaps
            ]
        steps = []
        for t, s in enumerate(controlled):
            values = jnp.asarray(outputs["values"][s.address])
            leaves = outputs["dist_leaves"][s.address]
            dist = jax.tree_util.tree_unflatten(
                s.dist_treedef, [jnp.asarray(l) for l in leaves]
            )
            def _pack_prior(v):
                # per-particle params carry a leading batch dim (vmapped
                # dist leaves); constants broadcast.  Rows are flattened
                # [B, K] — heads reshape to their own layout (scalar K=1,
                # event-shaped K=D or D*D)
                arr = jnp.asarray(v, util.dtype())
                if arr.ndim > 0 and arr.shape[0] == batch_size:
                    return arr.reshape(batch_size, -1)
                return jnp.broadcast_to(
                    arr.reshape(1, -1), (batch_size, max(arr.size, 1))
                )

            prior = {
                k: _pack_prior(v)
                for k, v in prior_param_arrays(dist).items()
            }
            step = {"values": values, "prior": prior}
            if W_loc:
                gap = gaps[t] if t < len(gaps) else []
                if gap:
                    lo = jnp.concatenate(
                        [
                            jnp.reshape(
                                jnp.asarray(
                                    outputs["values"][g.address],
                                    util.dtype(),
                                ),
                                (batch_size, -1),
                            )
                            for g in gap
                        ],
                        axis=1,
                    )
                    if lo.shape[1] > W_loc:
                        lo = lo[:, :W_loc]
                    elif lo.shape[1] < W_loc:
                        lo = jnp.concatenate(
                            [
                                lo,
                                jnp.zeros(
                                    (batch_size, W_loc - lo.shape[1]),
                                    util.dtype(),
                                ),
                            ],
                            axis=1,
                        )
                else:
                    lo = jnp.zeros((batch_size, W_loc), util.dtype())
                step["local_obs"] = lo
            mk = outputs.get("masks", {}).get(s.address)
            if mk is not None:  # sample(mask=) 1/0 activity per trace
                step["mask"] = jnp.asarray(mk, util.dtype())
            steps.append(step)
        packed = {"obs": obs, "steps": steps}
        addrs = tuple(s.address for s in controlled)
        dist_names = tuple(s.distribution_name for s in controlled)
        return packed, addrs, dist_names

    def _packed_batch_from_outputs(self, outputs, sites, batch_size):
        packed, addrs, dist_names = self._pack_arrays_from_outputs(
            outputs, sites, batch_size
        )
        return PackedBatch(packed, batch_size, addrs, dist_names, len(addrs))

    def _build_fused_online_step(self, model, batch_size, prior_inflation, sites):
        """The training hot loop as ONE jitted dispatch: generate a batch of
        traces (model forward under vmap), pack, loss, grads, optimizer
        update — no host round-trips in between.  This is what makes IC
        training fast over a high-latency device link and maps the whole
        step onto the chip."""
        from ..util import TraceMode, InferenceEngine
        from ..vectorized import run_traced

        controlled = [s for s in sites if s.control]
        addrs = tuple(s.address for s in controlled)
        dist_names = tuple(s.distribution_name for s in controlled)
        self._fused_step_addrs = addrs  # bumped per fused step by the loop
        _, loss_fn = self._make_loss_for(addrs, dist_names)
        update_raw = self._update_fn_raw
        pack = self._pack_arrays_from_outputs

        def single(key):
            outputs, _ = run_traced(
                model,
                key,
                {},
                TraceMode.PRIOR_FOR_INFERENCE_NETWORK,
                InferenceEngine.IMPORTANCE_SAMPLING,
                prior_inflation,
                1.0,
            )
            return outputs

        ema_decay = self._ema_decay

        def one_step(carry, inp):
            params, ema, opt_state = carry
            keys, lr = inp
            outputs = jax.vmap(single)(keys)
            packed, _, _ = pack(outputs, sites, batch_size)
            loss, grads = jax.value_and_grad(loss_fn)(params, packed)
            loss = loss / batch_size
            grads = jax.tree_util.tree_map(lambda g: g / batch_size, grads)
            params, opt_state = update_raw(params, grads, opt_state, lr)
            if ema_decay is not None:
                # Polyak/EMA average rides the scan carry: one fused
                # tree_map per step, no extra dispatches
                ema = jax.tree_util.tree_map(
                    lambda a, b: ema_decay * a + (1.0 - ema_decay) * b,
                    ema,
                    params,
                )
            return (params, ema, opt_state), loss

        def multi_step(params, ema, opt_state, keys, lrs):
            # keys: [K, B, ...], lrs: [K] — K optimizer steps in ONE
            # dispatch via lax.scan (bounds host round-trips on
            # high-latency device links)
            (params, ema, opt_state), losses = jax.lax.scan(
                one_step, (params, ema, opt_state), (keys, lrs)
            )
            return params, ema, opt_state, losses

        return jax.jit(multi_step, donate_argnums=(0, 1, 2))

    def _bump_head_iterations(self, addrs):
        """Per-address training-iteration counters, bumped only on actual
        optimizer steps (not loss construction or validation), so
        proposal_min_train_iterations gating reflects real training."""
        for addr in addrs:
            key = self._head_key(addr)
            self._head_train_iterations[key] = (
                self._head_train_iterations.get(key, 0) + 1
            )

    def _loss_params_subset(self, addrs, dist_names):
        """The sub-pytree of ``self._params`` a trace type's loss reads.
        Loss programs are jitted against THIS structure, so polymorphing
        a new address elsewhere does not change their input treedef and
        every previously compiled bucket stays compiled.  (Passing the
        full params instead retraced and recompiled every cached loss on
        every polymorph — measured ~77 recompiles over one Marsaglia FF
        training run.)  Default: the full params (fixed-structure
        models never polymorph mid-run)."""
        return self._params

    def _expand_grads(self, sub_grads, addrs, dist_names):
        """Embed gradients w.r.t. a params subset back into the
        full-params structure (zeros elsewhere)."""
        if sub_grads is None:
            return None

        def zeros(v):
            # host numpy zeros: a dispatched jnp.zeros_like per missing
            # leaf costs ~0.3 ms each on the CPU backend; the jitted
            # update transfers either kind identically
            return jax.tree_util.tree_map(
                lambda x: np.zeros(np.shape(x), x.dtype), v
            )

        def expand(full, sub):
            if isinstance(full, dict):
                return {
                    k: (
                        expand(v, sub[k])
                        if isinstance(sub, dict) and k in sub
                        else zeros(v)
                    )
                    for k, v in full.items()
                }
            return sub

        return expand(self._params, sub_grads)

    def _loss_and_grad(self, batch):
        """Full-batch loss + grads: one jitted computation per sub-batch
        (cached by trace type), grads accumulated over sub-batches."""
        if isinstance(batch, PackedBatch):
            key, loss_fn = self._make_loss_for(batch.addrs, batch.dist_names)
            packed = batch.packed
            subset = self._loss_params_subset(batch.addrs, batch.dist_names)
            if self._dp_mesh is not None:
                ndev = self._dp_mesh.size
                nprocs = self._dp_num_processes()
                target = ((batch.size + ndev - 1) // ndev) * ndev
                packed = self._pad_packed(packed, target)
                packed = self._globalize_packed(packed)
                dp_key = ("dp",) + key
                if dp_key not in self._loss_grad_cache:
                    self._loss_grad_cache[dp_key] = self._make_dp_loss_grad(
                        loss_fn
                    )
                loss, grads = self._loss_grad_cache[dp_key](
                    subset, packed
                )
                norm = batch.size * nprocs  # psum spans all ranks' rows
            else:
                if key not in self._loss_grad_cache:
                    util.relieve_compile_pressure()
                    self._loss_grad_cache[key] = jax.jit(
                        jax.value_and_grad(loss_fn)
                    )
                loss, grads = self._loss_grad_cache[key](subset, packed)
                norm = batch.size
            grads = self._expand_grads(grads, batch.addrs, batch.dist_names)
            loss_value = float(loss) / norm
            grads = jax.tree_util.tree_map(lambda g: g / norm, grads)
            success = not (
                math.isnan(loss_value) or math.isinf(loss_value)
            )
            if success:
                self._bump_head_iterations(batch.addrs)
            return success, loss_value, grads

        if self._dp_mesh is None:
            # variable-structure models: the gather-table loss serves
            # every trace type from ONE program per (pow2 length bucket,
            # table structure) — see nn/gather_loss.py; None = ineligible
            out = self._try_gather_loss_and_grad(batch)
            if out is not None:
                return out

        nprocs = self._dp_num_processes()
        if nprocs > 1 and len(batch.sub_batches) > 1:
            raise RuntimeError(
                "Multi-process data-parallel training requires a single "
                "trace type per batch (fixed-structure model): each rank "
                "must execute the same collective sequence. Use a "
                "fixed-structure model or single-process training."
            )
        total_loss = 0.0
        total_grads = None
        for sub_batch in batch.sub_batches:
            key, loss_fn = self._make_sub_batch_loss(sub_batch)
            packed = self._pack_sub_batch(sub_batch)
            # pad rows to a power of two (edge replication + 0-mask): a
            # trace type's sub-batch size varies every batch, and without
            # bounding the shape set each bucket's loss RECOMPILES nearly
            # every step (measured: 13 XLA compiles per 4-step Marsaglia
            # continuation, ~8 s each — the entire training cost)
            target = _next_pow2(len(sub_batch))
            if self._dp_mesh is not None:
                ndev = self._dp_mesh.size
                target = ((target + ndev - 1) // ndev) * ndev
            packed = self._pad_packed(packed, target)
            sb_addrs = tuple(
                v.address for v in sub_batch[0].variables_controlled
            )
            sb_dists = tuple(
                v.distribution.name
                for v in sub_batch[0].variables_controlled
            )
            subset = self._loss_params_subset(sb_addrs, sb_dists)
            if self._dp_mesh is not None:
                packed = self._globalize_packed(packed)
                dp_key = ("dp",) + key
                if dp_key not in self._loss_grad_cache:
                    self._loss_grad_cache[dp_key] = self._make_dp_loss_grad(
                        loss_fn
                    )
                loss, grads = self._loss_grad_cache[dp_key](
                    subset, packed
                )
            else:
                if key not in self._loss_grad_cache:
                    # variable-structure models mint one loss program per
                    # trace type: the canonical mmap-exhaustion risk
                    util.relieve_compile_pressure()
                    self._loss_grad_cache[key] = jax.jit(
                        jax.value_and_grad(loss_fn)
                    )
                loss, grads = self._loss_grad_cache[key](subset, packed)
            grads = self._expand_grads(grads, sb_addrs, sb_dists)
            total_loss = total_loss + loss
            if total_grads is None:
                total_grads = grads
            else:
                total_grads = jax.tree_util.tree_map(
                    lambda a, b: a + b, total_grads, grads
                )
        norm = batch.size * (nprocs if self._dp_mesh is not None else 1)
        loss_value = float(total_loss) / norm
        grads = jax.tree_util.tree_map(lambda g: g / norm, total_grads)
        success = not (math.isnan(loss_value) or math.isinf(loss_value))
        if success:
            for sub_batch in batch.sub_batches:
                self._bump_head_iterations(
                    tuple(v.address for v in sub_batch[0].variables_controlled)
                )
        return success, loss_value, grads

    def _try_gather_loss_and_grad(self, batch):
        """Subclass hook: gather-table loss+grad for mixed-trace-type
        batches (nn/gather_loss.py), or None to use the per-type path."""
        return None

    def _try_gather_loss(self, batch):
        """Subclass hook: gather-table validation loss, or None."""
        return None

    def _loss(self, batch):
        """Loss only (validation)."""
        if self._dp_mesh is None:
            out = self._try_gather_loss(batch)
            if out is not None:
                return out
        total_loss = 0.0
        for sub_batch in batch.sub_batches:
            key, loss_fn = self._make_sub_batch_loss(sub_batch)
            packed = self._pack_sub_batch(sub_batch)
            packed = self._pad_packed(packed, _next_pow2(len(sub_batch)))
            example = sub_batch[0]
            subset = self._loss_params_subset(
                tuple(v.address for v in example.variables_controlled),
                tuple(
                    v.distribution.name
                    for v in example.variables_controlled
                ),
            )
            if key not in self._loss_cache:
                util.relieve_compile_pressure()
                self._loss_cache[key] = jax.jit(loss_fn)
            total_loss = total_loss + float(
                self._loss_cache[key](subset, packed)
            )
        loss_value = total_loss / batch.size
        success = not (math.isnan(loss_value) or math.isinf(loss_value))
        return success, loss_value

    # ------------------------------------------------------------------
    # optimizer
    # ------------------------------------------------------------------
    def _create_optimizer(self, opt_state=None):
        if self._optimizer_type is None:
            return
        wd = self._weight_decay or 0.0
        use_larc = self._optimizer_type in (
            Optimizer.ADAM_LARC,
            Optimizer.SGD_LARC,
        )
        # With LARC the decay term is applied inside larc_scale (as in the
        # apex wrapper, which zeroes the inner optimizer's weight_decay —
        # reference: pyprob/nn/optimizer_larc.py); applying it in the base
        # chain as well would double the regularization.
        base_wd = 0.0 if use_larc else wd
        if self._optimizer_type in (Optimizer.ADAM, Optimizer.ADAM_LARC):
            # torch Adam semantics: L2 via grad += wd*p, then adam
            base = optax.chain(
                optax.add_decayed_weights(base_wd) if base_wd else optax.identity(),
                optax.scale_by_adam(),
            )
        else:
            base = optax.chain(
                optax.add_decayed_weights(base_wd) if base_wd else optax.identity(),
                optax.trace(decay=self._momentum or 0.9, nesterov=True),
            )
        self._base_optimizer = base

        def update(params, grads, state, lr):
            if use_larc:
                grads = larc_scale(
                    grads, params, lr, weight_decay=wd
                )
            updates, state = base.update(grads, state, params)
            updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
            params = optax.apply_updates(params, updates)
            return params, state

        self._update_fn_raw = update
        self._update_fn = jax.jit(update)
        # generation counter: fused gather updates (LSTM) key their
        # compiled scatter+update programs on it so optimizer recreation
        # (polymorph) invalidates them
        self._optimizer_gen = getattr(self, "_optimizer_gen", 0) + 1
        if opt_state is not None:
            self._opt_state = opt_state
        else:
            self._opt_state = base.init(self._params)

    def _current_learning_rate(self):
        """Poly LR decay by total train traces
        (reference: inference_network.py:357-379)."""
        lr_init = self._learning_rate_init
        lr_end = self._learning_rate_end
        t = self._learning_rate_scheduler_type
        if t in (None, LearningRateScheduler.NONE):
            return lr_init
        iter_end = self._total_train_traces_end or 1e9
        frac = min(self._total_train_traces / iter_end, 1.0)
        power = 1.0 if t == LearningRateScheduler.POLY1 else 2.0
        return (lr_init - lr_end) * ((1 - frac) ** power) + lr_end

    @property
    def learning_rate(self):
        return self._current_learning_rate()

    # ------------------------------------------------------------------
    # checkpointing (reference: inference_network.py:162-263)
    # ------------------------------------------------------------------
    def _state_dict(self):
        to_np = lambda tree: jax.tree_util.tree_map(
            lambda x: np.asarray(x)
            if isinstance(x, (jnp.ndarray, jax.Array))
            else x,
            tree,
        )
        return {
            "pyprob_tpu_version": __version__,
            "jax_version": jax.__version__,
            "network_type": self._network_type,
            "class_name": type(self).__name__,
            "params": to_np(self._params),
            "opt_state": to_np(self._opt_state),
            "ema_params": to_np(self._ema_params),
            "ema_decay": self._ema_decay,
            "ema_steps": self._ema_steps,
            "observe_meta": self._observe_meta,
            "observe_embedding_dim": self._observe_embedding_dim,
            "observe_embeddings_spec": self._observe_embeddings_spec,
            "layers_initialized": self._layers_initialized,
            "layers_pre_generated": self._layers_pre_generated,
            "head_train_iterations": self._head_train_iterations,
            "optimizer_type": self._optimizer_type,
            "momentum": self._momentum,
            "weight_decay": self._weight_decay,
            "learning_rate_scheduler_type": self._learning_rate_scheduler_type,
            "learning_rate_init": self._learning_rate_init,
            "learning_rate_end": self._learning_rate_end,
            "total_train_seconds": self._total_train_seconds,
            "total_train_traces": self._total_train_traces,
            "total_train_traces_end": self._total_train_traces_end,
            "total_train_iterations": self._total_train_iterations,
            "loss_init": self._loss_init,
            "loss_min": self._loss_min,
            "loss_max": self._loss_max,
            "loss_previous": self._loss_previous,
            "history_train_loss": self._history_train_loss,
            "history_train_loss_trace": self._history_train_loss_trace,
            "history_valid_loss": self._history_valid_loss,
            "history_valid_loss_trace": self._history_valid_loss_trace,
            "history_num_params": self._history_num_params,
            "history_num_params_trace": self._history_num_params_trace,
            "modified": self._modified,
            "updates": self._updates,
            "tie_address_instances": self._tie_address_instances,
            "subclass_state": self._subclass_state(),
        }

    def _head_key(self, address):
        """The key per-address layers are stored under: the full
        instance-numbered address normally; its base (instance stripped)
        under tie_address_instances."""
        if not self._tie_address_instances:
            return address
        base, _, inst = address.rpartition("__")
        return base if inst.isdigit() else address

    def _subclass_state(self):
        return {}

    def _load_subclass_state(self, state):
        pass

    def _save(self, file_name):
        self._modified = util.get_time_stamp()
        self._updates += 1
        data = self._state_dict()
        tmp_dir = tempfile.mkdtemp(suffix=str(uuid.uuid4()))
        tmp_file = os.path.join(tmp_dir, _CHECKPOINT_MEMBER)
        with open(tmp_file, "wb") as f:
            pickle.dump(data, f, protocol=pickle.HIGHEST_PROTOCOL)
        tar = tarfile.open(file_name, "w:gz", compresslevel=2)
        tar.add(tmp_file, arcname=_CHECKPOINT_MEMBER)
        tar.close()
        shutil.rmtree(tmp_dir)

    @staticmethod
    def _load(file_name):
        from .inference_network_feedforward import InferenceNetworkFeedForward
        from .inference_network_lstm import InferenceNetworkLSTM

        try:
            tar = tarfile.open(file_name, "r:gz")
            tmp_dir = tempfile.mkdtemp(suffix=str(uuid.uuid4()))
            tar.extract(_CHECKPOINT_MEMBER, tmp_dir, filter="data")
            tar.close()
            with open(os.path.join(tmp_dir, _CHECKPOINT_MEMBER), "rb") as f:
                data = pickle.load(f)
            shutil.rmtree(tmp_dir)
        except Exception as e:
            raise RuntimeError(f"Cannot load inference network: {e}")

        if data["pyprob_tpu_version"] != __version__:
            warnings.warn(
                f"Different pyprob_tpu versions (loaded network: "
                f"{data['pyprob_tpu_version']}, current: {__version__})"
            )
        cls = {
            "InferenceNetworkFeedForward": InferenceNetworkFeedForward,
            "InferenceNetworkLSTM": InferenceNetworkLSTM,
        }[data["class_name"]]
        net = cls.__new__(cls)
        InferenceNetwork.__init__(
            net,
            model=None,
            observe_embeddings=data["observe_embeddings_spec"],
            network_type=data["network_type"],
        )
        to_dev = lambda tree: jax.tree_util.tree_map(
            lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, tree
        )
        net._params = to_dev(data["params"])
        net._opt_state = to_dev(data["opt_state"])
        net._ema_params = to_dev(data.get("ema_params"))
        net._ema_decay = data.get("ema_decay")
        net._ema_steps = data.get("ema_steps", 0)
        net._observe_meta = data["observe_meta"]
        net._observe_embedding_dim = data["observe_embedding_dim"]
        net._layers_initialized = data["layers_initialized"]
        net._layers_pre_generated = data["layers_pre_generated"]
        net._head_train_iterations = data["head_train_iterations"]
        net._optimizer_type = data["optimizer_type"]
        net._momentum = data["momentum"]
        net._weight_decay = data["weight_decay"]
        net._learning_rate_scheduler_type = data["learning_rate_scheduler_type"]
        net._learning_rate_init = data["learning_rate_init"]
        net._learning_rate_end = data["learning_rate_end"]
        net._total_train_seconds = data["total_train_seconds"]
        net._total_train_traces = data["total_train_traces"]
        net._total_train_traces_end = data["total_train_traces_end"]
        net._total_train_iterations = data["total_train_iterations"]
        net._loss_init = data["loss_init"]
        net._loss_min = data["loss_min"]
        net._loss_max = data["loss_max"]
        net._loss_previous = data["loss_previous"]
        net._history_train_loss = data["history_train_loss"]
        net._history_train_loss_trace = data["history_train_loss_trace"]
        net._history_valid_loss = data["history_valid_loss"]
        net._history_valid_loss_trace = data["history_valid_loss_trace"]
        net._history_num_params = data["history_num_params"]
        net._history_num_params_trace = data["history_num_params_trace"]
        net._modified = data["modified"]
        net._updates = data["updates"]
        net._tie_address_instances = data.get("tie_address_instances", False)
        net._load_subclass_state(data["subclass_state"])
        if net._optimizer_type is not None:
            net._create_optimizer(net._opt_state)
        return net

    # ------------------------------------------------------------------
    # pre-generation (reference: inference_network.py:270-288)
    # ------------------------------------------------------------------
    def _maybe_init_local_observe(self, example_trace):
        """Subclass hook (InferenceNetworkLSTM): size the per-step local
        observation slot for tied-instance training."""

    def _pre_generate_layers(self, dataset, batch_size=64, save_file_name_prefix=None):
        if not self._layers_initialized:
            self._init_layers_observe_embedding(
                self._observe_embeddings_spec, example_trace=dataset[0]
            )
            self._maybe_init_local_observe(dataset[0])
            self._init_layers()
            self._layers_initialized = True
        self._layers_pre_generated = True
        n = len(dataset)
        for begin in range(0, n, batch_size):
            traces = [dataset[i] for i in range(begin, min(begin + batch_size, n))]
            changed = self._polymorph(Batch(traces))
            if changed and save_file_name_prefix is not None:
                self._save(f"{save_file_name_prefix}_00000000_pre_generated.network")
        util.log_print("Layer pre-generation complete")

    def _fused_online_optimize(
        self,
        dataset,
        num_traces,
        batch_size,
        save_file_name_prefix,
        save_every_sec,
        stop_with_bad_loss,
        log_file,
        time_start,
        prev_total_train_seconds,
        keep_best_eval=None,
        keep_best_every=None,
    ):
        """Online training with the single-dispatch fused step.  Returns
        True if it ran to completion, False to fall back to the generic
        loop (e.g. model not jax-traceable)."""
        # first batch: materialized, for polymorph + one warmup step;
        # preserve loaded optimizer state unless the parameter structure
        # changed (same guard as the generic loop)
        first = Batch(dataset.next_batch(batch_size))
        layers_changed = self._polymorph(first)
        if self._opt_state is None or layers_changed or self._update_fn is None:
            self._create_optimizer()
        success, loss, grads = self._loss_and_grad(first)
        if success:
            if grads is not None:  # None = gather path already stepped
                lr = self._current_learning_rate()
                self._params, self._opt_state = self._update_fn(
                    self._params, grads, self._opt_state, lr
                )
            self._total_train_iterations += 1
            self._total_train_traces += first.size
            self._ema_update_host()
        self._ema_sync_structure()  # polymorph may have grown the params
        probe = dataset.next_device_batch(batch_size)
        if probe is None:
            return False
        _, sites = probe
        fused = self._build_fused_online_step(
            dataset._model, batch_size, dataset._prior_inflation, sites
        )

        trace_count = first.size
        # scan depth: K optimizer steps per device dispatch.  Measured on
        # the real chip (tests/extra/chip_train.py, GUM+LSTM bench config):
        # K=1 -> 3,815 warm traces/s, K=4 -> 9,494, K=16 -> 15,746 — the
        # tunnel round-trip dominates, so scan deep by default on
        # accelerators.  r5 interleaved sweep (12.8k segments, best of
        # 3): lstm128 K=16/32/64 -> 13.2k/15.4k/16.6k, lstm512 ->
        # 14.6k/15.1k/15.0k traces/s; K=32 is the default (K=64 only
        # pays at small widths and doubles the trace-budget overshoot
        # granularity).  On CPU compile cost dominates and K=1 wins.
        default_k = "1" if jax.default_backend() == "cpu" else "32"
        steps_per_dispatch = int(
            os.environ.get("PYPROB_TPU_FUSED_STEPS", default_k)
        )
        loss_dev = None
        last_print = time_start
        last_auto_save_time = time_start
        time_last_batch = time_start
        step_in_window = 0
        next_keep_best = (
            keep_best_every if keep_best_eval is not None else None
        )
        while trace_count < num_traces:
            # fixed K keeps one compiled program; the trace budget may
            # overshoot by up to K-1 batches (batch-granular, as in the
            # reference's loop)
            k = steps_per_dispatch
            # the poly LR schedule is computed on the host per sub-step
            lrs = []
            traces_ahead = self._total_train_traces
            for i in range(k):
                saved = self._total_train_traces
                self._total_train_traces = traces_ahead + i * batch_size
                lrs.append(self._current_learning_rate())
                self._total_train_traces = saved
            lrs = jnp.asarray(lrs, util.dtype())
            keys = util.next_keys(k * batch_size)
            keys = keys.reshape((k, batch_size) + keys.shape[1:])
            self._params, self._ema_params, self._opt_state, losses_dev = (
                fused(
                    self._params, self._ema_params, self._opt_state, keys, lrs
                )
            )
            loss_dev = losses_dev[-1]
            lr = float(lrs[-1])
            if self._ema_decay is not None:
                self._ema_steps += k
            for _ in range(k):
                self._bump_head_iterations(self._fused_step_addrs)
            self._total_train_iterations += k
            trace_count += k * batch_size
            self._total_train_traces += k * batch_size
            step_in_window += k
            if next_keep_best is not None and trace_count >= next_keep_best:
                next_keep_best += keep_best_every
                self._keep_best_probe(keep_best_eval)
            now = time.time()
            if True:
                loss = float(loss_dev)
                self._total_train_seconds = prev_total_train_seconds + (
                    now - time_start
                )
                if math.isnan(loss) or math.isinf(loss):
                    util.log_error(
                        f"Bad loss in fused training step: {loss} (if the "
                        "model's observations are heavy-tailed, consider "
                        "observe_embeddings={'name': {'input_transform': "
                        "'arcsinh'}})"
                    )
                    if stop_with_bad_loss:
                        return True
                if self._loss_init is None:
                    self._loss_init = loss
                    self._loss_max = loss
                self._loss_min = min(self._loss_min, loss)
                self._loss_max = max(self._loss_max, loss)
                self._loss_previous = loss
                self._history_train_loss.append(loss)
                self._history_train_loss_trace.append(self._total_train_traces)
                tps = (
                    step_in_window
                    * batch_size
                    / max(now - time_last_batch, 1e-9)
                )
                time_last_batch = now
                step_in_window = 0
                if now - last_print > util._print_refresh_rate:
                    last_print = now
                    util.progress_update(
                        f"{util.days_hours_mins_secs_str(self._total_train_seconds)} "
                        f"| fused | {self._total_train_traces:9,} | "
                        f"loss {loss:+.3e} | min {self._loss_min:+.3e} | "
                        f"lr {lr:+.2e} | {tps:,.1f} traces/s"
                    )
                if log_file is not None:
                    log_file.write(
                        f"{self._total_train_seconds}, "
                        f"{self._total_train_iterations}, "
                        f"{self._total_train_traces}, {loss}, , {lr}, , 1, , "
                        f"{tps}\n"
                    )
                if (
                    save_file_name_prefix is not None
                    and save_every_sec is not None
                    and now - last_auto_save_time > save_every_sec
                ):
                    last_auto_save_time = now
                    self._save(
                        f"{save_file_name_prefix}_{util.get_time_stamp()}_"
                        f"traces_{self._total_train_traces}.network"
                    )
        return True

    # ------------------------------------------------------------------
    # the training loop (reference: inference_network.py:381-599)
    # ------------------------------------------------------------------
    def optimize(
        self,
        num_traces,
        dataset,
        dataset_valid=None,
        num_traces_end=1e9,
        batch_size=64,
        valid_every=None,
        optimizer_type=Optimizer.ADAM,
        learning_rate_init=0.0001,
        learning_rate_end=1e-6,
        learning_rate_scheduler_type=LearningRateScheduler.NONE,
        momentum=0.9,
        weight_decay=1e-5,
        save_file_name_prefix=None,
        save_every_sec=600,
        distributed_backend=None,
        distributed_params_sync_every_iter=10000,
        distributed_num_buckets=None,
        distributed_rank=0,
        distributed_world_size=1,
        stop_with_bad_loss=False,
        log_file_name=None,
        ema_decay=None,
        keep_best=False,
        keep_best_every=None,
        keep_best_metric=None,
    ):
        """``ema_decay``: maintain a Polyak/EMA average of the parameters
        (e.g. 0.98 per optimizer step) and serve proposals from it — the
        root fix for late constant-lr oscillation at large widths.
        ``keep_best``: validation-based checkpoint selection — probe a
        metric every ``keep_best_every`` traces (``keep_best_metric``: a
        callable ``net -> float``, higher is better; default with
        ``dataset_valid``: negative validation loss on the serving
        parameters), snapshot the best, and restore it before
        returning.  Reference precedent for the in-loop validation
        cadence: pyprob/nn/inference_network.py:535-548."""
        if not self._layers_initialized:
            self._init_layers_observe_embedding(
                self._observe_embeddings_spec, example_trace=dataset[0]
            )
            self._maybe_init_local_observe(dataset[0])
            self._init_layers()
            self._layers_initialized = True

        lr_scale_world = 1
        if distributed_backend is None:
            distributed_world_size = 1
            distributed_rank = 0
        elif distributed_backend in ("shard_map", "jax", "mesh", "dp"):
            # single-process data parallelism: batch rows shard over the
            # local device mesh, grads psum over ICI
            from ..parallel import data_parallel_mesh

            self._dp_mesh = data_parallel_mesh()
            lr_scale_world = self._dp_mesh.size
            distributed_world_size = 1
            distributed_rank = 0
            util.log_print(
                f"Data-parallel training over mesh: {self._dp_mesh.shape} "
                f"({self._dp_mesh.size} devices)"
            )
        else:
            # multi-process: this process is one rank; the sampler
            # partitions batches per rank (DistributedTraceBatchSampler)
            self._distributed_world_size = distributed_world_size
            lr_scale_world = distributed_world_size
            util.init_distributed_print(
                distributed_rank, distributed_world_size, False
            )
            if distributed_rank == 0:
                util.log_print("Distributed synchronous training")
                util.log_print(
                    f"Distributed world size: {distributed_world_size}"
                )
                util.log_print(
                    f"Distributed minibatch: {batch_size * distributed_world_size} "
                    f"(global), {batch_size} (per rank)"
                )

        # data iteration
        sampler = None
        if isinstance(dataset, OfflineDataset):
            if distributed_world_size == 1:
                sampler = TraceBatchSampler(
                    dataset, batch_size=batch_size, shuffle_batches=True
                )
            else:
                sampler = DistributedTraceBatchSampler(
                    dataset,
                    batch_size=batch_size,
                    rank=distributed_rank,
                    world_size=distributed_world_size,
                    num_buckets=distributed_num_buckets,
                    shuffle_batches=True,
                    shuffle_buckets=True,
                )

            def batches():
                for idx in sampler:
                    yield Batch([dataset[int(i)] for i in idx])

        else:

            def batches():
                # first batch is materialized so polymorph can create the
                # per-address layers; thereafter the device-resident fast
                # path feeds packed batches with no host round-trips
                yield Batch(dataset.next_batch(batch_size))
                while True:
                    fast = (
                        dataset.next_device_batch(batch_size)
                        if hasattr(dataset, "next_device_batch")
                        else None
                    )
                    if fast is None:
                        yield Batch(dataset.next_batch(batch_size))
                    else:
                        outputs, sites = fast
                        yield self._packed_batch_from_outputs(
                            outputs, sites, batch_size
                        )

        if dataset_valid is not None:
            valid_sampler = TraceBatchSampler(
                dataset_valid, batch_size=batch_size, shuffle_batches=False
            )
            if not self._layers_pre_generated:
                for idx in valid_sampler:
                    self._polymorph(
                        Batch([dataset_valid[int(i)] for i in idx])
                    )

        prev_total_train_seconds = self._total_train_seconds
        time_start = time.time()
        time_last_batch = time_start
        if valid_every is None:
            valid_every = max(100, num_traces / 1000)
        last_validation_trace = -valid_every + 1
        valid_loss = None
        if self._optimizer_type is None:
            self._optimizer_type = optimizer_type
        if self._momentum is None:
            self._momentum = momentum
        if self._weight_decay is None:
            self._weight_decay = weight_decay
        if self._learning_rate_scheduler_type is None:
            self._learning_rate_scheduler_type = learning_rate_scheduler_type
        if self._learning_rate_init is None:
            # sqrt(world) LR scaling (reference: inference_network.py:448)
            self._learning_rate_init = learning_rate_init * math.sqrt(
                lr_scale_world
            )
        if self._learning_rate_end is None:
            self._learning_rate_end = learning_rate_end
        if self._total_train_traces_end is None:
            self._total_train_traces_end = num_traces_end
        if ema_decay is not None:
            self._ema_decay = ema_decay

        # keep_best: per-call state; the final parameters compete in a
        # last probe before the best snapshot is restored
        self._keep_best_snapshot = None
        self._keep_best_metric = None
        keep_best_eval = None
        if keep_best:
            if keep_best_metric is not None:
                keep_best_eval = keep_best_metric
            elif dataset_valid is not None:

                def keep_best_eval(net):
                    # validation loss of the SERVING parameters (the EMA
                    # average when averaging is on)
                    raw = net._params
                    net._params = net._serving_params()
                    try:
                        total, nb = 0.0, 0
                        for idx in valid_sampler:
                            _, v = net._loss(
                                Batch([dataset_valid[int(i)] for i in idx])
                            )
                            total += v
                            nb += 1
                    finally:
                        net._params = raw
                    return -total / max(nb, 1)

            else:
                raise ValueError(
                    "keep_best requires keep_best_metric (a callable "
                    "net -> float, higher is better) or dataset_valid"
                )
            if keep_best_every is None:
                keep_best_every = max(batch_size, int(num_traces) // 4)

        epoch = 0
        trace_count = 0
        stop = False
        next_keep_best = keep_best_every if keep_best_eval is not None else None
        did_initial_param_sync = False
        last_auto_save_time = time_start - (save_every_sec or 0)
        last_print = time_start - util._print_refresh_rate
        log_file = None
        if distributed_rank == 0 and log_file_name is not None:
            log_file = open(log_file_name, mode="w", buffering=1)
            log_file.write(
                "time, iteration, trace, loss, valid_loss, learning_rate, "
                "mean_trace_length_controlled, sub_mini_batches, "
                "distributed_bucket_id, traces_per_second\n"
            )

        # Fused online hot loop: when training online on a traceable model
        # without a dp mesh, run generate+pack+loss+update as one jitted
        # dispatch per step (vital over a high-latency device link).
        if (
            not isinstance(dataset, OfflineDataset)
            and hasattr(dataset, "next_device_batch")
            and self._dp_mesh is None
            and distributed_world_size == 1
            and dataset_valid is None
        ):
            finished = self._fused_online_optimize(
                dataset=dataset,
                num_traces=num_traces,
                batch_size=batch_size,
                save_file_name_prefix=save_file_name_prefix,
                save_every_sec=save_every_sec,
                stop_with_bad_loss=stop_with_bad_loss,
                log_file=log_file,
                time_start=time_start,
                prev_total_train_seconds=prev_total_train_seconds,
                keep_best_eval=keep_best_eval,
                keep_best_every=keep_best_every,
            )
            if finished:
                util.progress_end()
                if keep_best_eval is not None:
                    self._keep_best_probe(keep_best_eval)
                    self.restore_params(self._keep_best_snapshot)
                if log_file is not None:
                    log_file.close()
                if save_file_name_prefix is not None:
                    self._save(
                        f"{save_file_name_prefix}_{util.get_time_stamp()}_"
                        f"traces_{self._total_train_traces}.network"
                    )
                return

        while not stop:
            epoch += 1
            for batch in batches():
                time_batch = time.time()
                if self._layers_pre_generated or isinstance(batch, PackedBatch):
                    layers_changed = False
                else:
                    layers_changed = self._polymorph(batch)
                if self._opt_state is None or layers_changed or self._update_fn is None:
                    self._create_optimizer()
                # rank-0 parameter broadcast at start and every
                # distributed_params_sync_every_iter iterations
                # (reference: inference_network.py:473-474)
                if (
                    not did_initial_param_sync
                    or self._total_train_iterations
                    % distributed_params_sync_every_iter
                    == 0
                ):
                    self._distributed_sync_parameters()
                    did_initial_param_sync = True

                success, loss, grads = self._loss_and_grad(batch)
                if not success:
                    util.log_error(
                        f"Cannot compute loss, skipping batch. Loss: {loss}"
                    )
                    if stop_with_bad_loss:
                        if log_file is not None:
                            log_file.close()
                        return
                    continue

                lr = self._current_learning_rate()
                if grads is not None:  # None = gather path already stepped
                    self._params, self._opt_state = self._update_fn(
                        self._params, grads, self._opt_state, lr
                    )
                self._ema_update_host()

                if self._loss_init is None:
                    self._loss_init = loss
                    self._loss_max = loss
                self._loss_min = min(self._loss_min, loss)
                self._loss_max = max(self._loss_max, loss)
                self._loss_previous = loss
                self._total_train_iterations += 1
                trace_count += batch.size * distributed_world_size
                self._total_train_traces += batch.size * distributed_world_size
                self._total_train_seconds = prev_total_train_seconds + (
                    time_batch - time_start
                )
                self._history_train_loss.append(loss)
                self._history_train_loss_trace.append(self._total_train_traces)
                traces_per_second = (
                    batch.size
                    * distributed_world_size
                    / max(time_batch - time_last_batch, 1e-9)
                )
                time_last_batch = time_batch

                if next_keep_best is not None and trace_count >= next_keep_best:
                    next_keep_best += keep_best_every
                    self._keep_best_probe(keep_best_eval)

                if dataset_valid is not None and (
                    trace_count - last_validation_trace > valid_every
                ):
                    valid_loss_total = 0.0
                    valid_batches = 0
                    for idx in valid_sampler:
                        _, v = self._loss(
                            Batch([dataset_valid[int(i)] for i in idx])
                        )
                        valid_loss_total += v
                        valid_batches += 1
                    valid_loss = valid_loss_total / max(valid_batches, 1)
                    self._history_valid_loss.append(valid_loss)
                    self._history_valid_loss_trace.append(
                        self._total_train_traces
                    )
                    last_validation_trace = trace_count - 1

                if (
                    distributed_rank == 0
                    and save_file_name_prefix is not None
                    and save_every_sec is not None
                    and time_batch - last_auto_save_time > save_every_sec
                ):
                    last_auto_save_time = time_batch
                    self._save(
                        f"{save_file_name_prefix}_{util.get_time_stamp()}_"
                        f"traces_{self._total_train_traces}.network"
                    )

                if trace_count >= num_traces:
                    stop = True
                if (
                    time_batch - last_print > util._print_refresh_rate
                ) or stop:
                    last_print = time_batch
                    util.progress_update(
                        f"{util.days_hours_mins_secs_str(self._total_train_seconds)} "
                        f"| ep {epoch} | {self._total_train_traces:9,} | "
                        f"loss {loss:+.3e} | min {self._loss_min:+.3e} | "
                        f"lr {lr:+.2e} | {traces_per_second:,.1f} traces/s"
                    )
                if log_file is not None:
                    bucket_id = (
                        sampler._current_bucket_id
                        if isinstance(sampler, DistributedTraceBatchSampler)
                        else None
                    )
                    log_file.write(
                        f"{self._total_train_seconds}, "
                        f"{self._total_train_iterations}, "
                        f"{self._total_train_traces}, {loss}, {valid_loss}, "
                        f"{lr}, {batch.mean_length_controlled}, "
                        f"{len(batch.sub_batches)}, {bucket_id}, "
                        f"{traces_per_second}\n"
                    )
                if stop:
                    break
        util.progress_end()
        if keep_best_eval is not None:
            self._keep_best_probe(keep_best_eval)  # final state competes
            self.restore_params(self._keep_best_snapshot)
        if log_file is not None:
            log_file.close()
        if distributed_rank == 0 and save_file_name_prefix is not None:
            self._save(
                f"{save_file_name_prefix}_{util.get_time_stamp()}_"
                f"traces_{self._total_train_traces}.network"
            )
