"""Sharding introspection: prove compiled programs actually shard.

Every mesh-aware engine places its particle/chain arrays with
``NamedSharding(mesh, P("dp"))`` and then relies on the XLA SPMD
partitioner to keep the computation sharded.  A dropped ``device_put``
(or a partitioner decision to replicate) silently serializes a
multi-chip run while producing identical numbers, so correctness tests
cannot catch it.  This module makes the sharding itself observable:

    with capture_jit() as records:
        model.posterior_results(..., mesh=mesh)
    assert any(r.dp_sharded_outputs(8) for r in records)
    assert any(r.has_collectives() for r in records)

``capture_jit`` temporarily wraps ``jax.jit`` so every jitted program
*created and first called* inside the context records its argument and
result shardings and (optionally) the post-SPMD optimized HLO.  It is a
debug/CI tool: zero overhead outside the context, one extra
lowering+compile per jitted program inside it.

The reference has no analogue — its data parallelism is explicit
torch.distributed code (reference: pyprob/nn/inference_network.py:290-341)
whose collectives fail loudly when ranks desync.  XLA's implicit SPMD
fails silently instead; this is the TPU-native replacement for that
loudness.
"""

from __future__ import annotations

import contextlib
import functools

import jax

# Op names as they appear in post-optimization (post-SPMD-partitioning)
# HLO.  all-to-all covers sharded transpose; collective-permute covers
# resampling-style shuffles.
_COLLECTIVE_OPS = (
    "all-reduce",
    "all-gather",
    "reduce-scatter",
    "collective-permute",
    "all-to-all",
)


def _named_spec(sharding):
    """(axis names tuple, device count) for NamedSharding; None otherwise."""
    spec = getattr(sharding, "spec", None)
    mesh = getattr(sharding, "mesh", None)
    if spec is None or mesh is None:
        return None
    axes = []
    for entry in spec:
        if entry is None:
            continue
        if isinstance(entry, (tuple, list)):
            axes.extend(entry)
        else:
            axes.append(entry)
    return tuple(axes), mesh.size


def _is_axis_sharded(sharding, axis, min_devices):
    info = _named_spec(sharding)
    if info is None:
        return False
    axes, n = info
    return axis in axes and n >= min_devices


class JitRecord:
    """Shardings + optimized HLO of one jitted program's first call."""

    def __init__(self, name):
        self.name = name
        self.arg_shardings = []
        self.out_shardings = []
        self.hlo = ""

    def dp_sharded_args(self, min_devices=2, axis="dp"):
        return any(
            _is_axis_sharded(s, axis, min_devices) for s in self.arg_shardings
        )

    def dp_sharded_outputs(self, min_devices=2, axis="dp"):
        return any(
            _is_axis_sharded(s, axis, min_devices) for s in self.out_shardings
        )

    def fully_replicated_outputs(self):
        """True when every output lives whole on every device (the failure
        mode a dropped device_put produces on a >1-device mesh)."""
        return all(
            getattr(s, "is_fully_replicated", True) for s in self.out_shardings
        )

    def has_collectives(self):
        return any(op in self.hlo for op in _COLLECTIVE_OPS)

    def collective_ops(self):
        return sorted({op for op in _COLLECTIVE_OPS if op in self.hlo})

    def __repr__(self):
        return (
            f"JitRecord({self.name!r}, args_dp={self.dp_sharded_args()}, "
            f"out_dp={self.dp_sharded_outputs()}, "
            f"collectives={self.collective_ops()})"
        )


class _SpyJitted:
    """Wraps one jitted callable; records shardings/HLO on first call."""

    def __init__(self, jitted, fun, records, capture_hlo):
        self._jitted = jitted
        self._records = records
        self._capture_hlo = capture_hlo
        self._record = None
        self._name = getattr(fun, "__name__", repr(fun))
        functools.update_wrapper(self, fun)

    def __call__(self, *args, **kwargs):
        arg_leaves = jax.tree_util.tree_leaves((args, kwargs))
        if any(isinstance(l, jax.core.Tracer) for l in arg_leaves):
            # inner jit under an outer trace: it inlines into the outer
            # program, there is nothing separately compiled to record
            return self._jitted(*args, **kwargs)
        first = self._record is None
        if first:
            rec = JitRecord(self._name)
            self._record = rec
            for leaf in arg_leaves:
                if isinstance(leaf, jax.Array):
                    rec.arg_shardings.append(leaf.sharding)
            if self._capture_hlo:
                # lower().compile() does not execute (and does not donate),
                # so it is safe to run before the real call; post-SPMD HLO
                # is where partitioner-inserted collectives are visible.
                try:
                    rec.hlo = (
                        self._jitted.lower(*args, **kwargs)
                        .compile()
                        .as_text()
                    )
                except Exception:
                    rec.hlo = ""
        out = self._jitted(*args, **kwargs)
        if first:
            for leaf in jax.tree_util.tree_leaves(out):
                if isinstance(leaf, jax.Array):
                    self._record.out_shardings.append(leaf.sharding)
            self._records.append(self._record)
        return out

    def __getattr__(self, name):
        return getattr(self.__dict__["_jitted"], name)


@contextlib.contextmanager
def capture_jit(capture_hlo=True):
    """Record every jitted program created (and called) in this context.

    Yields a list of :class:`JitRecord`.  Programs cached from *before*
    the context (e.g. ``vectorized._jit_run_cache`` entries) are not
    seen — use fresh model instances when asserting.
    """
    records = []
    real_jit = jax.jit

    def spy_jit(fun=None, **jit_kwargs):
        if fun is None:  # @jax.jit(static_argnames=...) decorator form
            return lambda f: spy_jit(f, **jit_kwargs)
        return _SpyJitted(
            real_jit(fun, **jit_kwargs), fun, records, capture_hlo
        )

    jax.jit = spy_jit
    try:
        yield records
    finally:
        jax.jit = real_jit
