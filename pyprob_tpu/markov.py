"""Scan-structured (Markov) model protocol.

A universal-PPL program cannot be paused mid-trace, so the generic SMC
engine resamples via staged replay: stage r re-executes the whole
``forward`` (pyprob_tpu.inference.smc) — T observes cost T full
re-executions, O(T^2) program work.  Models that ARE scan-structured
can say so by subclassing :class:`MarkovModel`; the SMC engine then runs
an O(T) ``lax.scan`` particle filter (pyprob_tpu.inference.smc_scan):
one ``markov_step`` evaluation per particle per stage, with resampling a
batched gather on the carry, the whole filter one XLA program.

Protocol (all effect calls — ``pp.sample`` / ``pp.observe`` /
``pp.factor`` — work as usual inside each hook):

* ``markov_init(self) -> carry`` — run once per particle: sample global
  latents and the initial state; may observe (weights fold into the
  initial stage).  Returns the filter carry, any pytree of arrays.
* ``markov_step(self, carry, t) -> carry`` — one transition: sample the
  step's latents, observe the step's data, return the new carry.
  Every ``observe(name=...)``/observed-``sample(name=...)`` inside
  ``markov_step`` reads ROW ``t`` of the user-provided observation
  array: pass ``observe={"y": array of shape [num_steps, ...]}`` and
  write ``pp.observe(dist, name="y")`` in the step.  Anything the next
  step needs (including values you want in the result) must flow
  through the carry.
* ``markov_finalize(self, carry) -> result`` — map the final carry to
  the model's return value (default: the carry itself).
* ``self.num_steps`` — the (static) number of steps.

The carry is an arbitrary pytree, and SMC resampling gathers WHOLE
carries: carrying the accumulated trajectory
(``path.at[t + 1].set(x)``) yields genealogy-correct SMOOTHED paths —
validated against the exact RTS smoother in tests/test_markov.py
(subject to the usual path-degeneracy caveat for long horizons).

``forward()`` is derived from the hooks (a plain Python loop with the
same per-step observation slicing), so a MarkovModel works unchanged
with every other engine — IS, IC, MCMC, HMC/NUTS, VI — on both tiers;
the reference has no counterpart (its engine list is
reference: pyprob/util.py:49-53 and it has no SMC at all).
"""

from __future__ import annotations

import contextlib

from .model import Model
from . import state


class _StepObserves:
    """Read-only view of the observed dict that slices row ``t`` of every
    value on access — installed while ``markov_step`` runs so per-step
    observations keep a single static address across steps.

    When ``num_steps`` is given, every access validates that the
    underlying array really has one row per step — otherwise a
    mismatched observation surfaces as an opaque indexing/scan error
    deep inside tracing."""

    __slots__ = ("_base", "_t", "_num_steps")

    def __init__(self, base, t, num_steps=None):
        self._base = base
        self._t = t
        self._num_steps = num_steps

    def __contains__(self, name):
        return name in self._base

    def __getitem__(self, name):
        v = self._base[name]
        if self._num_steps is not None:
            try:
                shape = tuple(v.shape)
            except AttributeError:
                import numpy as _np

                shape = _np.shape(v)
            if not shape or int(shape[0]) != self._num_steps:
                raise RuntimeError(
                    f"MarkovModel per-step observation {name!r} is read "
                    f"inside markov_step, so it must have leading "
                    f"dimension num_steps={self._num_steps} (one row per "
                    f"step); got shape {shape}.  Pass "
                    f"observe={{{name!r}: array of shape "
                    f"[num_steps, ...]}}, or move the observe to "
                    f"markov_init if it is not per-step."
                )
        return v[self._t]

    def get(self, name, default=None):
        if name in self._base:
            return self[name]
        return default

    def keys(self):
        return self._base.keys()

    def __iter__(self):
        return iter(self._base)

    def __len__(self):
        return len(self._base)

    def items(self):
        return ((k, self[k]) for k in self._base)

    def values(self):
        return (self[k] for k in self._base)


@contextlib.contextmanager
def _sliced_observes(t, num_steps=None):
    """Slice row ``t`` of every observed value for the active tier's
    handler while the body runs."""
    handler = state._get_handler()
    if handler is not None:  # compiled tier (vmap tracing)
        base = handler.observed
        handler.observed = _StepObserves(base, t, num_steps)
        try:
            yield
        finally:
            handler.observed = base
    else:  # interpreter tier
        ctx = state._ctx_local.value
        base = ctx.observed_variables
        ctx.observed_variables = _StepObserves(base, t, num_steps)
        try:
            yield
        finally:
            ctx.observed_variables = base


class MarkovModel(Model):
    """Base class for scan-structured models; see the module docstring
    for the ``markov_init`` / ``markov_step`` / ``markov_finalize``
    protocol.  Set ``num_steps`` (constructor argument or attribute)."""

    def __init__(self, num_steps=None, name="Unnamed pyprob_tpu markov model",
                 **kwargs):
        super().__init__(name=name, **kwargs)
        if num_steps is not None:
            self.num_steps = int(num_steps)

    # -- the protocol --------------------------------------------------
    def markov_init(self):
        raise NotImplementedError(
            "MarkovModel subclasses must implement markov_init()"
        )

    def markov_step(self, carry, t):
        raise NotImplementedError(
            "MarkovModel subclasses must implement markov_step(carry, t)"
        )

    def markov_finalize(self, carry):
        return carry

    # -- derived forward: every non-SMC engine sees a normal model -----
    def forward(self):
        num_steps = getattr(self, "num_steps", None)
        if not isinstance(num_steps, int) or num_steps < 1:
            raise RuntimeError(
                f"{type(self).__name__}.num_steps must be a positive int "
                f"(set it as a constructor argument or attribute); got "
                f"{num_steps!r}"
            )
        carry = self.markov_init()
        for t in range(num_steps):
            with _sliced_observes(t, num_steps):
                carry = self.markov_step(carry, t)
        return self.markov_finalize(carry)
