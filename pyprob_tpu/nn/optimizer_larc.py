"""LARC: layer-wise adaptive rate control for large-batch training.

Counterpart of the reference's apex-derived optimizer wrapper
(reference: pyprob/nn/optimizer_larc.py:9-107), reformulated as a pure
gradient transformation applied before the base optimizer — the idiomatic
JAX shape for the same math (arXiv:1708.03888):

    local_lr = trust_coefficient * ||p|| / (||g|| + weight_decay*||p|| + eps)
    clip mode:  g <- g * min(local_lr / global_lr, 1)
    scale mode: g <- g * local_lr
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def larc_scale(
    grads,
    params,
    learning_rate,
    trust_coefficient=0.002,
    clip=True,
    eps=1e-8,
    weight_decay=0.0,
):
    """Apply LARC per parameter leaf ("layer" granularity = leaf, matching
    the reference's per-parameter param_group treatment)."""

    def one(g, p):
        if g is None:
            return g
        p_norm = jnp.linalg.norm(jnp.ravel(p))
        g_norm = jnp.linalg.norm(jnp.ravel(g))
        adaptive_lr = trust_coefficient * p_norm / (
            g_norm + weight_decay * p_norm + eps
        )
        ok = (p_norm > 0) & (g_norm > 0)
        if clip:
            scale = jnp.where(
                ok, jnp.minimum(adaptive_lr / learning_rate, 1.0), 1.0
            )
        else:
            scale = jnp.where(ok, adaptive_lr, 1.0)
        g = g + weight_decay * p
        return g * scale

    return jax.tree_util.tree_map(one, grads, params)


class LARC:
    """Optimizer wrapper by the reference's name (reference:
    pyprob/nn/optimizer_larc.py:9-107 wraps any torch optimizer):
    ``LARC(base_optimizer)`` is an optax GradientTransformation that
    applies :func:`larc_scale` to the gradients and then the wrapped
    optimizer.  Use anywhere an optax transformation fits::

        import optax
        opt = LARC(optax.adam(1e-3), learning_rate=1e-3)
        state = opt.init(params)
        updates, state = opt.update(grads, state, params)

    ``state_dict``/``load_state_dict`` round-trip the optax state pytree
    for checkpointing.  The torch-only mutators (``step``, ``zero_grad``,
    ``add_param_group``) have no JAX counterpart — updates are pure.
    """

    def __init__(self, optimizer, learning_rate=0.01, trust_coefficient=0.02,
                 clip=True, eps=1e-8, weight_decay=0.0):
        self._base = optimizer
        self._lr = learning_rate
        self._kw = dict(trust_coefficient=trust_coefficient, clip=clip,
                        eps=eps, weight_decay=weight_decay)
        self._state = None

    def init(self, params):
        self._state = self._base.init(params)
        return self._state

    def update(self, grads, state, params=None):
        grads = larc_scale(grads, params, self._lr, **self._kw)
        updates, new_state = self._base.update(grads, state, params)
        self._state = new_state
        return updates, new_state

    def state_dict(self):
        return self._state

    def load_state_dict(self, state):
        self._state = state
        return state
