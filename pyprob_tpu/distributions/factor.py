"""Factor pseudo-distribution for soft conditioning
(reference: pyprob/distributions/factor.py:10-40).

Carries either a fixed log-probability contribution or a callable scoring an
arbitrary value; used by ``pyprob_tpu.factor``.
"""

from __future__ import annotations

import jax

from .. import util, backend
from .distribution import Distribution


class Factor(Distribution):
    _param_names = ()

    def __init__(self, log_prob=None, log_prob_func=None):
        if (log_prob is None) == (log_prob_func is None):
            raise ValueError("Provide exactly one of log_prob, log_prob_func")
        self._log_prob_value = log_prob
        self._log_prob_func = log_prob_func
        self._finish_init()

    def _finish_init(self):
        super().__init__(name="Factor", address_suffix="Factor", batch_shape=())

    def sample(self, rng=None, sample_shape=()):
        B = backend.of(self._log_prob_value)
        return B.asarray(0.0, util.dtype())

    def _sample_np(self, rng, shape):
        return self.sample()

    def _sample_jax(self, key, shape):
        return self.sample()

    def log_prob(self, value=None, sum=False):
        if self._log_prob_func is not None:
            return self._log_prob_func(value)
        B = backend.of(self._log_prob_value, value)
        return B.asarray(self._log_prob_value, util.dtype())

    @property
    def mean(self):
        raise NotImplementedError("Factor has no mean")

    @property
    def variance(self):
        raise NotImplementedError("Factor has no variance")


def _factor_flatten(d):
    return (d._log_prob_value,), d._log_prob_func


def _factor_unflatten(aux, children):
    d = Factor.__new__(Factor)
    d._log_prob_value = children[0]
    d._log_prob_func = aux
    d._finish_init()
    return d


jax.tree_util.register_pytree_node(Factor, _factor_flatten, _factor_unflatten)
