"""Mixture distribution (reference: pyprob/distributions/mixture.py:7-94).

``log_prob`` is the logsumexp over component log-pdfs weighted by the mixing
logits — on the compiled tier this is a single fused VPU expression under
XLA (optionally the Pallas kernel in ``pyprob_tpu.ops``).  Sampling draws
the component index and selects among per-component draws with a one-hot
contraction, which vectorizes under vmap with no gather scatter.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .. import util, backend
from .distribution import Distribution
from .categorical import Categorical


class Mixture(Distribution):
    _param_names = ()  # custom pytree flatten below

    def __init__(self, distributions, probs=None, logits=None):
        self._distributions = list(distributions)
        if probs is None and logits is None:
            # default equal weights broadcast over the components' common
            # batch shape (a scalar mixing dist would misreport batch_shape)
            batch_shape = np.broadcast_shapes(
                *[d.batch_shape for d in self._distributions]
            )
            K = len(self._distributions)
            probs = np.full(
                tuple(batch_shape) + (K,), 1.0 / K, dtype=util.dtype()
            )
        self._mixing = Categorical(probs=probs, logits=logits)
        self._finish_init()

    def _finish_init(self):
        self._num_components = len(self._distributions)
        batch_shape = self._mixing.batch_shape
        super().__init__(
            name="Mixture",
            address_suffix=f"Mixture({', '.join(d.address_suffix for d in self._distributions)})",
            batch_shape=batch_shape,
        )

    @property
    def distributions(self):
        return self._distributions

    @property
    def mixing_distribution(self):
        return self._mixing

    @property
    def probs(self):
        """Mixing probabilities (reference parity:
        pyprob/distributions/mixture.py Mixture.probs)."""
        return self._mixing.probs

    def _component_log_probs(self, B, value):
        lps = [d.log_prob(value) for d in self._distributions]
        return B.stack(lps, -1)  # [..., K]

    def log_prob(self, value, sum=False):
        B = backend.of(value, self._mixing._logits)
        value = B.asarray(value, util.dtype())
        if B is backend.JAX:
            fused = self._fused_log_prob(value)
            if fused is not None:
                return B.sum(fused) if sum else fused
        comp = self._component_log_probs(B, value)
        lp = B.logsumexp(comp + self._mixing.logits, axis=-1)
        return B.sum(lp) if sum else lp

    def _fused_log_prob(self, value):
        """Pallas-fused path for the hot homogeneous mixtures (the IC
        proposal families): all-Normal or all-TruncatedNormal components
        with 1-D batch.  Returns None when the shape doesn't fit."""
        from .. import ops
        from .normal import Normal as _Normal
        from .truncated_normal import TruncatedNormal as _TruncatedNormal

        if not ops.use_pallas():
            return None
        if len(self._batch_shape) != 1 or jnp.ndim(value) != 1:
            return None
        B = self._batch_shape[0]
        K = self._num_components
        logits = self._mixing.logits
        if all(isinstance(d, _Normal) for d in self._distributions):
            means = jnp.stack(
                [jnp.broadcast_to(d._loc, (B,)) for d in self._distributions], -1
            )
            stddevs = jnp.stack(
                [jnp.broadcast_to(d._scale, (B,)) for d in self._distributions],
                -1,
            )
            return ops.kernels.mixture_normal_log_prob_fused(
                value, means, stddevs, jnp.broadcast_to(logits, (B, K))
            )
        if all(isinstance(d, _TruncatedNormal) for d in self._distributions) and all(
            d._low is self._distributions[0]._low
            and d._high is self._distributions[0]._high
            for d in self._distributions
        ):
            d0 = self._distributions[0]
            low = jnp.broadcast_to(d0._low, (B,))
            high = jnp.broadcast_to(d0._high, (B,))
            means = jnp.stack(
                [
                    jnp.broadcast_to(d._mean_non_truncated, (B,))
                    for d in self._distributions
                ],
                -1,
            )
            stddevs = jnp.stack(
                [
                    jnp.broadcast_to(d._stddev_non_truncated, (B,))
                    for d in self._distributions
                ],
                -1,
            )
            return ops.kernels.mixture_truncated_normal_log_prob_fused(
                value, means, stddevs, jnp.broadcast_to(logits, (B, K)), low, high
            )
        return None

    def _sample_np(self, rng, shape):
        idx = self._mixing._sample_np(rng, shape)  # [shape + batch]
        draws = np.stack(
            [
                np.broadcast_to(d._sample_np(rng, shape), idx.shape)
                for d in self._distributions
            ],
            axis=-1,
        )
        return np.take_along_axis(draws, idx[..., None], axis=-1)[..., 0]

    def _sample_jax(self, key, shape):
        keys = jax.random.split(key, self._num_components + 1)
        idx = self._mixing._sample_jax(keys[0], shape)
        draws = jnp.stack(
            [
                jnp.broadcast_to(
                    d._sample_jax(keys[i + 1], shape), idx.shape
                ).astype(util.dtype())
                for i, d in enumerate(self._distributions)
            ],
            axis=-1,
        )
        onehot = jax.nn.one_hot(idx, self._num_components, dtype=draws.dtype)
        return jnp.sum(draws * onehot, axis=-1)

    @property
    def mean(self):
        B = backend.of(self._mixing._logits)
        w = B.exp(self._mixing.logits)
        means = B.stack(
            [B.broadcast_to(d.mean, self._batch_shape) for d in self._distributions],
            -1,
        )
        return B.sum(w * means, -1)

    @property
    def variance(self):
        B = backend.of(self._mixing._logits)
        w = B.exp(self._mixing.logits)
        means = B.stack(
            [B.broadcast_to(d.mean, self._batch_shape) for d in self._distributions],
            -1,
        )
        variances = B.stack(
            [
                B.broadcast_to(d.variance, self._batch_shape)
                for d in self._distributions
            ],
            -1,
        )
        m = B.sum(w * means, -1)
        return B.sum(w * (variances + means ** 2), -1) - m ** 2


def _mixture_flatten(d):
    return (tuple(d._distributions), d._mixing), None


def _mixture_unflatten(aux, children):
    d = Mixture.__new__(Mixture)
    d._distributions = list(children[0])
    d._mixing = children[1]
    d._finish_init()
    return d


jax.tree_util.register_pytree_node(Mixture, _mixture_flatten, _mixture_unflatten)
