"""Reference-named module classes over the functional nn layer.

The reference exposes its embeddings and proposal heads as torch Modules
(reference: pyprob/nn/embedding_feedforward.py, embedding_cnn_2d_5c.py,
embedding_cnn_3d_5c.py, proposal_*.py) that users occasionally construct
directly.  pyprob_tpu's equivalents are functional — param pytrees plus
pure apply functions in ``nn/layers.py`` / ``nn/proposals.py`` (required
so everything jits/vmaps) — and InferenceNetwork drives them internally.
This module provides thin *stateful wrappers by the reference's class
names* for migration: each holds a param pytree and forwards to the same
functional apply, so ``EmbeddingFeedForward(...)``/``Proposal...(...)``
constructor-and-``forward`` call sites port unchanged.  New code should
prefer the functional API (composable with jit/vmap/grad directly).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .. import util
from .layers import (
    mlp_init,
    mlp_apply,
    cnn2d5c_init,
    cnn2d5c_apply,
    cnn3d5c_init,
    cnn3d5c_apply,
    num_params,
)
from .proposals import head_init, head_apply, prior_param_arrays


def _shape_tuple(shape):
    if isinstance(shape, int):
        return (shape,)
    return tuple(int(s) for s in shape)


class FunctionalModule:
    """Param-holding wrapper over a pure apply function."""

    def __init__(self):
        self._params = None

    @property
    def params(self):
        """The underlying param pytree — usable with the functional API."""
        return self._params

    def num_parameters(self):
        return num_params(self._params)

    def __call__(self, *args, **kwargs):
        return self.forward(*args, **kwargs)

    def to(self, device=None, *args, **kwargs):
        """Migration no-op (torch ``Module.to``); placement is
        sharding-managed in JAX."""
        return self

    def forward(self, *args, **kwargs):
        raise NotImplementedError


class EmbeddingFeedForward(FunctionalModule):
    """MLP embedding (reference: pyprob/nn/embedding_feedforward.py:8-43)."""

    def __init__(self, input_shape, output_shape, num_layers=3,
                 activation=jax.nn.relu, activation_last=jax.nn.relu,
                 input_is_one_hot_index=False, input_one_hot_dim=None,
                 key=None):
        super().__init__()
        self._activation = activation
        self._activation_last = activation_last
        key = util.next_key() if key is None else key
        self._params = mlp_init(
            key,
            _shape_tuple(input_shape),
            _shape_tuple(output_shape),
            num_layers=num_layers,
            one_hot_dim=input_one_hot_dim if input_is_one_hot_index else None,
        )

    def forward(self, x):
        return mlp_apply(
            self._params,
            jnp.asarray(x),
            activation=self._activation,
            activation_last=self._activation_last,
        )


class EmbeddingCNN2D5C(FunctionalModule):
    """5-conv-layer 2D CNN embedding (reference:
    pyprob/nn/embedding_cnn_2d_5c.py)."""

    def __init__(self, input_shape, output_shape, key=None):
        super().__init__()
        key = util.next_key() if key is None else key
        self._params = cnn2d5c_init(
            key, _shape_tuple(input_shape), _shape_tuple(output_shape)
        )

    def forward(self, x):
        return cnn2d5c_apply(self._params, jnp.asarray(x))


class EmbeddingCNN3D5C(FunctionalModule):
    """5-conv-layer 3D CNN embedding (reference:
    pyprob/nn/embedding_cnn_3d_5c.py)."""

    def __init__(self, input_shape, output_shape, key=None):
        super().__init__()
        key = util.next_key() if key is None else key
        self._params = cnn3d5c_init(
            key, _shape_tuple(input_shape), _shape_tuple(output_shape)
        )

    def forward(self, x):
        return cnn3d5c_apply(self._params, jnp.asarray(x))


class _ProposalModule(FunctionalModule):
    """Shared machinery: holds one proposal head's params; ``forward(x,
    prior_variables)`` stacks the priors' parameters and returns the
    batched proposal distribution (batch_shape (B,)), as the reference's
    proposal modules do."""

    _kind = None

    def __init__(self, input_shape, mixture_components=10,
                 num_categories=None, event_dim=None, key=None, **_ignored):
        super().__init__()
        key = util.next_key() if key is None else key
        input_dim = int(np.prod(_shape_tuple(input_shape)))
        self._params = head_init(
            key,
            self._kind,
            input_dim,
            mixture_components=mixture_components,
            num_categories=num_categories,
            event_dim=event_dim,
        )

    @staticmethod
    def _prior_dists(prior_variables):
        dists = []
        for v in prior_variables:
            dists.append(getattr(v, "distribution", v))
        return dists

    def forward(self, x, prior_variables):
        dists = self._prior_dists(prior_variables)
        stacked = {}
        if dists:
            per_site = [prior_param_arrays(d) for d in dists]
            for k in per_site[0]:
                stacked[k] = jnp.stack(
                    [jnp.asarray(p[k], util.dtype()) for p in per_site]
                )
        return head_apply(self._params, jnp.asarray(x), stacked)


class ProposalNormalNormal(_ProposalModule):
    """Single-Normal head (reference: pyprob/nn/proposal_normal_normal.py)."""

    _kind = "normal_normal"


class ProposalNormalNormalMixture(_ProposalModule):
    """Normal-mixture head (reference:
    pyprob/nn/proposal_normal_normal_mixture.py:10-35)."""

    _kind = "normal_mixture"


class ProposalUniformBeta(_ProposalModule):
    """Single-Beta head (reference: pyprob/nn/proposal_uniform_beta.py)."""

    _kind = "uniform_beta"


class ProposalUniformBetaMixture(_ProposalModule):
    """Beta-mixture head (reference:
    pyprob/nn/proposal_uniform_beta_mixture.py)."""

    _kind = "uniform_beta_mixture"


class ProposalUniformTruncatedNormalMixture(_ProposalModule):
    """TruncatedNormal-mixture head over a Uniform prior (reference:
    pyprob/nn/proposal_uniform_truncated_normal_mixture.py)."""

    _kind = "uniform_truncated_normal_mixture"


class ProposalPoissonTruncatedNormalMixture(_ProposalModule):
    """TruncatedNormal-mixture head over a Poisson prior (reference:
    pyprob/nn/proposal_poisson_truncated_normal_mixture.py)."""

    _kind = "poisson_truncated_normal_mixture"


class ProposalCategoricalCategorical(_ProposalModule):
    """Categorical head (reference:
    pyprob/nn/proposal_categorical_categorical.py:10-21)."""

    _kind = "categorical"

    def __init__(self, input_shape, num_categories, num_layers=2, key=None):
        super().__init__(
            input_shape, num_categories=num_categories, key=key
        )


class ProposalBernoulliBernoulli(_ProposalModule):
    """Bernoulli head (reference:
    pyprob/nn/proposal_bernoulli_bernoulli.py:10-21)."""

    _kind = "bernoulli"
