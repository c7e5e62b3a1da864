"""NN shape and layer tests (reference: tests/test_nn.py:10-57)."""

import numpy as np
import jax
import jax.numpy as jnp

import pyprob_tpu as pp
from pyprob_tpu.nn import (
    mlp_init,
    mlp_apply,
    lstm_init,
    lstm_apply,
    lstm_step,
    lstm_zero_state,
    cnn2d5c_init,
    cnn2d5c_apply,
    cnn3d5c_init,
    cnn3d5c_apply,
    head_init,
    head_apply,
    larc_scale,
    num_params,
)


def _key():
    return jax.random.PRNGKey(0)


def test_mlp_shapes():
    p = mlp_init(_key(), (10,), (32,), num_layers=2)
    out = mlp_apply(p, jnp.ones((7, 10)))
    assert out.shape == (7, 32)


def test_mlp_one_hot():
    p = mlp_init(_key(), (1,), (8,), num_layers=1, one_hot_dim=5)
    out = mlp_apply(p, jnp.asarray([1, 3, 4]))
    assert out.shape == (3, 8)


def test_mlp_grads_exclude_meta():
    p = mlp_init(_key(), (4,), (2,), num_layers=2)
    g = jax.grad(lambda q: mlp_apply(q, jnp.ones((1, 4))).sum())(p)
    assert jax.tree_util.tree_structure(g) == jax.tree_util.tree_structure(p)


def test_lstm_shapes():
    p = lstm_init(_key(), 12, 16, depth=2)
    outs, (h, c) = lstm_apply(p, jnp.ones((5, 3, 12)))
    assert outs.shape == (5, 3, 16)
    assert h.shape == (2, 3, 16)
    # stepwise == scan
    state = lstm_zero_state(p, (3,))
    xs = jax.random.normal(_key(), (5, 3, 12))
    outs_scan, _ = lstm_apply(p, xs)
    step_outs = []
    for t in range(5):
        o, state = lstm_step(p, xs[t], state)
        step_outs.append(o)
    assert np.allclose(np.asarray(jnp.stack(step_outs)), np.asarray(outs_scan), atol=1e-5)


def test_cnn2d_shapes():
    p = cnn2d5c_init(_key(), (1, 28, 28), (32,))
    out = cnn2d5c_apply(p, jnp.ones((2, 1, 28, 28)))
    assert out.shape == (2, 32)


def test_cnn3d_shapes():
    p = cnn3d5c_init(_key(), (1, 16, 16, 16), (16,))
    out = cnn3d5c_apply(p, jnp.ones((2, 1, 16, 16, 16)))
    assert out.shape == (2, 16)


def test_head_normal_mixture():
    p = head_init(_key(), "normal_mixture", 32, mixture_components=4)
    d = head_apply(
        p,
        jnp.ones((5, 32)),
        {"mean": jnp.zeros(5), "stddev": jnp.ones(5)},
    )
    lp = d.log_prob(jnp.zeros(5))
    assert np.asarray(lp).shape == (5,)
    s = d._sample_jax(_key(), ())
    assert np.asarray(s).shape == (5,)


def test_head_uniform_tnorm_mixture():
    p = head_init(_key(), "uniform_truncated_normal_mixture", 32)
    d = head_apply(
        p,
        jnp.ones((3, 32)),
        {"low": jnp.zeros(3), "high": jnp.ones(3) * 2},
    )
    s = np.asarray(d._sample_jax(_key(), ()))
    assert ((s >= 0) & (s <= 2)).all()


def test_head_categorical():
    p = head_init(_key(), "categorical", 32, num_categories=4)
    d = head_apply(p, jnp.ones((3, 32)), {})
    assert d.num_categories == 4
    lp = d.log_prob(jnp.asarray([0, 1, 3]))
    assert np.isfinite(np.asarray(lp)).all()


def test_head_bernoulli():
    p = head_init(_key(), "bernoulli", 32)
    d = head_apply(p, jnp.ones((3, 32)), {})
    lp = d.log_prob(jnp.asarray([0.0, 1.0, 1.0]))
    assert np.isfinite(np.asarray(lp)).all()


def test_larc_scale():
    params = {"a": jnp.ones((4, 4)), "b": jnp.ones(4)}
    grads = {"a": jnp.ones((4, 4)) * 100.0, "b": jnp.zeros(4)}
    out = larc_scale(grads, params, learning_rate=0.1)
    # large grad gets scaled down
    assert float(jnp.abs(out["a"]).max()) < 100.0
    assert num_params(params) == 20
