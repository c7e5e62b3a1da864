"""Pallas kernel tests: numerical equivalence against the jnp reference
implementations (interpret mode on CPU; compiled on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyprob_tpu import ops
from pyprob_tpu.ops import kernels as K
from pyprob_tpu.distributions import Mixture, Normal, TruncatedNormal


@pytest.fixture
def pallas_interpret():
    from jax.experimental.pallas import tpu as pltpu

    K.set_use_pallas(True)
    with pltpu.force_tpu_interpret_mode():
        yield
    K.set_use_pallas(None)


def _rand(shape, lo=0.0, hi=1.0, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(lo, hi, shape), jnp.float32)


def test_mixture_normal_kernel(pallas_interpret):
    B, Kc = 200, 10
    x = _rand((B,), -3, 3, 1)
    means = _rand((B, Kc), -2, 2, 2)
    stddevs = _rand((B, Kc), 0.5, 2, 3)
    logits = jax.nn.log_softmax(_rand((B, Kc), -1, 1, 4), axis=1)
    out = K.mixture_normal_log_prob(x, means, stddevs, logits)
    ref = K._mixture_normal_ref(x, means, stddevs, logits)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_mixture_tnorm_kernel(pallas_interpret):
    B, Kc = 100, 10
    x = _rand((B,), -1.5, 1.5, 1)
    means = _rand((B, Kc), -1, 1, 2)
    stddevs = _rand((B, Kc), 0.5, 2, 3)
    logits = jax.nn.log_softmax(_rand((B, Kc), -1, 1, 4), axis=1)
    low = jnp.full((B,), -2.0)
    high = jnp.full((B,), 2.0)
    out = K.mixture_truncated_normal_log_prob(x, means, stddevs, logits, low, high)
    ref = K._mixture_tnorm_ref(x, means, stddevs, logits, low, high)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_log_weight_stats_kernel(pallas_interpret):
    lw = _rand((5000,), -10, 2, 7)
    m, s1, s2 = K.log_weight_stats(lw)
    rm, rs1, rs2 = K._log_weight_stats_ref(lw)
    assert np.isclose(float(m), float(rm))
    assert np.isclose(float(s1), float(rs1), rtol=1e-5)
    assert np.isclose(float(s2), float(rs2), rtol=1e-5)


def test_fused_mixture_grads_match(pallas_interpret):
    B, Kc = 64, 10
    means = _rand((B, Kc), -2, 2, 2)
    stddevs = _rand((B, Kc), 0.5, 2, 3)
    coeffs = jax.nn.softmax(_rand((B, Kc), -1, 1, 4), axis=1)
    x = _rand((B,), -3, 3, 1)

    def loss(m_):
        mix = Mixture(
            [Normal(m_[:, i], stddevs[:, i]) for i in range(Kc)], probs=coeffs
        )
        return jnp.sum(mix.log_prob(x))

    g_fused = jax.grad(loss)(means)
    K.set_use_pallas(False)
    g_ref = jax.grad(loss)(means)
    assert np.allclose(np.asarray(g_fused), np.asarray(g_ref), atol=1e-5)


def test_mixture_dispatch_conditions():
    # heterogeneous mixture must NOT take the fused path
    K.set_use_pallas(True)
    try:
        mix = Mixture(
            [Normal(jnp.zeros(4), jnp.ones(4)),
             TruncatedNormal(jnp.zeros(4), jnp.ones(4), -1.0, 1.0)],
            probs=jnp.full((4, 2), 0.5),
        )
        assert mix._fused_log_prob(jnp.zeros(4)) is None
    finally:
        K.set_use_pallas(None)


def test_erf_poly_accuracy():
    """The in-kernel erf approximation (A&S 7.1.26; Pallas TPU has no erf
    lowering) must match lax.erf to f32 resolution across the full range."""
    x = jnp.linspace(-6.0, 6.0, 20001)
    err = np.abs(np.asarray(K._erf_poly(x)) - np.asarray(jax.lax.erf(x)))
    assert err.max() < 1e-6
