"""Distribution unit tests, mirroring the reference suite's strategy
(reference: tests/test_distributions.py): shapes, batching, moment checks
against analytic values, cross-backend (numpy vs jnp) log-prob agreement,
and Empirical container ops across storage modes."""

import math
import os
import tempfile
import uuid

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pyprob_tpu as pp
from pyprob_tpu import util
from pyprob_tpu.distributions import (
    Distribution,
    Normal,
    Uniform,
    Categorical,
    Bernoulli,
    Binomial,
    Poisson,
    Exponential,
    Gamma,
    Beta,
    LogNormal,
    VonMises,
    Weibull,
    TruncatedNormal,
    Mixture,
    Factor,
    Empirical,
    EmpiricalType,
)


def _mc_check(dist, n=20000, atol_extra=0.06, check_var=True):
    rng = util.get_rng()
    m = np.asarray(dist.mean, dtype=np.float64)
    v = np.asarray(dist.variance, dtype=np.float64)
    s = np.asarray(dist.sample(rng, (n,)), dtype=np.float64)
    assert np.allclose(s.mean(0), m, atol=4 * np.sqrt(v / n) + atol_extra)
    if check_var:
        assert np.allclose(s.var(0), v, rtol=0.2, atol=0.05)
    key = jax.random.PRNGKey(7)
    sj = np.asarray(dist.sample(key, (n,)), dtype=np.float64)
    assert np.allclose(sj.mean(0), m, atol=4 * np.sqrt(v / n) + atol_extra)
    # cross-backend log_prob agreement
    x = s[:16]
    lp_np = np.asarray(dist.log_prob(x), dtype=np.float64)
    lp_j = np.asarray(dist.log_prob(jnp.asarray(x, jnp.float32)), dtype=np.float64)
    assert np.allclose(lp_np, lp_j, rtol=1e-3, atol=1e-3)


def test_normal():
    d = Normal(2.0, 3.0)
    _mc_check(d)
    assert np.isclose(float(d.log_prob(2.0)), -math.log(3.0 * math.sqrt(2 * math.pi)))
    assert np.isclose(float(d.cdf(2.0)), 0.5)
    assert np.isclose(float(d.icdf(0.5)), 2.0, atol=1e-5)


def test_normal_batched():
    d = Normal(np.zeros((2, 3)), np.ones((2, 3)))
    assert d.batch_shape == (2, 3)
    s = d.sample(util.get_rng())
    assert s.shape == (2, 3)
    assert np.asarray(d.log_prob(s)).shape == (2, 3)
    assert np.isclose(
        float(d.log_prob(s, sum=True)), float(np.sum(np.asarray(d.log_prob(s))))
    )


def test_uniform():
    d = Uniform(1.0, 3.0)
    _mc_check(d)
    assert float(d.log_prob(0.5)) == -np.inf
    assert np.isclose(float(d.log_prob(2.0)), -math.log(2.0))


def test_categorical():
    d = Categorical(probs=[0.1, 0.2, 0.7])
    assert d.num_categories == 3
    assert "len_probs:3" in d.address_suffix
    rng = util.get_rng()
    s = d.sample(rng, (20000,))
    freq = np.bincount(np.asarray(s, dtype=np.int64), minlength=3) / 20000
    assert np.allclose(freq, [0.1, 0.2, 0.7], atol=0.02)
    assert np.isclose(float(d.log_prob(2)), math.log(0.7), atol=1e-5)
    key = jax.random.PRNGKey(3)
    sj = np.asarray(d.sample(key, (20000,)))
    freqj = np.bincount(sj.astype(np.int64), minlength=3) / 20000
    assert np.allclose(freqj, [0.1, 0.2, 0.7], atol=0.02)


def test_categorical_batched():
    d = Categorical(probs=np.array([[0.5, 0.5], [0.1, 0.9]]))
    assert d.batch_shape == (1,) or d.batch_shape == (2,)
    s = d.sample(util.get_rng())
    assert np.asarray(s).shape == (2,)
    lp = d.log_prob(np.array([0, 1]))
    assert np.allclose(np.asarray(lp), [math.log(0.5), math.log(0.9)], atol=1e-5)


def test_bernoulli():
    _mc_check(Bernoulli(probs=0.3))


def test_binomial():
    _mc_check(Binomial(10, probs=0.4))


def test_poisson():
    _mc_check(Poisson(4.0))


def test_exponential():
    _mc_check(Exponential(2.0))


def test_gamma():
    _mc_check(Gamma(2.0, 3.0))


def test_beta():
    _mc_check(Beta(2.0, 3.0))


def test_beta_low_high():
    # affine support rescaling (reference: beta.py:37-47)
    d = Beta(2.0, 3.0, low=1.0, high=5.0)
    _mc_check(d)
    assert float(d.log_prob(0.5)) == -np.inf
    assert float(d.log_prob(6.0)) == -np.inf
    base = Beta(2.0, 3.0)
    x = 2.0
    assert np.isclose(
        float(d.log_prob(x)),
        float(base.log_prob((x - 1.0) / 4.0)) - math.log(4.0),
        atol=1e-5,
    )


def test_log_normal():
    _mc_check(LogNormal(0.5, 0.5))


def test_von_mises():
    d = VonMises(0.5, 4.0)
    rng = util.get_rng()
    s = np.asarray(d.sample(rng, (20000,)), dtype=np.float64)
    assert abs(s.mean() - 0.5) < 0.05
    key = jax.random.PRNGKey(11)
    sj = np.asarray(d.sample(key, (20000,)), dtype=np.float64)
    assert abs(sj.mean() - 0.5) < 0.05
    lp_np = np.asarray(d.log_prob(s[:8]))
    lp_j = np.asarray(d.log_prob(jnp.asarray(s[:8], jnp.float32)))
    assert np.allclose(lp_np, lp_j, atol=1e-3)
    # density integrates to 1 over the circle
    xs = np.linspace(-math.pi, math.pi, 10001)
    assert np.isclose(np.trapezoid(np.exp(np.asarray(d.log_prob(xs))), xs), 1.0, atol=1e-3)


def test_weibull():
    _mc_check(Weibull(2.0, 1.5))


def test_truncated_normal():
    d = TruncatedNormal(2.0, 3.0, low=-1.0, high=4.0)
    _mc_check(d)
    assert float(d.log_prob(-2.0)) == -np.inf
    assert float(d.log_prob(5.0)) == -np.inf
    # density integrates to 1 inside support
    xs = np.linspace(-1.0, 4.0, 10001)
    assert np.isclose(np.trapezoid(np.exp(np.asarray(d.log_prob(xs))), xs), 1.0, atol=1e-3)
    # clamp option
    d2 = TruncatedNormal(10.0, 1.0, low=-1.0, high=4.0, clamp_mean_between_low_high=True)
    assert float(d2.mean_non_truncated) == 4.0


def test_mixture():
    d = Mixture([Normal(-2.0, 1.0), Normal(2.0, 0.5)], probs=[0.3, 0.7])
    _mc_check(d)
    # logsumexp log_prob
    expected = np.logaddexp(
        math.log(0.3) + float(Normal(-2.0, 1.0).log_prob(0.0)),
        math.log(0.7) + float(Normal(2.0, 0.5).log_prob(0.0)),
    )
    assert np.isclose(float(d.log_prob(0.0)), expected, atol=1e-5)


def test_mixture_batched():
    means = np.array([[-2.0, 2.0], [0.0, 5.0]])
    d = Mixture(
        [Normal(means[:, 0], 1.0), Normal(means[:, 1], 1.0)],
        probs=np.array([[0.5, 0.5], [0.1, 0.9]]),
    )
    s = d.sample(util.get_rng())
    assert np.asarray(s).shape == (2,)
    lp = d.log_prob(np.array([0.0, 5.0]))
    assert np.asarray(lp).shape == (2,)


def test_factor():
    f = Factor(log_prob=-1.5)
    assert float(f.log_prob(None)) == -1.5
    f2 = Factor(log_prob_func=lambda x: -x * x)
    assert float(f2.log_prob(2.0)) == -4.0


def test_kl_divergence():
    kl = Distribution.kl_divergence(Normal(0.0, 1.0), Normal(0.0, 1.0))
    assert np.isclose(float(kl), 0.0)
    kl = Distribution.kl_divergence(Normal(0.0, 1.0), Normal(1.0, 2.0))
    assert float(kl) > 0
    kl = Distribution.kl_divergence(
        Categorical(probs=[0.5, 0.5]), Categorical(probs=[0.5, 0.5])
    )
    assert np.isclose(float(kl), 0.0, atol=1e-6)


def test_jit_pytree_crossing():
    @jax.jit
    def f(d, x):
        return d.log_prob(x)

    for d in [
        Normal(0.0, 1.0),
        TruncatedNormal(0.0, 1.0, -1.0, 2.0),
        Mixture([Normal(0.0, 1.0), Normal(5.0, 1.0)], probs=jnp.array([0.5, 0.5])),
    ]:
        lp = f(d, jnp.asarray(0.5))
        lp_host = d.to_numpy().log_prob(0.5) if not isinstance(d, Mixture) else None
        if lp_host is not None:
            assert np.isclose(float(lp), float(lp_host), atol=1e-5)


# ---------------------------------------------------------------------------
# Empirical
# ---------------------------------------------------------------------------


def test_empirical_basic():
    values = [1.0, 2.0, 3.0]
    log_weights = [1.0, 2.0, 3.0]
    e = Empirical(values=values, log_weights=log_weights)
    w = np.exp(np.asarray(log_weights, dtype=np.float64))
    w = w / w.sum()
    expected_mean = float((w * np.asarray(values)).sum())
    assert np.isclose(float(e.mean), expected_mean)
    expected_var = float((w * (np.asarray(values) - expected_mean) ** 2).sum())
    assert np.isclose(float(e.variance), expected_var)
    assert e.length == 3
    assert float(e.min) == 1.0 and float(e.max) == 3.0


def test_empirical_weights_arg():
    e = Empirical(values=[0.0, 1.0], weights=[0.2, 0.8])
    assert np.isclose(float(e.mean), 0.8)


def test_empirical_sampling_frequencies():
    e = Empirical(values=[0.0, 1.0], weights=[0.25, 0.75])
    s = np.asarray([e.sample() for _ in range(4000)])
    assert abs(s.mean() - 0.75) < 0.04


def test_empirical_unweighted_resample_thin():
    e = Empirical(values=list(range(100)), log_weights=list(np.linspace(0, 1, 100)))
    r = e.resample(50)
    assert r.length == 50
    assert np.allclose(r.weights, 1.0 / 50)
    t = e.thin(10)
    assert t.length == 10
    u = e.unweighted()
    assert np.allclose(u.weights, 1.0 / 100)


def test_empirical_map_filter_combine():
    e = Empirical(values=[1, 2, 3, 2], log_weights=[0.0, 0.0, 0.0, 0.0])
    m = e.map(lambda x: x * 10)
    assert m.get_values() == [10, 20, 30, 20]
    f = e.filter(lambda x: x > 1)
    assert f.length == 3
    c = e.combine_duplicates()
    assert c.length == 3
    assert np.isclose(float(c.mean), float(e.mean))
    assert e.mode == 2


def test_empirical_expectation_median():
    e = Empirical(values=[1.0, 2.0, 3.0, 4.0], log_weights=[0.0, 0.0, 0.0, 0.0])
    assert np.isclose(float(e.expectation(lambda x: x * x)), 7.5)
    assert float(e.median) in (2.0, 3.0)


def test_empirical_slice():
    e = Empirical(values=list(range(10)))
    s = e[2:5]
    assert s.get_values() == [2, 3, 4]
    assert e[3] == 3
    assert e[-1] == 9


def test_empirical_file_roundtrip(tmp_path):
    fn = str(tmp_path / "emp_file")
    e = Empirical(values=[1.0, 2.0, 3.0], log_weights=[0.0, 0.0, 1.0], file_name=fn)
    mean1 = float(e.mean)
    e.close()
    e2 = Empirical(file_name=fn)
    assert e2.length == 3
    assert np.isclose(float(e2.mean), mean1)
    # append across runs (reference: tests/test_model.py:59-77)
    e2.add(4.0, log_weight=0.0)
    e2.finalize()
    assert e2.length == 4
    e2.close()
    e3 = Empirical(file_name=fn)
    assert e3.length == 4
    e3.close()


def test_empirical_concat_memory():
    e1 = Empirical(values=[1.0, 2.0], log_weights=[0.0, 0.0])
    e2 = Empirical(values=[3.0, 4.0], log_weights=[0.0, 0.0])
    c = Empirical(concat_empiricals=[e1, e2])
    assert c.length == 4
    assert np.isclose(float(c.mean), 2.5)


def test_empirical_concat_file(tmp_path):
    fns = []
    for i in range(3):
        fn = str(tmp_path / f"chunk_{i}")
        e = Empirical(
            values=[float(i * 2), float(i * 2 + 1)], log_weights=[0.0, 0.0], file_name=fn
        )
        e.close()
        fns.append(fn)
    c = Empirical(concat_empirical_file_names=fns)
    assert c.length == 6
    assert np.isclose(float(c.mean), 2.5)
    copied = c.copy()
    c.close()
    assert copied.length == 6
    assert np.isclose(float(copied.mean), 2.5)


def test_empirical_copy_across_storage(tmp_path):
    mem = Empirical(values=[1.0, 2.0], log_weights=[0.0, 1.0])
    fn = str(tmp_path / "copy_target")
    on_disk = mem.copy(file_name=fn)
    assert on_disk.empirical_type == EmpiricalType.FILE
    assert np.isclose(float(on_disk.mean), float(mem.mean))
    back = on_disk.copy()
    assert back.empirical_type == EmpiricalType.MEMORY
    assert np.isclose(float(back.mean), float(mem.mean))
    on_disk.close()


def test_empirical_ess():
    e = Empirical(values=[1.0, 2.0, 3.0, 4.0], log_weights=[0.0, 0.0, 0.0, 0.0])
    assert np.isclose(e.effective_sample_size, 4.0)
    e2 = Empirical(values=[1.0, 2.0], log_weights=[0.0, -100.0])
    assert np.isclose(e2.effective_sample_size, 1.0, atol=1e-5)


def test_empirical_metadata():
    e = Empirical(values=[1.0, 2.0])
    m = e.map(lambda x: x)
    assert any(entry.get("op") == "map" for entry in m.metadata)


def test_empirical_density_estimate():
    rng = util.get_rng()
    e = Empirical(values=list(rng.normal(3.0, 1.0, size=500)))
    d = e.density_estimate(num_components=1)
    assert abs(float(d.mean) - 3.0) < 0.3
