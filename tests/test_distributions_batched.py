"""Systematic batched-shape coverage across all distributions
(reference: tests/test_distributions.py exercises shapes 2, 2x1, 2x3...)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyprob_tpu import util
from pyprob_tpu.distributions import (
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
    Empirical,
    EmpiricalType,
)

BATCH_SHAPES = [(2,), (2, 1), (2, 3)]


def _make(dist_name, shape):
    ones = np.ones(shape, dtype=np.float32)
    return {
        "Normal": lambda: Normal(0.0 * ones, 1.0 * ones),
        "Uniform": lambda: Uniform(0.0 * ones, 2.0 * ones),
        "Bernoulli": lambda: Bernoulli(probs=0.3 * ones),
        "Binomial": lambda: Binomial(5 * ones, probs=0.4 * ones),
        "Poisson": lambda: Poisson(3.0 * ones),
        "Exponential": lambda: Exponential(2.0 * ones),
        "Gamma": lambda: Gamma(2.0 * ones, 3.0 * ones),
        "Beta": lambda: Beta(2.0 * ones, 3.0 * ones),
        "LogNormal": lambda: LogNormal(0.0 * ones, 1.0 * ones),
        "VonMises": lambda: VonMises(0.0 * ones, 2.0 * ones),
        "Weibull": lambda: Weibull(1.0 * ones, 2.0 * ones),
        "TruncatedNormal": lambda: TruncatedNormal(
            0.0 * ones, 1.0 * ones, -2.0 * ones, 2.0 * ones
        ),
    }[dist_name]()


DIST_NAMES = [
    "Normal",
    "Uniform",
    "Bernoulli",
    "Binomial",
    "Poisson",
    "Exponential",
    "Gamma",
    "Beta",
    "LogNormal",
    "VonMises",
    "Weibull",
    "TruncatedNormal",
]


@pytest.mark.parametrize("dist_name", DIST_NAMES)
@pytest.mark.parametrize("shape", BATCH_SHAPES)
def test_batched_sample_and_log_prob_shapes(dist_name, shape):
    d = _make(dist_name, shape)
    assert d.batch_shape == shape
    # host path
    s = d.sample(util.get_rng())
    assert np.shape(s) == shape
    lp = d.log_prob(s)
    assert np.shape(lp) == shape
    assert np.isfinite(np.asarray(lp)).all()
    assert np.isclose(
        float(d.log_prob(s, sum=True)), float(np.sum(np.asarray(lp))), rtol=1e-5
    )
    # sample_shape prefix
    s5 = d.sample(util.get_rng(), (5,))
    assert np.shape(s5) == (5,) + shape
    # jax path
    key = jax.random.PRNGKey(0)
    sj = d.sample(key)
    assert sj.shape == shape
    lpj = d.log_prob(sj)
    assert lpj.shape == shape
    assert np.isfinite(np.asarray(lpj)).all()
    sj5 = d.sample(key, (5,))
    assert sj5.shape == (5,) + shape
    # moments broadcast to batch shape
    try:
        assert np.broadcast_shapes(np.shape(d.mean), shape) == shape
        assert np.broadcast_shapes(np.shape(d.variance), shape) == shape
    except NotImplementedError:
        pass


@pytest.mark.parametrize("shape", BATCH_SHAPES)
def test_batched_categorical(shape):
    probs = np.broadcast_to(
        np.asarray([0.2, 0.3, 0.5], np.float32), shape + (3,)
    )
    d = Categorical(probs=probs)
    assert d.batch_shape == shape
    s = d.sample(util.get_rng())
    assert np.shape(s) == shape
    lp = d.log_prob(s)
    assert np.shape(lp) == shape
    key = jax.random.PRNGKey(0)
    sj = d.sample(key)
    assert sj.shape == shape
    assert d.log_prob(sj).shape == shape


@pytest.mark.parametrize("shape", [(2,), (4,)])
def test_batched_mixture(shape):
    ones = np.ones(shape, np.float32)
    d = Mixture(
        [Normal(-1.0 * ones, 1.0 * ones), Normal(1.0 * ones, 1.0 * ones)],
        probs=np.broadcast_to(np.asarray([0.4, 0.6], np.float32), shape + (2,)),
    )
    assert d.batch_shape == shape
    s = d.sample(util.get_rng())
    assert np.shape(s) == shape
    assert np.shape(d.log_prob(s)) == shape
    key = jax.random.PRNGKey(0)
    sj = d.sample(key)
    assert sj.shape == shape
    assert d.log_prob(sj).shape == shape
    assert np.shape(d.mean) == shape


def test_empirical_copy_storage_combos(tmp_path):
    # copy across storage-type combinations (reference: test_distributions.py
    # Empirical copy across all 4 storage-type combos)
    mem = Empirical(values=[1.0, 2.0, 3.0], log_weights=[0.0, 0.5, 1.0])
    f1 = mem.copy(file_name=str(tmp_path / "f1"))
    assert f1.empirical_type == EmpiricalType.FILE
    f2 = f1.copy(file_name=str(tmp_path / "f2"))
    mem2 = f2.copy()
    assert mem2.empirical_type == EmpiricalType.MEMORY
    assert np.isclose(float(mem2.mean), float(mem.mean))
    # concat -> memory copy
    cat = Empirical(concat_empiricals=[mem, mem2])
    cat_mem = cat.copy()
    assert cat_mem.length == 6
    # concat file mode -> file copy
    catf = Empirical(
        concat_empirical_file_names=[str(tmp_path / "f1"), str(tmp_path / "f2")]
    )
    f3 = catf.copy(file_name=str(tmp_path / "f3"))
    assert f3.length == 6
    assert np.isclose(float(f3.mean), float(cat_mem.mean))
    for e in (f1, f2, f3, catf):
        e.close()


def test_empirical_vector_values():
    vals = [np.asarray([i, 2.0 * i], np.float32) for i in range(10)]
    e = Empirical(values=vals)
    assert np.shape(e.mean) == (2,)
    assert np.isclose(float(e.mean[1]), 2.0 * float(e.mean[0]))
    s = e.sample(sample_shape=(4,))
    assert np.shape(s) == (4, 2)
