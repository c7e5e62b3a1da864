"""Beyond-parity distributions (Laplace, StudentT, Dirichlet,
MultivariateNormal): moments vs MC, cross-backend agreement, jit crossing,
and end-to-end conjugate posteriors on both execution tiers."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pyprob_tpu as pp
from pyprob_tpu.distributions import (
    Laplace,
    StudentT,
    Dirichlet,
    MultivariateNormal,
    Categorical,
)


def _pairs():
    return [
        (Laplace(1.0, 2.0), Laplace(jnp.float32(1.0), jnp.float32(2.0))),
        (
            StudentT(5.0, 1.0, 2.0),
            StudentT(jnp.float32(5.0), jnp.float32(1.0), jnp.float32(2.0)),
        ),
        (Dirichlet([2.0, 3.0, 4.0]), Dirichlet(jnp.array([2.0, 3.0, 4.0]))),
        (
            MultivariateNormal(
                [0.0, 1.0], covariance_matrix=[[2.0, 0.5], [0.5, 1.0]]
            ),
            MultivariateNormal(
                jnp.array([0.0, 1.0]),
                covariance_matrix=jnp.array([[2.0, 0.5], [0.5, 1.0]]),
            ),
        ),
    ]


@pytest.mark.parametrize("idx", range(4))
def test_moments_vs_mc_both_backends(idx):
    d_np, d_jx = _pairs()[idx]
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    s_np = np.asarray(d_np.sample(rng, (100000,)), dtype=np.float64)
    s_jx = np.asarray(d_jx.sample(key, (100000,)), dtype=np.float64)
    mean = np.asarray(d_np.mean)
    var = np.asarray(d_np.variance)
    for s in (s_np, s_jx):
        assert np.allclose(s.mean(0), mean, atol=4 * np.sqrt(var.max() / 1e5) + 0.02)
        assert np.allclose(s.var(0), var, rtol=0.1, atol=0.02)


@pytest.mark.parametrize("idx", range(4))
def test_log_prob_cross_backend_and_jit(idx):
    d_np, d_jx = _pairs()[idx]
    rng = np.random.default_rng(1)
    x = np.asarray(d_np.sample(rng, (7,)))
    lp_np = np.asarray(d_np.log_prob(x))
    lp_jx = np.asarray(d_jx.log_prob(jnp.asarray(x)))
    lp_jit = np.asarray(jax.jit(lambda d, v: d.log_prob(v))(d_jx, jnp.asarray(x)))
    assert lp_np.shape == (7,)
    assert np.allclose(lp_np, lp_jx, atol=1e-4)
    assert np.allclose(lp_np, lp_jit, atol=1e-4)
    # sum=True reduces to a scalar
    assert np.ndim(np.asarray(d_np.log_prob(x, sum=True))) == 0


def test_batched_params():
    d = Laplace([0.0, 1.0], [1.0, 2.0])
    assert d.batch_shape == (2,)
    assert d.sample(np.random.default_rng(0), (5,)).shape == (5, 2)
    d = StudentT([3.0, 4.0], 0.0, 1.0)
    assert d.sample(np.random.default_rng(0), (5,)).shape == (5, 2)
    d = Dirichlet([[1.0, 2.0], [3.0, 4.0]])
    assert d.batch_shape == (2,)
    assert d.event_shape == (2,)
    s = d.sample(np.random.default_rng(0), (5,))
    assert s.shape == (5, 2, 2)
    assert d.log_prob(s).shape == (5, 2)
    L = np.array([[[1.0, 0.0], [0.3, 1.0]], [[2.0, 0.0], [0.1, 0.5]]])
    d = MultivariateNormal(np.zeros((2, 2)), scale_tril=L)
    assert d.batch_shape == (2,)
    s = d.sample(np.random.default_rng(0), (5,))
    assert s.shape == (5, 2, 2)
    assert d.log_prob(s).shape == (5, 2)


def test_mvn_log_prob_matches_dense_formula():
    cov = np.array([[2.0, 0.5], [0.5, 1.0]])
    loc = np.array([0.5, -1.0])
    d = MultivariateNormal(loc, covariance_matrix=cov)
    x = np.random.default_rng(2).normal(size=(9, 2))
    diff = x - loc
    expected = (
        -0.5 * np.einsum("ni,ij,nj->n", diff, np.linalg.inv(cov), diff)
        - 0.5 * np.log(np.linalg.det(cov))
        - np.log(2 * np.pi)
    )
    assert np.allclose(np.asarray(d.log_prob(x)), expected, atol=1e-4)


def test_laplace_cdf_icdf_roundtrip():
    d = Laplace(1.0, 2.0)
    u = np.linspace(0.01, 0.99, 17)
    assert np.allclose(np.asarray(d.cdf(d.icdf(u))), u, atol=1e-5)


def test_student_t_undefined_moments():
    assert np.isnan(np.asarray(StudentT(0.5).mean))
    assert np.isinf(np.asarray(StudentT(1.5).variance))
    assert np.isnan(np.asarray(StudentT(0.5).variance))


class DirCatModel(pp.Model):
    def forward(self):
        p = pp.sample(Dirichlet(jnp.ones(3)))
        lik = Categorical(probs=p)
        pp.observe(lik, name="o0")
        pp.observe(lik, name="o1")
        pp.observe(lik, name="o2")
        return p


class MVNConjugate(pp.Model):
    def forward(self):
        x = pp.sample(
            MultivariateNormal(jnp.zeros(2), covariance_matrix=jnp.eye(2))
        )
        pp.observe(
            MultivariateNormal(x, covariance_matrix=jnp.eye(2)), name="y"
        )
        return x


@pytest.mark.parametrize("vectorized", [True, False])
def test_dirichlet_categorical_posterior(vectorized):
    # obs counts (2,1,0) with flat Dirichlet(1,1,1) prior ->
    # posterior Dirichlet(3,2,1), mean (1/2, 1/3, 1/6)
    m = DirCatModel()
    post = m.posterior_results(
        num_traces=20000 if vectorized else 2000,
        observe={"o0": 0, "o1": 0, "o2": 1},
        vectorized=vectorized,
    )
    mean = np.asarray(post.mean, dtype=np.float64)
    assert np.allclose(mean, [0.5, 1 / 3, 1 / 6], atol=0.06)


@pytest.mark.parametrize("vectorized", [True, False])
def test_mvn_conjugate_posterior(vectorized):
    # prior N(0, I), likelihood N(x, I), y = (2, 0) -> posterior
    # N((1, 0), I/2)
    m = MVNConjugate()
    post = m.posterior_results(
        num_traces=20000 if vectorized else 2000,
        observe={"y": np.array([2.0, 0.0])},
        vectorized=vectorized,
    )
    mean = np.asarray(post.mean, dtype=np.float64)
    var = np.asarray(post.variance, dtype=np.float64)
    assert np.allclose(mean, [1.0, 0.0], atol=0.12)
    assert np.allclose(var, [0.5, 0.5], atol=0.12)
