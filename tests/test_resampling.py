"""Resampling schemes (beyond parity — the reference resamples only via
Empirical's multinomial Categorical draws, pyprob/distributions/empirical.py:392-408).

Covers parallel.collectives.resample_indices (systematic / stratified /
residual / multinomial), the interpreter-tier host mirror, and the
``resampling=`` plumbing through SMC and tempered SMC.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pyprob_tpu as pp
from pyprob_tpu.distributions import Normal, Uniform
from pyprob_tpu.parallel import resample_indices, RESAMPLING_SCHEMES
from pyprob_tpu.inference.smc import _host_resample_indices

SMC = pp.InferenceEngine.SEQUENTIAL_MONTE_CARLO

W = np.array([0.05, 0.35, 0.1, 0.4, 0.1])
LOG_W = np.log(W) + 3.0  # unnormalized on purpose
N = 4096


@pytest.mark.parametrize("scheme", sorted(RESAMPLING_SCHEMES))
def test_device_scheme_counts(scheme):
    idx = np.asarray(
        resample_indices(jax.random.PRNGKey(7), jnp.asarray(LOG_W), N, scheme)
    )
    assert idx.shape == (N,)
    assert idx.min() >= 0 and idx.max() < W.size
    counts = np.bincount(idx, minlength=W.size).astype(float)
    expected = N * W
    if scheme == "systematic":
        # single-offset guarantee: floor(Nw) <= count <= ceil(Nw)
        assert (counts >= np.floor(expected) - 1e-9).all()
        assert (counts <= np.ceil(expected) + 1e-9).all()
    elif scheme == "stratified":
        # per-stratum uniforms: counts can land one outside the systematic
        # bound depending on stratum alignment (Douc et al. 2005), so allow
        # floor(Nw)-1 .. ceil(Nw)+1 rather than pinning to the fixed seed.
        assert (counts >= np.floor(expected) - 1 - 1e-9).all()
        assert (counts <= np.ceil(expected) + 1 + 1e-9).all()
    elif scheme == "residual":
        assert (counts >= np.floor(expected) - 1e-9).all()
        assert np.abs(counts - expected).max() < 5 * math.sqrt(N)
    else:  # multinomial: counts ~ Binomial(N, w)
        std = np.sqrt(N * W * (1 - W))
        assert (np.abs(counts - expected) < 5 * std + 1).all()


@pytest.mark.parametrize("scheme", sorted(RESAMPLING_SCHEMES))
def test_host_scheme_counts(scheme):
    rng = np.random.default_rng(11)
    idx = _host_resample_indices(rng, LOG_W.astype(np.float64), N, scheme)
    assert idx.shape == (N,)
    counts = np.bincount(idx, minlength=W.size).astype(float)
    expected = N * W
    if scheme in ("systematic", "stratified", "residual"):
        assert (counts >= np.floor(expected) - 1e-9).all()
        assert np.abs(counts - expected).max() < 5 * math.sqrt(N)
    else:
        std = np.sqrt(N * W * (1 - W))
        assert (np.abs(counts - expected) < 5 * std + 1).all()


def test_residual_exact_weights_all_deterministic():
    # weights exactly multiples of 1/N: no residual mass, fully deterministic
    lw = np.log(np.array([0.25, 0.5, 0.25]))
    idx = np.asarray(
        resample_indices(jax.random.PRNGKey(0), jnp.asarray(lw), 8, "residual")
    )
    assert (np.bincount(idx, minlength=3) == [2, 4, 2]).all()
    rng = np.random.default_rng(0)
    hidx = _host_resample_indices(rng, lw, 8, "residual")
    assert (np.bincount(hidx, minlength=3) == [2, 4, 2]).all()


def test_unknown_scheme_raises():
    with pytest.raises(ValueError, match="Unknown resampling scheme"):
        resample_indices(jax.random.PRNGKey(0), jnp.asarray(LOG_W), 8, "bogus")
    with pytest.raises(ValueError, match="Unknown resampling scheme"):
        _host_resample_indices(np.random.default_rng(0), LOG_W, 8, "bogus")


class GUM(pp.Model):
    def forward(self):
        mu = pp.sample(Normal(1.0, math.sqrt(5.0)))
        lik = Normal(mu, math.sqrt(2.0))
        pp.observe(lik, name="obs0")
        pp.observe(lik, name="obs1")
        return mu


GUM_OBS = {"obs0": 8.0, "obs1": 9.0}
GUM_LOGZ = float(
    -np.log(2 * np.pi)
    - 0.5 * np.log(np.linalg.det([[7.0, 5.0], [5.0, 7.0]]))
    - 0.5
    * np.array([7.0, 8.0])
    @ np.linalg.inv([[7.0, 5.0], [5.0, 7.0]])
    @ np.array([7.0, 8.0])
)


@pytest.mark.parametrize("scheme", ["stratified", "residual", "multinomial"])
def test_smc_gum_all_schemes(scheme):
    m = GUM()
    post = m.posterior_results(
        num_traces=20000, observe=GUM_OBS, inference_engine=SMC,
        resample_threshold=1.0, resampling=scheme,
    )
    assert abs(float(post.mean) - 7.25) < 0.25
    assert abs(float(post.stddev) - math.sqrt(1 / 1.2)) < 0.12
    assert abs(post.log_evidence - GUM_LOGZ) < 0.3
    assert post.metadata[-1]["resampling"] == scheme


def test_smc_invalid_scheme_raises():
    with pytest.raises(ValueError, match="Unknown resampling scheme"):
        GUM().posterior_results(
            num_traces=100, observe=GUM_OBS, inference_engine=SMC,
            resampling="bogus",
        )


class MarsagliaGUM(pp.Model):
    """Host-divergent control flow: forces the interpreter SMC tier."""

    def marsaglia(self, mean, stddev):
        while True:
            x = pp.sample(Uniform(-1.0, 1.0))
            y = pp.sample(Uniform(-1.0, 1.0))
            s = float(x**2 + y**2)
            if 0.0 < s < 1.0:
                return mean + stddev * x * math.sqrt(-2.0 * math.log(s) / s)

    def forward(self):
        mu = self.marsaglia(1.0, math.sqrt(5.0))
        lik = Normal(mu, math.sqrt(2.0))
        pp.observe(lik, name="obs0")
        pp.observe(lik, name="obs1")
        return mu


def test_interpreter_smc_stratified():
    m = MarsagliaGUM()
    post = m.posterior_results(
        num_traces=600, observe=GUM_OBS, inference_engine=SMC,
        resample_threshold=1.0, resampling="stratified",
    )
    assert post.metadata[-1]["vectorized"] is False
    assert post.metadata[-1]["resampling"] == "stratified"
    assert abs(float(post.mean) - 7.25) < 0.6
    assert abs(post.log_evidence - GUM_LOGZ) < 1.0


def test_tempered_smc_residual():
    m = GUM()
    post = m.posterior_results(
        num_traces=2048,
        observe=GUM_OBS,
        inference_engine=pp.InferenceEngine.TEMPERED_SMC,
        resampling="residual",
    )
    assert abs(float(post.mean) - 7.25) < 0.3
    assert abs(post.log_evidence - GUM_LOGZ) < 0.5
    assert post.metadata[-1]["resampling"] == "residual"
