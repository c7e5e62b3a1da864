"""Predictive model comparison (beyond parity, pyprob_tpu/diagnostics.py):
log-likelihood matrix extraction, WAIC, PSIS-LOO (incl. the Pareto tail
diagnostic), and compare() ranking."""

import math

import numpy as np
import pytest

import pyprob_tpu as pp
from pyprob_tpu import diagnostics as dg
from pyprob_tpu.distributions import Normal

OBS = {
    f"y{i}": v for i, v in enumerate([7.8, 8.6, 9.1, 7.2, 8.4, 8.9])
}


class GUM(pp.Model):
    def forward(self):
        mu = pp.sample(Normal(1.0, math.sqrt(5.0)))
        lik = Normal(mu, math.sqrt(2.0))
        for i in range(6):
            pp.observe(lik, name=f"y{i}")
        return mu


class Overdispersed(pp.Model):
    def forward(self):
        mu = pp.sample(Normal(1.0, math.sqrt(5.0)))
        lik = Normal(mu, math.sqrt(40.0))
        for i in range(6):
            pp.observe(lik, name=f"y{i}")
        return mu


@pytest.fixture(scope="module")
def gum_posterior():
    return GUM().posterior(
        num_traces=2000, observe=OBS,
        inference_engine=pp.InferenceEngine.NO_U_TURN_SAMPLER, num_chains=8,
    )


def test_log_likelihood_matrix(gum_posterior):
    ll, labels, lw = dg.log_likelihood_matrix(gum_posterior)
    assert ll.shape == (2000, 6)
    assert labels == [f"y{i}" for i in range(6)]
    assert abs(float(np.logaddexp.reduce(lw))) < 1e-8  # normalized
    # subset by names
    ll2, labels2, _ = dg.log_likelihood_matrix(
        gum_posterior, names=["y0", "y3"]
    )
    assert ll2.shape == (2000, 2) and labels2 == ["y0", "y3"]
    np.testing.assert_allclose(ll2[:, 0], ll[:, 0])
    np.testing.assert_allclose(ll2[:, 1], ll[:, 3])


def test_loo_waic_agree_on_well_specified_model(gum_posterior):
    r_loo = dg.loo(gum_posterior, pointwise=True)
    r_waic = dg.waic(gum_posterior, pointwise=True)
    # one latent parameter: p_loo ~ p_waic ~ O(1); both criteria agree
    assert abs(r_loo["elpd_loo"] - r_waic["elpd_waic"]) < 0.5
    assert 0.1 < r_loo["p_loo"] < 2.5
    assert 0.1 < r_waic["p_waic"] < 2.5
    assert r_loo["se"] > 0 and r_waic["se"] > 0
    # a well-specified Gaussian model has light-tailed LOO ratios
    assert float(np.max(r_loo["pareto_k"])) < 0.7
    assert len(r_loo["elpd_i"]) == 6 and r_loo["labels"] == list(OBS)


def test_compare_ranks_true_model_first(gum_posterior):
    post_bad = Overdispersed().posterior(
        num_traces=2000, observe=OBS,
        inference_engine=pp.InferenceEngine.NO_U_TURN_SAMPLER, num_chains=8,
    )
    rows = dg.compare({"gum": gum_posterior, "overdispersed": post_bad})
    assert rows[0]["name"] == "gum" and rows[0]["elpd_diff"] == 0.0
    # the sqrt(40) likelihood loses decisively: diff >> its paired SE
    assert rows[1]["elpd_diff"] > 3 * rows[1]["dse"]
    rows_w = dg.compare(
        {"gum": gum_posterior, "overdispersed": post_bad}, ic="waic"
    )
    assert rows_w[0]["name"] == "gum"


def test_loo_on_weighted_is_posterior():
    post = GUM().posterior(num_traces=20000, observe=OBS, vectorized=True)
    r = dg.loo(post)
    assert np.isfinite(r["elpd_loo"])
    assert r["n_samples"] == 20000 and r["n_datapoints"] == 6


def test_results_only_posterior_rejected(gum_posterior):
    post = GUM().posterior_results(num_traces=50, observe=OBS)
    with pytest.raises(RuntimeError, match="full traces"):
        dg.loo(post)


def test_pareto_khat_flags_heavy_tails():
    rng = np.random.default_rng(0)
    # raw weights ~ Pareto(alpha): true tail shape k = 1/alpha
    heavy = np.log(rng.pareto(1.2, size=4000) + 1.0)
    _, k_heavy = dg._psis_smooth(heavy)
    light = rng.normal(size=4000) * 0.3
    _, k_light = dg._psis_smooth(light)
    assert k_heavy > 0.6
    assert k_light < 0.5
    # smoothing caps the tail at the raw max
    sm, _ = dg._psis_smooth(heavy)
    assert sm.max() <= 1e-12


def test_stacking_weights_optimizer_synthetic():
    # complementary models: A fits the first half of the observations, B
    # the second half — stacking mixes them; exp-elpd schemes collapse
    n = 20
    L = np.full((2, n), -10.0)
    L[0, : n // 2] = -1.0
    L[1, n // 2 :] = -1.0
    w = dg._stacking_weights(L)
    assert abs(w[0] - 0.5) < 0.02 and abs(w.sum() - 1.0) < 1e-9
    # dominated model gets ~zero stacking weight
    L = np.stack([np.full(n, -1.0), np.full(n, -3.0)])
    w = dg._stacking_weights(L)
    assert w[0] > 0.98
    # identical models: EM stays at the symmetric optimum
    L = np.stack([np.full(n, -2.0), np.full(n, -2.0)])
    w = dg._stacking_weights(L)
    assert abs(w[0] - 0.5) < 1e-9


def test_model_weights_end_to_end(gum_posterior):
    post_bad = Overdispersed().posterior(
        num_traces=2000, observe=OBS,
        inference_engine=pp.InferenceEngine.NO_U_TURN_SAMPLER, num_chains=8,
    )
    posteriors = {"gum": gum_posterior, "overdispersed": post_bad}
    for method in ("stacking", "pseudo-bma+", "pseudo-bma"):
        w = dg.model_weights(posteriors, method=method)
        assert set(w) == {"gum", "overdispersed"}
        assert abs(sum(w.values()) - 1.0) < 1e-6
        # the well-specified model dominates under every scheme
        assert w["gum"] > 0.85, (method, w)
    with pytest.raises(ValueError, match="method"):
        dg.model_weights(posteriors, method="nope")
