"""Diagnostics tests (reference: tests/test_diagnostics.py:44-76)."""

import math

import numpy as np
import pytest

import pyprob_tpu as pp
from pyprob_tpu import diagnostics
from pyprob_tpu.distributions import Normal, Uniform
from pyprob_tpu.graph import Graph


class GUMMarsaglia(pp.Model):
    def marsaglia(self, mean, stddev):
        uniform = Uniform(-1.0, 1.0)
        while True:
            x = pp.sample(uniform)
            y = pp.sample(uniform)
            s = float(x) ** 2 + float(y) ** 2
            if s < 1:
                return mean + stddev * (float(x) * math.sqrt(-2 * math.log(s) / s))

    def forward(self):
        mu = self.marsaglia(1.0, math.sqrt(5.0))
        likelihood = Normal(mu, math.sqrt(2.0))
        pp.observe(likelihood, name="obs0")
        pp.observe(likelihood, name="obs1")
        return mu


class GUM(pp.Model):
    def forward(self):
        mu = pp.sample(Normal(1.0, math.sqrt(5.0)), name="mu")
        pp.observe(Normal(mu, math.sqrt(2.0)), name="obs0")
        return mu


def test_trace_stats_lengths():
    # 100k-run reference constants: all-var length mean 4.544
    # (reference: tests/test_diagnostics.py:46-48)
    m = GUMMarsaglia()
    prior = m.prior(num_traces=2000)
    stats = diagnostics._trace_stats(prior)
    assert abs(stats["length_mean"] - 4.544) < 0.25
    assert abs(stats["length_controlled_mean"] - 2.563) < 0.25
    assert len(stats["trace_stats"]) >= 2  # multiple trace types


def test_address_stats():
    m = GUM()
    prior = m.prior(num_traces=200)
    stats = diagnostics._address_stats(prior)
    controlled = [s for s in stats.values() if s["controlled"]]
    assert len(controlled) == 1
    assert controlled[0]["count"] == 200


def test_autocorrelation():
    m = GUM()
    post = m.posterior(
        num_traces=2000,
        inference_engine=pp.InferenceEngine.RANDOM_WALK_METROPOLIS_HASTINGS,
        observe={"obs0": 8},
    )
    lags, result = diagnostics.autocorrelation(post, names=["mu"])
    acf = result["mu"]
    assert np.isclose(acf[0], 1.0)
    # MCMC chain: autocorrelation decays with lag
    assert acf[-1] < acf[0]


def test_gelman_rubin_converged_chains():
    m = GUM()
    chains = [
        m.posterior(
            num_traces=1500,
            inference_engine=pp.InferenceEngine.RANDOM_WALK_METROPOLIS_HASTINGS,
            observe={"obs0": 8},
        )[500:]
        for _ in range(3)
    ]
    iters, result = diagnostics.gelman_rubin(chains, names=["mu"])
    rhat = result["mu"]
    # converged chains: final R-hat near 1
    assert rhat[-1] < 1.3


def test_jensen_shannon():
    m = GUM()
    p1 = m.prior(num_traces=1000)
    p2 = m.prior(num_traces=1000)
    post = m.posterior(num_traces=1000, observe={"obs0": 8})
    js_same = diagnostics.jensen_shannon(p1, p2, names=["mu"])["mu"]
    js_diff = diagnostics.jensen_shannon(p1, post, names=["mu"])["mu"]
    assert js_same < js_diff
    assert js_same < 0.1


def test_log_prob_series():
    m = GUM()
    post = m.posterior(num_traces=100, observe={"obs0": 8})
    series = diagnostics.log_prob(post)
    assert len(series[0]) == 100
    assert np.isfinite(series[0]).all()


def test_graph():
    m = GUMMarsaglia()
    prior = m.prior(num_traces=500)
    g = diagnostics.graph(prior)
    assert "START" in g.addresses
    assert "END" in g.addresses
    assert len(g.nodes) > 3
    # transition probabilities normalized
    for node in g.nodes:
        if node.outgoing_edges:
            total = sum(e.weight for e in node.outgoing_edges)
            assert abs(total - 1.0) < 1e-6
    path = g.sample_execution()
    assert path[0].address_id == "START"
    assert path[-1].address_id == "END"
    dot = g.to_dot()
    assert "digraph" in dot


def test_graph_render_to_file(tmp_path):
    m = GUM()
    prior = m.prior(num_traces=100)
    g = diagnostics.graph(prior)
    out = g.render_to_file(str(tmp_path / "graph.dot"))
    assert out.endswith(".dot")
    assert "digraph" in open(out).read()


def test_trace_histograms_stats():
    m = GUMMarsaglia()
    prior = m.prior(num_traces=500)
    stats = diagnostics.trace_histograms(prior)
    assert "trace_stats" in stats


def test_address_histogram_report_files(tmp_path):
    """address_histograms(file_name=...) emits the reference's companion
    .txt summary and .csv per-address report
    (reference: pyprob/diagnostics.py:316-332)."""
    m = GUM()
    prior = m.prior(num_traces=200)
    base = str(tmp_path / "addr_report")
    diagnostics.address_histograms(prior, file_name=base)
    txt = open(base + ".txt").read()
    assert "address report" in txt
    assert "addresses_controlled: 1" in txt
    assert "num_distribution_elements: 200" in txt
    csv_lines = open(base + ".csv").read().strip().splitlines()
    assert csv_lines[0].startswith("address_id, count, name, controlled")
    # GUM: one controlled latent + one observed site
    rows = [l.split(", ") for l in csv_lines[1:]]
    assert len(rows) == 2
    counts = {r[2]: int(r[1]) for r in rows}
    assert counts == {"mu": 200, "obs0": 200}


def test_network_report():
    class GUM2(pp.Model):
        def forward(self):
            mu = pp.sample(Normal(1.0, math.sqrt(5.0)))
            pp.observe(Normal(mu, math.sqrt(2.0)), name="obs0")
            return mu

    m = GUM2()
    m.learn_inference_network(
        num_traces=512,
        observe_embeddings={"obs0": {"dim": 8}},
        batch_size=256,
    )
    report = diagnostics.network(m._inference_network)
    assert "Total parameters" in report
    assert "Total train traces" in report


def test_split_rhat_and_ess_synthetic():
    """Rank-normalized split-R-hat + bulk/tail ESS (Vehtari et al. 2021)
    on synthetic chains with known behavior."""
    rng = np.random.default_rng(0)
    M, N = 4, 4000
    iid = rng.normal(size=(M, N))
    assert abs(diagnostics.split_rhat(iid) - 1.0) < 0.01
    bulk = diagnostics.effective_sample_size_chains(iid, "bulk")
    tail = diagnostics.effective_sample_size_chains(iid, "tail")
    assert 0.8 * M * N < bulk < 1.2 * M * N
    assert 0.8 * M * N < tail < 1.2 * M * N

    # AR(1) phi=0.9: ESS ~ MN(1-phi)/(1+phi)
    phi = 0.9
    ar = np.zeros((M, N))
    for m in range(M):
        x = 0.0
        for t in range(N):
            x = phi * x + rng.normal() * math.sqrt(1 - phi**2)
            ar[m, t] = x
    expected = M * N * (1 - phi) / (1 + phi)
    assert 0.5 * expected < diagnostics.effective_sample_size_chains(ar) < 2.0 * expected

    # location, scale, and trend pathologies must all push R-hat > 1.01
    shifted = iid.copy()
    shifted[0] += 3.0
    assert diagnostics.split_rhat(shifted) > 1.05
    scale = iid.copy()
    scale[0] *= 0.1  # folding catches scale-stuck chains
    assert diagnostics.split_rhat(scale) > 1.05
    trend = iid.copy()
    trend[1] += np.linspace(-2, 2, N)  # splitting catches trends
    assert diagnostics.split_rhat(trend) > 1.05


def test_split_rhat_on_nuts_chains():
    """Integration: NUTS return_chains feed the modern diagnostics."""
    class GUM3(pp.Model):
        def forward(self):
            mu = pp.sample(Normal(1.0, math.sqrt(5.0)))
            lik = Normal(mu, math.sqrt(2.0))
            pp.observe(lik, name="obs0")
            pp.observe(lik, name="obs1")
            return mu

    chains = GUM3().posterior_results(
        num_traces=4000,
        observe={"obs0": 8.0, "obs1": 9.0},
        inference_engine=pp.InferenceEngine.NO_U_TURN_SAMPLER,
        num_chains=4,
        burn_in=200,
        return_chains=True,
    )
    assert diagnostics.split_rhat(chains) < 1.05
    assert diagnostics.effective_sample_size_chains(chains, "bulk") > 500
    assert diagnostics.effective_sample_size_chains(chains, "tail") > 200


def test_summary_table():
    class GUM4(pp.Model):
        def forward(self):
            mu = pp.sample(Normal(1.0, math.sqrt(5.0)))
            lik = Normal(mu, math.sqrt(2.0))
            pp.observe(lik, name="obs0")
            pp.observe(lik, name="obs1")
            return mu

    chains = GUM4().posterior_results(
        num_traces=4000,
        observe={"obs0": 8.0, "obs1": 9.0},
        inference_engine=pp.InferenceEngine.NO_U_TURN_SAMPLER,
        num_chains=4,
        burn_in=200,
        return_chains=True,
    )
    s = diagnostics.summary(chains)
    assert abs(s["mean"] - 7.25) < 0.15
    assert abs(s["sd"] - math.sqrt(1 / 1.2)) < 0.15
    assert s["r_hat"] < 1.05
    assert s["ess_bulk"] > 500 and s["ess_tail"] > 200
    assert s["num_chains"] == len(chains)  # mesh pads chain counts
    rendered = diagnostics.summary_str(chains)
    assert "r_hat" in rendered and "ess_bulk" in rendered
