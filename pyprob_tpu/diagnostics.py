"""Diagnostics: address/trace statistics, histograms, training reports,
MCMC convergence measures, divergences.

Counterpart of reference pyprob/diagnostics.py (1,169 LoC): the same public
API (_address_stats/_trace_stats/trace_histograms/address_histograms/
network/graph/trace_plot/log_prob/autocorrelation/gelman_rubin/
jensen_shannon), re-implemented with vectorized numpy host math
(autocorrelation via FFT instead of the reference's per-lag loops,
reference: diagnostics.py:714-781) and matplotlib-optional plotting.
"""

from __future__ import annotations

import math
import re as _re
from collections import OrderedDict

import numpy as np

from . import util
from .distributions import Empirical


# ---------------------------------------------------------------------------
# stats (reference: diagnostics.py:20-123)
# ---------------------------------------------------------------------------


def _address_stats(trace_dist, use_address_base=True, reuse_ids_from_address_stats=None):
    """Per-address counts/weights/ids over an Empirical of traces."""
    stats = OrderedDict()
    address_id_to_variable = {}
    if reuse_ids_from_address_stats is not None:
        next_id = len(reuse_ids_from_address_stats)
    else:
        next_id = 0
    weights = trace_dist.weights
    for i in range(trace_dist.length):
        trace = trace_dist._get_value(i)
        w = float(weights[i])
        for variable in trace.variables:
            address = variable.address_base if use_address_base else variable.address
            if address not in stats:
                if (
                    reuse_ids_from_address_stats is not None
                    and address in reuse_ids_from_address_stats
                ):
                    address_id = reuse_ids_from_address_stats[address]["address_id"]
                else:
                    address_id = "A" + str(next_id + 1)
                    next_id += 1
                stats[address] = {
                    "count": 0,
                    "weight": 0.0,
                    "address_id": address_id,
                    "variable": variable,
                    "controlled": variable.control,
                    "observed": variable.observed,
                    "tagged": variable.tagged,
                    "name": variable.name,
                }
                address_id_to_variable[address_id] = variable
            stats[address]["count"] += 1
            stats[address]["weight"] += w
    return stats


def _trace_stats(trace_dist, use_address_base=True, reuse_ids_from_address_stats=None, reuse_ids_from_trace_stats=None):
    """Per-trace-type counts plus trace-length and execution-time stats."""
    address_stats = _address_stats(
        trace_dist,
        use_address_base=use_address_base,
        reuse_ids_from_address_stats=reuse_ids_from_address_stats,
    )
    stats = OrderedDict()
    if reuse_ids_from_trace_stats is not None:
        next_id = len(reuse_ids_from_trace_stats)
    else:
        next_id = 0
    lengths = []
    lengths_controlled = []
    execution_times = []
    weights = trace_dist.weights
    for i in range(trace_dist.length):
        trace = trace_dist._get_value(i)
        w = float(weights[i])
        lengths.append(trace.length)
        lengths_controlled.append(trace.length_controlled)
        if trace.execution_time_sec is not None:
            execution_times.append(trace.execution_time_sec)
        key = "".join(
            address_stats[
                v.address_base if use_address_base else v.address
            ]["address_id"]
            for v in trace.variables_controlled
        )
        if key not in stats:
            if (
                reuse_ids_from_trace_stats is not None
                and key in reuse_ids_from_trace_stats
            ):
                trace_id = reuse_ids_from_trace_stats[key]["trace_id"]
            else:
                trace_id = "T" + str(next_id + 1)
                next_id += 1
            stats[key] = {
                "count": 0,
                "weight": 0.0,
                "trace_id": trace_id,
                "example_trace": trace,
                "addresses_controlled": [
                    v.address_base if use_address_base else v.address
                    for v in trace.variables_controlled
                ],
            }
        stats[key]["count"] += 1
        stats[key]["weight"] += w
    result = {
        "address_stats": address_stats,
        "trace_stats": stats,
        "length_mean": float(np.mean(lengths)) if lengths else 0.0,
        "length_stddev": float(np.std(lengths)) if lengths else 0.0,
        "length_controlled_mean": float(np.mean(lengths_controlled))
        if lengths_controlled
        else 0.0,
        "length_controlled_stddev": float(np.std(lengths_controlled))
        if lengths_controlled
        else 0.0,
        "execution_time_mean": float(np.mean(execution_times))
        if execution_times
        else None,
    }
    return result


def _rebuild_trace(trace, variables):
    """Build a consistent Trace from a filtered variable list (the derived
    per-category lists and lengths must match ``variables``)."""
    from .trace import Trace

    t = Trace()
    for v in variables:
        t.add(v)
    t.end(trace.result, trace.execution_time_sec)
    return t


def _remove_addresses_below_count(trace_dist, count):
    address_stats = _address_stats(trace_dist)
    keep = {a for a, s in address_stats.items() if s["count"] >= count}

    def prune(trace):
        return _rebuild_trace(
            trace, [v for v in trace.variables if v.address_base in keep]
        )

    return trace_dist.map(prune)


def _remove_addresses(trace_dist, regex):
    pattern = _re.compile(regex)

    def prune(trace):
        return _rebuild_trace(
            trace,
            [v for v in trace.variables if not pattern.match(v.address_base or "")],
        )

    return trace_dist.map(prune)


# ---------------------------------------------------------------------------
# value extraction helpers (reference: diagnostics.py:646-712)
# ---------------------------------------------------------------------------


def _n_most_frequent_addresses(trace_dist, n_most_frequent, num_traces=None):
    d = trace_dist if num_traces is None else trace_dist.thin(num_traces)
    address_stats = _address_stats(d, use_address_base=False)
    controlled = [
        (a, s) for a, s in address_stats.items() if s["controlled"]
    ]
    controlled.sort(key=lambda kv: -kv[1]["count"])
    return [a for a, _ in controlled[:n_most_frequent]]


def _variable_values(trace_dist, names=None, n_most_frequent=None, num_traces=None):
    """Extract per-variable value series: {label: np.ndarray [num_traces]}."""
    out = OrderedDict()
    if names is not None:
        for name in names:
            vals = []
            for i in range(trace_dist.length):
                trace = trace_dist._get_value(i)
                if name in trace.named_variables:
                    vals.append(
                        float(np.asarray(trace.named_variables[name].value).reshape(-1)[0])
                    )
                else:
                    vals.append(np.nan)
            out[name] = np.asarray(vals)
    else:
        addresses = _n_most_frequent_addresses(
            trace_dist, n_most_frequent or 10, num_traces
        )
        for address in addresses:
            vals = []
            for i in range(trace_dist.length):
                trace = trace_dist._get_value(i)
                v = trace.variables_dict_address.get(address)
                vals.append(
                    float(np.asarray(v.value).reshape(-1)[0])
                    if v is not None
                    else np.nan
                )
            out[address] = np.asarray(vals)
    return out


# ---------------------------------------------------------------------------
# histograms / plots (reference: diagnostics.py:155-332, 495-643)
# ---------------------------------------------------------------------------


def _maybe_plot(plot, plot_show, file_name, draw):
    if not (plot or plot_show or file_name):
        return None
    if not plot_show:
        import matplotlib

        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = draw(plt)
    if file_name is not None:
        fig.savefig(file_name, bbox_inches="tight")
    if plot_show:
        plt.show()
    else:
        plt.close(fig)
    return fig


def trace_histograms(trace_dist, use_address_base=True, figsize=(10, 5), bins=30, plot=False, plot_show=False, file_name=None):
    stats = _trace_stats(trace_dist, use_address_base=use_address_base)
    trace_stats = stats["trace_stats"]

    def draw(plt):
        fig, ax = plt.subplots(figsize=figsize)
        ids = [s["trace_id"] for s in trace_stats.values()]
        counts = [s["count"] for s in trace_stats.values()]
        ax.bar(ids, counts)
        ax.set_xlabel("Trace type")
        ax.set_ylabel("Count")
        return fig

    _maybe_plot(plot, plot_show, file_name, draw)
    return stats


def _write_address_reports(file_name, trace_dists, use_address_base):
    """Emit the reference's companion report files next to the histogram
    figure: ``<file_name>.txt`` (aggregate address summary) and
    ``<file_name>.csv`` (one row per address)
    (reference: pyprob/diagnostics.py:316-332)."""
    from . import __version__
    import jax

    combined = OrderedDict()
    total_elements = 0
    for d in trace_dists:
        stats = _address_stats(d, use_address_base=use_address_base,
                               reuse_ids_from_address_stats=combined or None)
        total_elements += d.length
        for key, val in stats.items():
            if key in combined:
                combined[key]["count"] += val["count"]
                combined[key]["weight"] += val["weight"]
            else:
                combined[key] = val
    extra = OrderedDict()
    extra["pyprob_tpu_version"] = __version__
    extra["jax_version"] = jax.__version__
    extra["num_distribution_elements"] = total_elements
    extra["addresses"] = len(combined)
    extra["addresses_controlled"] = sum(1 for v in combined.values() if v["controlled"])
    extra["addresses_observable"] = sum(1 for v in combined.values() if v["variable"].observable)
    extra["addresses_observed"] = sum(1 for v in combined.values() if v["observed"])
    extra["addresses_tagged"] = sum(1 for v in combined.values() if v["tagged"])
    with open(file_name + ".txt", "w") as f:
        f.write("pyprob_tpu diagnostics\n")
        f.write(("aggregated " if use_address_base else "") + "address report\n")
        for key, value in extra.items():
            f.write(f"{key}: {value}\n")
    with open(file_name + ".csv", "w") as f:
        f.write(
            "address_id, count, name, controlled, observable, observed, "
            + ("address_base" if use_address_base else "address")
            + "\n"
        )
        for key, value in combined.items():
            v = value["variable"]
            name = "" if v.name is None else v.name
            f.write(
                f"{value['address_id']}, {value['count']}, {name}, "
                f"{v.control}, {v.observable}, {v.observed}, {key}\n"
            )


def address_histograms(trace_dists, ground_truth_trace=None, figsize=(15, 12), bins=30, use_address_base=True, plot=False, plot_show=False, file_name=None, names=None):
    if not isinstance(trace_dists, (list, tuple)):
        trace_dists = [trace_dists]
    all_values = [
        _variable_values(d, names=names, n_most_frequent=8)
        for d in trace_dists
    ]
    if file_name is not None:
        _write_address_reports(file_name, trace_dists, use_address_base)

    def draw(plt):
        labels = list(all_values[0].keys())
        n = len(labels)
        cols = min(4, max(n, 1))
        rows = math.ceil(n / cols)
        fig, axes = plt.subplots(rows, cols, figsize=figsize, squeeze=False)
        for i, label in enumerate(labels):
            ax = axes[i // cols][i % cols]
            for j, values in enumerate(all_values):
                v = values[label]
                v = v[~np.isnan(v)]
                ax.hist(v, bins=bins, alpha=0.5, density=True, label=f"dist {j}")
            if ground_truth_trace is not None:
                gt = ground_truth_trace.variables_dict_address.get(label)
                if gt is not None:
                    ax.axvline(float(np.asarray(gt.value)), color="k")
            ax.set_title(util.truncate_str(label, 30), fontsize=8)
        return fig

    _maybe_plot(plot, plot_show, file_name, draw)
    return all_values


def network(inference_network, save_dir=None):
    """Text report + loss plot for a trained inference network
    (reference: diagnostics.py:335-460)."""
    lines = []
    lines.append(f"Network type: {inference_network._network_type}")
    from .nn import num_params

    lines.append(f"Total parameters: {num_params(inference_network._params):,}")
    lines.append(
        f"Total train traces: {inference_network._total_train_traces:,}"
    )
    lines.append(
        f"Total train iterations: {inference_network._total_train_iterations:,}"
    )
    lines.append(
        f"Total train seconds: {inference_network._total_train_seconds:,.1f}"
    )
    lines.append(f"Loss min: {inference_network._loss_min}")
    lines.append(f"Loss init: {inference_network._loss_init}")
    lines.append(
        f"Addresses: {len(inference_network._head_meta) if hasattr(inference_network, '_head_meta') else 'n/a'}"
    )
    report = "\n".join(lines)
    if save_dir is not None:
        import os

        os.makedirs(save_dir, exist_ok=True)
        with open(os.path.join(save_dir, "report.txt"), "w") as f:
            f.write(report + "\n")

        def draw(plt):
            fig, ax = plt.subplots(figsize=(10, 5))
            ax.plot(
                inference_network._history_train_loss_trace,
                inference_network._history_train_loss,
                label="train",
            )
            if inference_network._history_valid_loss:
                ax.plot(
                    inference_network._history_valid_loss_trace,
                    inference_network._history_valid_loss,
                    label="valid",
                )
            ax.set_xlabel("Traces")
            ax.set_ylabel("Loss")
            ax.legend()
            return fig

        _maybe_plot(
            False, False, os.path.join(save_dir, "loss.pdf"), draw
        )
    return report


def graph(trace_dist, use_address_base=True, n_most_frequent=None, base_graph=None, file_name=None, normalize_weights=True, min_address_count=None, exclude_addresses_regex=None):
    from .graph import Graph

    g = Graph(
        trace_dist=trace_dist,
        base_graph=base_graph,
        use_address_base=use_address_base,
        n_most_frequent=n_most_frequent,
        normalize_weights=normalize_weights,
        min_address_count=min_address_count,
        exclude_addresses_regex=exclude_addresses_regex,
    )
    if file_name is not None:
        g.render_to_file(file_name)
    return g


def address_dictionary(address_dict, file_name):
    with open(file_name, "w") as f:
        for key in sorted(address_dict._shelf.keys()):
            if key.startswith("address__"):
                f.write(f"{address_dict._shelf[key]}: {key[len('address__'):]}\n")


def trace_plot(trace_dists, variable_name=None, variable_address=None, resolution=1000, names=None, figsize=(10, 5), xlabel="Iteration", ylabel="Value", plot=False, plot_show=False, file_name=None, min_index=None, max_index=None, **kwargs):
    if not isinstance(trace_dists, (list, tuple)):
        trace_dists = [trace_dists]
    series = []
    for d in trace_dists:
        if variable_name is not None:
            values = _variable_values(d, names=[variable_name])[variable_name]
        elif variable_address is not None:
            vals = []
            for i in range(d.length):
                trace = d._get_value(i)
                v = trace.variables_dict_address.get(variable_address)
                vals.append(
                    float(np.asarray(v.value).reshape(-1)[0]) if v else np.nan
                )
            values = np.asarray(vals)
        else:
            values = next(iter(_variable_values(d, n_most_frequent=1).values()))
        lo = min_index or 0
        hi = max_index or len(values)
        series.append(values[lo:hi])

    def draw(plt):
        fig, ax = plt.subplots(figsize=figsize)
        for i, v in enumerate(series):
            label = names[i] if names else f"dist {i}"
            ax.plot(v, label=label)
        ax.set_xlabel(xlabel)
        ax.set_ylabel(ylabel)
        ax.legend()
        return fig

    _maybe_plot(plot, plot_show, file_name, draw)
    return series


def log_prob(trace_dists, resolution=1000, names=None, figsize=(10, 5), xlabel="Iteration", ylabel="Log probability", plot=False, plot_show=False, file_name=None, min_index=None, max_index=None, **kwargs):
    """Log-probability evolution over trace index
    (reference: diagnostics.py:580-643)."""
    if not isinstance(trace_dists, (list, tuple)):
        trace_dists = [trace_dists]
    series = []
    for d in trace_dists:
        vals = [
            float(np.sum(np.asarray(d._get_value(i).log_prob)))
            for i in range(d.length)
        ]
        lo = min_index or 0
        hi = max_index or len(vals)
        series.append(np.asarray(vals[lo:hi]))

    def draw(plt):
        fig, ax = plt.subplots(figsize=figsize)
        for i, v in enumerate(series):
            label = names[i] if names else f"dist {i}"
            ax.plot(v, label=label)
        ax.set_xlabel(xlabel)
        ax.set_ylabel(ylabel)
        ax.legend()
        return fig

    _maybe_plot(plot, plot_show, file_name, draw)
    return series


# ---------------------------------------------------------------------------
# MCMC convergence (reference: diagnostics.py:714-873)
# ---------------------------------------------------------------------------


def _autocorrelation_fft(x, lags):
    """Autocorrelation at the given lags via FFT (O(n log n), replacing the
    reference's per-lag loop, reference: diagnostics.py:720-733)."""
    x = np.asarray(x, dtype=np.float64)
    x = x[~np.isnan(x)]
    n = len(x)
    if n < 2:
        return np.zeros(len(lags))
    x = x - x.mean()
    f = np.fft.rfft(x, 2 * n)
    acf = np.fft.irfft(f * np.conj(f))[:n]
    acf /= acf[0] if acf[0] != 0 else 1.0
    lags = np.asarray(lags)
    lags = np.clip(lags, 0, n - 1)
    return acf[lags]


def autocorrelation(trace_dist, names=None, lags=None, n_most_frequent=10, figsize=(10, 5), plot=False, plot_show=False, file_name=None, **kwargs):
    length = trace_dist.length
    if lags is None:
        lags = np.unique(
            np.logspace(0, math.log10(max(length // 2, 2)), 50).astype(int)
        )
        lags = np.concatenate([[0], lags])
    values = _variable_values(
        trace_dist, names=names, n_most_frequent=n_most_frequent
    )
    result = OrderedDict(
        (label, _autocorrelation_fft(v, lags)) for label, v in values.items()
    )

    def draw(plt):
        fig, ax = plt.subplots(figsize=figsize)
        for label, acf in result.items():
            ax.plot(lags, acf, label=util.truncate_str(label, 30))
        ax.set_xscale("log")
        ax.set_xlabel("Lag")
        ax.set_ylabel("Autocorrelation")
        ax.legend(fontsize=7)
        return fig

    _maybe_plot(plot, plot_show, file_name, draw)
    return lags, result


def _r_hat(chains):
    """Gelman-Rubin potential scale reduction over chains [M, N]
    (reference: diagnostics.py:788-796)."""
    chains = np.asarray(chains, dtype=np.float64)
    M, N = chains.shape
    if N < 2 or M < 2:
        return np.nan
    chain_means = chains.mean(axis=1)
    grand_mean = chain_means.mean()
    B = N / (M - 1) * np.sum((chain_means - grand_mean) ** 2)
    W = chains.var(axis=1, ddof=1).mean()
    var_hat = (N - 1) / N * W + B / N
    if W == 0:
        return np.nan
    return math.sqrt(var_hat / W)


def gelman_rubin(trace_dists, names=None, iters=None, n_most_frequent=50, figsize=(10, 5), plot=False, plot_show=False, file_name=None, **kwargs):
    """R-hat evolution across chains (each trace_dist = one chain)
    (reference: diagnostics.py:784-873)."""
    all_values = [
        _variable_values(d, names=names, n_most_frequent=n_most_frequent)
        for d in trace_dists
    ]
    labels = list(all_values[0].keys())
    length = min(len(v[labels[0]]) for v in all_values)
    if iters is None:
        iters = np.unique(
            np.logspace(1, math.log10(max(length, 11)), 25).astype(int)
        )
        iters = iters[iters <= length]
    result = OrderedDict()
    for label in labels:
        chains = np.stack([v[label][:length] for v in all_values])
        result[label] = np.asarray([_r_hat(chains[:, :it]) for it in iters])

    def draw(plt):
        fig, ax = plt.subplots(figsize=figsize)
        for label, rh in result.items():
            ax.plot(iters, rh, label=util.truncate_str(label, 30))
        ax.axhline(1.1, color="k", linestyle="--")
        ax.set_xlabel("Iteration")
        ax.set_ylabel("R-hat")
        ax.legend(fontsize=7)
        return fig

    _maybe_plot(plot, plot_show, file_name, draw)
    return iters, result


def _chain_matrix(chains):
    """Stack chains of scalar values (per-chain Empiricals from vectorized
    MCMC with return_chains=True, or plain arrays) into an [M, N] float64
    matrix, truncating to the shortest chain."""
    series = []
    for c in chains:
        if isinstance(c, Empirical):
            series.append(
                np.asarray(
                    [float(np.asarray(c._get_value(i)).reshape(-1)[0]) for i in range(c.length)]
                )
            )
        else:
            series.append(np.asarray(c, dtype=np.float64).reshape(-1))
    length = min(len(s) for s in series)
    return np.stack([s[:length] for s in series])


def gelman_rubin_values(chains, iters=None):
    """R-hat evolution over chains of scalar *values* (e.g. the per-chain
    Empiricals from vectorized MCMC with return_chains=True), as opposed to
    ``gelman_rubin`` which extracts variables from trace-valued chains."""
    stacked = _chain_matrix(chains)
    length = stacked.shape[1]
    if iters is None:
        iters = np.unique(
            np.logspace(1, math.log10(max(length, 11)), 25).astype(int)
        )
        iters = iters[iters <= length]
    rhats = np.asarray([_r_hat(stacked[:, :it]) for it in iters])
    return iters, rhats


# ---- modern convergence diagnostics (Vehtari et al. 2021, -------------
# ---- "Rank-normalization, folding, and localization") -----------------
# Beyond parity: the reference ships only classic Gelman-Rubin R-hat
# (diagnostics.py:784-873) and plain autocorrelation.


def _split_halves(x):
    """[M, N] -> [2M, N//2]: split each chain into halves so within-chain
    trends register as between-chain variance."""
    n = x.shape[1] // 2
    return np.concatenate([x[:, :n], x[:, n : 2 * n]], axis=0)


def _rank_normal(x):
    """Average-tied ranks over all pooled draws mapped through the normal
    quantile function (Blom offsets)."""
    from scipy.stats import rankdata
    from scipy.special import ndtri

    r = rankdata(x, axis=None).reshape(x.shape)
    s = x.size
    return ndtri((r - 3.0 / 8.0) / (s + 1.0 / 4.0))


def _base_rhat(x):
    """Plain split-free R-hat of an [M, N] matrix."""
    m, n = x.shape
    chain_means = x.mean(axis=1)
    w = x.var(axis=1, ddof=1).mean()
    b = n * chain_means.var(ddof=1)
    var_hat = (n - 1) / n * w + b / n
    if w <= 0:
        return 1.0
    return float(np.sqrt(var_hat / w))


def split_rhat(chains):
    """Rank-normalized split-R-hat: max of the rank-normalized R-hat of
    the draws and of the draws folded about the median (catches both
    location and scale disagreements; < 1.01 indicates convergence).
    Accepts the same chain inputs as ``gelman_rubin_values``."""
    x = _chain_matrix(chains)
    if x.shape[1] < 4:
        raise ValueError("split_rhat needs chains of length >= 4")
    z = _rank_normal(_split_halves(x))
    folded = _rank_normal(_split_halves(np.abs(x - np.median(x))))
    return max(_base_rhat(z), _base_rhat(folded))


def _ess_geyer(x):
    """ESS of an [M, N] matrix via the multi-chain autocorrelation
    estimate with Geyer's initial monotone positive sequence."""
    m, n = x.shape
    if n < 4:
        return float("nan")
    chain_vars = x.var(axis=1, ddof=1)
    w = chain_vars.mean()
    b_over_n = x.mean(axis=1).var(ddof=1) if m > 1 else 0.0
    var_hat = (n - 1) / n * w + b_over_n
    if var_hat <= 0 or w <= 0:
        return float(m * n)
    # per-chain autocovariance via FFT
    xc = x - x.mean(axis=1, keepdims=True)
    size = 2 ** int(np.ceil(np.log2(2 * n)))
    f = np.fft.rfft(xc, size, axis=1)
    acov = np.fft.irfft(f * np.conj(f), size, axis=1)[:, :n].real / n
    mean_acov = acov.mean(axis=0)
    rho = 1.0 - (w - mean_acov) / var_hat
    rho[0] = 1.0
    # Geyer: pair sums G_k = rho[2k] + rho[2k+1] are positive for
    # reversible chains — keep while positive, enforce monotone decay
    pair_sums = []
    t = 0
    while t + 1 < n:
        p = rho[t] + rho[t + 1]
        if p <= 0:
            break
        pair_sums.append(p)
        t += 2
    running_min = np.inf
    s = 0.0
    for p in pair_sums:
        running_min = min(running_min, p)
        s += running_min
    tau = max(-1.0 + 2.0 * s, 1e-8)
    return float(m * n / tau)


def summary(chains):
    """One-line convergence summary of MCMC chains (the per-chain
    Empiricals from ``return_chains=True``, or a list of arrays):
    mean, sd, 5%/50%/95% quantiles, rank-normalized split-R-hat, and
    bulk/tail ESS — the table modern samplers print.  Returns a dict;
    ``print(summary_str(chains))`` renders it."""
    x = _chain_matrix(chains)
    flat = x.reshape(-1)
    q5, q50, q95 = np.quantile(flat, [0.05, 0.5, 0.95])
    from .distributions import Empirical

    hpd_lo, hpd_hi = Empirical.from_arrays(
        flat, np.zeros(flat.shape[0])
    ).hpd_interval(0.9)
    return {
        "mean": float(flat.mean()),
        "sd": float(flat.std(ddof=1)),
        "q5": float(q5),
        "median": float(q50),
        "q95": float(q95),
        "hpd90": (hpd_lo, hpd_hi),
        "r_hat": float(split_rhat(chains)),
        "ess_bulk": float(effective_sample_size_chains(chains, "bulk")),
        "ess_tail": float(effective_sample_size_chains(chains, "tail")),
        "num_chains": int(x.shape[0]),
        "num_draws": int(x.shape[1]),
    }


def summary_str(chains):
    """Rendered convergence summary table for ``summary(chains)``."""
    s = summary(chains)
    header = (
        f"{'mean':>9s} {'sd':>8s} {'5%':>8s} {'50%':>8s} {'95%':>8s} "
        f"{'hpd90':>19s} "
        f"{'r_hat':>7s} {'ess_bulk':>9s} {'ess_tail':>9s}"
    )
    hpd = f"[{s['hpd90'][0]:8.3f},{s['hpd90'][1]:8.3f}]"
    row = (
        f"{s['mean']:9.3f} {s['sd']:8.3f} {s['q5']:8.3f} "
        f"{s['median']:8.3f} {s['q95']:8.3f} {hpd:>19s} {s['r_hat']:7.3f} "
        f"{s['ess_bulk']:9.0f} {s['ess_tail']:9.0f}"
    )
    return (
        f"{s['num_chains']} chains x {s['num_draws']} draws\n"
        + header + "\n" + row
    )


def effective_sample_size_chains(chains, kind="bulk"):
    """Bulk or tail effective sample size across MCMC chains.

    ``bulk``: ESS of the rank-normalized split draws (mixing in the body
    of the distribution).  ``tail``: minimum of the ESS of the 5% and 95%
    quantile exceedance indicators (reliability of tail quantiles).
    Accepts the same chain inputs as ``gelman_rubin_values``."""
    x = _chain_matrix(chains)
    if kind == "bulk":
        return _ess_geyer(_rank_normal(_split_halves(x)))
    if kind == "tail":
        lo, hi = np.quantile(x, [0.05, 0.95])
        ess_lo = _ess_geyer(_split_halves((x <= lo).astype(np.float64)))
        ess_hi = _ess_geyer(_split_halves((x >= hi).astype(np.float64)))
        return min(ess_lo, ess_hi)
    raise ValueError(f"kind must be 'bulk' or 'tail', got {kind!r}")


def jensen_shannon(trace_dist_p, trace_dist_q, names=None, n_most_frequent=50, bins=50, plot=False, plot_show=False, file_name=None, **kwargs):
    """Per-variable Jensen-Shannon divergence between two trace
    distributions (reference: diagnostics.py:876-1169)."""
    values_p = _variable_values(
        trace_dist_p, names=names, n_most_frequent=n_most_frequent
    )
    values_q = _variable_values(
        trace_dist_q, names=names, n_most_frequent=n_most_frequent
    )
    labels = [l for l in values_p.keys() if l in values_q]
    weights_p = trace_dist_p.weights
    weights_q = trace_dist_q.weights
    result = OrderedDict()
    for label in labels:
        vp, vq = values_p[label], values_q[label]
        mp, mq = ~np.isnan(vp), ~np.isnan(vq)
        vp_, wp = vp[mp], weights_p[mp]
        vq_, wq = vq[mq], weights_q[mq]
        if len(vp_) == 0 or len(vq_) == 0:
            result[label] = np.nan
            continue
        lo = min(vp_.min(), vq_.min())
        hi = max(vp_.max(), vq_.max())
        if lo == hi:
            result[label] = 0.0
            continue
        hp, edges = np.histogram(
            vp_, bins=bins, range=(lo, hi), weights=wp, density=False
        )
        hq, _ = np.histogram(
            vq_, bins=bins, range=(lo, hi), weights=wq, density=False
        )
        p = hp / max(hp.sum(), 1e-12)
        q = hq / max(hq.sum(), 1e-12)
        m = 0.5 * (p + q)
        with np.errstate(divide="ignore", invalid="ignore"):
            kl_pm = np.nansum(np.where(p > 0, p * np.log2(p / m), 0))
            kl_qm = np.nansum(np.where(q > 0, q * np.log2(q / m), 0))
        result[label] = 0.5 * (kl_pm + kl_qm)
    return result


# ---------------------------------------------------------------------------
# predictive model comparison: WAIC, PSIS-LOO, compare (beyond parity —
# the reference has no model-comparison machinery at all)
# ---------------------------------------------------------------------------


def log_likelihood_matrix(trace_dist, names=None):
    """Per-draw, per-observation log-likelihood matrix from a trace-valued
    Empirical posterior.

    Returns ``(ll [S, N], labels [N], log_weights [S])`` where ``ll[s, i]``
    is the log-density of observed site i under draw s (element dims
    summed), ``labels`` are the observed sites' names (addresses when
    unnamed), and ``log_weights`` are the posterior draw log-weights
    normalized so logsumexp = 0 (all equal for MCMC/SVGD draws; IS/VI
    weights are folded into the estimators).  Every trace must observe the
    same site sequence."""
    traces = trace_dist.get_values()
    if len(traces) == 0:
        raise RuntimeError("log_likelihood_matrix needs a non-empty posterior")
    if not hasattr(traces[0], "variables_observed"):
        raise RuntimeError(
            "log_likelihood_matrix needs full traces — run posterior() "
            "(map_func=None), not posterior_results()"
        )

    def obs_labels(t):
        out = []
        for v in t.variables_observed:
            out.append(v.name if v.name is not None else v.address)
        return out

    labels = obs_labels(traces[0])
    if names is not None:
        keep = [i for i, l in enumerate(labels) if l in names]
        labels_kept = [labels[i] for i in keep]
    else:
        keep = list(range(len(labels)))
        labels_kept = labels
    if not keep:
        raise RuntimeError("no observed sites selected")
    ll = np.empty((len(traces), len(keep)), dtype=np.float64)
    for s, t in enumerate(traces):
        tl = obs_labels(t)
        if tl != labels:
            raise RuntimeError(
                f"observation sequence differs across draws ({tl} vs "
                f"{labels}); pointwise criteria need a fixed observe set"
            )
        vs = t.variables_observed
        for j, i in enumerate(keep):
            ll[s, j] = float(np.sum(np.asarray(vs[i].log_prob, np.float64)))
    lw = np.asarray(trace_dist.log_weights, dtype=np.float64)
    lw = lw - _logsumexp(lw)
    return ll, labels_kept, lw


def _logsumexp(a, axis=None):
    m = np.max(a, axis=axis, keepdims=True)
    out = m + np.log(np.sum(np.exp(a - m), axis=axis, keepdims=True))
    return float(out.reshape(())) if axis is None else np.squeeze(out, axis=axis)


def waic(trace_dist, names=None, pointwise=False):
    """Widely applicable information criterion (Watanabe 2010; Gelman,
    Hwang & Vehtari 2014): elpd_waic = lppd - p_waic with
    p_waic = sum_i Var_s[log p(y_i | theta_s)].  Draw weights are folded
    into both terms, so weighted (IS/VI-reweighted) posteriors work."""
    ll, labels, lw = log_likelihood_matrix(trace_dist, names)
    w = np.exp(lw)[:, None]
    lppd_i = _logsumexp(lw[:, None] + ll, axis=0)
    mean_ll = np.sum(w * ll, axis=0)
    p_i = np.sum(w * (ll - mean_ll) ** 2, axis=0)
    elpd_i = lppd_i - p_i
    n = ll.shape[1]
    out = {
        "elpd_waic": float(np.sum(elpd_i)),
        "p_waic": float(np.sum(p_i)),
        "se": float(np.sqrt(n * np.var(elpd_i))),
        "n_samples": int(ll.shape[0]),
        "n_datapoints": n,
    }
    if pointwise:
        out["elpd_i"] = elpd_i
        out["labels"] = labels
    return out


def _gpd_fit(x):
    """Generalized-Pareto (k, sigma) fit to ascending exceedances x > 0 by
    the Zhang & Stephens (2009) quadrature posterior mean — the estimator
    PSIS prescribes (Vehtari et al. 2024, arXiv:1507.02646 §App.C)."""
    n = x.size
    prior_bs, prior_k = 3.0, 10.0
    m_est = 30 + int(np.sqrt(n))
    jj = np.arange(1.0, m_est + 1.0)
    b = 1.0 - np.sqrt(m_est / (jj - 0.5))
    b /= prior_bs * x[int(n / 4 + 0.5) - 1]
    b += 1.0 / x[-1]
    k_j = np.mean(np.log1p(-b[:, None] * x), axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        profile = n * (np.log(-(b / k_j)) - k_j - 1.0)
    profile[~np.isfinite(profile)] = -np.inf
    wts = 1.0 / np.sum(np.exp(profile - profile[:, None]), axis=1)
    wts[~np.isfinite(wts)] = 0.0
    if wts.sum() <= 0:
        return np.inf, np.nan
    wts /= wts.sum()
    b_post = float(np.sum(b * wts))
    k_post = float(np.mean(np.log1p(-b_post * x)))
    sigma = -k_post / b_post
    # weakly informative shape prior regularizing small-tail estimates
    k_post = (n * k_post + prior_k * 0.5) / (n + prior_k)
    return k_post, sigma


def _psis_smooth(lw_raw):
    """Pareto-smooth one vector of raw log importance ratios.  Returns the
    smoothed (still unnormalized) log weights and the tail-shape k-hat
    (np.inf when the tail is too short to fit)."""
    s = lw_raw.size
    lw = lw_raw - lw_raw.max()
    n_tail = int(np.ceil(min(s / 5.0, 3.0 * np.sqrt(s))))
    if n_tail < 5:
        return lw, np.inf
    order = np.argsort(lw)
    tail_ids = order[s - n_tail:]
    cutoff = lw[order[s - n_tail - 1]]
    tail = lw[tail_ids]
    if np.ptp(tail) < 1e-12:
        return lw, np.inf
    exceed = np.exp(tail) - np.exp(cutoff)
    k, sigma = _gpd_fit(np.sort(exceed))
    if np.isfinite(k) and sigma > 0:
        # replace the tail by GPD quantiles at expected order statistics,
        # capped at the raw maximum (= 0 after the shift)
        p = (np.arange(1.0, n_tail + 1.0) - 0.5) / n_tail
        if abs(k) < 1e-8:
            q = sigma * -np.log1p(-p)
        else:
            q = sigma / k * (np.power(1.0 - p, -k) - 1.0)
        lw[tail_ids] = np.minimum(np.log(np.exp(cutoff) + q), 0.0)
    return lw, k


def loo(trace_dist, names=None, pointwise=False):
    """Pareto-smoothed importance-sampling leave-one-out cross-validation
    (PSIS-LOO, Vehtari, Gelman & Gabry 2017): elpd_loo = sum_i
    log E_{-i}[p(y_i | theta)], with the 1/p(y_i|theta_s) ratios
    Pareto-smoothed per observation.  ``pareto_k`` > 0.7 flags
    observations whose LOO estimate is unreliable."""
    ll, labels, lw = log_likelihood_matrix(trace_dist, names)
    s, n = ll.shape
    elpd_i = np.empty(n)
    khat = np.empty(n)
    for i in range(n):
        lr, k = _psis_smooth(lw - ll[:, i])
        lr = lr - _logsumexp(lr)
        elpd_i[i] = _logsumexp(lr + ll[:, i])
        khat[i] = k
    lppd_i = _logsumexp(lw[:, None] + ll, axis=0)
    out = {
        "elpd_loo": float(np.sum(elpd_i)),
        "p_loo": float(np.sum(lppd_i - elpd_i)),
        "se": float(np.sqrt(n * np.var(elpd_i))),
        "pareto_k": khat,
        "n_samples": int(s),
        "n_datapoints": int(n),
    }
    if pointwise:
        out["elpd_i"] = elpd_i
        out["labels"] = labels
    return out


def compare(posteriors, ic="loo", names=None):
    """Rank models by expected predictive accuracy.

    ``posteriors`` maps model name -> trace-valued Empirical posterior
    (all conditioned on the SAME data).  Returns rows sorted best-first
    with ``elpd``, ``se``, ``elpd_diff`` (vs the best) and ``dse`` — the
    paired SE of the difference, computed from the pointwise elpds as
    Vehtari et al. 2017 §5.2 prescribe."""
    crit = {"loo": loo, "waic": waic}[ic]
    results = {
        name: crit(post, names=names, pointwise=True)
        for name, post in posteriors.items()
    }
    key = "elpd_loo" if ic == "loo" else "elpd_waic"
    ranked = sorted(results.items(), key=lambda kv: -kv[1][key])
    best_i = ranked[0][1]["elpd_i"]
    rows = []
    for rank, (name, r) in enumerate(ranked):
        diff_i = best_i - r["elpd_i"]
        rows.append({
            "name": name,
            "rank": rank,
            "elpd": r[key],
            "se": r["se"],
            "elpd_diff": float(np.sum(diff_i)),
            "dse": float(np.sqrt(len(diff_i) * np.var(diff_i))),
            **({"pareto_k_max": float(np.max(r["pareto_k"]))}
               if "pareto_k" in r else {}),
        })
    return rows


def _stacking_weights(L, tol=1e-10, max_iter=5000):
    """Maximize sum_i log sum_k w_k exp(L[k, i]) over the simplex.

    The objective is a fixed-component mixture log-likelihood, so EM
    applies: responsibilities r_ik = w_k p_ki / sum_k', then
    w_k = mean_i r_ik — monotone ascent, no step-size hyperparameters."""
    K, n = L.shape
    # per-observation normalization keeps the exponentials tame
    Ln = L - np.max(L, axis=0, keepdims=True)
    P = np.exp(Ln)  # [K, n]
    w = np.full(K, 1.0 / K)
    prev = -np.inf
    for _ in range(max_iter):
        mix = w @ P  # [n]
        obj = float(np.sum(np.log(np.clip(mix, 1e-300, None))))
        if obj - prev < tol:
            break
        prev = obj
        r = (w[:, None] * P) / np.clip(mix, 1e-300, None)  # [K, n]
        w = r.mean(axis=1)
        w = w / w.sum()
    return w


def model_weights(posteriors, method="stacking", ic="loo", names=None,
                  bb_samples=1000, seed=0):
    """Model-averaging weights from pointwise predictive accuracy
    (Yao, Vehtari, Gelman & Gabry 2018, "Using stacking to average
    Bayesian predictive distributions").

    ``posteriors``: {model name: trace-valued Empirical posterior}, all
    conditioned on the SAME data.  Methods:

    - ``stacking``: maximize the leave-one-out log score of the weighted
      predictive mixture over the simplex — complementary models both get
      weight, unlike exp-elpd schemes that collapse to the single best.
    - ``pseudo-bma+``: exp(elpd) weights regularized by the Bayesian
      bootstrap over observations (accounts for elpd uncertainty).
    - ``pseudo-bma``: plain exp(elpd) normalization.

    Returns {model name: weight}."""
    crit = {"loo": loo, "waic": waic}[ic]
    results = {
        name: crit(post, names=names, pointwise=True)
        for name, post in posteriors.items()
    }
    model_names = list(results.keys())
    L = np.stack([results[m]["elpd_i"] for m in model_names])  # [K, n]
    K, n = L.shape
    if method == "stacking":
        w = _stacking_weights(L)
    elif method == "pseudo-bma+":
        rng = np.random.default_rng(seed)
        acc = np.zeros(K)
        for _ in range(int(bb_samples)):
            pi = rng.dirichlet(np.ones(n))
            z = n * (L @ pi)  # bootstrap elpd per model
            z = z - z.max()
            e = np.exp(z)
            acc += e / e.sum()
        w = acc / acc.sum()
    elif method == "pseudo-bma":
        z = L.sum(axis=1)
        z = z - z.max()
        e = np.exp(z)
        w = e / e.sum()
    else:
        raise ValueError(
            "method must be 'stacking', 'pseudo-bma+' or 'pseudo-bma', "
            f"got {method!r}"
        )
    return {m: float(wk) for m, wk in zip(model_names, w)}


def __getattr__(name):
    # Module-level Trace/Graph re-exports (reference parity:
    # pyprob/diagnostics.py:16-17 imports both at module scope).  Lazy
    # (PEP 562) because graph.py imports this module at its own top level.
    if name == "Graph":
        from .graph import Graph

        return Graph
    if name == "Trace":
        from .trace import Trace

        return Trace
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
