"""Guards the API surface documented in MIGRATION.md: every name a
migrating pyprob user is told exists must import and be callable.
Reference surface: pyprob/__init__.py:1-6, pyprob/model.py:23-242,
pyprob/distributions/__init__.py."""

import inspect

import pyprob_tpu
from pyprob_tpu import distributions as dists


def test_top_level_surface():
    names = [
        "sample", "observe", "factor", "tag", "rejection_sample",
        "Model", "RemoteModel", "ConditionalModel", "ParallelModel",
        "RemoteModelPool", "LockstepRemoteModel",
        "TraceMode", "PriorInflation", "InferenceEngine",
        "InferenceNetwork", "ObserveEmbedding", "Optimizer",
        "LearningRateScheduler", "AddressDictionary", "ChainState",
        "seed", "set_verbosity", "set_device", "set_platform",
        "set_dtype",
    ]
    for n in names:
        assert hasattr(pyprob_tpu, n), n
    # lazy attributes must resolve without error
    assert pyprob_tpu.serving.PosteriorService is pyprob_tpu.PosteriorService
    assert pyprob_tpu.remote is not None
    assert pyprob_tpu.ppx is not None
    assert pyprob_tpu.address_dictionary is not None


def test_model_method_surface():
    methods = [
        "forward", "get_trace", "sample", "prior", "prior_results",
        "posterior", "posterior_results", "learn_inference_network",
        "reset_inference_network", "save_inference_network",
        "load_inference_network", "save_dataset", "condition", "filter",
        "parallel", "map_estimate", "posterior_predictive",
        "posterior_predictive_results",
    ]
    for m in methods:
        assert callable(getattr(pyprob_tpu.Model, m)), m


def test_posterior_keywords():
    sig = inspect.signature(pyprob_tpu.Model.posterior)
    for kw in ["num_traces", "inference_engine", "initial_trace",
               "map_func", "observe", "file_name", "thinning_steps",
               "likelihood_importance"]:
        assert kw in sig.parameters, kw
    sig = inspect.signature(pyprob_tpu.Model.learn_inference_network)
    for kw in ["num_traces", "inference_network", "prior_inflation",
               "dataset_dir", "dataset_valid_dir", "observe_embeddings",
               "batch_size", "valid_size", "valid_every", "optimizer_type",
               "learning_rate_init", "learning_rate_end",
               "learning_rate_scheduler_type", "momentum", "weight_decay",
               "save_file_name_prefix", "save_every_sec",
               "pre_generate_layers", "distributed_backend",
               "stop_with_bad_loss", "log_file_name", "lstm_dim",
               "lstm_depth", "proposal_mixture_components"]:
        assert kw in sig.parameters, kw


def test_distribution_surface():
    reference_16 = [
        "Normal", "Uniform", "Categorical", "Bernoulli", "Binomial",
        "Poisson", "Exponential", "Gamma", "Beta", "LogNormal",
        "VonMises", "Weibull", "TruncatedNormal", "Mixture", "Factor",
        "Empirical",
    ]
    beyond = [
        "Laplace", "StudentT", "Dirichlet", "MultivariateNormal",
        "Cauchy", "HalfCauchy", "HalfNormal", "Gumbel", "Logistic",
        "Chi2", "Geometric", "Multinomial", "InverseGamma", "Pareto",
        "NegativeBinomial", "LKJCholesky", "Censored", "ZeroInflated",
    ]
    for n in reference_16 + beyond:
        assert hasattr(dists, n), n
    emp = dists.Empirical
    for m in ["map", "filter", "condition", "reweight", "reobserve",
              "resample", "thin", "combine_duplicates", "unweighted",
              "density_estimate", "quantile", "hpd_interval",
              "from_arrays"]:
        assert hasattr(emp, m), m


def test_engine_enum_values():
    e = pyprob_tpu.InferenceEngine
    reference_4 = [
        "IMPORTANCE_SAMPLING",
        "IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK",
        "LIGHTWEIGHT_METROPOLIS_HASTINGS",
        "RANDOM_WALK_METROPOLIS_HASTINGS",
    ]
    beyond = [
        "SEQUENTIAL_MONTE_CARLO",
        "SEQUENTIAL_MONTE_CARLO_WITH_INFERENCE_NETWORK",
        "HAMILTONIAN_MONTE_CARLO", "NO_U_TURN_SAMPLER",
        "PARALLEL_TEMPERING", "TEMPERED_SMC", "VARIATIONAL_INFERENCE",
        "STEIN_VARIATIONAL_GRADIENT_DESCENT", "LAPLACE",
    ]
    for n in reference_4 + beyond:
        assert hasattr(e, n), n


def test_diagnostics_surface():
    from pyprob_tpu import diagnostics as d
    for n in ["autocorrelation", "gelman_rubin", "jensen_shannon",
              "_address_stats", "_trace_stats", "trace_histograms",
              "address_histograms", "network", "trace_plot", "log_prob",
              "split_rhat", "effective_sample_size_chains", "waic",
              "loo", "compare", "model_weights", "summary"]:
        assert hasattr(d, n), n
    from pyprob_tpu import graph as g
    assert hasattr(g, "Graph")


def test_util_compat_surface():
    u = pyprob_tpu.util
    for n in ["to_tensor", "to_array", "effective_sample_size",
              "empirical_to_categorical", "check_gnu_dbm",
              "init_distributed_print", "set_compute_dtype",
              "safe_log", "clamp_probs", "has_nan_or_inf"]:
        assert hasattr(u, n), n
