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


def test_param_accessor_surface():
    # reference distributions expose constructor params as attributes
    # (torch convention) — auto-generated from _param_names (r5)
    from pyprob_tpu.distributions import (
        Normal, Gamma, LogNormal, VonMises, Weibull, Bernoulli, Binomial,
        Mixture, Uniform,
    )
    import numpy as np

    n = Normal(2.0, 3.0)
    assert float(n.loc) == 2.0 and float(n.scale) == 3.0
    g = Gamma(2.0, 5.0)
    assert float(g.concentration) == 2.0 and float(g.rate) == 5.0
    ln = LogNormal(0.5, 1.5)
    assert float(ln.loc) == 0.5 and float(ln.scale) == 1.5
    vm = VonMises(0.25, 4.0)
    assert float(vm.loc) == 0.25 and float(vm.concentration) == 4.0
    w = Weibull(2.0, 1.5)
    assert float(w.scale) == 2.0 and float(w.concentration) == 1.5
    b = Bernoulli(0.75)
    assert np.isclose(float(b.logits), np.log(3.0), atol=1e-5)
    bi = Binomial(10, 0.25)
    assert np.isclose(float(bi.logits), np.log(1.0 / 3.0), atol=1e-5)
    mx = Mixture([Normal(0, 1), Normal(1, 1)], probs=[0.3, 0.7])
    assert np.allclose(np.asarray(mx.probs), [0.3, 0.7], atol=1e-6)
    # .to(device) is a documented no-op returning self
    assert n.to("cuda") is n and Uniform(0, 1).to("cpu") is not None


def test_empirical_reference_ops():
    from pyprob_tpu.distributions import Empirical, Normal
    import numpy as np, os, tempfile

    e = Empirical(values=[1.0, 2.0, 3.0], log_weights=[0.0, 1.0, 2.0])
    assert e.weighted
    assert not e.unweighted().weighted
    assert float(e.arg_max(lambda x: x)) == 3.0
    assert float(e.arg_min(lambda x: x)) == 1.0
    assert float(e.arg_max(lambda x: -x)) == 1.0
    e2 = Empirical.from_distribution(Normal(0.0, 1.0), 16)
    assert len(e2) == 16 and not e2.weighted
    fd, fn = tempfile.mkstemp(suffix=".yaml")
    os.close(fd)
    try:
        e.save_metadata(fn)
        assert os.path.getsize(fn) > 0
    finally:
        os.remove(fn)
    assert e.to("cuda") is e


def test_diagnostics_trace_graph_exports():
    from pyprob_tpu import diagnostics as d
    from pyprob_tpu.trace import Trace
    from pyprob_tpu.graph import Graph

    assert d.Trace is Trace and d.Graph is Graph
    assert Trace().to("cuda") is not None


def test_nn_module_class_surface():
    # reference-named module classes wrap the functional layers (r5)
    import numpy as np
    from pyprob_tpu.nn import (
        EmbeddingFeedForward,
        EmbeddingCNN2D5C,
        EmbeddingCNN3D5C,
        ProposalNormalNormalMixture,
        ProposalCategoricalCategorical,
    )
    from pyprob_tpu.distributions import Normal, Mixture, Categorical

    x = np.random.randn(4, 8).astype(np.float32)
    ff = EmbeddingFeedForward((8,), (16,))
    assert ff(x).shape == (4, 16)
    assert ff.to("cuda") is ff and ff.num_parameters() > 0
    img = np.random.randn(4, 1, 16, 16).astype(np.float32)
    assert EmbeddingCNN2D5C((1, 16, 16), (8,))(img).shape == (4, 8)
    vol = np.random.randn(2, 1, 8, 8, 8).astype(np.float32)
    assert EmbeddingCNN3D5C((1, 8, 8, 8), (8,))(vol).shape == (2, 8)

    priors = [Normal(0.0, 1.0) for _ in range(4)]
    prop = ProposalNormalNormalMixture((8,))
    dist = prop(x, priors)
    assert isinstance(dist, Mixture)
    s = dist.sample()
    assert np.shape(s)[0] == 4 and np.all(np.isfinite(np.asarray(dist.log_prob(s))))
    cat = ProposalCategoricalCategorical((8,), 5)(x, priors)
    assert isinstance(cat, Categorical)


def test_graph_reference_methods():
    from pyprob_tpu.graph import Graph
    from pyprob_tpu.trace import Trace, Variable
    from pyprob_tpu.distributions import Empirical
    import numpy as np

    def make_trace(v):
        t = Trace()
        t.add(Variable(value=np.float64(v), address="A1", address_base="A1",
                       control=True))
        t.add(Variable(value=np.float64(v + 1), address="A2",
                       address_base="A2", control=True))
        t.end(None, 0.0)
        return t

    g = Graph(Empirical(values=[make_trace(0.0), make_trace(1.0)]))
    g.compute_normalized_weights()
    for node in g.nodes:
        assert hasattr(node, "weight_normalized")
    subs = list(g.trace_graphs())
    assert len(subs) >= 1
    for tid, sub in subs:
        assert isinstance(sub, Graph) and sub.nodes
    dot = g.render_to_graphviz()
    assert dot.startswith("digraph")


def test_larc_wrapper_and_remaining_names():
    import numpy as np
    import optax
    import jax.numpy as jnp
    from pyprob_tpu.nn import LARC, InferenceNetworkBase, InferenceNetwork
    from pyprob_tpu.trace import Variable

    assert InferenceNetworkBase is InferenceNetwork
    v = Variable(value=np.float64(1.0), address="A1", address_base="A1")
    assert v.to("cuda") is v

    opt = LARC(optax.sgd(0.1), learning_rate=0.1)
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    grads = {"w": jnp.full((4, 4), 0.5), "b": jnp.full((4,), 0.5)}
    state = opt.init(params)
    updates, state2 = opt.update(grads, state, params)
    stepped = optax.apply_updates(params, updates)
    assert not np.allclose(np.asarray(stepped["w"]), np.asarray(params["w"]))
    # state round-trips through the torch-named checkpoint surface
    sd = opt.state_dict()
    assert opt.load_state_dict(sd) is sd


def test_offline_dataset_file_lru_cache():
    import os, tempfile
    from pyprob_tpu.nn.dataset import OfflineDatasetFile
    from pyprob_tpu.concurrency import Shelf

    old_cap = OfflineDatasetFile.cache_capacity
    OfflineDatasetFile.cache.clear()
    OfflineDatasetFile.cache_capacity = 2
    try:
        with tempfile.TemporaryDirectory() as d:
            files = []
            for i in range(4):
                fn = os.path.join(d, f"f{i}")
                s = Shelf(fn)
                s["num_traces"] = 1
                s["trace_0"] = float(i)
                s.close()
                files.append(OfflineDatasetFile(fn))
            # handle cache stays bounded while every file stays readable
            assert len(OfflineDatasetFile.cache) <= 2
            for i, f in enumerate(files):
                assert f[0] == float(i) and len(f) == 1
            assert len(OfflineDatasetFile.cache) <= 2
            for f in files:
                f.close()
            assert len(OfflineDatasetFile.cache) == 0
    finally:
        OfflineDatasetFile.cache_capacity = old_cap
        OfflineDatasetFile.cache.clear()
