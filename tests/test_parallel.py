"""Multi-device tests on the virtual 8-device CPU mesh: sharded particle
IS, shard_map DP training, sharded MCMC chains, collectives."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pyprob_tpu as pp
from pyprob_tpu.models import GaussianUnknownMean
from pyprob_tpu.parallel import (
    data_parallel_mesh,
    pad_to_multiple,
    sharded_effective_sample_size,
    systematic_resample_indices,
)

OBS = {"obs0": 8, "obs1": 9}


def test_mesh_has_8_devices():
    mesh = data_parallel_mesh()
    assert mesh.size == 8


def test_pad_to_multiple():
    assert pad_to_multiple(13, 8) == 16
    assert pad_to_multiple(16, 8) == 16


def test_sharded_ess_matches_host():
    from jax.sharding import PartitionSpec as P

    mesh = data_parallel_mesh()
    lw = jnp.asarray(np.random.default_rng(0).normal(size=1024), jnp.float32)
    ess_sharded = jax.jit(
        jax.shard_map(
            lambda x: sharded_effective_sample_size(x, "dp"),
            mesh=mesh,
            in_specs=P("dp"),
            out_specs=P(),
            check_vma=False,
        )
    )(lw)
    from pyprob_tpu import util

    assert np.isclose(
        float(ess_sharded), util.effective_sample_size(np.asarray(lw)), rtol=1e-4
    )


def test_systematic_resample():
    lw = jnp.log(jnp.asarray([0.1, 0.2, 0.3, 0.4]))
    idx = systematic_resample_indices(jax.random.PRNGKey(0), lw, 1000)
    freqs = np.bincount(np.asarray(idx), minlength=4) / 1000
    assert np.allclose(freqs, [0.1, 0.2, 0.3, 0.4], atol=0.01)


def test_sharded_mcmc_chains():
    m = GaussianUnknownMean()
    mesh = data_parallel_mesh()
    from pyprob_tpu.inference.mcmc import vectorized_mcmc_posterior

    post = vectorized_mcmc_posterior(
        m,
        num_traces=48000,
        inference_engine=pp.InferenceEngine.RANDOM_WALK_METROPOLIS_HASTINGS,
        observe=OBS,
        mesh=mesh,
    )
    assert abs(float(post.mean) - 7.25) < 0.3
    assert abs(float(post.stddev) - math.sqrt(1 / 1.2)) < 0.3


def test_dp_training_equivalent_quality():
    m = GaussianUnknownMean()
    m.learn_inference_network(
        num_traces=8192,
        observe_embeddings={"obs0": {"dim": 16}, "obs1": {"dim": 16}},
        batch_size=512,
        learning_rate_init=0.005,
        distributed_backend="shard_map",
    )
    post = m.posterior_results(
        num_traces=4000,
        observe=OBS,
        vectorized=True,
        inference_engine=pp.InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK,
    )
    assert abs(float(post.mean) - 7.25) < 0.75
    assert post.effective_sample_size > 0.02 * 4000


def test_dryrun_multichip():
    import importlib.util, os

    spec = importlib.util.spec_from_file_location(
        "graft_entry",
        os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_entry_compiles():
    import importlib.util, os

    spec = importlib.util.spec_from_file_location(
        "graft_entry2",
        os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, (keys, obs) = mod.entry()
    results, log_w = jax.jit(fn)(keys, obs)
    assert results.shape[0] == keys.shape[0]
    assert np.isfinite(np.asarray(log_w)).all()


def test_mcmc_return_chains_gelman_rubin():
    from pyprob_tpu.inference.mcmc import vectorized_mcmc_posterior
    from pyprob_tpu import diagnostics

    m = GaussianUnknownMean()
    chains = vectorized_mcmc_posterior(
        m,
        num_traces=16000,
        inference_engine=pp.InferenceEngine.RANDOM_WALK_METROPOLIS_HASTINGS,
        observe=OBS,
        num_chains=8,
        return_chains=True,
    )
    assert len(chains) == 8
    iters, rhats = diagnostics.gelman_rubin_values(chains)
    assert rhats[-1] < 1.1  # converged
