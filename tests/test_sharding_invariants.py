"""Sharding is a tested invariant, not a hope.

Every mesh-aware path is run on the 8-virtual-device CPU mesh under
``pyprob_tpu.parallel.capture_jit`` and must prove two things:

  (a) the compiled programs' particle/chain arrays actually carry a
      ``dp`` NamedSharding over all 8 devices (a dropped ``device_put``
      or a partitioner decision to replicate fails the test), and
      cross-particle engines show partitioner-inserted collectives in
      their post-SPMD optimized HLO;
  (b) seed-fixed results are invariant across mesh widths 1/2/4/8 —
      sharding is layout, never math.

The reference's parallelism is explicit torch.distributed code that
fails loudly (reference: pyprob/nn/inference_network.py:290-341); XLA's
implicit SPMD fails silently, so this suite is the loudness.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pyprob_tpu as pp
from pyprob_tpu import InferenceEngine
from pyprob_tpu.models import GaussianUnknownMean
from pyprob_tpu.parallel import capture_jit, get_mesh

OBS = {"obs0": 8.0, "obs1": 9.0}
TRUE_MEAN, TRUE_STD = 7.25, 0.9129452507276277


def _mesh(n=8):
    assert len(jax.devices()) >= n
    return get_mesh(num_devices=n)


def _dp_records(records, min_devices=8):
    return [r for r in records if r.dp_sharded_outputs(min_devices)]


def _assert_posterior_sane(post, tol=0.75):
    assert abs(float(post.mean) - TRUE_MEAN) < tol


# ---------------------------------------------------------------------------
# (a) compiled-program sharding assertions, engine by engine
# ---------------------------------------------------------------------------


def test_is_particles_dp_sharded():
    m = GaussianUnknownMean()  # fresh instance: fresh _jit_run_cache entry
    mesh = _mesh()
    with capture_jit() as records:
        post = m.posterior_results(
            64, observe=OBS, vectorized=True, mesh=mesh
        )
    _assert_posterior_sane(post)
    dp = _dp_records(records)
    assert dp, f"no dp-sharded compiled program in {records}"
    # the particle program consumes dp-sharded keys
    assert any(r.dp_sharded_args(8) for r in records)


def test_is_unsharded_without_mesh():
    # control: no mesh → nothing should claim dp sharding
    m = GaussianUnknownMean()
    with capture_jit(capture_hlo=False) as records:
        m.posterior_results(64, observe=OBS, vectorized=True)
    assert not _dp_records(records, min_devices=2)


def test_smc_particles_dp_sharded_with_collectives():
    m = GaussianUnknownMean()
    mesh = _mesh()
    with capture_jit() as records:
        post = m.posterior_results(
            64,
            observe=OBS,
            inference_engine=InferenceEngine.SEQUENTIAL_MONTE_CARLO,
            resample_threshold=1.0,  # force resampling: cross-particle comm
            mesh=mesh,
        )
    _assert_posterior_sane(post)
    dp = _dp_records(records)
    assert dp, f"no dp-sharded SMC program in {records}"
    # weight normalization / resampling must cross shards
    assert any(r.has_collectives() for r in dp), (
        f"no collectives in dp-sharded SMC programs: {dp}"
    )


def test_mcmc_chains_dp_sharded():
    m = GaussianUnknownMean()
    mesh = _mesh()
    with capture_jit(capture_hlo=False) as records:
        post = m.posterior_results(
            64,
            observe=OBS,
            inference_engine=InferenceEngine.RANDOM_WALK_METROPOLIS_HASTINGS,
            vectorized=True,
            num_chains=8,
            burn_in=0,
            mesh=mesh,
        )
    assert post.length > 0
    dp = _dp_records(records)
    assert dp, f"no dp-sharded MCMC program in {records}"


def test_hmc_chains_dp_sharded():
    m = GaussianUnknownMean()
    mesh = _mesh()
    with capture_jit(capture_hlo=False) as records:
        post = m.posterior_results(
            64,
            observe=OBS,
            inference_engine=InferenceEngine.HAMILTONIAN_MONTE_CARLO,
            num_chains=8,
            burn_in=4,
            leapfrog_steps=3,
            mesh=mesh,
        )
    assert post.length > 0
    assert _dp_records(records), f"no dp-sharded HMC program in {records}"


def test_nuts_chains_dp_sharded():
    m = GaussianUnknownMean()
    mesh = _mesh()
    with capture_jit(capture_hlo=False) as records:
        post = m.posterior_results(
            32,
            observe=OBS,
            inference_engine=InferenceEngine.NO_U_TURN_SAMPLER,
            num_chains=8,
            burn_in=4,
            max_tree_depth=3,
            mesh=mesh,
        )
    assert post.length > 0
    assert _dp_records(records), f"no dp-sharded NUTS program in {records}"


def test_pt_ensembles_dp_sharded():
    m = GaussianUnknownMean()
    mesh = _mesh()
    with capture_jit(capture_hlo=False) as records:
        post = m.posterior_results(
            32,
            observe=OBS,
            inference_engine=InferenceEngine.PARALLEL_TEMPERING,
            num_chains=8,
            burn_in=4,
            num_temperatures=2,
            leapfrog_steps=2,
            mesh=mesh,
        )
    assert post.length > 0
    assert _dp_records(records), f"no dp-sharded PT program in {records}"


def test_tempered_smc_dp_sharded_with_collectives():
    m = GaussianUnknownMean()
    mesh = _mesh()
    with capture_jit() as records:
        post = m.posterior_results(
            64,
            observe=OBS,
            inference_engine=InferenceEngine.TEMPERED_SMC,
            rejuvenation_steps=1,
            leapfrog_steps=2,
            mesh=mesh,
        )
    assert post.length > 0
    dp = _dp_records(records)
    assert dp, f"no dp-sharded tempered-SMC program in {records}"
    assert any(r.has_collectives() for r in dp)


def test_vi_draws_dp_sharded():
    m = GaussianUnknownMean()
    mesh = _mesh()
    with capture_jit(capture_hlo=False) as records:
        post = m.posterior_results(
            64,
            observe=OBS,
            inference_engine=InferenceEngine.VARIATIONAL_INFERENCE,
            vi_steps=20,
            vi_particles=8,
            mesh=mesh,
        )
    assert post.length > 0
    assert _dp_records(records), f"no dp-sharded VI program in {records}"


def test_svgd_particles_dp_sharded():
    m = GaussianUnknownMean()
    mesh = _mesh()
    with capture_jit(capture_hlo=False) as records:
        post = m.posterior_results(
            64,
            observe=OBS,
            inference_engine=(
                InferenceEngine.STEIN_VARIATIONAL_GRADIENT_DESCENT
            ),
            svgd_steps=10,
            svgd_particles=16,
            mesh=mesh,
        )
    assert post.length > 0
    assert _dp_records(records), f"no dp-sharded SVGD program in {records}"


def test_laplace_draws_dp_sharded():
    m = GaussianUnknownMean()
    mesh = _mesh()
    with capture_jit(capture_hlo=False) as records:
        post = m.posterior_results(
            64,
            observe=OBS,
            inference_engine=InferenceEngine.LAPLACE,
            map_steps=30,
            mesh=mesh,
        )
    assert post.length > 0
    assert _dp_records(records), f"no dp-sharded Laplace program in {records}"


def test_train_step_psum_collectives():
    """The shard_map DP training step must all-reduce gradients
    (the XLA-collective replacement for the reference's all_reduce at
    reference: pyprob/nn/inference_network.py:290-341)."""
    import __graft_entry__ as ge
    from pyprob_tpu.nn import Batch
    from pyprob_tpu.util import Optimizer, LearningRateScheduler

    mesh = _mesh()
    model, net, dataset = ge._build_model_and_network(lstm_dim=16)
    net._dp_mesh = mesh
    net._optimizer_type = Optimizer.ADAM
    net._momentum = 0.9
    net._weight_decay = 1e-5
    net._learning_rate_scheduler_type = LearningRateScheduler.NONE
    net._learning_rate_init = 1e-3
    net._learning_rate_end = 1e-6
    net._create_optimizer()
    batch = Batch(dataset.next_batch(16))
    net._polymorph(batch)
    net._create_optimizer()
    with capture_jit() as records:
        success, loss, grads = net._loss_and_grad(batch)
    assert success
    assert any(r.has_collectives() for r in records), (
        f"no all-reduce in the DP train step: {records}"
    )


# ---------------------------------------------------------------------------
# (b) mesh-width invariance: sharding is layout, never math
# ---------------------------------------------------------------------------


def _is_means_by_width(widths, n=64):
    means = []
    for w in widths:
        pp.seed(321)
        m = GaussianUnknownMean()
        post = m.posterior_results(
            n, observe=OBS, vectorized=True, mesh=get_mesh(num_devices=w)
        )
        means.append(float(post.mean))
    return means


def test_is_mesh_width_invariant():
    means = _is_means_by_width([1, 2, 4, 8])
    for other in means[1:]:
        assert abs(other - means[0]) < 1e-5, means


def test_smc_mesh_width_invariant():
    means = []
    for w in [1, 2, 4, 8]:
        pp.seed(321)
        m = GaussianUnknownMean()
        post = m.posterior_results(
            64,
            observe=OBS,
            inference_engine=InferenceEngine.SEQUENTIAL_MONTE_CARLO,
            resample_threshold=1.0,
            mesh=get_mesh(num_devices=w),
        )
        means.append(float(post.mean))
    for other in means[1:]:
        assert abs(other - means[0]) < 1e-4, means


def test_hmc_mesh_width_invariant():
    means = []
    for w in [1, 4, 8]:
        pp.seed(321)
        m = GaussianUnknownMean()
        post = m.posterior_results(
            64,
            observe=OBS,
            inference_engine=InferenceEngine.HAMILTONIAN_MONTE_CARLO,
            num_chains=8,
            burn_in=4,
            leapfrog_steps=3,
            mesh=get_mesh(num_devices=w),
        )
        means.append(float(post.mean))
    for other in means[1:]:
        assert abs(other - means[0]) < 1e-3, means
