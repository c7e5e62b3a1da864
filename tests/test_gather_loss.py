"""Gather-table loss (nn/gather_loss.py): numerical equality with the
per-trace-type loss, compile-count bounds, masking, and fallbacks.

The per-type loss is the reference-semantics baseline (reference:
pyprob/nn/inference_network_lstm.py:136-220); the gather loss must match
it to float32 round-off on mixed variable-structure batches while
compiling O(log T_max) programs instead of one per address sequence.
"""

import os

import numpy as np
import pytest
import jax

import pyprob_tpu as pp
from pyprob_tpu import util
from pyprob_tpu.models import GaussianUnknownMeanMarsaglia
from pyprob_tpu.nn.dataset import Batch, OnlineDataset
from pyprob_tpu.nn import gather_loss as gl


def _trained_net(model, num_traces=512, lstm_dim=32):
    model.learn_inference_network(
        num_traces=num_traces,
        observe_embeddings={"obs0": {"dim": 8}, "obs1": {"dim": 8}},
        inference_network=pp.InferenceNetwork.LSTM,
        batch_size=64,
        lstm_dim=lstm_dim,
    )
    return model._inference_network


def _mixed_batch(model, net, n=64):
    ds = OnlineDataset(model)
    traces = ds.next_batch(n)
    batch = Batch(traces)
    net._polymorph(batch)
    return batch


def _per_type_loss_and_grad(net, batch):
    os.environ["PYPROB_TPU_GATHER_LOSS"] = "0"
    try:
        return net._loss_and_grad(batch)
    finally:
        os.environ.pop("PYPROB_TPU_GATHER_LOSS", None)


def test_gather_matches_per_type_loss_and_grads():
    model = GaussianUnknownMeanMarsaglia()
    net = _trained_net(model)
    batch = _mixed_batch(model, net, n=64)
    assert len(batch.sub_batches) > 1  # genuinely mixed trace types

    ok_ref, loss_ref, grads_ref = _per_type_loss_and_grad(net, batch)
    net._gather_fused_update = False  # return grads instead of stepping
    out = net._try_gather_loss_and_grad(batch)
    assert out is not None, "gather loss should be eligible for Marsaglia"
    ok_g, loss_g, grads_g = out
    assert ok_ref and ok_g
    assert loss_g == pytest.approx(loss_ref, rel=1e-4)

    ref_leaves, ref_def = jax.tree_util.tree_flatten(grads_ref)
    g_leaves, g_def = jax.tree_util.tree_flatten(grads_g)
    assert ref_def == g_def
    for a, b in zip(ref_leaves, g_leaves):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5
        )


def test_gather_validation_loss_matches():
    model = GaussianUnknownMeanMarsaglia()
    net = _trained_net(model)
    batch = _mixed_batch(model, net, n=32)
    os.environ["PYPROB_TPU_GATHER_LOSS"] = "0"
    try:
        _, loss_ref = net._loss(batch)
    finally:
        os.environ.pop("PYPROB_TPU_GATHER_LOSS", None)
    out = net._try_gather_loss(batch)
    assert out is not None
    _, loss_g = out
    assert loss_g == pytest.approx(loss_ref, rel=1e-4)


def test_gather_fused_update_matches_separate_step():
    """The in-jit scatter+optimizer step (grads=None fast path) must land
    on exactly the same parameters as host scatter + _update_fn."""
    import copy

    model = GaussianUnknownMeanMarsaglia()
    net = _trained_net(model)
    batch = _mixed_batch(model, net, n=32)
    params0 = copy.deepcopy(jax.tree_util.tree_map(np.asarray, net._params))
    opt0 = copy.deepcopy(
        jax.tree_util.tree_map(np.asarray, net._opt_state)
    )

    # path A: separate grads + update
    net._gather_fused_update = False
    ok, loss_a, grads = net._try_gather_loss_and_grad(batch)
    assert ok and grads is not None
    lr = net._current_learning_rate()
    params_a, _ = net._update_fn(net._params, grads, net._opt_state, lr)

    # path B: fused (from the same starting point).  The fused program
    # compiles in the background — trigger it, wait until ready, then
    # reset to the common starting point and take the fused step.
    import time

    net._gather_fused_update = True
    net._last_layers_change_iter = -1000  # force "stable" gating
    net._try_gather_loss_and_grad(batch)  # kicks off the bg compile
    deadline = time.time() + 120
    entry = None
    while time.time() < deadline:
        entries = [
            v
            for k, v in net._loss_grad_cache.items()
            if isinstance(k, tuple) and k[0] == "gather_update"
        ]
        if entries and entries[0].get("fn") is not None:
            entry = entries[0]
            break
        time.sleep(0.1)
    assert entry is not None, "background fused-update compile never landed"
    net._params = jax.tree_util.tree_map(
        lambda x: x if not hasattr(x, "shape") else jax.numpy.asarray(x),
        params0,
    )
    net._opt_state = jax.tree_util.tree_map(
        lambda x: x if not hasattr(x, "shape") else jax.numpy.asarray(x),
        opt0,
    )
    ok, loss_b, grads_b = net._try_gather_loss_and_grad(batch)
    assert ok and grads_b is None
    assert loss_b == pytest.approx(loss_a, rel=1e-5)
    la, da = jax.tree_util.tree_flatten(params_a)
    lb, db = jax.tree_util.tree_flatten(net._params)
    assert da == db
    for a, b in zip(la, lb):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        )


def test_gather_compile_count_is_logarithmic():
    """Training across many trace types mints one gather program per
    (pow2 T, pow2 B) bucket — NOT one per address sequence."""
    model = GaussianUnknownMeanMarsaglia()
    net = _trained_net(model)
    ds = OnlineDataset(model)
    types_seen = set()
    for _ in range(6):
        batch = Batch(ds.next_batch(64))
        net._polymorph(batch)
        out = net._try_gather_loss_and_grad(batch)
        assert out is not None
        for tr in batch.traces:
            types_seen.add(tr.trace_hash())
    gather_keys = [
        k for k in net._loss_grad_cache if k[0] == "gather_lstm"
    ]
    assert len(types_seen) >= 3  # genuinely variable-structure run
    # program count is log-bounded in T (pow2 length buckets + one
    # speculative neighbour), INDEPENDENT of the number of trace types —
    # the per-type path minted >= one program per (type, row bucket)
    assert len(gather_keys) <= 6, (
        f"{len(gather_keys)} gather programs for {len(types_seen)} types"
    )


def test_gather_respects_sample_mask_steps():
    """A masked variable contributes zero loss: zeroing the mask for one
    step must change the gather loss by exactly that step's term."""
    model = GaussianUnknownMeanMarsaglia()
    net = _trained_net(model)
    batch = _mixed_batch(model, net, n=16)
    net._gather_fused_update = False
    prep = net._prepare_gather(batch)
    assert prep is not None
    reg, sig, packed, hk, sk, _ = prep
    tables = gl.stack_tables(net._params, reg, hk, sk)
    loss_fn = net._gather_loss_fn()
    full = float(loss_fn(tables, packed))
    # zero out one active (step, trace) cell
    mask = np.asarray(packed["mask"]).copy()
    t, b = np.argwhere(mask > 0)[0]
    mask2 = mask.copy()
    mask2[t, b] = 0.0
    packed2 = dict(packed)
    import jax.numpy as jnp

    packed2["mask"] = jnp.asarray(mask2)
    reduced = float(loss_fn(tables, packed2))
    assert reduced != pytest.approx(full)  # the step really contributed
    # and a fully-masked batch has exactly zero loss
    packed3 = dict(packed)
    packed3["mask"] = jnp.zeros_like(packed["mask"])
    assert float(loss_fn(tables, packed3)) == 0.0


def test_gather_disabled_by_env(monkeypatch):
    model = GaussianUnknownMeanMarsaglia()
    net = _trained_net(model)
    batch = _mixed_batch(model, net, n=16)
    monkeypatch.setenv("PYPROB_TPU_GATHER_LOSS", "0")
    assert net._try_gather_loss_and_grad(batch) is None


def test_gather_end_to_end_training_and_posterior():
    """Marsaglia IC-LSTM trained end-to-end with the gather loss engaged
    (the default path) still produces a usable guided posterior."""
    pp.set_verbosity(0)
    model = GaussianUnknownMeanMarsaglia()
    model.learn_inference_network(
        num_traces=3072,
        observe_embeddings={"obs0": {"dim": 16}, "obs1": {"dim": 16}},
        inference_network=pp.InferenceNetwork.LSTM,
        batch_size=128,
        lstm_dim=64,
        learning_rate_init=0.002,
    )
    net = model._inference_network
    assert getattr(net, "_gather_used", False), (
        "variable-structure training should engage the gather loss"
    )
    post = model.posterior_results(
        1500,
        observe={"obs0": 8, "obs1": 9},
        inference_engine=(
            pp.InferenceEngine.IMPORTANCE_SAMPLING_WITH_INFERENCE_NETWORK
        ),
        vectorized=False,
    )
    assert abs(float(post.mean) - 7.25) < 0.8


def test_gather_obs_rows_follow_sub_batch_columns():
    """Regression (r4): packed observe rows must follow the SUB-BATCH
    column order used by every other packed array, not batch.traces'
    raw generation order — the mismatch silently paired each trace's
    sampled values with another trace's observations, destroying the
    observation-conditional training signal (loss plateaued at the
    marginal; Marsaglia IC-LSTM ESS fell to ~1% vs the 1.6% floor)."""
    model = GaussianUnknownMeanMarsaglia()
    net = _trained_net(model)
    batch = _mixed_batch(model, net, n=64)
    assert len(batch.sub_batches) > 1
    ordered = [tr for sub in batch.sub_batches for tr in sub]
    # the permutation must be non-trivial for this test to bite
    assert ordered != list(batch.traces)
    prep = net._prepare_gather(batch)
    assert prep is not None
    _, _, packed, _, _, _ = prep
    for name, arr in packed["obs"].items():
        rows = np.asarray(arr)
        for b, tr in enumerate(ordered):
            np.testing.assert_array_equal(
                rows[b],
                np.asarray(
                    tr.named_value(name), dtype=rows.dtype
                ).reshape(-1),
                err_msg=f"obs '{name}' row {b} misaligned",
            )


def test_gather_loss_tracks_single_observation_perturbation():
    """Perturbing ONE trace's observation must shift the gather loss by
    exactly the per-type loss's shift — loss-VALUE equality on a fixed
    batch cannot catch row misalignment (undertrained nets are nearly
    observation-insensitive), but the per-trace pairing shows up the
    moment one observation moves."""
    model = GaussianUnknownMeanMarsaglia()
    net = _trained_net(model, num_traces=2048)
    batch = _mixed_batch(model, net, n=48)
    net._gather_fused_update = False

    def both_losses():
        out = net._try_gather_loss_and_grad(batch)
        assert out is not None
        _, loss_g, _ = out
        ok_r, loss_r, _ = _per_type_loss_and_grad(net, batch)
        return loss_g, loss_r

    g0, r0 = both_losses()
    # perturb the LAST sub-batch's first trace (a row whose packed
    # column differs from its batch.traces position)
    victim = batch.sub_batches[-1][0]
    name = next(iter(net._params["observe"].keys()))
    vars_named = [v for v in victim.variables if v.name == name]
    assert vars_named, name
    old = [v.value for v in vars_named]
    for v in vars_named:
        v.value = np.asarray(v.value) + 10.0
    g1, r1 = both_losses()
    for v, o in zip(vars_named, old):
        v.value = o
    assert (g1 - g0) == pytest.approx(r1 - r0, rel=1e-3, abs=1e-5)
    assert abs(r1 - r0) > 1e-7  # the perturbation was actually visible
