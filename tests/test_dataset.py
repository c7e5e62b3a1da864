"""Dataset tests: offline save/sort/shard, samplers, multi-node sharded
sorting simulated in one process (reference: tests/test_dataset.py:110-142)."""

import math
import os

import numpy as np
import pytest

import pyprob_tpu as pp
from pyprob_tpu.distributions import Normal, Uniform
from pyprob_tpu.nn import (
    Batch,
    OnlineDataset,
    OfflineDataset,
    TraceBatchSampler,
    DistributedTraceBatchSampler,
    prune_trace,
)


class GUM(pp.Model):
    def forward(self):
        mu = pp.sample(Normal(1.0, math.sqrt(5.0)))
        likelihood = Normal(mu, math.sqrt(2.0))
        pp.observe(likelihood, name="obs0")
        pp.observe(likelihood, name="obs1")
        return mu


class VariableLengthModel(pp.Model):
    def forward(self):
        n = 0
        while True:
            x = pp.sample(Uniform(0.0, 1.0))
            n += 1
            if float(x) < 0.5 or n >= 4:
                break
        pp.observe(Normal(float(n), 1.0), name="obs0")
        return n


def _make_dataset(tmp_path, model, num_traces=200, per_file=50):
    d = str(tmp_path / "dataset")
    model.save_dataset(d, num_traces=num_traces, num_traces_per_file=per_file)
    return d


def test_online_dataset():
    ds = OnlineDataset(GUM())
    t = ds[0]
    assert t.length_controlled == 1
    assert "obs0" in t.named_variables
    # PRIOR_FOR_INFERENCE_NETWORK: observes receive sampled values
    assert t.named_variables["obs0"].value is not None
    batch = ds.next_batch(32)
    assert len(batch) == 32


def test_offline_dataset_roundtrip(tmp_path):
    d = _make_dataset(tmp_path, GUM())
    ds = OfflineDataset(d)
    assert len(ds) == 200
    t = ds[0]
    assert t.length_controlled == 1
    assert t.variables_controlled[0].distribution is not None


def test_offline_sorted_indices(tmp_path):
    d = _make_dataset(tmp_path, VariableLengthModel())
    ds = OfflineDataset(d)
    hashes = [ds[int(i)].trace_hash() for i in ds.sorted_indices]
    assert hashes == sorted(hashes)


def test_trace_batch_sampler(tmp_path):
    d = _make_dataset(tmp_path, VariableLengthModel())
    ds = OfflineDataset(d)
    sampler = TraceBatchSampler(ds, batch_size=16)
    seen = [i for batch in sampler for i in batch]
    assert sorted(seen) == list(range(len(ds)))
    # sorted batching keeps similar traces together: most batches have 1 type
    type_counts = []
    for batch in sampler:
        traces = [ds[int(i)] for i in batch]
        type_counts.append(len({t.trace_hash() for t in traces}))
    assert np.mean(type_counts) < 3


def test_distributed_sampler_partition(tmp_path):
    # simulate 4 ranks in one process (reference test strategy, SURVEY §4)
    d = _make_dataset(tmp_path, VariableLengthModel())
    ds = OfflineDataset(d)
    world = 4
    all_batches = {}
    for rank in range(world):
        sampler = DistributedTraceBatchSampler(
            ds, batch_size=8, rank=rank, world_size=world
        )
        all_batches[rank] = list(iter(sampler))
    # disjoint across ranks
    for r1 in range(world):
        for r2 in range(r1 + 1, world):
            ids1 = {i for b in all_batches[r1] for i in b}
            ids2 = {i for b in all_batches[r2] for i in b}
            assert ids1.isdisjoint(ids2)
    # equal batch counts across ranks (synchronous SGD requirement)
    counts = [len(v) for v in all_batches.values()]
    assert len(set(counts)) == 1


def test_multinode_save_sorted(tmp_path):
    # Multi-node sharded sorting simulated by calling save_sorted with
    # disjoint file ranges (reference: tests/test_dataset.py:110-142)
    d = _make_dataset(tmp_path, VariableLengthModel())
    ds = OfflineDataset(d)
    sorted_dir = str(tmp_path / "sorted")
    num_files = ds.save_sorted(
        sorted_dir, num_traces_per_file=50, begin_file_index=0, end_file_index=2
    )
    ds.save_sorted(
        sorted_dir,
        num_traces_per_file=50,
        begin_file_index=2,
        end_file_index=num_files,
    )
    ds2 = OfflineDataset(sorted_dir)
    assert len(ds2) == len(ds)
    hashes = [ds2[i].trace_hash() for i in range(len(ds2))]
    assert hashes == sorted(hashes)


def test_batch_sub_batches():
    m = VariableLengthModel()
    traces = [prune_trace(m.sample()) for _ in range(40)]
    batch = Batch(traces)
    assert batch.size == 40
    assert sum(len(s) for s in batch.sub_batches) == 40
    # all traces in a sub-batch share the controlled address sequence
    for sub in batch.sub_batches:
        assert len({t.trace_hash() for t in sub}) == 1
