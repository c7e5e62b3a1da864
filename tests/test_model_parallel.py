"""ParallelModel: data-parallel trace generation over a real process pool
with Empirical chunk-file concatenation
(reference: tests/test_model_parallel.py:39-107)."""

import math

import numpy as np
import pytest

import pyprob_tpu as pp
from pyprob_tpu.models import GaussianUnknownMean

OBS = {"obs0": 8, "obs1": 9}


def test_parallel_prior():
    model = GaussianUnknownMean().parallel(num_workers=2)
    prior = model.prior_results(num_traces=200)
    assert prior.length == 200
    assert abs(float(prior.mean) - 1.0) < 0.6


def test_parallel_posterior_is():
    model = GaussianUnknownMean().parallel(num_workers=2)
    post = model.posterior_results(num_traces=400, observe=OBS)
    assert post.length == 400
    assert abs(float(post.mean) - 7.25) < 1.2


def test_parallel_rejects_mcmc():
    model = GaussianUnknownMean().parallel(num_workers=2)
    with pytest.raises(ValueError):
        model.posterior(
            num_traces=10,
            inference_engine=pp.InferenceEngine.LIGHTWEIGHT_METROPOLIS_HASTINGS,
            observe=OBS,
        )


def test_parallel_file_mode(tmp_path):
    model = GaussianUnknownMean().parallel(num_workers=2)
    fn = str(tmp_path / "parallel_traces")
    post = model.posterior_results(num_traces=200, observe=OBS, file_name=fn)
    assert post.length == 200
    # chunk files kept in file mode (reference: model.py:395-397)
    import glob

    assert len(glob.glob(fn + "_chunk_*")) == 2
