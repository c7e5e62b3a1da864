"""Factory for a subprocess PosteriorServer (used by test/verify drives).

PosteriorServer.spawn("tests.extra.serving_factory:make_service", ...)
builds the model and service inside the subprocess.
"""

import jax

jax.config.update("jax_platforms", "cpu")

from pyprob_tpu.models import GaussianUnknownMean
from pyprob_tpu.serving import PosteriorService


def make_service():
    return PosteriorService(
        GaussianUnknownMean(), num_traces=10000, vectorized=True
    )
