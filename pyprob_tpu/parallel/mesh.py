"""Device mesh utilities.

The reference scales with torch.distributed process groups
(reference: pyprob/nn/inference_network.py:387-395); here scaling is a
``jax.sharding.Mesh``: particles and batch rows shard over a 1-D ``dp``
axis riding ICI, with XLA inserting the collectives.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def get_mesh(num_devices=None, axis_name="dp", devices=None):
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis_name,))


def data_parallel_mesh(num_devices=None):
    return get_mesh(num_devices=num_devices, axis_name="dp")


def replicated(mesh):
    return NamedSharding(mesh, PartitionSpec())


def sharded(mesh, axis_name="dp"):
    return NamedSharding(mesh, PartitionSpec(axis_name))


def pad_to_multiple(n, m):
    """Smallest n' >= n with n' % m == 0."""
    return ((n + m - 1) // m) * m
