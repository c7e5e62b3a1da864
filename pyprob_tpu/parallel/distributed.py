"""Multi-host initialization and helpers.

On a real pod slice each host runs the same program;
``initialize_multihost`` wraps ``jax.distributed.initialize`` (the
TPU-native replacement for the reference's
``torch.distributed.init_process_group``, reference:
pyprob/nn/inference_network.py:391) and returns (rank, world_size,
local_device_count).  The DistributedTraceBatchSampler and the
``distributed_rank``/``distributed_world_size`` arguments of
``InferenceNetwork.optimize`` consume these directly.

Single-host multi-device parallelism does not need this — use
``distributed_backend='shard_map'`` (batch rows shard over the local mesh)
or the mesh arguments of the compiled tier.
"""

from __future__ import annotations

import jax

from .. import util


def initialize_multihost(
    coordinator_address=None, num_processes=None, process_id=None
):
    """Initialize JAX multi-host collectives.  With no arguments, relies on
    the TPU pod environment's auto-detection."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    rank = jax.process_index()
    world_size = jax.process_count()
    util.init_distributed_print(rank, world_size)
    return rank, world_size, jax.local_device_count()


def global_mesh(axis_name="dp"):
    """1-D mesh over every device in the (possibly multi-host) job —
    collectives ride ICI within a slice and DCN across slices, inserted by
    XLA from the sharding annotations."""
    import numpy as np
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis_name,))
