"""Device mesh and sharding helpers.

The scaling story (SURVEY.md §2.3): the env batch is the data axis — lanes
are sharded over every chip (``env`` mesh axis, ICI within a slice, DCN
across hosts), while learner parameters stay replicated; XLA inserts the
gradient ``psum`` from the sharding annotations. This replaces the
reference's serial Python loop over 16 env objects and its absent
distributed backend.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_AXIS = "env"


def make_mesh(num_devices=None, axis_name=ENV_AXIS, devices=None):
    """A 1-D mesh over the fastest available axis."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh, axis_name=ENV_AXIS):
    """Shard the leading (lane) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def shard_env_state(tree, mesh, axis_name=ENV_AXIS):
    """Place a batched pytree with its leading axis split over the mesh."""
    sh = batch_sharding(mesh, axis_name)
    return jax.device_put(tree, sh)


def replicate(tree, mesh):
    return jax.device_put(tree, replicated_sharding(mesh))


def initialize_distributed():
    """Multi-host initialization (no-op when single-process)."""
    if jax.process_count() == 1:
        try:
            jax.distributed.initialize()
        except Exception:
            pass  # already initialized or single-host without coordinator
