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


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Multi-host initialization.

    Explicit parameters win; otherwise the standard JAX coordinator
    environment (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID``, also set by most cluster launchers) is used. With
    no coordinator configured anywhere this is a documented no-op
    (single-host run); a *configured but failing* initialization raises —
    silently training on 1/N of the fleet is never acceptable.

    Returns (process_index, process_count).
    """
    import os

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and num_processes is None \
            and "JAX_NUM_PROCESSES" not in os.environ:
        return jax.process_index(), jax.process_count()
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except RuntimeError as exc:
        if "already initialized" not in str(exc):
            raise
    return jax.process_index(), jax.process_count()


def per_host_seed(seed, process_index=None):
    """Fold the host id into a level-stream seed.

    Every host draws from its own deterministic ``SeedSequence`` branch —
    streams are distinct across hosts yet reproducible for a given
    (seed, host) pair independent of cluster size, preserving the
    reference's reproducible-seeding contract (``changelog.md:26,43-44``)
    across hosts (SURVEY.md §5 commitment).
    """
    if process_index is None:
        process_index = jax.process_index()
    root = seed if isinstance(seed, np.random.SeedSequence) \
        else np.random.SeedSequence(seed)
    return np.random.SeedSequence(
        entropy=root.entropy,
        spawn_key=root.spawn_key + (np.uint32(process_index),))


def is_logging_host():
    """Only host 0 writes logs in a multi-host run."""
    return jax.process_index() == 0


def gather_episodes(tree):
    """Gather per-host episode-record arrays onto every host.

    Identity in single-process runs. In multi-host runs, each leaf's
    leading axis is concatenated across processes so host 0 can log the
    fleet's episodes (the reference's deprecated Ray remote logger's
    role, safelife_logger.py:433-535, redesigned as an allgather).
    """
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(tree)
    # process_allgather stacks a new leading axis [P, ...]; merge it into
    # the episode axis.
    return jax.tree.map(
        lambda x: x.reshape((-1,) + x.shape[2:]), gathered)
