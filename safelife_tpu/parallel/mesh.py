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
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
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


def training_mesh():
    """The global mesh for fleet training, or None single-process.

    Single-process runs keep plain jit (one device, no sharding
    overhead); multi-process runs train one global SPMD program: env
    lanes sharded over every device of every host, learner replicated,
    gradient reductions over ICI/DCN inserted by XLA.
    """
    if jax.process_count() == 1:
        return None
    return make_mesh()


def global_batch(tree, mesh):
    """Lift host-identical batched arrays into global lane-sharded arrays.

    Every host must hold the same full value (guaranteed here by seeding
    reset identically); each host contributes its addressable shards.
    """
    sh = batch_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.make_array_from_callback(
            np.shape(x), sh, lambda idx, _x=x: np.asarray(_x)[idx]), tree)


def global_replicated(tree, mesh):
    """Lift host-identical values into globally replicated arrays."""
    sh = replicated_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.make_array_from_callback(
            np.shape(x), sh, lambda idx, _x=x: np.asarray(_x)[idx]), tree)


def allgather_level_pool(pool):
    """Concatenate every host's level pool into one global pool.

    Preserves the per-host level streams (SURVEY §5's SeedSequence
    folding: each host generates *different* levels) while keeping the
    device pool replicated-identical on every host — the requirement for
    the pool to ride through the SPMD training step as a plain input.
    Identity when single-process. Static pool flags AND across hosts.
    """
    if jax.process_count() == 1:
        return pool
    from jax.experimental import multihost_utils

    def gather(x):
        out = multihost_utils.process_allgather(np.asarray(x))
        return out.reshape((-1,) + out.shape[2:])  # [P, L, ...] -> [P*L,...]

    arrays = jax.tree.map(gather, pool)
    flags = np.asarray(multihost_utils.process_allgather(np.asarray([
        pool.rows_packed, pool.all_goals_static, pool.spawner_free])))
    flags = flags.all(axis=0)
    return arrays.replace(rows_packed=bool(flags[0]),
                          all_goals_static=bool(flags[1]),
                          spawner_free=bool(flags[2]))


def addressable_values(x):
    """This process's view of an array as one host ndarray.

    Fully-addressable arrays (single-process, or replicated) fetch
    whole; globally sharded arrays concatenate the local shards — the
    right semantics for per-lane fields like ``EnvState.level_idx``
    where each host only needs (and can only see) its own lanes.
    """
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        return np.concatenate(
            [np.asarray(s.data) for s in x.addressable_shards])
    return np.asarray(x)


def gather_episodes(tree):
    """Materialize episode-record arrays fully on every host.

    Identity in single-process runs. In multi-host runs (the reference's
    deprecated Ray remote logger's role, safelife_logger.py:433-535,
    redesigned over collectives): global jax arrays from the SPMD
    training step are assembled via allgather of their missing shards;
    plain host-local arrays are concatenated across processes along the
    episode axis.
    """
    if jax.process_count() == 1:
        # One bulk fetch: downstream consumers index these arrays
        # repeatedly per finished lane, and each np.asarray of a device
        # array would be its own (tunneled) transfer.
        return jax.device_get(tree)
    from jax.experimental import multihost_utils

    def gather(x):
        if isinstance(x, jax.Array):
            if x.is_fully_addressable:
                return np.asarray(x)
            return np.asarray(
                multihost_utils.process_allgather(x, tiled=True))
        out = multihost_utils.process_allgather(np.asarray(x))
        return out.reshape((-1,) + out.shape[2:])

    return jax.tree.map(gather, tree)
