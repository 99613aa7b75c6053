"""Spatial sharding of large boards: halo-exchange CA advance.

The grid-world cousin of context parallelism (SURVEY.md §5): the standard
26x26 boards scale over the *batch* axis, but very large boards (big
experimental worlds, ``GameOfLife``-style soups) can exceed one chip's
comfortable working set. Here a single board is sharded **row-wise across
the device mesh**, and each advance step exchanges a one-row halo with
the two ring neighbors via ``jax.lax.ppermute`` (ICI neighbor exchange —
exactly the collective the 3x3 stencil needs, and nothing more). The
toroidal wrap falls out of the ring topology: shard 0's top halo is the
last shard's bottom row.

Everything runs inside one ``shard_map``, so XLA overlaps the two-row
ppermute with local compute and no host sync is involved. Results are
bit-identical to the single-device kernel (asserted in
``tests/test_spatial.py``).
"""

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..core import advance
from .mesh import ENV_AXIS


def _nb_sum_slab(x):
    """3x3 neighborhood sum over a halo slab [HL+2, W] -> [HL, W]:
    horizontal wrap is local; vertical neighbors come from the halo rows."""
    r = x + jnp.roll(x, 1, axis=-1) + jnp.roll(x, -1, axis=-1)
    return r[..., :-2, :] + r[..., 1:-1, :] + r[..., 2:, :]


def _nb_or_slab(x):
    r = x | jnp.roll(x, 1, axis=-1) | jnp.roll(x, -1, axis=-1)
    return r[..., :-2, :] | r[..., 1:-1, :] | r[..., 2:, :]


def _exchange_halos(local_rows, axis_name, num_shards):
    """One-row halo exchange around the mesh ring.

    Returns (top_halo, bottom_halo): the last row of the previous shard
    and the first row of the next shard (toroidal over the ring).
    """
    if num_shards == 1:
        return local_rows[-1:], local_rows[:1]
    fwd = [(i, (i + 1) % num_shards) for i in range(num_shards)]
    bwd = [(i, (i - 1) % num_shards) for i in range(num_shards)]
    top = jax.lax.ppermute(local_rows[-1:], axis_name, perm=fwd)
    bottom = jax.lax.ppermute(local_rows[:1], axis_name, perm=bwd)
    return top, bottom


def _advance_local(board, spawn_lt, axis_name, num_shards):
    """Advance one shard given its spawn draws, exchanging halos."""
    top, bottom = _exchange_halos(board, axis_name, num_shards)
    slab = jnp.concatenate([top, board, bottom], axis=0)
    packed, orv = advance.pack_counters(slab)
    stats = advance.stats_from_aggregates(
        _nb_sum_slab(packed), _nb_or_slab(orv))
    # Shared canonical rule body — only the aggregation differs (halo
    # slabs instead of toroidal rolls).
    return advance.apply_rule(board, stats, spawn_lt)


def advance_sharded_given_spawns(board, spawn_lt, mesh,
                                 axis_name=ENV_AXIS):
    """One CA step of a row-sharded board with supplied spawn coin flips.

    board : int32[H, W] — H must divide evenly over the mesh axis.
    spawn_lt : bool[H, W], sharded identically.
    """
    n = mesh.shape[axis_name]
    fn = functools.partial(_advance_local, axis_name=axis_name,
                          num_shards=n)
    return shard_map(
        fn, mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name, None)),
        out_specs=P(axis_name, None))(board, spawn_lt)


def advance_sharded(board, key, spawn_prob, mesh, axis_name=ENV_AXIS,
                    stochastic=True):
    """One (optionally stochastic) CA step of a row-sharded board.

    Spawn draws are generated shard-locally from ``key`` folded with the
    shard index — independent per-cell uniforms, the same fast-mode
    contract as :func:`safelife_tpu.core.advance.advance_board`.
    """
    n = mesh.shape[axis_name]

    def local(b):
        if stochastic:
            k = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
            u = jax.random.uniform(k, b.shape, dtype=jnp.float32)
            spawn_lt = u < advance.spawn_threshold(spawn_prob)
        else:
            spawn_lt = jnp.zeros(b.shape, bool)
        return _advance_local(b, spawn_lt, axis_name, n)

    return shard_map(local, mesh=mesh, in_specs=P(axis_name, None),
                     out_specs=P(axis_name, None))(board)


def advance_sharded_nstep(board, key, spawn_prob, n_steps, mesh,
                          axis_name=ENV_AXIS, stochastic=True):
    """``n_steps`` sharded CA steps under one jitted scan; the per-step
    halo exchanges stay inside the scan (no host round trips)."""
    n = mesh.shape[axis_name]

    def local(b, keys):
        def step(bb, k):
            if stochastic:
                kk = jax.random.fold_in(k, jax.lax.axis_index(axis_name))
                u = jax.random.uniform(kk, bb.shape, dtype=jnp.float32)
                spawn_lt = u < advance.spawn_threshold(spawn_prob)
            else:
                spawn_lt = jnp.zeros(bb.shape, bool)
            return _advance_local(bb, spawn_lt, axis_name, n), None

        out, _ = jax.lax.scan(step, b, keys)
        return out

    keys = jax.random.split(key, n_steps)
    return shard_map(
        local, mesh=mesh,
        in_specs=(P(axis_name, None), P()),
        out_specs=P(axis_name, None))(board, keys)
