"""The cellular-automaton physics step, TPU-native.

This module implements the exact SafeLife advance rule (semantics parity with
the reference C kernel ``safelife/speedups_src/advance_board.c:12-125``) as a
vectorized, batched XLA program over int32 boards.

The reference accumulates neighborhood information with two sequential 1-D
passes of packed bit tricks. That formulation is order-dependent in appearance
only — the consensus logic reduces to order-independent statements about the
3x3 neighborhood (including the cell itself):

* ``count``      – number of alive cells in the 3x3 block (self included).
* ``flags1``     – OR of PRESERVING / INHIBITING / SPAWNING over the block.
* ``consensus``  – the color bits (and the destructible marker, which the C
  kernel temporarily stores in the exit-bit position: ``advance_board.c:45-47``)
  that appear in **at least two alive** cells of the block.  Note that because
  the destructible bit is OR-copied onto bit 8, alive cells that carry the
  EXIT flag also count toward destructibility consensus — we replicate that
  quirk exactly.
* ``spawn color`` – OR of the colors of all SPAWNING cells in the block,
  merged into the consensus colors (``advance_board.c:19``).

Update rule (``advance_board.c:94-124``):

* live cell survives (value copied) iff it is FROZEN, or any neighbor is
  PRESERVING, or count ∈ {3, 4}; else it dies to 0.
* dead cell: if FROZEN or any neighbor INHIBITING → unchanged; elif count == 3
  → newborn ``ALIVE | consensus_colors | consensus_destructible``; elif any
  neighbor SPAWNING and an independent uniform draw < spawn_prob → spawned
  ``ALIVE | DESTRUCTIBLE | consensus_colors``; else unchanged.

Randomness: the reference draws one ``next_double`` from the global NumPy
bit generator per *eligible* cell in raster order (``advance_board.c:115``).
Two modes are provided here:

* **fast mode** (default, for training): one independent uniform per cell via
  ``jax.random`` counters — identical distribution, not the same stream.
* **oracle mode** (:mod:`safelife_tpu.core.pcg64`): a PCG64 emulator draws in
  raster order so trajectories match the reference bit-for-bit under the same
  seed, even for stochastic (spawner) levels.
"""

import jax
import jax.numpy as jnp

from . import cells as C

# The C kernel compares ``next_double() < (float)spawn_prob`` where spawn_prob
# narrows through a C ``float`` (advance_board.c:34-36,115). We replicate by
# rounding the threshold to float32 before the comparison.


def _nb_sum(x):
    """Sum of the 3x3 neighborhood (self included) with toroidal wrap."""
    r = x + jnp.roll(x, 1, axis=-1) + jnp.roll(x, -1, axis=-1)
    return r + jnp.roll(r, 1, axis=-2) + jnp.roll(r, -1, axis=-2)


def _nb_or(x):
    """Bitwise OR over the 3x3 neighborhood (self included), wrapped."""
    r = x | jnp.roll(x, 1, axis=-1) | jnp.roll(x, -1, axis=-1)
    return r | jnp.roll(r, 1, axis=-2) | jnp.roll(r, -1, axis=-2)


def pack_counters(board):
    """Per-cell packed values feeding the two neighborhood aggregations.

    Returns (packed, orv): ``packed`` carries the five counters (alive,
    destructible2, color r/g/b) in 5-bit lanes of one int32 so a single
    separable neighborhood *sum* covers all of them (max count 9 < 32, so
    lanes cannot carry); ``orv`` carries the PRESERVING/INHIBITING/
    SPAWNING flags plus spawner colors for the neighborhood *OR*.
    Exposed separately so spatially-sharded advances
    (:mod:`safelife_tpu.parallel.spatial`) can aggregate over halo slabs.
    """
    # Copy the destructible bit onto bit 8 so destructibility flows through
    # the same machinery as colors (parity: advance_board.c:45-47).
    m = board | ((board & C.DESTRUCTIBLE) << 5)

    alive = m & 1
    packed = (
        alive
        | (((m >> 8) & alive) << 5)
        | (((m >> 9) & alive) << 10)
        | (((m >> 10) & alive) << 15)
        | (((m >> 11) & alive) << 20)
    )
    spawner = (m >> C.SPAWNING_BIT) & 1
    orv = (m & (C.PRESERVING | C.INHIBITING | C.SPAWNING)) | ((m & C.COLORS) * spawner)
    return packed, orv


def stats_from_aggregates(s, orred):
    """Unpack neighborhood (sum, OR) aggregates into the rule's inputs."""
    count = s & 31
    cnt_d2 = (s >> 5) & 31
    cnt_r = (s >> 10) & 31
    cnt_g = (s >> 15) & 31
    cnt_b = (s >> 20) & 31

    flags = orred & (C.PRESERVING | C.INHIBITING | C.SPAWNING)
    spawn_colors = orred & C.COLORS

    consensus_colors = (
        jnp.where(cnt_r >= 2, C.COLOR_R, 0)
        | jnp.where(cnt_g >= 2, C.COLOR_G, 0)
        | jnp.where(cnt_b >= 2, C.COLOR_B, 0)
        | spawn_colors
    )
    consensus_destructible = jnp.where(cnt_d2 >= 2, C.DESTRUCTIBLE, 0)
    return count, flags, consensus_colors, consensus_destructible


def neighborhood_stats(board):
    """Compute all 3x3 neighborhood aggregates the advance rule needs.

    Parameters
    ----------
    board : int32[..., H, W]

    Returns
    -------
    count : int32[..., H, W]
        Alive count in the 3x3 block (self included), in [0, 9].
    flags : int32[..., H, W]
        OR of the PRESERVING/INHIBITING/SPAWNING bits over the block.
    consensus_colors : int32[..., H, W]
        Color bits (at COLOR_BIT..COLOR_BIT+2) present in >=2 alive cells of
        the block, OR'd with the colors of all spawner cells in the block.
    consensus_destructible : int32[..., H, W]
        DESTRUCTIBLE bit (at DESTRUCTIBLE_BIT) where >=2 alive cells of the
        block are destructible-or-exit (the C kernel's bit-8 aliasing).
    """
    packed, orv = pack_counters(board)
    return stats_from_aggregates(_nb_sum(packed), _nb_or(orv))


def advance_board_given_spawns(board, spawn_draw_lt_prob):
    """One physics step with externally supplied spawn coin flips.

    Parameters
    ----------
    board : int32[..., H, W]
    spawn_draw_lt_prob : bool[..., H, W]
        Whether the uniform draw for this cell landed below spawn_prob. Only
        consulted for cells that are spawn-eligible; supplying independent
        draws for every cell is distribution-identical to the reference's
        sequential raster draws (fast mode), while the oracle mode supplies
        draws generated in raster order from an emulated PCG64 stream.

    Returns
    -------
    new_board : int32[..., H, W]
    """
    return apply_rule(board, neighborhood_stats(board),
                      spawn_draw_lt_prob)


def apply_rule(board, stats, spawn_lt):
    """The SafeLife update rule given neighborhood stats.

    The single canonical implementation — the spatially-sharded advance
    (:mod:`safelife_tpu.parallel.spatial`) applies the same function to
    halo-slab aggregates, so a rule fix here fixes every path.
    """
    count, flags, cons_colors, cons_destr = stats

    alive = (board & C.ALIVE) != 0
    frozen = (board & C.FROZEN) != 0
    preserved = (flags & C.PRESERVING) != 0
    inhibited = (flags & C.INHIBITING) != 0
    spawn_nbr = (flags & C.SPAWNING) != 0

    survives = frozen | preserved | (count == 3) | (count == 4)
    live_out = jnp.where(survives, board, 0)

    newborn = C.ALIVE | cons_colors | cons_destr
    spawned = C.ALIVE | C.DESTRUCTIBLE | cons_colors
    dead_out = jnp.where(
        frozen | inhibited,
        board,
        jnp.where(
            count == 3,
            newborn,
            jnp.where(spawn_nbr & spawn_lt, spawned, board),
        ),
    )
    return jnp.where(alive, live_out, dead_out)


def spawn_eligible(board):
    """Cells for which the reference kernel consumes one random draw.

    A draw happens iff the cell is dead, not frozen, has no inhibiting
    neighbor, has an alive-neighbor count != 3, and has a spawning neighbor
    (parity: the fall-through chain at advance_board.c:96-124).
    """
    count, flags, _, _ = neighborhood_stats(board)
    alive = (board & C.ALIVE) != 0
    frozen = (board & C.FROZEN) != 0
    inhibited = (flags & C.INHIBITING) != 0
    spawn_nbr = (flags & C.SPAWNING) != 0
    return (~alive) & (~frozen) & (~inhibited) & (count != 3) & spawn_nbr


def spawn_threshold(spawn_prob):
    """The effective spawn threshold after the C float narrowing."""
    return jnp.asarray(spawn_prob, jnp.float32)


def advance_board(board, key, spawn_prob):
    """One physics step in fast mode (independent per-cell uniforms).

    Parameters
    ----------
    board : int32[..., H, W]
    key : jax PRNG key
    spawn_prob : float or float32[...] broadcastable to the batch shape.
    """
    u = jax.random.uniform(key, board.shape, dtype=jnp.float32)
    thresh = spawn_threshold(spawn_prob)
    if thresh.ndim > 0:
        thresh = thresh[..., None, None]  # broadcast batch dims over (H, W)
    return advance_board_given_spawns(board, u < thresh)


def advance_board_deterministic(board):
    """One physics step assuming no spawners fire (exactly correct for
    spawner-free boards, where no draws are consumed)."""
    return advance_board_given_spawns(board, jnp.zeros(board.shape, bool))


def advance_board_nstep(board, key, spawn_prob, n_steps):
    """Advance ``n_steps`` physics steps (fast mode), returning the final
    board. Parity: ``advance_board_nstep`` (advance_board.c:128-149)."""
    def step(b, k):
        return advance_board(b, k, spawn_prob), None
    keys = jax.random.split(key, n_steps)
    out, _ = jax.lax.scan(step, board, keys)
    return out


def advance_board_oracle(board, pcg_state, pcg_inc, k_hi, k_lo):
    """One physics step in oracle mode: spawn draws come from an emulated
    NumPy-PCG64 stream in raster order, so the result is bit-identical to the
    reference C kernel under the same generator state.

    Parameters
    ----------
    board : int32[H, W] (single board — oracle mode is inherently sequential)
    pcg_state, pcg_inc : uint32[8] limb state (see core.pcg64)
    k_hi, k_lo : uint32 spawn threshold from ``pcg64.threshold_53``.

    Returns
    -------
    (new_board, new_pcg_state)
    """
    from . import pcg64

    elig = spawn_eligible(board)
    spawns, pcg_state = pcg64.raster_spawn_draws(
        elig, pcg_state, pcg_inc, k_hi, k_lo
    )
    return advance_board_given_spawns(board, spawns), pcg_state


def life_occupancy(board, key, spawn_prob, n_steps):
    """Advance ``n_steps`` steps accumulating per-cell, per-color occupancy.

    Counts, for every cell and every color, how many of the ``n_steps``
    advanced boards had that cell occupied by free life — alive and not
    agent/exit/frozen (parity: ``life_occupancy`` + ``accumulate_cell_types``,
    advance_board.c:153-189).

    Returns
    -------
    counts : int32[..., H, W, 8]
    """
    def step(carry, k):
        b, acc = carry
        b = advance_board(b, k, spawn_prob)
        free_life = ((b & C.ALIVE) != 0) & ((b & (C.AGENT | C.EXIT | C.FROZEN)) == 0)
        color = (b >> C.COLOR_BIT) & 7
        onehot = (color[..., None] == jnp.arange(8)) & free_life[..., None]
        return (b, acc + onehot.astype(jnp.int32)), None

    acc0 = jnp.zeros(board.shape + (8,), jnp.int32)
    keys = jax.random.split(key, n_steps)
    (b, acc), _ = jax.lax.scan(step, (board, acc0), keys)
    return acc
