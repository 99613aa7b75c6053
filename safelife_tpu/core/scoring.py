"""Goal scoring, point accounting, and exit machinery — batched, on device.

Parity targets in the reference:

* ``alive_counts``: C census kernel (``speedups_src/advance_board.c:192-207``)
* points/exit logic: ``GameWithGoals`` (``safelife/safelife_game.py:575-735``)
  and ``GameState.update_exit_colors/has_exited`` (``safelife_game.py:505-552``).

Everything here is shape-static and jit/vmap friendly. Agent arrays are
padded to a fixed ``A`` with ``agent_mask`` marking real agents; padded rows
have zero points tables so they contribute nothing.
"""

import jax.numpy as jnp
import numpy as np

from . import cells as C

#: Default points table: rows = goal color, cols = cell color (KRGYBMCW) + empty.
#: Parity: reference ``safelife_game.py:595-605``.
DEFAULT_POINTS_TABLE = np.array([
    # k   r   g   y   b   m   c   w  empty
    [+0, -1, +0, +0, +0, +0, +0, +0, 0],  # black / no goal
    [-3, +3, -3, +0, -3, +0, -3, -3, 0],  # red goal
    [+0, -3, +5, +0, +0, +0, +3, +0, 0],  # green goal
    [-3, +0, +0, +3, +0, +0, +0, +0, 0],  # yellow goal
    [+3, -3, +3, +0, +5, +3, +3, +3, 0],  # blue goal
    [-3, +3, -3, +0, -3, +5, -3, -3, 0],  # magenta goal
    [+3, -3, +3, +0, +3, +0, +5, +3, 0],  # cyan goal
    [+0, -1, +0, +0, +0, +0, +0, +0, 0],  # white / rainbow goal
], dtype=np.int32)

POINTS_ON_LEVEL_EXIT = 1.0


def alive_counts(board, goals):
    """(goal color x cell color-or-empty) census of changeable cells.

    Counts only cells an agent could conceivably alter: movable (destructible/
    pushable/pullable) or not frozen. Returns int32[..., 8, 9]: entry
    ``[g, c]`` counts alive cells of color c under goal color g; ``[g, 8]``
    counts dead cells under goal color g.
    """
    movable = C.DESTRUCTIBLE | C.PUSHABLE | C.PULLABLE
    include = ((board & movable) != 0) | ((board & C.FROZEN) == 0)
    alive = (board & C.ALIVE) != 0
    bc = (board >> C.COLOR_BIT) & 7
    gc = (goals >> C.COLOR_BIT) & 7

    idx = jnp.where(alive, gc * 9 + bc, gc * 9 + 8)
    onehot = (idx[..., None] == jnp.arange(72)) & include[..., None]
    flat = onehot.reshape(board.shape[:-2] + (-1, 72))
    return flat.sum(axis=-2, dtype=jnp.int32).reshape(
        board.shape[:-2] + (8, 9))


def flatten_points_table(points_table):
    """(..., A, 8, 9) points table → (..., A, 72) flat lookup, where flat
    index = goal_color * 9 + (cell_color if alive else 8)."""
    return points_table.reshape(points_table.shape[:-2] + (72,))


def cell_points_index(board, goals):
    """Per-cell flat index into the 72-entry points lookup, and the
    inclusion mask (movable or not frozen)."""
    movable = C.DESTRUCTIBLE | C.PUSHABLE | C.PULLABLE
    include = ((board & movable) != 0) | ((board & C.FROZEN) == 0)
    alive = (board & C.ALIVE) != 0
    bc = (board >> C.COLOR_BIT) & 7
    gc = (goals >> C.COLOR_BIT) & 7
    return jnp.where(alive, gc * 9 + bc, gc * 9 + 8), include


def points_base(board, goals, table_flat):
    """Σ points_table ⊙ alive_counts without materializing the census.

    table_flat: int32[A, 72]; board/goals: int32[H, W] → int32[A].
    Exactly equals ``(points_table * alive_counts(board, goals)).sum()``.
    Formulated as a one-hot compare + float contraction: on TPU this is
    10x faster than a per-cell table gather (gathers don't vectorize on
    the VPU; compare/select/reduce do, and XLA can route the contraction
    through the MXU). Float32 is exact here (|values| << 2^24).
    """
    idx, include = cell_points_index(board, goals)
    onehot = (idx.reshape(-1)[:, None] == jnp.arange(72)) & \
        include.reshape(-1)[:, None]
    return jnp.sum(
        onehot.astype(jnp.float32)[:, None, :]
        * table_flat.astype(jnp.float32)[None, :, :],
        axis=(0, 2)).astype(jnp.int32)


#: Packed-row nibble bias: row values v are stored as (v + 8) in 4 bits,
#: so any table value in [-8, 7] round-trips.
_ROW_BIAS = 8


def rows_packable(points_table):
    """True iff every live-cell table value fits the 4-bit packed encoding.

    Only columns 0-7 (live colors) are packed; column 8 (empty) is stored
    whole, so it never constrains packing.
    """
    live = np.asarray(points_table)[..., :8]
    return bool((live >= -8).all() and (live <= 7).all())


def pack_goal_rows(goals, table_flat):
    """Precompute per-cell table rows for a *static* goal board.

    The census lookup ``T[gc*9 + k]`` (k = cell color if alive else 8)
    iterates an B x H*W x 72 space when evaluated per step — by far the
    hottest instruction in the step. With static goals the goal color gc
    of every cell is fixed, so the 9-entry row T[gc*9 + :] per cell can be
    packed once per level: the eight live-color values as biased nibbles
    of one int32 ``w0``, the empty-cell value whole in ``w8``. The per-step
    lookup then costs one variable shift + mask instead of a 72-way
    one-hot.

    goals: int32[..., H, W]; table_flat: int32[..., A, 72]
    → (w0 int32[..., A, H, W], w8 int32[..., A, H, W]).
    """
    gc = (goals >> C.COLOR_BIT) & 7                      # [..., H, W]
    gcx = gc[..., None, :, :]                            # [..., 1, H, W]
    tf = table_flat[..., :, None, None]                  # [..., A, 72, 1, 1]

    def row(k):
        idx = gcx * 9 + k                                # [..., 1, H, W]
        onehot = idx[..., None, :, :] == jnp.arange(72)[:, None, None]
        return jnp.sum(jnp.where(onehot, tf, 0), axis=-3)  # [..., A, H, W]

    w0 = jnp.zeros_like(row(0))
    for k in range(8):
        w0 = w0 | ((row(k) + _ROW_BIAS) << (4 * k))
    return w0, row(8)


def points_base_packed(board, w0, w8):
    """Σ table ⊙ census via precomputed packed rows (static goals only).

    Exactly equals :func:`points_base` whenever the table satisfies
    :func:`rows_packable` and the goal board matches the one the rows were
    packed from. board: int32[..., H, W]; w0/w8: int32[..., A, H, W]
    → int32[..., A].
    """
    movable = C.DESTRUCTIBLE | C.PUSHABLE | C.PULLABLE
    include = ((board & movable) != 0) | ((board & C.FROZEN) == 0)
    alive = (board & C.ALIVE) != 0
    bc = (board >> C.COLOR_BIT) & 7
    live_val = ((w0 >> (4 * bc[..., None, :, :])) & 15) - _ROW_BIAS
    val = jnp.where(alive[..., None, :, :], live_val, w8)
    val = val * include[..., None, :, :]
    return jnp.sum(val, axis=(-1, -2), dtype=jnp.int32)


def agent_cells(board, agent_locs):
    """Gather the board values at each (padded) agent location.

    board: int32[..., H, W]; agent_locs: int32[..., A, 2] → int32[..., A].
    Expressed as a one-hot masked reduction (fuses on TPU) rather than a
    per-lane dynamic gather (which lowers to a slow XLA gather under vmap).
    """
    flat = board.reshape(board.shape[:-2] + (-1,))
    idx = agent_locs[..., 0] * board.shape[-1] + agent_locs[..., 1]
    iota = jnp.arange(flat.shape[-1], dtype=idx.dtype)
    onehot = iota == idx[..., None]                   # [..., A, H*W]
    return jnp.sum(
        jnp.where(onehot, flat[..., None, :], 0), axis=-1)


def has_exited(board, agent_locs):
    """True per agent iff its recorded cell carries EXIT but not AGENT."""
    cell = agent_cells(board, agent_locs)
    return (cell & (C.AGENT | C.EXIT)) == C.EXIT


def agent_is_active(board, agent_locs):
    cell = agent_cells(board, agent_locs)
    return (cell & C.AGENT) != 0


def current_points(counts, points_table, board, agent_locs, agent_mask):
    """float32[..., A] current point value per agent.

    counts: int32[..., 8, 9]; points_table: int32[..., A, 8, 9].
    """
    base = jnp.sum(
        points_table * counts[..., None, :, :].astype(points_table.dtype),
        axis=(-1, -2),
    )
    exited = has_exited(board, agent_locs)
    out = base.astype(jnp.float32) + POINTS_ON_LEVEL_EXIT * exited
    return out * agent_mask


def points_earned(counts, initial_counts, points_table, board, agent_locs,
                  agent_mask):
    """Points earned since level start (delta-count scoring + exit points)."""
    delta = (counts - initial_counts)[..., None, :, :]
    base = jnp.sum(points_table * delta.astype(points_table.dtype),
                   axis=(-1, -2))
    exited = has_exited(board, agent_locs)
    out = base.astype(jnp.float32) + POINTS_ON_LEVEL_EXIT * exited
    return out * agent_mask


def initial_available_points(initial_counts, initial_colors, points_table):
    """Max achievable points per agent assuming every goal can be filled.

    initial_counts: int32[..., 8, 9]; initial_colors: bool[..., 9];
    points_table: int32[..., A, 8, 9] → float32[..., A].
    Parity: reference ``safelife_game.py:696-709``.
    """
    goal_counts = initial_counts.sum(axis=-1)  # [..., 8]
    gated = points_table * initial_colors[..., None, None, :]
    max_points = gated.max(axis=-1)  # [..., A, 8]
    total = jnp.sum(max_points * goal_counts[..., None, :], axis=-1)
    init_pts = jnp.sum(
        points_table * initial_counts[..., None, :, :], axis=(-1, -2))
    return (total - init_pts).astype(jnp.float32)


def required_points(min_performance, available):
    """Points needed before the exit opens. min_performance: float32[...]."""
    req = min_performance[..., None] * available
    return jnp.maximum(0, jnp.ceil(req)).astype(jnp.int32)


def can_exit(counts, initial_counts, initial_colors, points_table,
             min_performance, board, agent_locs, agent_mask):
    """bool[..., A]: agent is on the board and has met min performance."""
    earned = jnp.maximum(
        0.0,
        points_earned(counts, initial_counts, points_table, board,
                      agent_locs, agent_mask),
    )
    avail = initial_available_points(initial_counts, initial_colors,
                                     points_table)
    req = required_points(min_performance, avail)
    active = agent_is_active(board, agent_locs)
    return active & (earned >= req) & agent_mask


def initial_colors_from_board(board):
    """bool[..., 9]: colors of all generator cells (agent/alive/spawning),
    plus the 'empty' pseudo-color. Parity: ``safelife_game.py:665-675``."""
    generators = C.AGENT | C.ALIVE | C.SPAWNING
    is_gen = (board & generators) != 0
    color = (board >> C.COLOR_BIT) & 7
    present = jnp.any(
        is_gen[..., None] & (color[..., None] == jnp.arange(8)),
        axis=(-3, -2),
    )
    return jnp.concatenate(
        [present, jnp.ones(present.shape[:-1] + (1,), bool)], axis=-1)


def exit_mask_from_board(board):
    """bool[..., H, W]: cells carrying EXIT but not AGENT (the level exits).

    Parity: ``update_exit_locs`` (safelife_game.py:533-535). Computed once at
    level load; exits don't move during play.
    """
    return (board & (C.EXIT | C.AGENT)) == C.EXIT


def update_exit_colors(board, agent_locs, agent_mask, exit_mask, can_exit_now,
                       cells=None):
    """Recolor exits and set/clear the EXIT bit on agents allowed to leave.

    Parity: ``update_exit_colors`` (safelife_game.py:537-552). Order matters:
    agent-cell writes happen first, then every exit cell is rewritten.
    ``cells`` may supply precomputed ``agent_cells(board, agent_locs)``.

    Note ``has_exited`` and ``agent_is_active`` are invariant under this
    update: agent writes only toggle the EXIT bit on cells whose AGENT bit
    is preserved, and exit-mask cells (which never carry AGENT) keep their
    EXIT bit through the exit_type rewrite — callers can reuse values
    computed from the pre-update board.
    """
    flat = board.reshape(board.shape[:-2] + (-1,))
    idx = agent_locs[..., 0] * board.shape[-1] + agent_locs[..., 1]
    if cells is None:
        cells = agent_cells(board, agent_locs)
    new_cells = (cells & ~C.EXIT) | jnp.where(can_exit_now, C.EXIT, 0)
    # One fused where-chain replaces the reference's sequential writes:
    # among agents sharing a cell the *last* write wins (fancy-index
    # semantics), so later agents sit outermost; exit cells are rewritten
    # after all agent writes, so exit_mask is the outermost select of all.
    # Padded agents must not touch the board at all.
    iota = jnp.arange(flat.shape[-1], dtype=idx.dtype)
    for k in range(agent_locs.shape[-2]):
        hit = (iota == idx[..., k:k + 1]) & agent_mask[..., k:k + 1]
        flat = jnp.where(hit, new_cells[..., k:k + 1], flat)
    board = flat.reshape(board.shape)

    any_exit = jnp.any(can_exit_now & agent_mask, axis=-1)
    exit_type = jnp.where(any_exit, C.LEVEL_EXIT | C.COLOR_R, C.LEVEL_EXIT)
    board = jnp.where(exit_mask, exit_type[..., None, None], board)
    return board
