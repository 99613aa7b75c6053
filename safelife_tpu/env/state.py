"""Environment state pytrees and level packing.

Everything stateful in the reference's OO ``SafeLifeGame``/``SafeLifeEnv``
becomes arrays-in/arrays-out here: an :class:`EnvState` batch of boards
advanced in lockstep by a single jitted step, and a device-resident
:class:`LevelBatch` pool that auto-reset draws fresh levels from (the TPU
analog of the reference's multiprocessing level queue,
``level_iterator.py:200-223``).

Agent arrays are padded to a static ``A`` with ``agent_mask``; exits are
padded to a static ``E`` with ``exit_locs_valid``.
"""

from functools import partial

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ..core import cells as C, scoring


@flax.struct.dataclass
class LaneLevel:
    """The slim per-lane slice of level data the hot step path needs.

    Carried inside :class:`EnvState` instead of a full :class:`LevelBatch`
    row: the big per-level arrays (pristine board/goals, the 8x9 points
    table, initial censuses) live only in the pool and are consulted at
    reset, so the per-step auto-reset gather + select-merge streams ~6x
    less data.
    """

    agent_mask: jax.Array       # bool  [A]
    table_flat: jax.Array       # int32 [A, 72]
    init_points: jax.Array      # int32 [A]
    required_points: jax.Array  # int32 [A]
    available_points: jax.Array  # float32 [A]
    spawn_prob: jax.Array       # float32 []
    goals_static: jax.Array     # bool []
    exit_mask: jax.Array        # bool  [H, W]
    exit_locs: jax.Array        # int32 [E, 2]
    exit_locs_valid: jax.Array  # bool  [E]
    # Packed census rows for the fast static-goals scoring path (see
    # core.scoring.pack_goal_rows); dummy [A, 1, 1] when not packable.
    row_w0: jax.Array           # int32 [A, H, W] (or [A, 1, 1] dummy)
    row_w8: jax.Array           # int32 [A, H, W] (or [A, 1, 1] dummy)
    rows_packed: bool = flax.struct.field(pytree_node=False, default=False)
    # True iff every level in the source pool has static goals — lets the
    # step compile out the goals advance and keep packed scoring even when
    # cfg.goals_may_evolve is on.
    all_goals_static: bool = flax.struct.field(
        pytree_node=False, default=False)
    # True iff no level has spawner cells — compiles out the spawn RNG.
    spawner_free: bool = flax.struct.field(pytree_node=False, default=False)


@flax.struct.dataclass
class LevelBatch:
    """A batch/pool of levels resident on device. Leading axis = levels."""

    board: jax.Array            # int32 [L, H, W]
    goals: jax.Array            # int32 [L, H, W]
    agent_locs: jax.Array       # int32 [L, A, 2]
    agent_mask: jax.Array       # bool  [L, A]
    points_table: jax.Array     # int32 [L, A, 8, 9]
    min_performance: jax.Array  # float32 [L]
    spawn_prob: jax.Array       # float32 [L]
    initial_counts: jax.Array   # int32 [L, 8, 9]
    initial_colors: jax.Array   # bool  [L, 9]
    exit_mask: jax.Array        # bool  [L, H, W]
    exit_locs: jax.Array        # int32 [L, E, 2] (padded, raster order)
    exit_locs_valid: jax.Array  # bool  [L, E]
    goals_static: jax.Array     # bool  [L]
    # Precomputed scoring constants (hot-path fast scoring; see
    # core.scoring.points_base):
    table_flat: jax.Array       # int32 [L, A, 72]
    init_points: jax.Array      # int32 [L, A] — points_table ⊙ initial counts
    required_points: jax.Array  # int32 [L, A]
    available_points: jax.Array  # float32 [L, A] — initial_available_points
    row_w0: jax.Array           # int32 [L, A, H, W] (or [L, A, 1, 1] dummy)
    row_w8: jax.Array           # int32 [L, A, H, W] (or [L, A, 1, 1] dummy)
    # Precomputed t=0 reset artifacts (see _derived_fields): the board
    # after the reset exit recoloring and the initial old_value — they
    # make per-step auto-reset pure gathers. ``reset_boards`` stacks the
    # positive-fraction recoloring ([:, 0]) and the zero-points-
    # requirement one ([:, 1]: min_perf_fraction == 0, exits open at
    # t=0); resets reshape to [2L, H, W] (free) and gather row
    # ``2*idx + (fraction <= 0)`` so lane selection costs one gather,
    # not two plus a select. Axis 0 stays L like every pool field, so
    # multi-host slicing/allgather treat it uniformly.
    reset_boards: jax.Array     # int32 [L, 2, H, W]
    reset_old_value: jax.Array  # float32 [L, A]
    rows_packed: bool = flax.struct.field(pytree_node=False, default=False)
    all_goals_static: bool = flax.struct.field(
        pytree_node=False, default=False)
    spawner_free: bool = flax.struct.field(pytree_node=False, default=False)

    @property
    def num_levels(self):
        return self.board.shape[0]

    @property
    def board_shape(self):
        return self.board.shape[-2:]

    @property
    def num_agents(self):
        return self.agent_locs.shape[-2]

    def take(self, idx):
        """Gather one level (or a batch of levels) by index."""
        return jax.tree.map(lambda x: jnp.take(x, idx, axis=0), self)


@flax.struct.dataclass
class EnvState:
    """Batched environment state. Leading axis = parallel boards.

    Deliberately SLIM: per-lane level data is referenced by ``level_idx``
    into the (loop-invariant) pool and re-gathered on demand each step
    (:func:`lane_level`) rather than carried. Carrying the level arrays
    made every scanned step copy them through the loop carry and made the
    auto-reset merge stream the whole tree — measured ~840 us/step of
    pure overhead at batch 4096 against ~11 us for the step itself.
    """

    board: jax.Array            # int32 [B, H, W]
    goals: jax.Array            # int32 [B, H, W]
    agent_locs: jax.Array       # int32 [B, A, 2]
    num_steps: jax.Array        # int32 [B]
    old_value: jax.Array        # float32 [B, A] — last current_points()
    episode_reward: jax.Array   # float32 [B, A]
    episode_length: jax.Array   # int32 [B, A]
    is_active: jax.Array        # bool [B, A]
    level_idx: jax.Array        # int32 [B] — pool index of the running level
    # min_performance scale active when this lane last reset (the
    # MinPerformanceScheduler's knob); required_points derives from it.
    min_perf_fraction: jax.Array  # float32 [B]
    rng: jax.Array              # PRNG key [B, ...]


def lane_level(pool, idx, min_perf_fraction):
    """Per-lane :class:`LaneLevel` view gathered from the pool.

    Pure gathers keyed on ``idx`` — XLA fuses them into their consumers,
    so calling this every step costs roughly what reading carried arrays
    would, without making the level data loop-variant.
    """
    g = lambda x: jnp.take(x, idx, axis=0)  # noqa: E731
    mperf = g(pool.min_performance) * min_perf_fraction
    return LaneLevel(
        agent_mask=g(pool.agent_mask),
        table_flat=g(pool.table_flat),
        init_points=g(pool.init_points),
        required_points=scoring.required_points(
            mperf, g(pool.available_points)),
        available_points=g(pool.available_points),
        spawn_prob=g(pool.spawn_prob),
        goals_static=g(pool.goals_static),
        exit_mask=g(pool.exit_mask),
        exit_locs=g(pool.exit_locs),
        exit_locs_valid=g(pool.exit_locs_valid),
        row_w0=g(pool.row_w0),
        row_w8=g(pool.row_w8),
        rows_packed=pool.rows_packed,
        all_goals_static=pool.all_goals_static,
        spawner_free=pool.spawner_free,
    )


def goals_are_static(goals):
    """Host-side staticness check for a goal board.

    Parity with the reference's first-step detection
    (``safelife_game.py:753-761``): goals are static iff one advance leaves
    them unchanged and the advanced board has no spawners. Static goals also
    consume zero RNG draws, so skipping their advance preserves the exact
    reference RNG stream.
    """
    from ..core.advance_np import advance_board_np

    g = np.asarray(goals).astype(np.int64)
    adv = advance_board_np(g)
    return (not (adv & C.SPAWNING).any()) and (adv == g).all()


@partial(jax.jit, static_argnames=("rows_packed",))
def _derived_fields(boards, goals, tables, mperf, agent_locs, agent_mask,
                    exit_mask, rows_packed):
    """All device-computed LevelBatch fields in one jitted call.

    Keeping this a single dispatch matters: over a tunneled device, every
    un-jitted op costs a host round trip, which made level-pool refreshes
    take seconds. Per-level *reset artifacts* (the board after the t=0
    exit recoloring, the initial old_value) are precomputed here so
    auto-reset inside the step is pure cheap gathers — recomputing the
    reset censuses every step measured ~3.5 ms/step at batch 4096.
    """
    initial_counts = scoring.alive_counts(boards, goals)
    initial_colors = scoring.initial_colors_from_board(boards)
    init_points = jnp.sum(
        tables * initial_counts[:, None, :, :], axis=(-1, -2))
    available = scoring.initial_available_points(
        initial_counts, initial_colors, tables)
    required = scoring.required_points(mperf, available)
    table_flat = scoring.flatten_points_table(tables)
    if rows_packed:
        row_w0, row_w8 = scoring.pack_goal_rows(goals, table_flat)
    else:
        n_levels, n_agents = table_flat.shape[:2]
        row_w0 = jnp.zeros((n_levels, n_agents, 1, 1), jnp.int32)
        row_w8 = jnp.zeros((n_levels, n_agents, 1, 1), jnp.int32)

    # t=0 reset artifacts. The exit recoloring's can-exit test at reset
    # (earned 0 vs required) has a min_perf_fraction-independent outcome
    # for every fraction > 0 — ceil keeps positive requirements >= 1 and
    # non-positive ones non-positive — so precomputing with the unscaled
    # min_performance is exact whenever the fraction is positive. A
    # fraction of exactly 0 (a legitimate schedule start: no points
    # requirement, exits open at t=0) flips the test for every agent, so
    # that case gets its own precomputed board and resets select per lane
    # (env.reset_batch).
    cells = scoring.agent_cells(boards, agent_locs)
    exited = (cells & (C.AGENT | C.EXIT)) == C.EXIT
    earned = (init_points - init_points).astype(jnp.float32) \
        + scoring.POINTS_ON_LEVEL_EXIT * exited
    active = ((cells & C.AGENT) != 0) & agent_mask
    ce = active & (jnp.maximum(0.0, earned) >= required)
    reset_board = scoring.update_exit_colors(
        boards, agent_locs, agent_mask, exit_mask, ce, cells=cells)
    # required == 0 for every agent: earned >= 0 always holds, so
    # can-exit reduces to "agent is active".
    reset_board_open = scoring.update_exit_colors(
        boards, agent_locs, agent_mask, exit_mask, active, cells=cells)
    reset_boards = jnp.stack([reset_board, reset_board_open], axis=1)
    reset_old_value = (init_points.astype(jnp.float32)
                       + scoring.POINTS_ON_LEVEL_EXIT * exited) * agent_mask
    return dict(
        initial_counts=initial_counts,
        initial_colors=initial_colors,
        table_flat=table_flat,
        init_points=init_points.astype(jnp.int32),
        required_points=required,
        available_points=available.astype(jnp.float32),
        row_w0=row_w0,
        row_w8=row_w8,
        reset_boards=reset_boards,
        reset_old_value=reset_old_value,
    )


def pack_levels(levels, pad_agents=None, pad_exits=None, force_flags=None):
    """Pack host :class:`~safelife_tpu.io.levels.Level` objects into a
    device :class:`LevelBatch`. All levels must share a board shape.

    ``force_flags`` optionally pins the static (rows_packed,
    all_goals_static, spawner_free) flags — used when packing replacement
    levels that must be tree-compatible with an existing pool.
    """
    shapes = {lv.shape for lv in levels}
    if len(shapes) != 1:
        raise ValueError("levels in one batch must share a board shape, "
                         "got %s" % shapes)
    h, w = shapes.pop()
    A = pad_agents or max(1, max(lv.num_agents for lv in levels))
    boards, goals, locs, masks, tables = [], [], [], [], []
    mperf, sprob, emasks, elocs, evalid, gstatic = [], [], [], [], [], []

    for lv in levels:
        a = lv.num_agents
        if a > A:
            raise ValueError("level has %d agents > pad_agents=%d" % (a, A))
        boards.append(lv.board)
        goals.append(lv.goals)
        locs.append(np.concatenate(
            [lv.agent_locs, np.zeros((A - a, 2), np.int64)]).astype(np.int32))
        masks.append(np.arange(A) < a)
        pt = np.concatenate(
            [lv.points_table.astype(np.int32),
             np.zeros((A - a, 8, 9), np.int32)])
        tables.append(pt)
        mperf.append(np.float32(lv.min_performance))
        sprob.append(np.float32(lv.spawn_prob))
        em = np.asarray(
            (lv.board & (C.EXIT | C.AGENT)) == C.EXIT)
        emasks.append(em)
        ey, ex = np.nonzero(em)
        elocs.append(np.stack([ey, ex], axis=1))
        gstatic.append(goals_are_static(lv.goals))

    E = pad_exits or max(1, max(len(e) for e in elocs))
    elocs_p, evalid_p = [], []
    for e in elocs:
        n = len(e)
        if n > E:
            raise ValueError("level has %d exits > pad_exits=%d" % (n, E))
        pad = np.zeros((E - n, 2), np.int64)
        elocs_p.append(np.concatenate([e, pad]).astype(np.int32))
        evalid_p.append(np.arange(E) < n)

    boards_np = np.stack(boards)
    goals_np = np.stack(goals)
    tables_np = np.stack(tables)
    rows_packed = scoring.rows_packable(tables_np)
    all_goals_static = bool(np.all(gstatic))
    spawner_free = not bool(((boards_np | goals_np) & C.SPAWNING).any())
    if force_flags is not None:
        f_rows, f_static, f_spawnfree = force_flags
        rows_packed = rows_packed and f_rows
        all_goals_static = all_goals_static and f_static
        spawner_free = spawner_free and f_spawnfree

    # One bulk host->device transfer, then one jitted call for everything
    # derived on device.
    host = dict(
        board=boards_np.astype(np.int32),
        goals=goals_np.astype(np.int32),
        agent_locs=np.stack(locs).astype(np.int32),
        agent_mask=np.stack(masks),
        points_table=tables_np,
        min_performance=np.stack(mperf),
        spawn_prob=np.stack(sprob),
        exit_mask=np.stack(emasks),
        exit_locs=np.stack(elocs_p).astype(np.int32),
        exit_locs_valid=np.stack(evalid_p),
        goals_static=np.stack(gstatic),
    )
    dev = jax.device_put(host)
    derived = _derived_fields(dev["board"], dev["goals"],
                              dev["points_table"], dev["min_performance"],
                              dev["agent_locs"], dev["agent_mask"],
                              dev["exit_mask"], rows_packed)
    return LevelBatch(
        **dev, **derived,
        rows_packed=rows_packed,
        all_goals_static=all_goals_static,
        spawner_free=spawner_free,
    )
