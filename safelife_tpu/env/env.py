"""The SafeLife environment as a pure, batched, jitted function.

Replaces the reference's gym ``SafeLifeEnv`` (``safelife/safelife_env.py``)
and its serial Python loop over env objects with one ``step`` over a batch of
boards in lockstep. Semantics parity, per step (``safelife_env.py:148-201``):

1. ``execute_actions`` — agent moves/toggles.
2. ``advance_board`` — board physics; goals physics unless provably static.
3. ``update_exit_colors`` — open/close the level exit.
4. reward = Δ ``current_points`` (points table ⊙ alive-count census + exit
   points), masked by per-agent activity.
5. ``done`` = agent gone (exited/destroyed) or time limit reached.
6. observations: board ⊕ (goal colors << 16), white goals removed, view
   recentered per agent with exits projected onto the view perimeter, then
   unpacked into binary channels (``safelife_env.py:105-146``).

Auto-reset: finished lanes immediately restart from a fresh level drawn from
the device-resident pool, so rollouts never leave the device.
"""

import dataclasses

import jax
import jax.numpy as jnp

from ..core import actions as actions_mod, advance, cells as C, scoring
from ..core.scoring import POINTS_ON_LEVEL_EXIT
from .state import EnvState, lane_level

DEFAULT_CHANNELS = tuple(range(16)) + (25, 26, 27)


@dataclasses.dataclass(frozen=True)
class EnvConfig:
    """Static environment configuration (hashable; part of the jit cache key).

    Parity: constructor attributes of the reference ``SafeLifeEnv``
    (safelife_env.py:60-96).
    """

    view_shape: tuple = (15, 15)
    output_channels: tuple = DEFAULT_CHANNELS  # None → raw packed uint32 view
    time_limit: int = 1000
    remove_white_goals: bool = True
    goals_may_evolve: bool = True   # False compiles out the goal advance
    stochastic: bool = True         # False: spawner-free pool, no RNG draws
    auto_reset: bool = True
    # Emit observations flattened to uint8 [B, A, vh*vw*C] instead of
    # [B, A, vh, vw, C]: the channel-minor layout pads to (32, 128) byte
    # tiles on TPU (~11x physical inflation at (25, 25, 15)); the flat
    # layout fills the lane dimension. Consumers reshape at the policy
    # boundary (the conv relayouts its input either way).
    flat_obs: bool = False


# ---------------------------------------------------------------------------
# Observations


def recenter_view(board, view_shape, center):
    """Wrapped view of ``board`` centered at ``center``.

    Equivalent to the reference's wrapping-array slice
    (``helper_utils.py:42-63``): row r of the view is board row
    ``(center_y - vh//2 + r) mod H`` — views larger than the board tile it.
    """
    vh, vw = view_shape
    h, w = board.shape[-2:]
    y1 = center[0] - vh // 2
    x1 = center[1] - vw // 2
    rolled = jnp.roll(board, shift=(-y1, -x1), axis=(-2, -1))
    reps_h = -(-vh // h)
    reps_w = -(-vw // w)
    if reps_h > 1 or reps_w > 1:
        rolled = jnp.tile(rolled, (reps_h, reps_w))
    return rolled[..., :vh, :vw]


def _project_exits(view, packed, center, view_shape, exit_locs, exit_valid):
    """Overwrite view cells so off-screen exits appear on the perimeter.

    Parity: ``helper_utils.py:64-75``. Writes happen sequentially in exit
    raster order (later exits win on collision), exactly like the reference's
    fancy-index assignment.
    """
    vh, vw = view_shape
    h, w = packed.shape[-2:]
    y0, x0 = center[0], center[1]
    for e in range(exit_locs.shape[0]):
        iy, ix = exit_locs[e, 0], exit_locs[e, 1]
        jy = (iy - y0 + h // 2) % h - h // 2
        jx = (ix - x0 + w // 2) % w - w // 2
        jy = jnp.clip(jy + vh // 2, 0, vh - 1)
        jx = jnp.clip(jx + vw // 2, 0, vw - 1)
        val = packed[iy, ix]
        cur = view[jy, jx]
        view = view.at[jy, jx].set(jnp.where(exit_valid[e], val, cur))
    return view


def get_obs(cfg, board, goals, agent_locs, agent_mask,
            exit_locs, exit_valid):
    """Per-agent observations for a single board. Returns uint8
    [A, vh, vw, C] (or int32 [A, vh, vw] if output_channels is None)."""
    gcol = goals & C.RAINBOW_COLOR
    if cfg.remove_white_goals:
        gcol = gcol * (gcol != C.RAINBOW_COLOR)
    packed = board | (gcol << 16)

    def one_agent(loc, valid):
        center = jnp.where(valid, loc, jnp.zeros_like(loc))
        view = recenter_view(packed, cfg.view_shape, center)
        return _project_exits(view, packed, center, cfg.view_shape,
                              exit_locs, exit_valid)

    views = jax.vmap(one_agent)(agent_locs, agent_mask)
    if cfg.output_channels is None:
        return views
    shifts = jnp.array(cfg.output_channels, jnp.int32)
    chans = (views[..., None] >> shifts) & 1
    return chans.astype(jnp.uint8)


# Byte planes of the packed view word that can be nonzero: board bits live
# in 0..15 and goal colors in 25..27 (``gcol << 16`` with 3-bit colors at
# 9..11), so byte 2 (bits 16..23) is identically zero and is skipped.
_VIEW_BYTE_SHIFTS = (0, 8, 24)


def get_obs_batch(cfg, board, goals, agent_locs, agent_mask,
                  exit_locs, exit_valid):
    """Whole-batch observations via one-hot matmul recentering.

    Semantically identical to ``vmap(get_obs)`` (asserted in
    tests/test_env.py) but TPU-native: the reference's wrapping-slice view
    (``helper_utils.py:42-75``) is a dynamic gather per agent, which XLA
    lowers to serial gather loops under vmap. Instead the wrapped window
    ``view[r, c] = packed[(y1+r) % H, (x1+c) % W]`` is two one-hot
    contractions ``R @ packed @ C^T`` that ride the MXU. The packed int32
    word is split into byte planes first — byte values 0..255 are exact in
    bfloat16, so the matmuls run at the MXU's native precision; wider
    integer payloads would need exact-but-3x-slower Precision.HIGHEST
    (bf16x3) passes or 16-bit-half splits to survive the float round trip.

    Exit perimeter projection is a one-hot select (no scatters), applied in
    exit raster order so later exits win on collision exactly like the
    reference's fancy-index assignment.

    Inputs: board/goals int32 [B,H,W], agent_locs int32 [B,A,2],
    agent_mask bool [B,A], exit_locs int32 [B,E,2], exit_valid bool [B,E].
    Returns uint8 [B,A,vh,vw,C] — or flattened uint8 [B,A,vh*vw*C] when
    ``cfg.flat_obs`` (the channel-minor (vh,vw,C)=(25,25,15) layout pads to
    (32,128) byte tiles on TPU, a ~11x physical inflation; the flat layout
    packs the lane dimension full) — or int32 [B,A,vh,vw] when
    ``output_channels`` is None.
    """
    vh, vw = cfg.view_shape
    h, w = board.shape[-2:]
    gcol = goals & C.RAINBOW_COLOR
    if cfg.remove_white_goals:
        gcol = gcol * (gcol != C.RAINBOW_COLOR)
    packed = board | (gcol << 16)                      # int32 [B,H,W]

    center = jnp.where(agent_mask[..., None], agent_locs, 0)  # [B,A,2]
    y1 = center[..., 0] - vh // 2                      # int32 [B,A]
    x1 = center[..., 1] - vw // 2

    # One-hot row/col selectors; views larger than the board tile it for
    # free (several view rows map onto the same board row).
    rowsel = ((y1[..., None, None] + jnp.arange(vh)[:, None]) % h
              == jnp.arange(h)).astype(jnp.bfloat16)   # [B,A,vh,H]
    colsel = ((x1[..., None, None] + jnp.arange(vw)[:, None]) % w
              == jnp.arange(w)).astype(jnp.bfloat16)   # [B,A,vw,W]

    planes = jnp.stack(
        [(packed >> s) & 0xFF for s in _VIEW_BYTE_SHIFTS],
        axis=1).astype(jnp.bfloat16)                   # [B,P,H,W]

    # Each output element has exactly one nonzero product (one-hot lhs),
    # so bf16 operands give the exact integer result: byte values 0..255
    # need 8 mantissa bits, which bf16 has. The intermediate stays bf16
    # (still exact) to halve the second matmul's operand bandwidth.
    t = jnp.einsum("bavh,bphw->bapvw", rowsel, planes,
                   preferred_element_type=jnp.bfloat16)
    byts = jnp.einsum("bapvw,baxw->bapvx", t, colsel,
                      preferred_element_type=jnp.float32)
    byts = byts.astype(jnp.int32)                      # [B,A,P,vh,vw]
    views = byts[:, :, 0]
    for p, s in enumerate(_VIEW_BYTE_SHIFTS[1:], start=1):
        views = views | (byts[:, :, p] << s)           # int32 [B,A,vh,vw]

    # Exit perimeter projection, raster order (later exits win).
    vy = jnp.arange(vh)[:, None]
    vx = jnp.arange(vw)
    for e in range(exit_locs.shape[1]):
        iy, ix = exit_locs[:, e, 0], exit_locs[:, e, 1]        # [B]
        hit = ((jnp.arange(h)[:, None] == iy[:, None, None])
               & (jnp.arange(w) == ix[:, None, None]))         # [B,H,W]
        val = jnp.sum(packed * hit, axis=(-2, -1))             # int32 [B]
        jy = (iy[:, None] - center[..., 0] + h // 2) % h - h // 2
        jx = (ix[:, None] - center[..., 1] + w // 2) % w - w // 2
        jy = jnp.clip(jy + vh // 2, 0, vh - 1)                 # [B,A]
        jx = jnp.clip(jx + vw // 2, 0, vw - 1)
        mask = ((vy == jy[..., None, None]) & (vx == jx[..., None, None])
                & exit_valid[:, e, None, None, None])          # [B,A,vh,vw]
        views = jnp.where(mask, val[:, None, None, None], views)

    return unpack_view_channels(cfg, views)


def unpack_view_channels(cfg, views):
    """Binary-channel unpack of packed int32 views per ``output_channels``
    (reference ``safelife_env.py:140-143``); shared tail of the XLA and
    Pallas view producers."""
    if cfg.output_channels is None:
        return views
    shifts = jnp.array(cfg.output_channels, jnp.int32)
    chans = ((views[..., None] >> shifts) & 1).astype(jnp.uint8)
    if cfg.flat_obs:
        return chans.reshape(chans.shape[:2] + (-1,))
    return chans


# ---------------------------------------------------------------------------
# Reset


def reset_batch(cfg, pool, idx, min_perf_fraction=1.0):
    """Fresh batched (slim) state from pool levels ``idx`` (int32[B]).

    The carried state holds only lane dynamics plus ``level_idx``; the
    level data itself stays in the pool and is re-gathered per step
    (:func:`~safelife_tpu.env.state.lane_level`). ``min_perf_fraction``
    (the MinPerformanceScheduler knob) is remembered per lane so
    required_points scale with the value active at reset time.
    """
    mpf = jnp.broadcast_to(
        jnp.asarray(min_perf_fraction, jnp.float32), idx.shape)
    # Pure gathers: the t=0 exit recoloring and initial value live
    # precomputed in the pool (pack-time _derived_fields), so resets are
    # cheap enough to merge unconditionally inside the hot step.
    g = lambda x: jnp.take(x, idx, axis=0)  # noqa: E731
    b, a = idx.shape[0], pool.num_agents
    # Fraction 0 zeroes every points requirement, flipping the t=0
    # exit recoloring (exits open immediately); any positive fraction
    # recolors identically to the unscaled precompute (see
    # state._derived_fields). Both variants live in one [L, 2, H, W]
    # stack — the reset stays a single pure gather (one board fetch per
    # lane on the hot auto-reset path, not two plus a select).
    rb = pool.reset_boards.reshape((-1,) + pool.reset_boards.shape[-2:])
    board = jnp.take(rb, 2 * idx + (mpf <= 0), axis=0)
    return EnvState(
        board=board,
        goals=g(pool.goals),
        agent_locs=g(pool.agent_locs),
        num_steps=jnp.zeros((b,), jnp.int32),
        old_value=g(pool.reset_old_value),
        episode_reward=jnp.zeros((b, a), jnp.float32),
        episode_length=jnp.zeros((b, a), jnp.int32),
        is_active=jnp.ones((b, a), bool),
        level_idx=idx,
        min_perf_fraction=mpf,
        rng=jnp.zeros((b,), jnp.uint32),  # unused per lane; step takes keys
    )


def reset_impl(cfg, pool, key, batch_size, min_perf_fraction=1.0):
    """Initialize a batch of lanes from the level pool.

    Lane i starts on level ``i mod L``; auto-reset then draws random pool
    levels. Returns (state, obs).
    """
    idx = jnp.arange(batch_size, dtype=jnp.int32) % pool.num_levels
    state = reset_batch(cfg, pool, idx, min_perf_fraction)
    return state, _batch_obs(cfg, pool, state)


# ---------------------------------------------------------------------------
# Step


def _advance_physics(cfg, board, goals, goals_static, spawn_prob, key):
    """Advance board and (if needed) goals for one lane."""
    if not cfg.stochastic:
        # Spawner-free levels consume no RNG draws; this is exact, not an
        # approximation (eligibility requires a spawning neighbor).
        new_board = advance.advance_board_deterministic(board)
        if cfg.goals_may_evolve:
            adv_goals = advance.advance_board_deterministic(goals)
            goals = jnp.where(goals_static, goals, adv_goals)
        return new_board, goals
    k1, k2 = jax.random.split(key)
    new_board = advance.advance_board(board, k1, spawn_prob)
    if cfg.goals_may_evolve:
        adv_goals = advance.advance_board(goals, k2, spawn_prob)
        goals = jnp.where(goals_static, goals, adv_goals)
    return new_board, goals


def _physics_batch(cfg, lv, state, actions, key):
    """Batched physics phase: execute actions, advance board (and goals),
    read back agent cell values.

    On TPU this is one fused Pallas kernel (:mod:`safelife_tpu.ops.physics`
    — the analog of the reference's two C kernels); elsewhere it is the
    vmapped XLA formulation from :mod:`safelife_tpu.core`. Both produce
    bit-identical boards (for matching spawn draws).

    Returns (board, goals, agent_locs, cells) — all batched; cells is the
    post-advance board value at each agent's location.
    """
    from .. import ops

    b, h, w = state.board.shape
    # The goals advance compiles out entirely when every pool level has
    # provably static goals, even under cfg.goals_may_evolve; likewise the
    # spawn RNG when no level has spawners (no cell is ever spawn-eligible).
    evolve_goals = cfg.goals_may_evolve and not lv.all_goals_static
    stochastic = cfg.stochastic and not lv.spawner_free
    cfg = dataclasses.replace(cfg, goals_may_evolve=evolve_goals,
                              stochastic=stochastic)
    if ops.use_fused_physics((h, w), b):
        # Two independent 32-bit seed words per stream (board, goals): a
        # single word birthday-collides within ~1e5 steps and would replay
        # identical spawn-noise patterns across steps.
        k1, k2 = jax.random.split(key)
        seed = jax.random.randint(
            k1, (2, 2), jnp.iinfo(jnp.int32).min,
            jnp.iinfo(jnp.int32).max, jnp.int32)
        board, agent_locs, cells = ops.fused_actions_advance(
            state.board.reshape(b, h * w), state.agent_locs, actions,
            lv.spawn_prob, seed[0],
            h=h, w=w, stochastic=cfg.stochastic)
        board = board.reshape(b, h, w)
        goals = state.goals
        if evolve_goals:
            adv = ops.advance_pallas(
                state.goals.reshape(b, h * w), lv.spawn_prob,
                seed[1], h=h, w=w, stochastic=cfg.stochastic,
            ).reshape(b, h, w)
            goals = jnp.where(lv.goals_static[:, None, None],
                              state.goals, adv)
        return board, goals, agent_locs, cells

    keys = jax.random.split(key, b)
    board, agent_locs = jax.vmap(actions_mod.execute_actions)(
        state.board, state.agent_locs, actions)
    board, goals = jax.vmap(
        lambda bb, gg, gs, sp, k: _advance_physics(cfg, bb, gg, gs, sp, k)
    )(board, state.goals, lv.goals_static,
      lv.spawn_prob, keys)
    cells = scoring.agent_cells(board, agent_locs)
    return board, goals, agent_locs, cells


def _finish_one(cfg, s, lv, board, goals, agent_locs, cells):
    """Scoring/exit/bookkeeping for one lane, given the physics results."""
    num_steps = s.num_steps + 1

    if lv.rows_packed and (not cfg.goals_may_evolve
                           or lv.all_goals_static):
        # Goals provably never change -> the packed per-cell census rows
        # stay valid; the lookup is one shift+mask instead of the 72-way
        # one-hot contraction (the hottest instruction of the whole step).
        base = scoring.points_base_packed(board, lv.row_w0, lv.row_w8)
    else:
        base = scoring.points_base(board, goals, lv.table_flat)
    exited = (cells & (C.AGENT | C.EXIT)) == C.EXIT
    active0 = ((cells & C.AGENT) != 0) & lv.agent_mask
    earned = (base - lv.init_points).astype(jnp.float32) + \
        POINTS_ON_LEVEL_EXIT * exited
    ce = active0 & (jnp.maximum(0.0, earned) >= lv.required_points)
    board = scoring.update_exit_colors(
        board, agent_locs, lv.agent_mask, lv.exit_mask, ce, cells=cells)

    # has_exited / agent_is_active are invariant under update_exit_colors
    # (see its docstring), so the pre-update reads serve for all of these.
    times_up = num_steps >= cfg.time_limit
    value = (base.astype(jnp.float32)
             + POINTS_ON_LEVEL_EXIT * exited) * lv.agent_mask
    reward = (value - s.old_value) * s.is_active
    success = exited & lv.agent_mask
    active = active0
    done = ~active | times_up

    episode_reward = s.episode_reward + reward
    episode_length = s.episode_length + s.is_active
    is_active = s.is_active & ~done

    s = s.replace(
        board=board, goals=goals, agent_locs=agent_locs,
        num_steps=num_steps, old_value=value,
        episode_reward=episode_reward, episode_length=episode_length,
        is_active=is_active,
    )

    lane_done = jnp.all(done | ~lv.agent_mask)
    info = {
        "times_up": times_up,
        "success": success,
        "done": done,
        "lane_done": lane_done,
        "episode_reward": episode_reward,
        "episode_length": episode_length,
        "level_idx": s.level_idx,
        # Padded-agent mask, for the learner to weight flattened [B, A]
        # samples (the lockstep analog of base_algo.py:152-244 collecting
        # only live agents into the batch).
        "agent_mask": lv.agent_mask,
        # Per-agent score denominators, captured at episode time so logged
        # records stay correct even after the pool slot is recycled
        # (parity: safelife_logger.py:286-294; the logger squeezes the
        # single-agent case back to a scalar).
        "reward_possible": (lv.available_points
                            + POINTS_ON_LEVEL_EXIT) * lv.agent_mask,
        "reward_needed": lv.required_points * lv.agent_mask,
    }

    return s, reward, done, info


def advance_batch(cfg, boards, spawn_prob, key):
    """Batched plain CA advance (no agents) — e.g. for inaction baselines.

    Uses the Pallas kernel on TPU, the XLA formulation elsewhere.
    """
    from .. import ops

    b, h, w = boards.shape
    if ops.use_fused_physics((h, w), b):
        seed = jax.random.randint(key, (2,), jnp.iinfo(jnp.int32).min,
                                  jnp.iinfo(jnp.int32).max, jnp.int32)
        return ops.advance_pallas(
            boards.reshape(b, h * w), spawn_prob, seed,
            h=h, w=w, stochastic=cfg.stochastic).reshape(b, h, w)
    if not cfg.stochastic:
        return advance.advance_board_deterministic(boards)
    keys = jax.random.split(key, b)
    return jax.vmap(advance.advance_board)(boards, keys, spawn_prob)


def step_core(cfg, pool, state, actions, key):
    """Batched env step without auto-reset or observations.

    The shared backbone for :func:`step_impl`, the reward-shaping
    wrappers, and the episode runner. Returns (state, reward, done, info).
    """
    lv = lane_level(pool, state.level_idx, state.min_perf_fraction)
    actions = jnp.where(lv.agent_mask, actions, 0)
    board, goals, agent_locs, cells = _physics_batch(
        cfg, lv, state, actions, key)
    return jax.vmap(
        lambda s, l, bb, gg, ll, cc: _finish_one(cfg, s, l, bb, gg, ll, cc)
    )(state, lv, board, goals, agent_locs, cells)


def _batch_obs(cfg, pool, state):
    from .. import ops

    lv = lane_level(pool, state.level_idx, state.min_perf_fraction)
    b, h, w = state.board.shape
    if ops.use_obs_kernel((h, w), b, cfg.view_shape):
        # Pallas recenter kernel (the TPU production path): per-lane
        # binary-decomposed cyclic rolls in VMEM instead of the one-hot
        # matmuls — bit-exact, ~10x cheaper (see ops/obs.py). On a
        # multi-device mesh (fleet / multi-chip) the call goes through
        # the lane-axis custom_partitioning wrapper so each device runs
        # the kernel on its local lanes.
        recenter = (ops.recenter_views_sharded
                    if len(jax.devices()) > 1
                    else ops.recenter_views_pallas)
        center = jnp.where(lv.agent_mask[..., None], state.agent_locs, 0)
        views = recenter(
            state.board, state.goals, center[..., 0], center[..., 1],
            lv.exit_locs, lv.exit_locs_valid,
            view_shape=cfg.view_shape,
            remove_white_goals=cfg.remove_white_goals)
        return unpack_view_channels(cfg, views)
    return get_obs_batch(cfg, state.board, state.goals, state.agent_locs,
                         lv.agent_mask, lv.exit_locs, lv.exit_locs_valid)


def merge_lane_reset(lane_done, key, fresh_fn, state):
    """Replace finished lanes with fresh pool levels, unconditionally.

    The carried state is slim (lane dynamics + level_idx), so the merge
    is a cheap elementwise select fused into the step's own writes.
    Guarding it behind a ``lax.cond`` is a measured anti-optimization:
    the cond boundary copies every operand in and out (~1.3 ms at batch
    4096 — 75x the step itself — even with identity branches), while the
    unconditional gather+select costs tens of microseconds.

    fresh_fn(idx int32[B]) must return a batched state pytree.
    """
    b = lane_done.shape[0]
    idx = jax.random.randint(key, (b,), 0, 2**31 - 1, jnp.int32)
    fresh = fresh_fn(idx)
    return jax.tree.map(
        lambda a, f: jnp.where(
            lane_done.reshape((b,) + (1,) * (a.ndim - 1)), f, a),
        state, fresh)


def sample_episode_record(pool, init_boards, state, info, valid=True):
    """A single finished episode's (init, final) board pair for side-effect
    telemetry.

    The reference computes side effects for every episode at episode end
    (safelife_env.py:183-193) — affordable at 16 serial envs. At lockstep
    scale that would dominate the step, so each step instead captures at
    most one finished episode (the first done lane); the training loop
    scores a sampled subset of these on the device occupancy kernel.

    ``init_boards`` must be the episodes' own starting boards (e.g. the
    wrapper's starting-state baseline) — re-reading the level pool would
    race with pool refreshes recycling slots mid-episode. ``valid=False``
    (static) marks the capture unusable (e.g. inaction-baseline mode,
    whose baseline board evolves).
    """
    lane = jnp.argmax(info["lane_done"])
    lane_idx = jnp.take(state.level_idx, lane)
    return {
        "found": jnp.any(info["lane_done"]) & bool(valid),
        "init_board": jnp.take(init_boards, lane, axis=0),
        "final_board": jnp.take(state.board, lane, axis=0),
        "num_steps": jnp.take(state.num_steps, lane),
        "spawn_prob": jnp.take(pool.spawn_prob, lane_idx),
        "level_idx": lane_idx,
    }


def all_episode_records(pool, init_boards, state, info, valid=True):
    """Per-lane episode capture for exhaustive side-effect scoring.

    The per-lane analog of :func:`sample_episode_record`: every lane's
    (init, final) board pair plus metadata, with ``found`` flagging the
    lanes whose episode ended this step. Materializing [T, B, H, W]
    boards per chunk is only affordable at validation-scale batches —
    the ``side_effect.exhaustive_logging`` option that consumes this is
    opt-in (the reference scores every episode at 16 serial envs,
    ``safelife_env.py:183-193``; this restores that behavior when asked).
    """
    return {
        "found": info["lane_done"] & bool(valid),
        "init_board": init_boards,
        "final_board": state.board,
        "num_steps": state.num_steps,
        "spawn_prob": jnp.take(pool.spawn_prob, state.level_idx),
        "level_idx": state.level_idx,
    }


def step_impl(cfg, pool, state, actions, key):
    """Batched environment step.

    Parameters
    ----------
    cfg : EnvConfig (static)
    pool : LevelBatch — level pool for auto-reset draws.
    state : EnvState with leading batch axis B.
    actions : int32[B, A]
    key : PRNG key (split per lane internally).

    Returns
    -------
    (state, obs, reward, done, info) — obs uint8[B, A, vh, vw, C],
    reward float32[B, A], done bool[B, A].
    """
    reset_key, key = jax.random.split(key)
    state, reward, done, info = step_core(cfg, pool, state, actions, key)
    if cfg.auto_reset:
        state = merge_lane_reset(
            info["lane_done"], reset_key,
            lambda r: reset_batch(cfg, pool, r % pool.num_levels,
                                  state.min_perf_fraction),
            state)
    obs = _batch_obs(cfg, pool, state)
    return state, obs, reward, done, info


reset = jax.jit(reset_impl, static_argnames=("cfg", "batch_size"))
step = jax.jit(step_impl, static_argnames=("cfg",))
