"""Training-time reward shaping, folded into the batched env step.

The reference stacks gym wrappers around each env object
(``training/env_factory.py:261-287``: MovementBonus -> ExtraExitBonus ->
SimpleSideEffectPenalty -> MinPerformanceScheduler). Here the same shaping
is a pure function over a :class:`WrappedState` pytree so the whole thing
stays inside one jitted lockstep step. Semantics parity with
``safelife/env_wrappers.py``:

* **movement bonus** (env_wrappers.py:32-98): speed over a trailing
  ``period``-step window; with ``as_penalty`` the bonus is recentered into a
  standing-still penalty. The reference's ``speed ** 1e-100`` (≈ 1 for any
  movement, 0 for none) is computed in a float32-safe way.
* **extra exit bonus** (env_wrappers.py:121-128): on episode end (except
  time-up), add ``bonus * episode_reward`` — the *core* env episode reward,
  excluding shaping.
* **simple side-effect penalty** (env_wrappers.py:148-213): per-step penalty
  on the number of cells deviating from a baseline board (the starting state,
  or an inaction counterfactual advanced alongside), ignoring player bits and
  exit recoloring.
* **min-performance scheduler** (env_wrappers.py:131-145): scales each fresh
  level's ``min_performance``; handled by the ``min_perf_fraction`` argument
  threaded into resets.

Schedule-driven coefficients (side-effect penalty, exit difficulty) are
traced scalars so training schedules don't trigger recompiles.
"""

import dataclasses

import flax.struct
import jax
import jax.numpy as jnp

from ..core import cells as C
from . import env as E


@dataclasses.dataclass(frozen=True)
class WrapperConfig:
    movement_bonus: float = 0.1
    movement_bonus_period: int = 4
    movement_bonus_power: float = 1e-100
    movement_as_penalty: bool = True
    single_agent: bool = True  # scalar (agent-0) vs per-agent move bonus
    exit_bonus: float = 0.5
    se_baseline: str = "starting-state"  # or "inaction"
    ignore_reward_cells: bool = False
    enabled: bool = True
    # ContinuingEnv semantics (reference env_wrappers.py:101-118): the
    # learner-visible ``done`` is suppressed unless the time limit fired,
    # so value bootstrapping continues across deaths/exits (auto-reset
    # supplies the fresh level either way). The reference restricts this
    # to single-agent envs; here the [B] times_up flag broadcasts over
    # the agent axis, which is the same restriction in batched form.
    continuing: bool = False
    # Capture every lane's (init, final) boards per step so the trainer
    # can score every finished episode's side effects like the reference
    # (safelife_env.py:183-193) instead of sampling one per step. Costs
    # [T, B, H, W] x2 per chunk — use at validation-scale batches.
    exhaustive_se: bool = False


@flax.struct.dataclass
class WrappedState:
    env: E.EnvState
    prior_positions: jax.Array   # int32 [B, period, A, 2] ring buffer
    prior_count: jax.Array       # int32 [B] — entries filled (<= period)
    last_side_effect: jax.Array  # int32 [B]
    baseline_board: jax.Array    # int32 [B, H, W]
    # The episode's own starting board, held fixed for episode-end
    # side-effect sampling. Separate from baseline_board because the
    # inaction baseline *evolves* each step.
    episode_start_board: jax.Array  # int32 [B, H, W]


def _fresh_wrapper_fields(period, env_state):
    """Batched wrapper state right after a reset."""
    locs = env_state.agent_locs  # [B, A, 2]
    b = locs.shape[0]
    ring = jnp.zeros((b, period) + locs.shape[1:], jnp.int32)
    ring = ring.at[:, 0].set(locs)
    return ring, jnp.ones((b,), jnp.int32), jnp.zeros((b,), jnp.int32), \
        env_state.board


def reset_impl(cfg, wcfg, pool, key, batch_size, min_perf_fraction=1.0):
    state, obs = E.reset(cfg, pool, key, batch_size, min_perf_fraction)
    ring, cnt, lse, base = _fresh_wrapper_fields(
        wcfg.movement_bonus_period, state)
    return WrappedState(
        env=state, prior_positions=ring, prior_count=cnt,
        last_side_effect=lse, baseline_board=base,
        episode_start_board=base,
    ), obs


def _movement_bonus(wcfg, ws_prior, ws_count, locs, agent_mask):
    """Per-lane movement bonus (no batch axis).

    Single-agent mode returns a scalar (the reference's squeeze,
    env_wrappers.py:85-86); multi-agent mode returns a per-agent [A]
    vector, exactly as the reference's un-squeezed ``speed`` broadcasts
    into the per-agent reward vector.
    """
    period = wcfg.movement_bonus_period
    full = ws_count >= period
    # Oldest entry: with a full ring the slot about to be overwritten; before
    # that, the first entry ever written (slot 0).
    oldest = jnp.where(full, ws_count % period, 0)
    p1 = ws_prior[oldest]
    dist = jnp.sum(jnp.abs(locs - p1), axis=-1).astype(jnp.float32)
    dist = dist + jnp.where(full, 0, period - ws_count).astype(jnp.float32)
    speed = dist / period
    if wcfg.single_agent:
        speed = jnp.sum(speed[:1] * agent_mask[:1])
    # speed ** 1e-100 in float64 ≈ (speed > 0); compute float32-safely.
    p = wcfg.movement_bonus_power
    powd = jnp.where(
        speed > 0, jnp.exp(p * jnp.log(jnp.maximum(speed, 1e-30))), 0.0)
    bonus = wcfg.movement_bonus * powd
    if wcfg.movement_as_penalty:
        bonus = bonus - wcfg.movement_bonus
    return bonus


def _side_effect_count(wcfg, board, baseline_board, goals, exit_mask):
    """Number of non-player cell deviations from the baseline (per lane)."""
    b = board & ~C.PLAYER
    bb = baseline_board & ~C.PLAYER
    # Ignore exit recoloring.
    b = jnp.where(exit_mask, bb, b)
    unchanged = b == bb
    if wcfg.ignore_reward_cells:
        red_life = C.ALIVE | C.COLOR_R
        start_red = (bb & red_life) == red_life
        end_red = (b & red_life) == red_life
        goal_cell = (goals & C.RAINBOW_COLOR) == C.COLOR_B
        end_alive = (b & red_life) == C.ALIVE
        non_effects = unchanged | (start_red & ~end_red) | \
            (goal_cell & end_alive)
    else:
        non_effects = unchanged
    return jnp.sum(~non_effects).astype(jnp.int32)


def _shape_one(wcfg, ring, count, last_se, s, lv, reward, done, times_up,
               baseline, se_penalty_coef):
    """Per-lane reward shaping, given the core step's per-lane results."""
    # --- movement bonus (innermost wrapper) ---
    bonus = _movement_bonus(
        wcfg, ring, count, s.agent_locs, lv.agent_mask)
    shaped = reward + bonus
    slot = count % wcfg.movement_bonus_period
    ring = ring.at[slot].set(s.agent_locs)
    count = count + 1

    # --- extra exit bonus: uses the core episode reward ---
    shaped = shaped + jnp.where(
        done & ~times_up, wcfg.exit_bonus * s.episode_reward, 0.0)

    # --- side-effect penalty ---
    se = _side_effect_count(
        wcfg, s.board, baseline, s.goals, lv.exit_mask)
    delta = (se - last_se).astype(jnp.float32)
    shaped = shaped - delta * se_penalty_coef
    return shaped, ring, count, se


def _fresh_wrapped(cfg, wcfg, pool, idx, min_perf_fraction):
    """Batched fresh WrappedState from pool levels ``idx`` (int32[B])."""
    fresh_env = E.reset_batch(cfg, pool, idx, min_perf_fraction)
    f_ring, f_cnt, f_lse, f_base = _fresh_wrapper_fields(
        wcfg.movement_bonus_period, fresh_env)
    return WrappedState(env=fresh_env, prior_positions=f_ring,
                        prior_count=f_cnt, last_side_effect=f_lse,
                        baseline_board=f_base,
                        episode_start_board=f_base)


def step_impl(cfg, wcfg, pool, state, actions, key,
              se_penalty_coef=0.0, min_perf_fraction=1.0):
    """Batched wrapped step. actions: int32[B, A]."""
    reset_key, phys_key, se_key = jax.random.split(key, 3)
    # Core env step without auto-reset (rewards are shaped from the
    # pre-reset state first; lanes and wrapper state reset together).
    core_cfg = dataclasses.replace(cfg, auto_reset=False)
    env2, reward, done, info = E.step_core(
        core_cfg, pool, state.env, actions, phys_key)
    # Episode-end SE sampling reads the episode's own start board, so
    # inaction-baseline runs (exactly the penalized spawn-task runs that
    # need safety telemetry) sample episodes too.
    if wcfg.exhaustive_se:
        info["ep_sample"] = E.all_episode_records(
            pool, state.episode_start_board, env2, info)
    else:
        info["ep_sample"] = E.sample_episode_record(
            pool, state.episode_start_board, env2, info)

    if wcfg.enabled:
        if wcfg.se_baseline == "inaction":
            base_cfg = dataclasses.replace(
                core_cfg, stochastic=(core_cfg.stochastic
                                      and not pool.spawner_free))
            baseline = E.advance_batch(
                base_cfg, state.baseline_board,
                jnp.take(pool.spawn_prob, env2.level_idx), se_key)
        else:
            baseline = state.baseline_board
        lv2 = E.lane_level(pool, env2.level_idx, env2.min_perf_fraction)
        shaped, ring, count, last_se = jax.vmap(
            lambda r, c, l, s, lvl, rw, d, t, bb: _shape_one(
                wcfg, r, c, l, s, lvl, rw, d, t, bb, se_penalty_coef)
        )(state.prior_positions, state.prior_count,
          state.last_side_effect, env2, lv2, reward, done,
          info["times_up"], baseline)
        reward = shaped
    else:
        ring, count, last_se, baseline = (
            state.prior_positions, state.prior_count,
            state.last_side_effect, state.baseline_board)

    state = WrappedState(env=env2, prior_positions=ring, prior_count=count,
                         last_side_effect=last_se, baseline_board=baseline,
                         episode_start_board=state.episode_start_board)
    if cfg.auto_reset:
        state = E.merge_lane_reset(
            info["lane_done"], reset_key,
            lambda r: _fresh_wrapped(cfg, wcfg, pool, r % pool.num_levels,
                                     min_perf_fraction),
            state)
    obs = E._batch_obs(cfg, pool, state.env)
    if wcfg.continuing:
        # The lanes reset above regardless; only the learner-visible
        # episode boundary is masked (the reference's ContinuingEnv
        # returns the fresh reset obs with done=False the same way).
        done = done & info["times_up"][:, None]
    return state, obs, reward, done, info


reset = jax.jit(reset_impl, static_argnames=("cfg", "wcfg", "batch_size"))
step = jax.jit(step_impl, static_argnames=("cfg", "wcfg"))
