"""Reward-shaping wrapper semantics (parity: safelife/env_wrappers.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from safelife_tpu.core import cells as C
from safelife_tpu.core.scoring import DEFAULT_POINTS_TABLE
from safelife_tpu.env import env as E, wrappers as W
from safelife_tpu.env.state import pack_levels
from safelife_tpu.io.levels import Level


def _empty_level(min_perf=-1.0):
    """Open floor: agent in the middle, exit far away, no life."""
    board = np.zeros((12, 12), np.int64)
    goals = np.zeros((12, 12), np.int64)
    board[6, 6] = C.PLAYER
    board[1, 1] = C.LEVEL_EXIT
    return Level(
        board=board.astype(np.int32), goals=goals.astype(np.int32),
        agent_locs=np.array([[6, 6]]), agent_names=np.array(["a"]),
        points_table=np.tile(DEFAULT_POINTS_TABLE, (1, 1, 1)),
        min_performance=min_perf, spawn_prob=0.3, name="empty")


def _setup(wcfg, min_perf=-1.0, time_limit=50):
    cfg = E.EnvConfig(view_shape=(9, 9), time_limit=time_limit,
                      goals_may_evolve=False, auto_reset=False)
    pool = pack_levels([_empty_level(min_perf)])
    ws, obs = W.reset(cfg, wcfg, pool, jax.random.PRNGKey(0), 1)
    return cfg, pool, ws, obs


def _step(cfg, wcfg, pool, ws, action, key=0, **kw):
    return W.step_impl(cfg, wcfg, pool, ws,
                       jnp.full((1, 1), action, jnp.int32),
                       jax.random.PRNGKey(key), **kw)


class TestMovementBonus:
    def test_standing_still_penalized(self):
        """as_penalty recenters the bonus: no movement over the window
        costs -movement_bonus per step (env_wrappers.py:85-98)."""
        wcfg = W.WrapperConfig(movement_bonus=0.1, movement_as_penalty=True,
                               exit_bonus=0.0)
        cfg, pool, ws, _ = _setup(wcfg)
        for t in range(6):
            ws, obs, r, d, info = _step(cfg, wcfg, pool, ws, 0, key=t)
        assert float(np.asarray(r)[0, 0]) == pytest.approx(-0.1)

    def test_constant_motion_unpenalized(self):
        wcfg = W.WrapperConfig(movement_bonus=0.1, movement_as_penalty=True,
                               exit_bonus=0.0)
        cfg, pool, ws, _ = _setup(wcfg)
        # March right continuously; after the window fills, speed == 1.
        for t in range(6):
            ws, obs, r, d, info = _step(cfg, wcfg, pool, ws, 2, key=t)
        assert float(np.asarray(r)[0, 0]) == pytest.approx(0.0, abs=1e-6)


class TestExitBonus:
    def test_bonus_on_successful_exit(self):
        """exit bonus = bonus * core episode reward when the episode ends
        by exiting, not when time runs out (env_wrappers.py:121-128)."""
        wcfg = W.WrapperConfig(movement_bonus=0.0, exit_bonus=0.5)
        # min_perf <= 0 -> exit open immediately. Walk agent to the exit.
        cfg, pool, ws, _ = _setup(wcfg)
        path = [1] * 5 + [4] * 5   # up x5 (6->1), left x5 (6->1)
        r = d = None
        for t, a in enumerate(path):
            ws, obs, r, d, info = _step(cfg, wcfg, pool, ws, a, key=t)
        assert bool(np.asarray(d)[0, 0]), "agent should have exited"
        # Core episode reward: +1 exit point; shaped adds 0.5 * 1.
        assert float(np.asarray(r)[0, 0]) == pytest.approx(1.0 + 0.5)

    def test_no_bonus_on_timeout(self):
        wcfg = W.WrapperConfig(movement_bonus=0.0, exit_bonus=0.5)
        cfg, pool, ws, _ = _setup(wcfg, time_limit=3)
        for t in range(3):
            ws, obs, r, d, info = _step(cfg, wcfg, pool, ws, 0, key=t)
        assert bool(np.asarray(d)[0, 0])
        assert float(np.asarray(r)[0, 0]) == pytest.approx(0.0)


class TestSideEffectPenalty:
    def test_penalty_on_board_change(self):
        """Creating a life cell deviates from the starting-state baseline
        by one cell -> reward -= coef * 1 (env_wrappers.py:171-213)."""
        wcfg = W.WrapperConfig(movement_bonus=0.0, exit_bonus=0.0,
                               se_baseline="starting-state")
        cfg, pool, ws, _ = _setup(wcfg)
        # Toggle up: creates a life cell above the agent.
        ws, obs, r, d, info = _step(cfg, wcfg, pool, ws, 5,
                                    se_penalty_coef=2.0)
        core_reward = 0.0  # black life on a no-goal cell scores 0
        assert float(np.asarray(r)[0, 0]) == pytest.approx(
            core_reward - 2.0 * 1)

    def test_penalty_only_on_delta(self):
        wcfg = W.WrapperConfig(movement_bonus=0.0, exit_bonus=0.0,
                               se_baseline="starting-state")
        cfg, pool, ws, _ = _setup(wcfg)
        ws, obs, r, d, info = _step(cfg, wcfg, pool, ws, 5,
                                    se_penalty_coef=2.0)
        # Next step: no new deviation -> no additional penalty.
        ws, obs, r, d, info = _step(cfg, wcfg, pool, ws, 0, key=1,
                                    se_penalty_coef=2.0)
        assert float(np.asarray(r)[0, 0]) == pytest.approx(0.0)

    def test_movement_orientation_quirk(self):
        """The reference masks the player composite but NOT the
        orientation bits, so the first move leaves a 2-cell orientation
        residue vs the baseline (verified against the real reference
        wrapper: side_effect jumps to 2 once, then stays). We reproduce
        that quirk exactly (env_wrappers.py:186-193)."""
        wcfg = W.WrapperConfig(movement_bonus=0.0, exit_bonus=0.0,
                               se_baseline="starting-state")
        cfg, pool, ws, _ = _setup(wcfg)
        ws, obs, r, d, info = _step(cfg, wcfg, pool, ws, 2,
                                    se_penalty_coef=5.0)
        assert float(np.asarray(r)[0, 0]) == pytest.approx(-10.0)
        ws, obs, r, d, info = _step(cfg, wcfg, pool, ws, 2, key=1,
                                    se_penalty_coef=5.0)
        assert float(np.asarray(r)[0, 0]) == pytest.approx(0.0)


class TestMinPerformanceScheduler:
    def test_fraction_scales_required_points(self):
        wcfg = W.WrapperConfig(movement_bonus=0.0, exit_bonus=0.0)
        board = np.zeros((12, 12), np.int64)
        goals = np.zeros((12, 12), np.int64)
        goals[2:6, 2:6] = C.COLOR_B
        board[6, 6] = C.PLAYER
        board[1, 1] = C.LEVEL_EXIT
        lv = Level(
            board=board.astype(np.int32), goals=goals.astype(np.int32),
            agent_locs=np.array([[6, 6]]), agent_names=np.array(["a"]),
            points_table=np.tile(DEFAULT_POINTS_TABLE, (1, 1, 1)),
            min_performance=0.8, spawn_prob=0.3, name="goalful")
        cfg = E.EnvConfig(view_shape=(9, 9), time_limit=50,
                          goals_may_evolve=False, auto_reset=False)
        pool = pack_levels([lv])
        ws_full, _ = W.reset(cfg, wcfg, pool, jax.random.PRNGKey(0), 1,
                             min_perf_fraction=1.0)
        ws_small, _ = W.reset(cfg, wcfg, pool, jax.random.PRNGKey(0), 1,
                              min_perf_fraction=0.01)
        lv_full = E.lane_level(pool, ws_full.env.level_idx,
                               ws_full.env.min_perf_fraction)
        lv_small = E.lane_level(pool, ws_small.env.level_idx,
                                ws_small.env.min_perf_fraction)
        full = int(np.asarray(lv_full.required_points)[0, 0])
        small = int(np.asarray(lv_small.required_points)[0, 0])
        assert full > small >= 0

    def test_fraction_zero_opens_exits_at_reset(self):
        """A schedule fraction of exactly 0 zeroes the points requirement,
        so exits must be recolored open at t=0 — the precomputed
        reset_board (exact for every positive fraction) must not leak in.
        Ground truth: the same level packed with min_performance=0."""
        wcfg = W.WrapperConfig(movement_bonus=0.0, exit_bonus=0.0)
        board = np.zeros((12, 12), np.int64)
        goals = np.zeros((12, 12), np.int64)
        goals[2:6, 2:6] = C.COLOR_B
        board[6, 6] = C.PLAYER
        board[1, 1] = C.LEVEL_EXIT

        def mk(mperf):
            lv = Level(
                board=board.astype(np.int32), goals=goals.astype(np.int32),
                agent_locs=np.array([[6, 6]]), agent_names=np.array(["a"]),
                points_table=np.tile(DEFAULT_POINTS_TABLE, (1, 1, 1)),
                min_performance=mperf, spawn_prob=0.3, name="goalful")
            return pack_levels([lv])

        cfg = E.EnvConfig(view_shape=(9, 9), time_limit=50,
                          goals_may_evolve=False, auto_reset=False)
        pool = mk(0.8)
        ws_zero, _ = W.reset(cfg, wcfg, pool, jax.random.PRNGKey(0), 1,
                             min_perf_fraction=0.0)
        ws_full, _ = W.reset(cfg, wcfg, pool, jax.random.PRNGKey(0), 1,
                             min_perf_fraction=1.0)
        # The closed-exit recoloring must differ from the open one
        # somewhere (the exit cell), and the fraction-0 reset must match
        # the requirement-free level bit for bit.
        assert not np.array_equal(np.asarray(ws_zero.env.board),
                                  np.asarray(ws_full.env.board))
        truth, _ = W.reset(cfg, wcfg, mk(0.0), jax.random.PRNGKey(0), 1,
                           min_perf_fraction=1.0)
        np.testing.assert_array_equal(np.asarray(ws_zero.env.board),
                                      np.asarray(truth.env.board))


class TestInactionBaselineEpisodeSampling:
    """Inaction-baseline training runs must still produce valid
    episode-end SE samples: the sample reads the episode's own start
    board, carried separately from the evolving baseline (VERDICT
    round-1 weak item 4)."""

    def test_inaction_run_samples_episodes(self):
        wcfg = W.WrapperConfig(se_baseline="inaction")
        cfg, pool, ws, obs = _setup(wcfg, time_limit=3)
        start_board = np.asarray(ws.env.board[0]).copy()
        found = False
        for t in range(3):
            ws, obs, r, d, info = _step(cfg, wcfg, pool, ws, 1, key=t)
            samp = info["ep_sample"]
            if bool(np.asarray(samp["found"])):
                found = True
                np.testing.assert_array_equal(
                    np.asarray(samp["init_board"]), start_board)
        assert found, "episode finished (time limit 3) but no sample"

    def test_inaction_baseline_still_evolves(self):
        """The penalty baseline itself must keep advancing (that is what
        distinguishes inaction from starting-state)."""
        from safelife_tpu.io.levels import Level
        from safelife_tpu.core.scoring import DEFAULT_POINTS_TABLE

        board = np.zeros((12, 12), np.int64)
        goals = np.zeros((12, 12), np.int64)
        # A blinker oscillates, so the inaction baseline changes each
        # step while the starting-state baseline would not.
        board[4, 3:6] = C.ALIVE | C.DESTRUCTIBLE
        board[8, 8] = C.PLAYER
        board[1, 1] = C.LEVEL_EXIT
        lv = Level(board=board.astype(np.int32),
                   goals=goals.astype(np.int32),
                   agent_locs=np.array([[8, 8]]),
                   agent_names=np.array(["a"]),
                   points_table=np.tile(DEFAULT_POINTS_TABLE, (1, 1, 1)),
                   min_performance=-1.0, spawn_prob=0.0, name="blinker")
        cfg = E.EnvConfig(view_shape=(9, 9), time_limit=50,
                          goals_may_evolve=False, auto_reset=False,
                          stochastic=False)
        pool = pack_levels([lv])
        wcfg = W.WrapperConfig(se_baseline="inaction")
        ws, obs = W.reset(cfg, wcfg, pool, jax.random.PRNGKey(0), 1)
        b0 = np.asarray(ws.baseline_board[0]).copy()
        ws, obs, r, d, info = _step(cfg, wcfg, pool, ws, 0)
        b1 = np.asarray(ws.baseline_board[0])
        assert (b0 != b1).any()
        # ...while the episode-start capture stays fixed.
        np.testing.assert_array_equal(
            np.asarray(ws.episode_start_board[0]), b0)
