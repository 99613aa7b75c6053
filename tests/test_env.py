"""Step-for-step parity tests of the batched TPU env against the numpy
env oracle, on crafted levels and on real shipped benchmark levels."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracle as O
from env_oracle import GameOracle, EnvOracle
from safelife_tpu.core import cells as C
from safelife_tpu.env import env as E
from safelife_tpu.env.state import pack_levels
from safelife_tpu.io.levels import Level, load_levels, level_from_data
from safelife_tpu.core.scoring import DEFAULT_POINTS_TABLE

REF_LEVELS = "/root/reference/safelife/levels"


def crafted_level(seed=0, size=(14, 14), min_perf=0.3):
    rng = np.random.default_rng(seed)
    h, w = size
    board = np.zeros(size, np.int64)
    goals = np.zeros(size, np.int64)
    alive = rng.random(size) < 0.15
    board |= alive * (O.ALIVE | O.DESTRUCTIBLE)
    board |= (rng.random(size) < 0.08) * O.FROZEN
    # some colored life and goals
    board |= (rng.integers(0, 8, size) << 9) * alive
    goals |= (rng.random(size) < 0.2) * (1 << 10)  # green goals
    loc = (h // 2, w // 2)
    board[loc] = C.PLAYER
    board[2, 2] = C.LEVEL_EXIT
    return Level(
        board=board.astype(np.int32), goals=goals.astype(np.int32),
        agent_locs=np.array([loc]),
        agent_names=np.array(["agent0"]),
        points_table=np.tile(DEFAULT_POINTS_TABLE, (1, 1, 1)),
        min_performance=min_perf, spawn_prob=0.3, name="crafted-%d" % seed,
    )


def make_env(level, **cfg_kw):
    cfg = E.EnvConfig(auto_reset=False, goals_may_evolve=True, **cfg_kw)
    pool = pack_levels([level])
    state, obs = E.reset(cfg, pool, jax.random.PRNGKey(0), 1)
    return cfg, pool, state, obs


def make_oracle(level, **env_kw):
    g = GameOracle(
        level.board, level.goals, level.agent_locs,
        points_table=level.points_table,
        min_performance=level.min_performance,
        spawn_prob=level.spawn_prob,
        rng=np.random.default_rng(0),
    )
    env = EnvOracle(g, **env_kw)
    obs = env.reset_bookkeeping()
    return env, obs


def rollout_compare(level, n_steps=30, seed=0, **env_kw):
    cfg, pool, state, obs = make_env(level, **env_kw)
    oenv, oobs = make_oracle(level, **{
        k.replace("view_shape", "view_shape"): v for k, v in env_kw.items()})
    np.testing.assert_array_equal(np.asarray(obs[0]), oobs,
                                  err_msg="reset obs mismatch")
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    for t in range(n_steps):
        act = rng.integers(0, 9, size=len(level.agent_locs))
        key, k = jax.random.split(key)
        state, obs, reward, done, info = E.step(
            cfg, pool, state, jnp.asarray(act[None], jnp.int32), k)
        oobs, oreward, odone, oinfo = oenv.step(act)
        np.testing.assert_array_equal(
            np.asarray(state.board[0]), oenv.game.board,
            err_msg="board mismatch at step %d" % t)
        np.testing.assert_array_equal(
            np.asarray(obs[0]), oobs, err_msg="obs mismatch at step %d" % t)
        np.testing.assert_allclose(
            np.asarray(reward[0]), oreward,
            err_msg="reward mismatch at step %d" % t)
        np.testing.assert_array_equal(
            np.asarray(done[0]), odone, err_msg="done mismatch at step %d" % t)


def crafted_multiagent_level(seed=0, size=(14, 14), n_agents=3):
    lv = crafted_level(seed, size)
    rng = np.random.default_rng(seed + 100)
    h, w = size
    locs = [tuple(lv.agent_locs[0])]
    board = lv.board
    while len(locs) < n_agents:
        y, x = int(rng.integers(1, h - 1)), int(rng.integers(1, w - 1))
        if (y, x) in locs or board[y, x] & C.EXIT:
            continue
        board[y, x] = C.PLAYER | (int(rng.integers(0, 8)) << 9)
        locs.append((y, x))
    lv.agent_locs = np.array(locs)
    lv.agent_names = np.array(["agent%d" % i for i in range(n_agents)])
    lv.points_table = np.tile(DEFAULT_POINTS_TABLE, (n_agents, 1, 1))
    return lv


class TestCraftedLevels:
    @pytest.mark.parametrize("seed", range(4))
    def test_random_rollout_parity(self, seed):
        rollout_compare(crafted_level(seed), n_steps=25, seed=seed)

    @pytest.mark.parametrize("seed", range(3))
    def test_multiagent_rollout_parity(self, seed):
        """Simultaneous multi-agent actions: sequential-order semantics,
        per-agent rewards/done (reference v1.2 multi-agent support)."""
        rollout_compare(crafted_multiagent_level(seed), n_steps=25,
                        seed=seed)

    def test_scoring_primitives(self):
        lv = crafted_level(1)
        from safelife_tpu.core import scoring
        g = GameOracle(lv.board, lv.goals, lv.agent_locs,
                       min_performance=lv.min_performance)
        counts = scoring.alive_counts(
            jnp.asarray(lv.board, jnp.int32), jnp.asarray(lv.goals, jnp.int32))
        np.testing.assert_array_equal(np.asarray(counts), g.alive_counts())

        pt = jnp.asarray(lv.points_table, jnp.int32)
        mask = jnp.ones((1,), bool)
        locs = jnp.asarray(lv.agent_locs, jnp.int32)
        board = jnp.asarray(lv.board, jnp.int32)
        cur = scoring.current_points(counts, pt, board, locs, mask)
        np.testing.assert_allclose(np.asarray(cur), g.current_points())

        avail = scoring.initial_available_points(
            counts, jnp.asarray(g.initial_colors), pt)
        np.testing.assert_allclose(np.asarray(avail),
                                   g.initial_available_points())
        req = scoring.required_points(
            jnp.asarray(lv.min_performance, jnp.float32)[None], avail)
        np.testing.assert_array_equal(np.asarray(req)[0], g.required_points())

    def test_exit_opens_after_enough_points(self):
        # A level with min_performance <= 0 opens its exit immediately
        lv = crafted_level(2, min_perf=-1.0)
        cfg, pool, state, obs = make_env(lv)
        board = np.asarray(state.board[0])
        assert board[2, 2] == C.LEVEL_EXIT | C.COLOR_R  # open & red
        y, x = lv.agent_locs[0]
        assert board[y, x] & C.EXIT  # exit bit on the agent

    def test_view_larger_than_board(self):
        rollout_compare(crafted_level(3), n_steps=6, view_shape=(25, 25))

    def test_raw_observation_mode(self):
        lv = crafted_level(0)
        cfg, pool, state, obs = make_env(lv, output_channels=None)
        oenv, oobs = make_oracle(lv, output_channels=None)
        np.testing.assert_array_equal(np.asarray(obs[0]), oobs)


class TestBatchedObs:
    """The matmul-recenter batch path must match vmap of the scalar path
    bit for bit on adversarial inputs (border agents, invalid agents,
    colliding exits, views larger than the board)."""

    def _random_inputs(self, seed, b=7, h=11, w=13, a=3, e=4):
        rng = np.random.default_rng(seed)
        board = rng.integers(0, 1 << 16, (b, h, w), dtype=np.int64)
        goals = rng.integers(0, 1 << 16, (b, h, w), dtype=np.int64)
        locs = np.stack([rng.integers(0, h, (b, a)),
                         rng.integers(0, w, (b, a))], axis=-1)
        # force border / corner agents into the mix
        locs[:, 0] = [0, 0]
        locs[:, 1] = [h - 1, w - 1]
        mask = rng.random((b, a)) < 0.7
        elocs = np.stack([rng.integers(0, h, (b, e)),
                          rng.integers(0, w, (b, e))], axis=-1)
        elocs[:, 1] = elocs[:, 0]  # colliding exits: later must win
        evalid = rng.random((b, e)) < 0.7
        return (jnp.asarray(board, jnp.int32), jnp.asarray(goals, jnp.int32),
                jnp.asarray(locs, jnp.int32), jnp.asarray(mask),
                jnp.asarray(elocs, jnp.int32), jnp.asarray(evalid))

    def _assert_match(self, cfg, seed=0, **kw):
        args = self._random_inputs(seed, **kw)
        got = E.get_obs_batch(cfg, *args)
        want = jax.vmap(lambda bo, go, lo, ma, el, ev: E.get_obs(
            cfg, bo, go, lo, ma, el, ev))(*args)
        if cfg.flat_obs and cfg.output_channels is not None:
            want = want.reshape(want.shape[:2] + (-1,))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    @pytest.mark.parametrize("seed", range(3))
    def test_channels(self, seed):
        self._assert_match(E.EnvConfig(view_shape=(7, 9)), seed)

    def test_raw_packed(self):
        self._assert_match(E.EnvConfig(view_shape=(7, 9),
                                       output_channels=None))

    def test_view_larger_than_board(self):
        self._assert_match(E.EnvConfig(view_shape=(25, 25)))

    def test_keep_white_goals(self):
        self._assert_match(E.EnvConfig(view_shape=(15, 15),
                                       remove_white_goals=False))

    def test_flat_layout(self):
        self._assert_match(E.EnvConfig(view_shape=(7, 9), flat_obs=True))


class TestAutoReset:
    def test_lane_restarts_on_done(self):
        lv = crafted_level(0)
        cfg = E.EnvConfig(auto_reset=True, time_limit=5)
        pool = pack_levels([lv, crafted_level(1)])
        state, obs = E.reset(cfg, pool, jax.random.PRNGKey(0), 3)
        key = jax.random.PRNGKey(1)
        for t in range(5):
            key, k = jax.random.split(key)
            state, obs, reward, done, info = E.step(
                cfg, pool, state, jnp.zeros((3, 1), jnp.int32), k)
        # time limit hit at t=5 -> all lanes reset
        assert (np.asarray(state.num_steps) == 0).all()
        assert np.asarray(info["lane_done"]).all()
        # a fresh lane is fully re-initialized
        assert (np.asarray(state.episode_reward) == 0).all()


@pytest.mark.skipif(not os.path.isdir(REF_LEVELS),
                    reason="reference levels unavailable")
class TestReferenceBenchmarkLevels:
    def test_load_old_format_archive(self):
        levels = load_levels(
            os.path.join(REF_LEVELS, "benchmarks/v1.0/append-still.npz"))
        assert len(levels) == 100
        lv = levels[0]
        assert lv.shape == (26, 26)
        assert lv.num_agents == 1
        assert (lv.board[tuple(lv.agent_locs[0])] & C.AGENT)
        assert lv.min_performance > 0

    @pytest.mark.parametrize("idx", [0, 1, 50])
    def test_append_still_rollout_parity(self, idx):
        levels = load_levels(
            os.path.join(REF_LEVELS, "benchmarks/v1.0/append-still.npz"))
        lv = levels[idx]
        assert not (lv.board & C.SPAWNING).any(), "expected deterministic"
        rollout_compare(lv, n_steps=40, seed=idx)

    def test_prune_still_rollout_parity(self):
        levels = load_levels(
            os.path.join(REF_LEVELS, "benchmarks/v1.0/prune-still.npz"))
        rollout_compare(levels[0], n_steps=40, seed=7)


class TestPackedScoring:
    """points_base_packed must exactly match points_base for packable
    tables (the fast static-goals path used by the hot step)."""

    def test_matches_points_base(self):
        import jax.numpy as jnp
        from safelife_tpu.core import cells as C, scoring

        rng = np.random.default_rng(7)
        B, H, W, A = 5, 11, 13, 3
        board = rng.integers(0, 1 << 16, (B, H, W)).astype(np.int32)
        goals = (rng.integers(0, 8, (B, H, W)).astype(np.int32)
                 << C.COLOR_BIT)
        table = rng.integers(-8, 8, (B, A, 8, 9)).astype(np.int32)
        tf = scoring.flatten_points_table(jnp.asarray(table))
        assert scoring.rows_packable(table)
        w0, w8 = scoring.pack_goal_rows(jnp.asarray(goals), tf)
        ref = jax.vmap(scoring.points_base)(
            jnp.asarray(board), jnp.asarray(goals), tf)
        got = scoring.points_base_packed(jnp.asarray(board), w0, w8)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_unpackable_detected(self):
        from safelife_tpu.core import scoring

        t = np.zeros((1, 1, 8, 9), np.int32)
        t[0, 0, 3, 2] = 9
        assert not scoring.rows_packable(t)
        t[0, 0, 3, 2] = 0
        t[0, 0, 3, 8] = 1000  # empty column never constrains packing
        assert scoring.rows_packable(t)


class TestRegistry:
    """Canonical env registry (parity: safelife_env.py:231-246)."""

    def test_make_and_step(self):
        from safelife_tpu.registry import ENV_REGISTRY, make

        assert len(ENV_REGISTRY) == 8
        env = make("safelife-append-still-easy-v1", batch_size=2, seed=5,
                   time_limit=20)
        obs = env.reset()
        assert obs.shape[0] == 2
        for _ in range(3):
            a = np.zeros((2,), np.int32)
            obs, reward, done, info = env.step(a)
        assert reward.shape == (2, env.num_agents)
        assert isinstance(env.render(0), str)

    def test_unknown_name(self):
        from safelife_tpu.registry import make

        with pytest.raises(KeyError):
            make("safelife-bogus-v1")


class TestPackagedLevelAssets:
    """The packaged benchmark suite is the reference's frozen one.

    Benchmark scores are only comparable to published SafeLife numbers if
    the levels are byte-identical to the reference's shipped archives
    (VERDICT round-1 item 3); these tests pin that contract.
    """

    def _pkg(self, *parts):
        from safelife_tpu.io.levels import LEVEL_DIRECTORY
        return os.path.join(LEVEL_DIRECTORY, *parts)

    @pytest.mark.skipif(not os.path.isdir(REF_LEVELS),
                        reason="reference levels unavailable")
    @pytest.mark.parametrize("task", [
        "append-still", "append-spawn", "append-dynamic", "navigation",
        "prune-still", "prune-still-hard", "prune-spawn", "prune-dynamic"])
    def test_v10_archives_byte_identical(self, task):
        pkg = self._pkg("benchmarks", "v1.0", task + ".npz")
        ref = os.path.join(REF_LEVELS, "benchmarks/v1.0", task + ".npz")
        with open(pkg, "rb") as f1, open(ref, "rb") as f2:
            assert f1.read() == f2.read()

    @pytest.mark.parametrize("task", [
        "append-still", "append-spawn", "append-dynamic", "navigation",
        "prune-still", "prune-still-hard", "prune-spawn", "prune-dynamic"])
    def test_v12_human_archives_load(self, task):
        levels = load_levels(
            self._pkg("benchmarks", "v1.2", task + "-human.npz"))
        assert len(levels) == 10
        assert levels[0].shape[0] > 0

    def test_puzzles_and_mazes_load(self):
        import glob

        puzzles = sorted(glob.glob(self._pkg("puzzles", "*.npz")))
        mazes = sorted(glob.glob(self._pkg("mazes", "*.npz")))
        assert len(puzzles) == 18 and len(mazes) == 11
        for path in puzzles[:3] + mazes[:3]:
            lv = load_levels(path)[0]
            assert lv.board.shape == lv.goals.shape

    def test_factory_uses_packaged_suite(self):
        from safelife_tpu.training.env_factory import build_environments

        bundle = build_environments(
            {"env_type": "prune-still", "seed": 1},
            num_envs=1, pool_size=4, procgen_workers=0)
        assert len(bundle.benchmark_levels) == 100
        bundle.pool_manager.close()

    MULTIAGENT_TASKS = ("asym1", "asym2", "multi-build-coop",
                        "multi-build-compete", "multi-build-parallel",
                        "multi-prune")

    def test_multiagent_archives_byte_stable(self):
        """The frozen multi-agent suite (ours — the reference ships none;
        its gen_benchmarks was only run for the 8 single-agent tasks)
        must match its generation-time SHA256 manifest byte for byte, so
        benchmark rows stay reproducible against a fixed suite."""
        import hashlib

        sums_path = self._pkg("benchmarks", "multi-agent-v1", "SHA256SUMS")
        sums = dict(
            reversed(line.split()) for line in open(sums_path)
            if line.strip())
        assert set(sums) == {t + ".npz" for t in self.MULTIAGENT_TASKS}
        for fname, expect in sums.items():
            data = open(self._pkg("benchmarks", "multi-agent-v1",
                                  fname), "rb").read()
            assert hashlib.sha256(data).hexdigest() == expect, fname

    @pytest.mark.parametrize("task", MULTIAGENT_TASKS)
    def test_multiagent_archives_load(self, task):
        levels = load_levels(
            self._pkg("benchmarks", "multi-agent-v1", task + ".npz"))
        assert len(levels) == 100
        multi = sum(lv.num_agents == 2 for lv in levels)
        if task == "multi-prune":
            assert multi > 0  # spec mixes 1- and 2-agent draws
        else:
            assert multi == 100

    def test_factory_uses_multiagent_suite(self):
        from safelife_tpu.training.env_factory import build_environments

        bundle = build_environments(
            {"env_type": "multi-build-coop", "seed": 1},
            num_envs=1, pool_size=4, procgen_workers=0)
        assert len(bundle.benchmark_levels) == 100
        assert all(lv.num_agents == 2 for lv in bundle.benchmark_levels)
        bundle.pool_manager.close()
