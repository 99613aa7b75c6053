"""Multi-device sharding tests on the virtual 8-device CPU mesh.

The standard JAX substitute for a real pod slice: conftest forces
``--xla_force_host_platform_device_count=8``, so these tests exercise the
real mesh/sharding code paths (env lanes sharded over the ``env`` axis,
learner replicated, psum'd grads) without TPU hardware.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from safelife_tpu.env import env as E, wrappers as W
from safelife_tpu.env.state import pack_levels
from safelife_tpu.models.nets import SafeLifePolicyNetwork
from safelife_tpu.parallel import mesh as M
from safelife_tpu.training import ppo

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the virtual 8-device mesh")


def _crafted(n=4, size=(14, 14)):
    from safelife_tpu.core import cells as C
    from safelife_tpu.core.scoring import DEFAULT_POINTS_TABLE
    from safelife_tpu.io.levels import Level

    out = []
    for seed in range(n):
        rng = np.random.default_rng(seed)
        h, w = size
        board = np.zeros(size, np.int64)
        goals = np.zeros(size, np.int64)
        board |= (rng.random(size) < 0.1) * (C.ALIVE | C.DESTRUCTIBLE)
        goals |= (rng.random(size) < 0.15) * C.COLOR_B
        board[h // 2, w // 2] = C.PLAYER
        board[2, 2] = C.LEVEL_EXIT
        out.append(Level(
            board=board.astype(np.int32), goals=goals.astype(np.int32),
            agent_locs=np.array([[h // 2, w // 2]]),
            agent_names=np.array(["agent0"]),
            points_table=np.tile(DEFAULT_POINTS_TABLE, (1, 1, 1)),
            min_performance=0.1, spawn_prob=0.3, name="p-%d" % seed))
    return out


class TestShardedTraining:
    @pytest.mark.slow  # full sharded-vs-replicated train iteration (~70s)
    def test_sharded_train_iteration_matches_replicated(self):
        mesh = M.make_mesh(8)
        pool = pack_levels(_crafted(2))
        env_cfg = E.EnvConfig(view_shape=(25, 25),
                              output_channels=tuple(range(15)),
                              time_limit=16, goals_may_evolve=False)
        wcfg = W.WrapperConfig()
        ppo_cfg = ppo.PPOConfig(steps_per_env=4)

        batch = 16
        ws, obs = W.reset(env_cfg, wcfg, pool, jax.random.PRNGKey(0), batch)
        model = SafeLifePolicyNetwork()
        params = model.init(jax.random.PRNGKey(1),
                            np.zeros((1, 25, 25, 15), np.float32))
        pstate = ppo.init_ppo_state(ppo_cfg, params)

        # Unsharded single-device result.
        p1, ws1, obs1, m1 = ppo.train_iteration(
            env_cfg, wcfg, ppo_cfg, model.apply, pool, pstate, ws, obs,
            jax.random.PRNGKey(2))

        # Sharded: env lanes over the mesh, learner replicated.
        ws_s = M.shard_env_state(ws, mesh)
        obs_s = M.shard_env_state(obs, mesh)
        pool_s = M.replicate(pool, mesh)
        pstate_s = M.replicate(pstate, mesh)
        with mesh:
            p2, ws2, obs2, m2 = ppo.train_iteration(
                env_cfg, wcfg, ppo_cfg, model.apply, pool_s, pstate_s,
                ws_s, obs_s, jax.random.PRNGKey(2))

        assert int(p2.num_steps) == int(p1.num_steps) == 4 * batch
        np.testing.assert_allclose(
            float(m2["loss"]), float(m1["loss"]), rtol=2e-4)
        np.testing.assert_array_equal(
            np.asarray(ws2.env.board), np.asarray(ws1.env.board))
        # Boards must actually be distributed across devices.
        shardings = {str(d) for d in ws2.env.board.sharding.device_set}
        assert len(shardings) == 8

    def test_env_step_sharded_equals_unsharded(self):
        mesh = M.make_mesh(8)
        pool = pack_levels(_crafted(3))
        cfg = E.EnvConfig(view_shape=(15, 15), time_limit=20,
                          goals_may_evolve=False, stochastic=False)
        state, obs = E.reset(cfg, pool, jax.random.PRNGKey(0), 32)
        actions = jax.random.randint(
            jax.random.PRNGKey(1), (32, pool.num_agents), 0, 9, jnp.int32)

        s1, o1, r1, d1, i1 = E.step(cfg, pool, state, actions,
                                    jax.random.PRNGKey(2))
        state_s = M.shard_env_state(state, mesh)
        with mesh:
            s2, o2, r2, d2, i2 = E.step(cfg, pool, state_s, actions,
                                        jax.random.PRNGKey(2))
        np.testing.assert_array_equal(np.asarray(s1.board),
                                      np.asarray(s2.board))
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
