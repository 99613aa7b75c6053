"""Marginal-cost ablation of the full env step."""
import time

import jax
import jax.numpy as jnp

from safelife_tpu.env import env as E
from safelife_tpu.env.state import pack_levels
from safelife_tpu.io.levels import load_levels
from safelife_tpu.core import actions as actions_mod, advance, scoring
from safelife_tpu.core import cells as C
from safelife_tpu.core.scoring import POINTS_ON_LEVEL_EXIT

BATCH = 4096
STEPS = 100

pool = pack_levels(load_levels(
    "/root/reference/safelife/levels/benchmarks/v1.0/append-still.npz"))
cfg = E.EnvConfig(view_shape=(25, 25), output_channels=None,
                  time_limit=1000, goals_may_evolve=False,
                  stochastic=False, auto_reset=True)
state0, _ = E.reset(cfg, pool, jax.random.PRNGKey(0), BATCH)


def make_step_one(no_actions=False, no_advance=False, no_points=False,
                  no_exits=False, no_reset=False, no_obs=False):
    def _step_one(s, action, key):
        lv = s.level
        step_key, reset_key = jax.random.split(key)
        action = jnp.where(lv.agent_mask, action, 0)
        if not no_actions:
            board, agent_locs = actions_mod.execute_actions(
                s.board, s.agent_locs, action)
            s = s.replace(board=board, agent_locs=agent_locs)
        agent_locs = s.agent_locs

        if not no_advance:
            board, goals = E._advance_physics(cfg, s, step_key)
        else:
            board, goals = s.board, s.goals
        num_steps = s.num_steps + 1

        if not no_points:
            base = scoring.points_base(board, goals, lv.table_flat)
        else:
            base = jnp.zeros_like(lv.init_points)
        cells = scoring.agent_cells(board, agent_locs)
        exited = (cells & (C.AGENT | C.EXIT)) == C.EXIT
        active0 = ((cells & C.AGENT) != 0) & lv.agent_mask
        earned = (base - lv.init_points).astype(jnp.float32) + \
            POINTS_ON_LEVEL_EXIT * exited
        ce = active0 & (jnp.maximum(0.0, earned) >= lv.required_points)
        if not no_exits:
            board = scoring.update_exit_colors(
                board, agent_locs, lv.agent_mask, lv.exit_mask, ce,
                cells=cells)

        times_up = num_steps >= cfg.time_limit
        value = (base.astype(jnp.float32)
                 + POINTS_ON_LEVEL_EXIT * exited) * lv.agent_mask
        reward = (value - s.old_value) * s.is_active
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

        if not no_reset:
            new_idx = jax.random.randint(
                reset_key, (), 0, pool.num_levels, jnp.int32)
            fresh = E._reset_one(cfg, pool, new_idx)
            s = jax.tree.map(lambda a, b: jnp.where(lane_done, b, a), s, fresh)

        if not no_obs:
            obs = E.get_obs(cfg, s.board, s.goals, s.agent_locs,
                            s.level.agent_mask, s.level.exit_locs,
                            s.level.exit_locs_valid)
        else:
            obs = jnp.zeros((), jnp.int32)
        return s, obs, reward

    return _step_one


def bench(name, step_one):
    def run(st, key):
        def body(st, k):
            ka, ke = jax.random.split(k)
            a = jax.random.randint(ka, (BATCH, pool.num_agents), 0, 9,
                                   jnp.int32)
            keys = jax.random.split(ke, BATCH)
            st, obs, r = jax.vmap(step_one)(st, a, keys)
            return st, r.sum()
        st, rs = jax.lax.scan(body, st, jax.random.split(key, STEPS))
        return st
    f = jax.jit(run, donate_argnums=0)
    st = f(jax.tree.map(jnp.copy, state0), jax.random.PRNGKey(1))
    jax.block_until_ready(st)
    reps = 5
    t0 = time.perf_counter()
    for i in range(reps):
        st = f(st, jax.random.PRNGKey(2 + i))
    jax.block_until_ready(st)
    dt = (time.perf_counter() - t0) / reps / STEPS
    print("%-24s %8.1f us/batch-step" % (name, dt * 1e6))


bench("full", make_step_one())
bench("- execute_actions", make_step_one(no_actions=True))
bench("- advance", make_step_one(no_advance=True))
bench("- points", make_step_one(no_points=True))
bench("- exits", make_step_one(no_exits=True))
bench("- auto_reset", make_step_one(no_reset=True))
bench("- obs", make_step_one(no_obs=True))
bench("bare (all off)", make_step_one(True, True, True, True, True, True))
