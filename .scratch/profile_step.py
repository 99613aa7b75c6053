"""Attribute env-step time to its components on the real chip."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from safelife_tpu.env import env as E
from safelife_tpu.env.state import pack_levels
from safelife_tpu.io.levels import load_levels
from safelife_tpu.core import advance, scoring, actions as actions_mod

BATCH = 4096
STEPS = 100

pool = pack_levels(load_levels(
    "/root/reference/safelife/levels/benchmarks/v1.0/append-still.npz"))
cfg = E.EnvConfig(view_shape=(25, 25), output_channels=None,
                  time_limit=1000, goals_may_evolve=False,
                  stochastic=False, auto_reset=True)
state, obs = E.reset(cfg, pool, jax.random.PRNGKey(0), BATCH)


def bench(name, fn, carry):
    run = jax.jit(fn, donate_argnums=0)
    c = run(jax.tree.map(jnp.copy, carry), jax.random.PRNGKey(1))
    jax.block_until_ready(c)
    reps = 5
    t0 = time.perf_counter()
    for i in range(reps):
        c = run(c, jax.random.PRNGKey(2 + i))
    jax.block_until_ready(c)
    dt = (time.perf_counter() - t0) / reps / STEPS
    print("%-28s %8.1f us/batch-step  -> %8.2fM env-steps/s"
          % (name, dt * 1e6, BATCH / dt / 1e6))
    return dt


# 1. full step
def full(carry, key):
    st = carry
    def body(st, k):
        ka, ke = jax.random.split(k)
        a = jax.random.randint(ka, (BATCH, pool.num_agents), 0, 9, jnp.int32)
        st, obs, r, d, info = E.step_impl(cfg, pool, st, a, ke)
        return st, r.sum()
    st, rs = jax.lax.scan(body, st, jax.random.split(key, STEPS))
    return st

bench("full step", full, state)

# 2. advance only
def adv_only(carry, key):
    b = carry
    def body(b, k):
        return advance.advance_board_deterministic(b), None
    b, _ = jax.lax.scan(body, b, jax.random.split(key, STEPS))
    return b

bench("advance only", adv_only, state.board)

# 3. execute_actions only
def acts_only(carry, key):
    def body(c, k):
        b, locs = c
        a = jax.random.randint(k, (BATCH, pool.num_agents), 0, 9, jnp.int32)
        b, locs = jax.vmap(actions_mod.execute_actions)(b, locs, a)
        return (b, locs), None
    c, _ = jax.lax.scan(body, carry, jax.random.split(key, STEPS))
    return c

bench("execute_actions only", acts_only, (state.board, state.agent_locs))

# 4. points_base only
tf = state.level.table_flat
def pts_only(carry, key):
    b = carry
    def body(b, k):
        p = jax.vmap(scoring.points_base)(b, state.goals, tf)
        return b + (p.sum() % 2).astype(b.dtype) * 0, None
    b, _ = jax.lax.scan(body, b, jax.random.split(key, STEPS))
    return b

bench("points_base only", pts_only, state.board)

# 5. obs only
def obs_only(carry, key):
    b = carry
    def body(b, k):
        o = jax.vmap(lambda bb, gg, al, am, el, ev: E.get_obs(
            cfg, bb, gg, al, am, el, ev))(
            b, state.goals, state.agent_locs, state.level.agent_mask,
            state.level.exit_locs, state.level.exit_locs_valid)
        return b ^ (o.sum() % 2).astype(b.dtype) * 0, None
    b, _ = jax.lax.scan(body, b, jax.random.split(key, STEPS))
    return b

bench("get_obs only", obs_only, state.board)

# 6. reset/where machinery only
def reset_only(carry, key):
    st = carry
    def body(st, k):
        idx = jax.random.randint(k, (BATCH,), 0, pool.num_levels, jnp.int32)
        fresh = jax.vmap(lambda i: E._reset_one(cfg, pool, i))(idx)
        done = jnp.zeros((BATCH,), bool)
        st = jax.tree.map(
            lambda a, b: jnp.where(
                done.reshape((BATCH,) + (1,) * (a.ndim - 1)), b, a), st, fresh)
        return st, None
    st, _ = jax.lax.scan(body, st, jax.random.split(key, STEPS))
    return st

bench("auto-reset machinery only", reset_only, state)

# 7. update_exit_colors + has_exited + gathers
def exits_only(carry, key):
    b = carry
    def body(b, k):
        ex = jax.vmap(scoring.has_exited)(b, state.agent_locs)
        act = jax.vmap(scoring.agent_is_active)(b, state.agent_locs)
        ce = act & ex
        b = jax.vmap(scoring.update_exit_colors)(
            b, state.agent_locs, state.level.agent_mask,
            state.level.exit_mask, ce)
        return b, None
    b, _ = jax.lax.scan(body, b, jax.random.split(key, STEPS))
    return b

bench("exit machinery only", exits_only, state.board)
