"""Compare observation-production strategies inside the full env step.

Variants (same physics/actions/reset pipeline, only obs differs):
  old   — per-agent dynamic-roll recenter under vmap (round-2 baseline)
  mm    — one-hot matmul recenter, uint8 [B,A,vh,vw,C] channel-minor
  flat  — matmul recenter, flat uint8 [B,A,vh*vw*C] layout

Run on the real chip:  PYTHONPATH=/root/repo:/root/.axon_site python bench/bench_obs.py
"""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from safelife_tpu.env import env as E
from safelife_tpu.env.state import lane_level
from safelife_tpu.training.env_factory import TRAINING_CHANNELS

BATCH = 4096
SCAN_STEPS = 100
TIMED_REPS = 5


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def batch_obs_old(cfg, pool, state):
    lv = lane_level(pool, state.level_idx, state.min_perf_fraction)
    return jax.vmap(
        lambda s, l: E.get_obs(cfg, s.board, s.goals, s.agent_locs,
                               l.agent_mask, l.exit_locs, l.exit_locs_valid)
    )(state, lv)


def make_step(obs_fn):
    def step_impl(cfg, pool, state, actions, key):
        reset_key, key = jax.random.split(key)
        state, reward, done, info = E.step_core(cfg, pool, state, actions, key)
        state = E.merge_lane_reset(
            info["lane_done"], reset_key,
            lambda r: E.reset_batch(cfg, pool, r % pool.num_levels,
                                    state.min_perf_fraction),
            state)
        return state, obs_fn(cfg, pool, state), reward
    return step_impl


def run_variant(name, cfg, pool, obs_fn):
    step_impl = make_step(obs_fn)
    state, _ = E.reset(dataclasses.replace(cfg, flat_obs=False),
                       pool, jax.random.PRNGKey(0), BATCH)
    obs = obs_fn(cfg, pool, state)

    def run_chunk(carry, key):
        def body(carry, k):
            state, obs = carry
            ka, ke = jax.random.split(k)
            base = jax.random.randint(
                ka, (BATCH, pool.num_agents), 0, 9, jnp.int32)
            checksum = obs.reshape(BATCH, pool.num_agents, -1).sum(
                axis=-1, dtype=jnp.int32)
            actions = (base + checksum) % 9
            state, obs, reward = step_impl(cfg, pool, state, actions, ke)
            return (state, obs), reward.sum()
        keys = jax.random.split(key, SCAN_STEPS)
        carry, rs = jax.lax.scan(body, carry, keys)
        return carry, rs.sum()

    run = jax.jit(run_chunk, donate_argnums=0)
    carry = (state, obs)
    t0 = time.perf_counter()
    carry, _ = run(carry, jax.random.PRNGKey(1))
    jax.block_until_ready(carry)
    log("%s compile+warmup: %.1fs" % (name, time.perf_counter() - t0))

    t0 = time.perf_counter()
    for i in range(TIMED_REPS):
        carry, rsum = run(carry, jax.random.PRNGKey(2 + i))
    log("%s reward checksum: %s" % (name, float(rsum)))
    jax.block_until_ready(carry)
    dt = time.perf_counter() - t0
    steps = BATCH * SCAN_STEPS * TIMED_REPS
    log("%s: %.0f env-steps/s  (%.2f ms per step-batch)"
        % (name, steps / dt, dt / (SCAN_STEPS * TIMED_REPS) * 1e3))
    return steps / dt


def main():
    from safelife_tpu.env.state import pack_levels
    from safelife_tpu.io.levels import load_levels
    pool = pack_levels(load_levels(
        "/root/repo/safelife_tpu/levels/benchmarks/v1.0/append-still.npz"))
    base = E.EnvConfig(
        view_shape=(25, 25), output_channels=TRAINING_CHANNELS,
        time_limit=1000, goals_may_evolve=False, stochastic=False,
        auto_reset=True)
    log("device:", jax.devices()[0].device_kind)
    results = {}
    results["mm"] = run_variant("mm", base, pool, E._batch_obs)
    results["flat"] = run_variant(
        "flat", dataclasses.replace(base, flat_obs=True), pool, E._batch_obs)
    results["old"] = run_variant("old", base, pool, batch_obs_old)
    for k, v in sorted(results.items(), key=lambda kv: -kv[1]):
        log("%6s  %12.0f steps/s" % (k, v))


if __name__ == "__main__":
    main()
