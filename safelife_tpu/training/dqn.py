"""DQN with a device-resident replay buffer.

Math parity with the reference (``training/dqn.py``): multi-step (5)
returns assembled per-lane, uniform replay (100k), ε-greedy with a
piecewise-linear schedule (1 → 0.5 → 0.03 over 5e4/5e5/4e6 steps), target
network synced every 10k steps, dueling Q network, squared TD-error loss.

TPU-native differences: the replay buffer is a fixed pytree of device
arrays written by masked scatters inside jit; acting + n-step assembly +
buffer insertion run fused with the env step, one scan per optimize
interval.
"""

import dataclasses
from functools import partial

import flax.struct
import jax
import jax.numpy as jnp
import optax



@dataclasses.dataclass(frozen=True)
class DQNConfig:
    gamma: float = 0.97
    multi_step: int = 5
    batch_size: int = 96
    optimize_interval: int = 32
    learning_rate: float = 3e-4
    epsilon_points: tuple = ((5e4, 1.0), (5e5, 0.5), (4e6, 0.03))
    epsilon_testing: float = 0.01
    replay_initial: int = 40000
    replay_size: int = 100000
    target_update_interval: int = 10000
    # Reporting cadence in env steps (parity: a HyperParam on the
    # reference's DQN, dqn.py:60; 256 there suits 96 serial lanes, 4096
    # suits device-batched lanes). ``dqn.report_interval`` in the global
    # config overrides, e.g. for short smoke/cluster runs.
    report_interval: int = 4096


def epsilon_schedule(cfg, step):
    """Piecewise-linear ε with constant extrapolation (parity: the
    UnivariateSpline(k=1, ext='const') at dqn.py:51-54)."""
    xs = jnp.array([p[0] for p in cfg.epsilon_points])
    ys = jnp.array([p[1] for p in cfg.epsilon_points])
    return jnp.interp(jnp.asarray(step, jnp.float32), xs, ys)


@flax.struct.dataclass
class ReplayBuffer:
    obs: jax.Array        # [cap, ...obs]
    action: jax.Array     # [cap] int32
    reward: jax.Array     # [cap] float32
    next_obs: jax.Array   # [cap, ...obs]
    done: jax.Array       # [cap] bool
    idx: jax.Array        # scalar int32 — total pushes (mod-capacity slots)

    @property
    def capacity(self):
        return self.obs.shape[0]

    def size(self):
        return jnp.minimum(self.idx, self.capacity)


def init_replay(capacity, obs_shape, obs_dtype=jnp.uint8):
    return ReplayBuffer(
        obs=jnp.zeros((capacity,) + obs_shape, obs_dtype),
        action=jnp.zeros((capacity,), jnp.int32),
        reward=jnp.zeros((capacity,), jnp.float32),
        next_obs=jnp.zeros((capacity,) + obs_shape, obs_dtype),
        done=jnp.zeros((capacity,), bool),
        idx=jnp.zeros((), jnp.int32),
    )


def push_masked(buf, obs, action, reward, next_obs, done, valid):
    """Append ``valid`` entries (others skipped) preserving arrival order."""
    n = valid.shape[0]
    offsets = jnp.cumsum(valid.astype(jnp.int32)) - 1
    slots = (buf.idx + offsets) % buf.capacity
    # Invalid entries write to a dummy out-of-range slot (dropped).
    slots = jnp.where(valid, slots, buf.capacity + 1)
    return buf.replace(
        obs=buf.obs.at[slots].set(obs, mode="drop"),
        action=buf.action.at[slots].set(action, mode="drop"),
        reward=buf.reward.at[slots].set(reward, mode="drop"),
        next_obs=buf.next_obs.at[slots].set(next_obs, mode="drop"),
        done=buf.done.at[slots].set(done, mode="drop"),
        idx=buf.idx + valid.sum(dtype=jnp.int32),
    )


@flax.struct.dataclass
class TrajectoryState:
    """Per-lane n-step assembly ring (parity: dqn.py:82-134). Slot 0 is the
    newest step; rewards accumulate discounted future rewards in place."""

    obs: jax.Array      # [B, n, ...obs]
    action: jax.Array   # [B, n]
    reward: jax.Array   # [B, n]
    filled: jax.Array   # [B, n] bool


def init_trajectories(batch, n, obs_shape, obs_dtype=jnp.uint8):
    return TrajectoryState(
        obs=jnp.zeros((batch, n) + obs_shape, obs_dtype),
        action=jnp.zeros((batch, n), jnp.int32),
        reward=jnp.zeros((batch, n), jnp.float32),
        filled=jnp.zeros((batch, n), bool),
    )


def step_trajectories(cfg, traj, obs, action, reward, next_obs, done,
                      valid=None):
    """Advance the n-step rings one step; emit replay-entry candidates.

    Per slot (a lane, or a flattened lane x agent pair): the outgoing
    (oldest) entry emits with its accumulated n-step reward; on episode
    end the whole ring flushes (terminal state bootstraps nothing) and
    clears. Steps with ``valid`` False (padded or already-finished
    agents) enter the ring unfilled and are never emitted.

    Returns (traj, emissions): ``emissions`` is a dict of [K, N, ...]
    candidate entries with a [K, N] validity plane, K = n + 2 slots in
    arrival order. The caller accumulates emissions across a scan and
    writes them to the replay buffer in ONE batched
    :func:`push_emissions` — pushing inside the step would scatter into
    the (gigabyte-scale) buffer many times per step, which measured ~20x
    slower on the TPU.
    """
    n = cfg.multi_step
    gammas = cfg.gamma ** jnp.arange(1, n)
    if valid is None:
        valid = jnp.ones_like(done)

    # Oldest entry falls out when the ring is full.
    out_obs = traj.obs[:, -1]
    out_action = traj.action[:, -1]
    out_reward = traj.reward[:, -1]
    out_valid = traj.filled[:, -1]

    # Shift and insert the new step at slot 0.
    new_obs = jnp.concatenate([obs[:, None], traj.obs[:, :-1]], axis=1)
    new_action = jnp.concatenate(
        [action[:, None], traj.action[:, :-1]], axis=1)
    shifted_reward = jnp.concatenate(
        [reward[:, None], traj.reward[:, :-1]], axis=1)
    new_filled = jnp.concatenate(
        [valid[:, None], traj.filled[:, :-1]], axis=1)
    # Discount the new reward into the older entries.
    disc = jnp.concatenate([jnp.zeros((1,)), gammas])
    new_reward = shifted_reward + reward[:, None] * disc[None, :]

    ones = jnp.ones_like(done)
    # Arrival order: outgoing-normal, outgoing-terminal, ring flush 0..n-1
    # (matching the sequential pushes this replaces).
    emissions = {
        "obs": jnp.concatenate([
            out_obs[:, None], out_obs[:, None], new_obs], axis=1),
        "action": jnp.concatenate([
            out_action[:, None], out_action[:, None], new_action], axis=1),
        "reward": jnp.concatenate([
            out_reward[:, None], out_reward[:, None], new_reward], axis=1),
        "next_obs": jnp.concatenate(
            [obs[:, None], next_obs[:, None]]
            + [next_obs[:, None]] * n, axis=1),
        "done": jnp.concatenate(
            [jnp.zeros_like(done)[:, None]] + [ones[:, None]] * (n + 1),
            axis=1),
        "valid": jnp.concatenate(
            [(out_valid & ~done)[:, None], (out_valid & done)[:, None]]
            + [(new_filled[:, k] & done)[:, None] for k in range(n)],
            axis=1),
    }
    # [N, K, ...] -> [K, N, ...] so a scan-stacked [T, K, N, ...] flattens
    # in arrival order.
    emissions = {k: jnp.swapaxes(v, 0, 1) for k, v in emissions.items()}

    cleared = done[:, None]
    cleared_obs = done.reshape((done.shape[0],) + (1,) * (new_obs.ndim - 1))
    traj = TrajectoryState(
        obs=jnp.where(cleared_obs, 0, new_obs),
        action=jnp.where(cleared, 0, new_action),
        reward=jnp.where(cleared, 0.0, new_reward),
        filled=jnp.where(cleared, False, new_filled),
    )
    return traj, emissions


def push_emissions(buf, emissions):
    """Write stacked step emissions (leading axes flatten in arrival
    order) to the replay buffer in one masked scatter.

    A single ``push_masked`` call must not carry more valid entries than
    the buffer capacity — wrapped slot indices inside one scatter would
    resolve nondeterministically, breaking newest-overwrites-oldest.
    Pushes therefore segment at the capacity (a static bound; segments
    only arise for pathologically large chunk x slot configurations).
    """
    obs_shape = buf.obs.shape[1:]

    def f(x, trailing=()):
        return x.reshape((-1,) + trailing)

    flat = (f(emissions["obs"], obs_shape), f(emissions["action"]),
            f(emissions["reward"]), f(emissions["next_obs"], obs_shape),
            f(emissions["done"]), f(emissions["valid"]))
    total = flat[-1].shape[0]
    cap = buf.capacity
    for start in range(0, total, cap):
        seg = tuple(x[start:start + cap] for x in flat)
        buf = push_masked(buf, *seg)
    return buf


def td_loss(cfg, apply_fn, params, target_params, batch):
    # Observations go to the network in their stored dtype: the model casts
    # unpacked uint8 channels to float itself, and packed int32 views must
    # NOT round-trip through float32 (bits above 24 would not survive).
    q_values = apply_fn(params, batch["obs"])
    next_q = apply_fn(target_params, batch["next_obs"])
    next_q = jax.lax.stop_gradient(next_q)
    q_taken = jnp.take_along_axis(
        q_values, batch["action"][:, None], axis=-1)[:, 0]
    discount = cfg.gamma ** cfg.multi_step * \
        (1.0 - batch["done"].astype(jnp.float32))
    target = batch["reward"] + discount * next_q.max(axis=-1)
    loss = jnp.mean((q_taken - target) ** 2)
    metrics = {
        "loss": loss,
        "q_model_mean": q_values.mean(),
        "q_model_max": q_values.max(axis=-1).mean(),
        "q_target_mean": next_q.mean(),
        "q_target_max": next_q.max(axis=-1).mean(),
    }
    return loss, metrics


@flax.struct.dataclass
class DQNState:
    params: object
    target_params: object
    opt_state: object
    replay: ReplayBuffer
    traj: TrajectoryState
    num_steps: jax.Array


def init_dqn_state(cfg, params, batch, obs_shape, obs_dtype=jnp.uint8):
    opt = optax.adam(cfg.learning_rate)
    return DQNState(
        params=params,
        target_params=params,
        opt_state=opt.init(params),
        replay=init_replay(cfg.replay_size, obs_shape, obs_dtype),
        traj=init_trajectories(batch, cfg.multi_step, obs_shape, obs_dtype),
        num_steps=jnp.zeros((), jnp.int32),
    )


def act_epsilon_greedy(apply_fn, params, obs, epsilon, key):
    qvals = apply_fn(params, obs)
    greedy = jnp.argmax(qvals, axis=-1).astype(jnp.int32)
    k1, k2 = jax.random.split(key)
    random_actions = jax.random.randint(
        k1, greedy.shape, 0, qvals.shape[-1], jnp.int32)
    use_random = jax.random.uniform(k2, greedy.shape) < epsilon
    return jnp.where(use_random, random_actions, greedy)


def collect_and_optimize_impl(env_cfg, wcfg, cfg, apply_fn, pool, dstate,
                              ws, obs, key, n_steps):
    """Run ``n_steps`` env steps (acting ε-greedily, filling replay), then
    one optimizer step if the buffer is warm. One jit-compiled unit."""
    from ..env import wrappers as W

    def _flat(x):
        return x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])

    def body(carry, k):
        dstate, ws, obs = carry
        ka, ke = jax.random.split(k)
        eps = epsilon_schedule(cfg, dstate.num_steps)
        b, a = obs.shape[:2]
        flat_obs = _flat(obs)
        # Only live (non-padded, not-yet-finished) agents contribute
        # replay entries; see rollout() in ppo.py for the rationale.
        valid = _flat(ws.env.is_active
                      & jnp.take(pool.agent_mask, ws.env.level_idx,
                                 axis=0))
        actions = act_epsilon_greedy(
            apply_fn, dstate.params, flat_obs, eps, ka)
        ws2, obs2, reward, done, info = W.step_impl(
            env_cfg, wcfg, pool, ws, actions.reshape(b, a), ke)
        traj, emissions = step_trajectories(
            cfg, dstate.traj, flat_obs, actions,
            _flat(reward), _flat(obs2), _flat(done), valid)
        dstate = dstate.replace(
            traj=traj, num_steps=dstate.num_steps + b)
        ep = {
            "lane_done": info["lane_done"],
            "episode_reward": info["episode_reward"],
            "episode_length": info["episode_length"],
            "success": info["success"],
            "level_idx": info["level_idx"],
            "agent_mask": info["agent_mask"],
            "reward_possible": info["reward_possible"],
            "reward_needed": info["reward_needed"],
        }
        return (dstate, ws2, obs2), (ep, emissions)

    keys = jax.random.split(key, n_steps + 1)
    (dstate, ws, obs), (ep_records, emissions) = jax.lax.scan(
        body, (dstate, ws, obs), keys[:-1])
    # One batched replay write for the whole chunk ([T, K, N] stacked
    # emissions flatten in arrival order).
    dstate = dstate.replace(
        replay=push_emissions(dstate.replay, emissions))

    # One optimize step (masked out while the buffer is cold).
    opt = optax.adam(cfg.learning_rate)
    size = dstate.replay.size()
    sample_idx = jax.random.randint(
        keys[-1], (cfg.batch_size,), 0, jnp.maximum(size, 1))
    batch = {
        "obs": dstate.replay.obs[sample_idx],
        "action": dstate.replay.action[sample_idx],
        "reward": dstate.replay.reward[sample_idx],
        "next_obs": dstate.replay.next_obs[sample_idx],
        "done": dstate.replay.done[sample_idx],
    }
    (loss, metrics), grads = jax.value_and_grad(
        lambda p: td_loss(cfg, apply_fn, p, dstate.target_params, batch),
        has_aux=True)(dstate.params)
    warm = size >= cfg.replay_initial
    updates, new_opt = opt.update(grads, dstate.opt_state, dstate.params)
    new_params = optax.apply_updates(dstate.params, updates)
    dstate = dstate.replace(
        params=jax.tree.map(
            lambda new, old: jnp.where(warm, new, old),
            new_params, dstate.params),
        opt_state=jax.tree.map(
            lambda new, old: jnp.where(warm, new, old),
            new_opt, dstate.opt_state),
    )

    # Target sync on interval crossings.
    crossed = (dstate.num_steps // cfg.target_update_interval) > \
        ((dstate.num_steps - n_steps * obs.shape[0])
         // cfg.target_update_interval)
    dstate = dstate.replace(target_params=jax.tree.map(
        lambda t, p: jnp.where(crossed, p, t),
        dstate.target_params, dstate.params))
    metrics = dict(metrics)
    metrics["episodes"] = ep_records
    metrics["epsilon"] = epsilon_schedule(cfg, dstate.num_steps)
    metrics["replay_size"] = size
    return dstate, ws, obs, metrics


collect_and_optimize = jax.jit(
    collect_and_optimize_impl,
    static_argnames=("env_cfg", "wcfg", "cfg", "apply_fn", "n_steps"))


def train_chunk_impl(env_cfg, wcfg, cfg, apply_fn, pool, dstate, ws, obs,
                     key, n_steps, n_iters):
    """``n_iters`` collect+optimize units under one jit — amortizes the
    per-call host round trip (tens of ms over a tunneled device)."""
    def body(carry, k):
        dstate, ws, obs = carry
        dstate, ws, obs, metrics = collect_and_optimize_impl(
            env_cfg, wcfg, cfg, apply_fn, pool, dstate, ws, obs, k, n_steps)
        return (dstate, ws, obs), metrics

    keys = jax.random.split(key, n_iters)
    (dstate, ws, obs), metrics = jax.lax.scan(
        body, (dstate, ws, obs), keys)
    episodes = jax.tree.map(
        lambda x: x.reshape((-1,) + x.shape[3:]), metrics.pop("episodes"))
    metrics = jax.tree.map(lambda x: x[-1], metrics)
    metrics["episodes"] = episodes
    return dstate, ws, obs, metrics


train_chunk = jax.jit(
    train_chunk_impl,
    static_argnames=("env_cfg", "wcfg", "cfg", "apply_fn", "n_steps",
                     "n_iters"))
