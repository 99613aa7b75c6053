"""PPO actor-learner, fully on device.

Replaces the reference's host-loop PPO (``training/ppo.py``) with a fused
``lax.scan`` rollout over the batched lockstep env feeding a jitted learner.
Math parity with the reference (hyperparameter defaults ``ppo.py:26-43``,
losses ``ppo.py:145-166``, advantage recursion ``ppo.py:119-132``):

* advantages: ``adv[t] = (r[t] + γ·v[t+1] − v[t]) + λ·adv[t+1]`` — note the
  reference's nonstandard recursion multiplies the tail by λ alone (not γλ);
  replicated exactly, with episode boundaries cutting the recursion.
* returns: discounted reward sums bootstrapped by the final value only when
  the trajectory did not end.
* policy loss in ratio-difference form:
  ``|adv| · clamp(sign(adv)·(1 − π/π_old), min=−ε)``.
* clipped value loss (max of clipped/unclipped squared errors), entropy bonus
  active only below the entropy clip.
* 3 epochs over the batch; minibatch boundaries from
  ``linspace(0, n, num_minibatches + 2)[1:-1]`` — which, as in the reference,
  yields ``num_minibatches + 1`` slices.
"""

import dataclasses

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..env import wrappers as W


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    steps_per_env: int = 20
    num_minibatches: int = 4
    epochs_per_batch: int = 3
    gamma: float = 0.97
    lmda: float = 0.95
    learning_rate: float = 3e-4
    entropy_reg: float = 0.01
    entropy_clip: float = 1.0
    vf_coef: float = 0.5
    eps_policy: float = 0.2
    eps_value: float = 0.2
    # Reporting cadence in env steps (parity: ppo.py:40). Overridable as
    # ``ppo.report_interval`` in the global config.
    report_interval: int = 960


@flax.struct.dataclass
class PPOState:
    params: object
    opt_state: object
    num_steps: jax.Array  # int64-ish step counter (int32 is fine to 2^31)


def make_optimizer(cfg):
    return optax.adam(cfg.learning_rate)


def init_ppo_state(cfg, params):
    opt = make_optimizer(cfg)
    return PPOState(params=params, opt_state=opt.init(params),
                    num_steps=jnp.zeros((), jnp.int32))


# ---------------------------------------------------------------------------
# Rollout


def _flatten_agents(x):
    """[B, A, ...] -> [B*A, ...] (the learner batch axis)."""
    return x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])


def rollout(env_cfg, wcfg, pool, apply_fn, params, ws, obs, key, n_steps,
            se_penalty_coef=0.0, min_perf_fraction=1.0):
    """Collect ``n_steps`` of experience from every lane under one scan.

    obs: uint8[B, A, vh, vw, C]. Agents flatten into the learner batch
    ([B, A] -> [B*A]) with per-sample weights masking padded and
    already-finished agents — the lockstep analog of the reference's
    ``obs_for_envs``/``act_on_envs`` flattening (base_algo.py:152-244),
    which collects only live agents. With A=1 the weights are identically
    one and this reduces to the single-agent squeeze.

    Returns (traj dict of [T, B*A, ...] arrays, final (ws, obs),
    final values).
    """

    def body(carry, k):
        ws, obs = carry
        ka, ke = jax.random.split(k)
        b, a = obs.shape[:2]
        flat_obs = _flatten_agents(obs)
        # A sample only trains the policy if its agent was live when the
        # action was taken (pre-step): padded agents never, exited/dead
        # agents not after their terminal step.
        weight = _flatten_agents(
            ws.env.is_active
            & jnp.take(pool.agent_mask, ws.env.level_idx, axis=0)
        ).astype(jnp.float32)
        values, policy = apply_fn(params, flat_obs)
        actions = jax.random.categorical(ka, jnp.log(policy + 1e-30))
        a_prob = jnp.take_along_axis(
            policy, actions[:, None], axis=-1)[:, 0]
        ws2, obs2, reward, done, info = W.step_impl(
            env_cfg, wcfg, pool, ws, actions.reshape(b, a), ke,
            se_penalty_coef, min_perf_fraction)
        out = {
            "obs": flat_obs,
            "actions": actions,
            "action_prob": a_prob,
            "rewards": _flatten_agents(reward),
            "values": values,
            "done": _flatten_agents(done),
            "weight": weight,
            # Episode-completion records for the host-side logger (the
            # lockstep analog of SafeLifeLogWrapper's on-done callback).
            "ep": {
                "lane_done": info["lane_done"],
                "episode_reward": info["episode_reward"],
                "episode_length": info["episode_length"],
                "success": info["success"],
                "level_idx": info["level_idx"],
                "agent_mask": info["agent_mask"],
                "reward_possible": info["reward_possible"],
                "reward_needed": info["reward_needed"],
                "sample": info["ep_sample"],
            },
        }
        return (ws2, obs2), out

    keys = jax.random.split(key, n_steps)
    (ws, obs), traj = jax.lax.scan(body, (ws, obs), keys)
    final_values, _ = apply_fn(params, _flatten_agents(obs))
    return traj, (ws, obs), final_values


def compute_gae(cfg, traj, final_values):
    """Returns and advantages with the reference's exact recursions."""
    rewards = traj["rewards"]          # [T, B]
    values = traj["values"]            # [T, B]
    done = traj["done"]                # [T, B] bool

    not_done = (~done).astype(jnp.float32)
    boot = final_values * not_done[-1]

    # v[t+1] within an episode; 0 across boundaries and at the (done) end.
    val1 = jnp.concatenate([values[1:], final_values[None]], axis=0)
    val1 = val1 * not_done

    delta = rewards + cfg.gamma * val1 - values

    def adv_body(carry, xs):
        d, nd = xs
        carry = d + cfg.lmda * nd * carry
        return carry, carry

    _, adv = jax.lax.scan(
        adv_body, jnp.zeros_like(delta[-1]), (delta, not_done), reverse=True)

    def ret_body(carry, xs):
        r, nd = xs
        carry = r + cfg.gamma * nd * carry
        return carry, carry

    _, ret = jax.lax.scan(
        ret_body, boot, (rewards, not_done), reverse=True)
    # The reference adds γ·bootstrap to the last reward before the backward
    # sweep; seeding the scan carry with the bootstrap is identical.
    return ret, adv


# ---------------------------------------------------------------------------
# Loss and update


def calculate_loss(cfg, apply_fn, params, obs, actions, old_policy,
                   old_values, returns, advantages, weight=None):
    """Parity: reference ``calculate_loss`` (ppo.py:145-166).

    ``weight`` masks flattened-agent samples out of every mean (padded or
    already-finished agents — the reference never collects those samples
    at all). ``None`` means all-ones (single-agent training).
    """
    values, policy = apply_fn(params, obs)
    a_policy = jnp.take_along_axis(policy, actions[..., None], axis=-1)[..., 0]

    if weight is None:
        weight = jnp.ones_like(advantages)
    wsum = jnp.maximum(weight.sum(), 1.0)

    def wmean(x):
        return jnp.sum(x * weight) / wsum

    prob_diff = jnp.sign(advantages) * (1 - a_policy / old_policy)
    policy_loss = jnp.abs(advantages) * jnp.maximum(
        prob_diff, -cfg.eps_policy)
    policy_loss = wmean(policy_loss)

    v_clip = old_values + jnp.clip(
        values - old_values, -cfg.eps_value, cfg.eps_value)
    value_loss = wmean(jnp.maximum(
        (v_clip - returns) ** 2, (values - returns) ** 2))

    entropy = jnp.sum(-policy * jnp.log(policy + 1e-12), axis=-1)
    entropy_mean = wmean(entropy)
    entropy_loss = -cfg.entropy_reg * jnp.minimum(
        entropy_mean, cfg.entropy_clip)

    loss = policy_loss + value_loss * cfg.vf_coef + entropy_loss
    return loss, {
        "loss": loss,
        "policy_loss": policy_loss,
        "value_loss": value_loss,
        "entropy": entropy_mean,
    }


def _minibatch_bounds(n, num_minibatches):
    """The reference's exact split points (ppo.py:170-172): linspace interior
    points -> num_minibatches + 1 slices."""
    pts = np.linspace(0, n, num_minibatches + 2, dtype=int)
    bounds = [0] + list(pts[1:-1]) + [n]
    return [(int(a), int(b)) for a, b in zip(bounds[:-1], bounds[1:])]


def train_on_batch(cfg, apply_fn, ppo_state, batch, key,
                   force_unrolled=False):
    """3 epochs of shuffled minibatch SGD over a flattened batch.

    When every minibatch has the same size (n divisible by the
    reference's num_minibatches + 1 slices — true for all standard lane
    counts), the epochs x minibatches double loop runs as ONE
    ``lax.scan`` over stacked shuffled index chunks: bit-identical math
    (``x[perm][a:b] == x[perm[a:b]]``, and Adam updates stay strictly
    sequential), but the fwd+bwd graph appears once in the compiled
    program instead of 15 times — measured 13.8k -> ~5k StableHLO lines
    for the train chunk, with the compile time to match. Ragged
    minibatch sizes fall back to the unrolled loop (same semantics).
    """
    opt = make_optimizer(cfg)
    n = batch["obs"].shape[0]
    bounds = _minibatch_bounds(n, cfg.num_minibatches)
    grad_fn = jax.grad(
        lambda p, mb: calculate_loss(
            cfg, apply_fn, p, mb["obs"], mb["actions"], mb["action_prob"],
            mb["values"], mb["returns"], mb["advantages"],
            mb["weight"])[0],
    )

    params, opt_state = ppo_state.params, ppo_state.opt_state
    sizes = {b - a for a, b in bounds}
    if len(sizes) == 1 and not force_unrolled:
        perms = []
        for _ in range(cfg.epochs_per_batch):
            key, kshuf = jax.random.split(key)
            perms.append(jax.random.permutation(kshuf, n))
        # [epochs * slices, mb] index chunks in exact epoch/slice order.
        idx = jnp.stack([p[a:b] for p in perms for a, b in bounds])

        def body(carry, mb_idx):
            params, opt_state = carry
            mb = jax.tree.map(lambda x: jnp.take(x, mb_idx, axis=0),
                              batch)
            grads = grad_fn(params, mb)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), None

        (params, opt_state), _ = jax.lax.scan(
            body, (params, opt_state), idx)
        return ppo_state.replace(params=params, opt_state=opt_state)

    for _ in range(cfg.epochs_per_batch):
        key, kshuf = jax.random.split(key)
        perm = jax.random.permutation(kshuf, n)
        shuffled = jax.tree.map(lambda x: x[perm], batch)
        for a, b in bounds:
            mb = jax.tree.map(lambda x: x[a:b], shuffled)
            grads = grad_fn(params, mb)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
    return ppo_state.replace(params=params, opt_state=opt_state)


def train_iteration_impl(env_cfg, wcfg, ppo_cfg, apply_fn, pool,
                         ppo_state, ws, obs, key,
                         se_penalty_coef=0.0, min_perf_fraction=1.0):
    """One full PPO iteration: rollout -> GAE -> minibatch updates.

    Jittable end-to-end; this is the unit sharded across the device mesh.
    """
    krol, ktrain = jax.random.split(key)
    n_lanes = obs.shape[0]
    traj, (ws, obs), final_values = rollout(
        env_cfg, wcfg, pool, apply_fn, ppo_state.params, ws, obs, krol,
        ppo_cfg.steps_per_env, se_penalty_coef, min_perf_fraction)
    returns, advantages = compute_gae(ppo_cfg, traj, final_values)

    t, n = traj["rewards"].shape  # n = lanes * agents
    batch = {
        "obs": traj["obs"].reshape((t * n,) + traj["obs"].shape[2:]),
        "actions": traj["actions"].reshape(-1),
        "action_prob": traj["action_prob"].reshape(-1),
        "values": traj["values"].reshape(-1),
        "returns": returns.reshape(-1),
        "advantages": advantages.reshape(-1),
        "weight": traj["weight"].reshape(-1),
    }
    ppo_state = train_on_batch(ppo_cfg, apply_fn, ppo_state, batch, ktrain)
    # Step counting is per env-step, not per agent-slot (parity:
    # ppo.py:134 ``steps_per_env * len(training_envs)``).
    ppo_state = ppo_state.replace(
        num_steps=ppo_state.num_steps + t * n_lanes)

    _, metrics = calculate_loss(
        ppo_cfg, apply_fn, ppo_state.params, batch["obs"], batch["actions"],
        batch["action_prob"], batch["values"], batch["returns"],
        batch["advantages"], batch["weight"])
    w = batch["weight"]
    wsum = jnp.maximum(w.sum(), 1.0)
    metrics["reward_mean"] = jnp.sum(traj["rewards"].reshape(-1) * w) / wsum
    metrics["values_mean"] = jnp.sum(batch["values"] * w) / wsum
    metrics["advantages_mean"] = jnp.sum(batch["advantages"] * w) / wsum
    # Flatten the [T, B] episode-completion records into one [T*B] batch
    # the host-side EpisodeCollector can consume directly. The per-step
    # side-effect samples keep their [T, ...] leading axis.
    ep = dict(traj["ep"])
    metrics["ep_samples"] = ep.pop("sample")
    metrics["episodes"] = jax.tree.map(
        lambda x: x.reshape((-1,) + x.shape[2:]), ep)
    return ppo_state, ws, obs, metrics


train_iteration = jax.jit(
    train_iteration_impl,
    static_argnames=("env_cfg", "wcfg", "ppo_cfg", "apply_fn"),
)


def train_chunk_impl(env_cfg, wcfg, ppo_cfg, apply_fn, pool,
                     ppo_state, ws, obs, key, n_iters,
                     se_penalty_coef=0.0, min_perf_fraction=1.0):
    """``n_iters`` PPO iterations under one jit (a scan of iterations).

    Over a tunneled device every host round trip costs tens of ms;
    chunking iterations amortizes that across ``n_iters`` updates. The
    stacked metrics (including the flattened episode records) come back
    once per chunk.
    """
    def body(carry, k):
        ppo_state, ws, obs = carry
        ppo_state, ws, obs, metrics = train_iteration_impl(
            env_cfg, wcfg, ppo_cfg, apply_fn, pool, ppo_state, ws, obs, k,
            se_penalty_coef, min_perf_fraction)
        return (ppo_state, ws, obs), metrics

    keys = jax.random.split(key, n_iters)
    (ppo_state, ws, obs), metrics = jax.lax.scan(
        body, (ppo_state, ws, obs), keys)
    # Flatten episode records and side-effect samples across the chunk;
    # reduce scalar metrics to their last-iteration values for reporting.
    episodes = jax.tree.map(
        lambda x: x.reshape((-1,) + x.shape[2:]), metrics.pop("episodes"))
    samples = jax.tree.map(
        lambda x: x.reshape((-1,) + x.shape[2:]), metrics.pop("ep_samples"))
    metrics = jax.tree.map(lambda x: x[-1], metrics)
    metrics["episodes"] = episodes
    metrics["ep_samples"] = samples
    return ppo_state, ws, obs, metrics


train_chunk = jax.jit(
    train_chunk_impl,
    static_argnames=("env_cfg", "wcfg", "ppo_cfg", "apply_fn", "n_iters"),
)
