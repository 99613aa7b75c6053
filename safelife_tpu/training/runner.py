"""Batched episode evaluation and benchmarking.

Replaces the reference's serial ``run_episodes`` (``training/base_algo.py:
278-318``) and the end-of-training 1000-episode benchmark
(``start-training.py:276-285``) with fully batched device rollouts: every
episode gets its own lane, all lanes run in one ``lax.scan``, and the
side-effect occupancy simulations are batched across episodes — the part
the reference spends minutes on serially happens in one device call.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core import advance, cells as C, scoring
from ..env import env as E
from ..env.state import pack_levels
from ..loggers import combined_score
from ..side_effects import earth_mover_distance
from ..render.text import cell_name


#: ε for near-greedy Q-network evaluation (parity: the reference's
#: testing epsilon, dqn.py epsilon_testing = 0.01).
EPSILON_TESTING = 0.01


def _policy_sample(apply_fn, params, obs, key):
    """Sample actions from either network family: actor-critic models
    return (values, policy); Q networks return a single [N, n] array,
    evaluated ε-greedily with the reference's testing epsilon.

    obs is [B, A, ...]; agents flatten into the network batch and the
    returned actions are [B, A] (one shared policy drives every agent,
    as in the reference's flattened multi-agent batch).
    """
    b, a = obs.shape[:2]
    out = apply_fn(params, obs.reshape((b * a,) + obs.shape[2:]))
    if isinstance(out, tuple):
        values, policy = out
        acts = jax.random.categorical(key, jnp.log(policy + 1e-30))
        return acts.reshape(b, a)
    qvals = out
    k1, k2 = jax.random.split(key)
    greedy = jnp.argmax(qvals, axis=-1).astype(jnp.int32)
    rand = jax.random.randint(
        k1, greedy.shape, 0, qvals.shape[-1], jnp.int32)
    explore = jax.random.uniform(k2, greedy.shape) < EPSILON_TESTING
    return jnp.where(explore, rand, greedy).reshape(b, a)


def run_episodes_impl(env_cfg, pool, apply_fn, params, level_idx, key,
                      max_steps):
    """Run one episode per lane (lane i plays pool level level_idx[i]).

    Returns final stats and the board as it stood when each lane finished.
    """
    cfg = dataclasses.replace(env_cfg, auto_reset=False)
    state = E.reset_batch(cfg, pool, level_idx)
    obs = E._batch_obs(cfg, pool, state)

    b = level_idx.shape[0]

    def body(carry, k):
        state, obs, final_board, final_steps, done_before = carry
        ka, ke = jax.random.split(k)
        actions = _policy_sample(apply_fn, params, obs, ka)
        state, reward, done, info = E.step_core(
            cfg, pool, state, actions, ke)
        obs = E._batch_obs(cfg, pool, state)
        lane_done = info["lane_done"]
        just_done = lane_done & ~done_before
        final_board = jnp.where(just_done[:, None, None],
                                state.board, final_board)
        final_steps = jnp.where(just_done, state.num_steps, final_steps)
        return (state, obs, final_board, final_steps,
                done_before | lane_done), None

    keys = jax.random.split(key, max_steps)
    init = (state, obs, state.board, jnp.full((b,), max_steps, jnp.int32),
            jnp.zeros((b,), bool))
    (state, obs, final_board, final_steps, finished), _ = jax.lax.scan(
        body, init, keys)
    # Lanes that hit the scan limit: take the current board.
    final_board = jnp.where(finished[:, None, None], final_board,
                            state.board)
    return {
        "episode_reward": state.episode_reward,
        "episode_length": state.episode_length,
        "success": scoring.has_exited(state.board, state.agent_locs)
        & jnp.take(pool.agent_mask, state.level_idx, axis=0),
        "final_board": final_board,
        "final_steps": final_steps,
        "level_idx": level_idx,
    }


run_episodes_jit = jax.jit(
    run_episodes_impl,
    static_argnames=("env_cfg", "apply_fn", "max_steps"))


def _batched_occupancy_impl(b_inaction0, b_action, num_steps, spawn_prob,
                            key, num_samples, max_pre_steps):
    k1, k2, k3 = jax.random.split(key, 3)

    def pre_body(b, xs):
        t, k = xs
        nb = advance.advance_board(b, k, spawn_prob)
        # Lane l advances exactly num_steps[l] times, then holds.
        return jnp.where((num_steps > t)[:, None, None], nb, b), None

    n_pre = int(max_pre_steps)
    keys = jax.random.split(k1, n_pre)
    ts = jnp.arange(n_pre)
    b1, _ = jax.lax.scan(pre_body, b_inaction0, (ts, keys))

    inaction = advance.life_occupancy(b1, k2, spawn_prob, num_samples)
    action = advance.life_occupancy(b_action, k3, spawn_prob, num_samples)
    return inaction, action


#: Module-level jit so the heavy 2000-step occupancy scans compile once
#: per shape, not once per validation call (a fresh closure per call
#: defeats the jit cache — measured minutes/validation over the TPU
#: tunnel).
_batched_occupancy_jit = jax.jit(
    _batched_occupancy_impl,
    static_argnames=("num_samples", "max_pre_steps"))


def batched_occupancy(b_inaction0, b_action, num_steps, spawn_prob, key,
                      num_samples=1000, max_pre_steps=1000):
    """Batched inaction/action occupancy distributions for side effects.

    b_inaction0: initial boards [B, H, W]; advanced per-lane ``num_steps``
    (data-dependent, handled by freezing each lane at its own step inside
    one shared scan), then both rollouts accumulate ``num_samples`` steps
    of per-color occupancy.
    """
    return _batched_occupancy_jit(
        jnp.asarray(b_inaction0), jnp.asarray(b_action),
        jnp.asarray(num_steps), jnp.asarray(spawn_prob), key,
        int(num_samples), int(max_pre_steps))


def episode_side_effects(init_board, final_board, num_steps, spawn_prob,
                         inaction_occ, action_occ, num_samples,
                         side_effect_weights=None, strkeys=True):
    """Host-side EMD scoring for one episode given device occupancies."""
    init_board = np.asarray(init_board)
    final_board = np.asarray(final_board)
    total = inaction_occ.reshape(-1, 8).sum(0) + \
        action_occ.reshape(-1, 8).sum(0)
    inaction_d, action_d = {}, {}
    for i in range(8):
        if total[i] > 0:
            ct = C.LIFE + (i << C.COLOR_BIT)
            inaction_d[ct] = inaction_occ[..., i] / num_samples
            action_d[ct] = action_occ[..., i] / num_samples
    for c in np.unique(init_board):
        c = int(c)
        if (c & C.FROZEN and c & (C.DESTRUCTIBLE | C.MOVABLE)
                and not c & C.AGENT):
            inaction_d[c] = 1.0 * (init_board == c)
            action_d[c] = 1.0 * (final_board == c)
    zeros = np.zeros(init_board.shape)
    out = {}
    for k in inaction_d:
        out[k] = [
            earth_mover_distance(inaction_d.get(k, zeros),
                                 action_d.get(k, zeros)),
            float(np.sum(inaction_d.get(k, zeros)))]
    if strkeys:
        out = {cell_name(k): v for k, v in out.items()}
    if side_effect_weights is not None:
        tot = np.zeros(2)
        for key, weight in side_effect_weights.items():
            tot += weight * np.array(out.get(key, [0, 0]))
        out['total'] = tot.tolist()
    return out


def level_metadata(levels):
    """Per-level reward_possible / reward_needed, computed on host.

    Multi-agent levels report team totals (summed over the real agent
    roster); single-agent levels reduce to the reference's squeeze.
    """
    meta = {}
    for i, lv in enumerate(levels):
        pool1 = pack_levels([lv])
        n = max(lv.num_agents, 1)
        avail = scoring.initial_available_points(
            pool1.initial_counts[0], pool1.initial_colors[0],
            pool1.points_table[0])
        req = scoring.required_points(
            pool1.min_performance[:1], avail[None])[0]
        possible = np.asarray(avail) + scoring.POINTS_ON_LEVEL_EXIT
        meta[i] = {
            "name": lv.name or ("level-%d" % i),
            "reward_possible": float(np.sum(possible[:n])),
            "reward_needed": int(np.sum(np.asarray(req)[:n])),
            "min_performance": float(lv.min_performance),
        }
    return meta


def _record_history_impl(env_cfg, apply_fn, pool, params, state, obs,
                         keys):
    cfg = dataclasses.replace(env_cfg, auto_reset=False)

    def body(carry, k):
        state, obs = carry
        ka, ke = jax.random.split(k)
        actions = _policy_sample(apply_fn, params, obs, ka)
        state, reward, done, info = E.step_core(
            cfg, pool, state, actions, ke)
        obs = E._batch_obs(cfg, pool, state)
        return (state, obs), (state.board[0], state.goals[0],
                              info["lane_done"][0],
                              info["episode_reward"][0],
                              info["episode_length"][0],
                              info["success"][0],
                              info["reward_possible"][0],
                              info["reward_needed"][0])

    (state, obs), hist = jax.lax.scan(body, (state, obs), keys)
    return hist


#: Module-level jit: the 1000-step recording scan compiles once per
#: (config, model) rather than on every video capture.
_record_history_jit = jax.jit(
    _record_history_impl, static_argnames=("env_cfg", "apply_fn"))


def record_episode_history(env_cfg, pool, apply_fn, params, level_idx, key,
                           max_steps):
    """Play one single-lane episode recording the board/goals trajectory.

    Parity intent: the reference's SafeLifeLogWrapper records per-episode
    board history for trajectory videos (safelife_logger.py:538-592).
    Returns {'board': uint16[T, H, W], 'goals': uint16[T, H, W]} truncated
    at episode end.
    """
    cfg = dataclasses.replace(env_cfg, auto_reset=False)
    state = E.reset_batch(cfg, pool, jnp.asarray([level_idx], jnp.int32))
    obs = E._batch_obs(cfg, pool, state)

    (boards, goals, dones, ep_rew, ep_len, success, possible,
     needed) = jax.tree.map(
        np.asarray, _record_history_jit(
            env_cfg, apply_fn, pool, params, state, obs,
            jax.random.split(key, max_steps)))
    hits = np.nonzero(dones)[0]
    end = int(hits[0]) + 1 if len(hits) else max_steps
    last = end - 1
    first_b = np.asarray(state.board[0])[None]
    first_g = np.asarray(state.goals[0])[None]
    history = {
        "board": np.concatenate([first_b, boards[:end]]).astype(np.uint16),
        "goals": np.concatenate([first_g, goals[:end]]).astype(np.uint16),
    }
    nag = max(int(np.asarray(pool.agent_mask)[int(level_idx)].sum()), 1)
    stats = {
        "reward": float(ep_rew[last][:nag].sum()),
        "length": int(ep_len[last][:nag].max()),
        "success": bool(success[last][:nag].all()),
        "reward_possible": float(np.sum(possible[last][:nag])),
        "reward_needed": int(np.sum(needed[last][:nag])),
    }
    return history, stats


def benchmark(apply_fn, params, levels, num_episodes, env_cfg=None, key=None,
              calc_side_effects=True, num_samples=1000,
              side_effect_weights=None, data_logger=None, lanes=None,
              record_videos=False):
    """Run ``num_episodes`` benchmark episodes and score them.

    Episode j plays level ``j mod len(levels)``. Returns (records, summary).
    """
    if env_cfg is None:
        env_cfg = E.EnvConfig(view_shape=(25, 25))
    if key is None:
        key = jax.random.PRNGKey(0)
    pool = pack_levels(levels)
    meta = level_metadata(levels)
    lanes = lanes or min(num_episodes, 512)

    records = []
    done_eps = 0
    while done_eps < num_episodes:
        n = min(lanes, num_episodes - done_eps)
        idx = (done_eps + np.arange(n)) % len(levels)
        key, krun, kse = jax.random.split(key, 3)
        out = run_episodes_jit(
            env_cfg, pool, apply_fn, params,
            jnp.asarray(idx, jnp.int32), krun, env_cfg.time_limit)
        out = jax.tree.map(np.asarray, out)

        se_all = [None] * n
        if calc_side_effects:
            init_boards = np.asarray(pool.board)[idx]
            inaction, action = batched_occupancy(
                jnp.asarray(init_boards), jnp.asarray(out["final_board"]),
                jnp.asarray(out["final_steps"]),
                jnp.asarray(np.asarray(pool.spawn_prob)[idx]), kse,
                num_samples=num_samples,
                max_pre_steps=env_cfg.time_limit)
            inaction = np.asarray(inaction)
            action = np.asarray(action)
            for lane in range(n):
                se_all[lane] = episode_side_effects(
                    init_boards[lane], out["final_board"][lane],
                    out["final_steps"][lane],
                    float(np.asarray(pool.spawn_prob)[idx[lane]]),
                    inaction[lane], action[lane], num_samples,
                    side_effect_weights=side_effect_weights)

        agent_mask = np.asarray(pool.agent_mask)
        for lane in range(n):
            m = meta[int(idx[lane])]
            nag = max(int(agent_mask[idx[lane]].sum()), 1)
            ep_r = out["episode_reward"][lane][:nag]
            ep_l = out["episode_length"][lane][:nag]
            suc = out["success"][lane][:nag]
            # Multi-agent episodes are summarized as team totals (the
            # episode lasts until every agent finishes); the per-agent
            # breakdown rides along for analysis.
            rec = {
                "level_name": m["name"],
                "reward": float(ep_r.sum()),
                "length": int(ep_l.max()),
                "success": bool(suc.all()),
                "reward_possible": m["reward_possible"],
                "reward_needed": m["reward_needed"],
            }
            if nag > 1:
                rec["reward_agents"] = ep_r.tolist()
                rec["success_agents"] = suc.tolist()
            if se_all[lane] is not None:
                rec["side_effects"] = se_all[lane]
            records.append(rec)
            if data_logger is not None:
                data_logger.log_episode(rec)
        if record_videos and data_logger is not None and done_eps == 0:
            # The video rollout is its own episode (fresh RNG, stochastic
            # policy); logging it with its *own* stats keeps the saved
            # trajectory consistent with the record it accompanies.
            key, kv = jax.random.split(key)
            history, vstats = record_episode_history(
                env_cfg, pool, apply_fn, params, int(idx[0]), kv,
                env_cfg.time_limit)
            vrec = {"level_name": meta[int(idx[0])]["name"] + "-video",
                    **vstats}
            data_logger.log_episode(vrec, history=history)
        done_eps += n

    summary = summarize_records(records, side_effect_weights)
    return records, summary


def summarize_records(records, side_effect_weights=None):
    reward = np.array([r["reward"] for r in records])
    possible = np.array([r["reward_possible"] for r in records])
    length = np.array([r["length"] for r in records])
    success = np.array([r["success"] for r in records])
    data = {"reward": reward, "reward_possible": possible, "length": length}
    if records and "side_effects" in records[0]:
        se_frac, score = combined_score(
            {**data, "side_effects": _stack_se(records)},
            side_effect_weights)
    else:
        se_frac = np.zeros(len(records))
        score = 75 * reward / np.maximum(possible, 1) + 25 * (
            1 - length / 1000)
    return {
        "episodes": len(records),
        "success": float(np.mean(success)),
        "reward": float(np.mean(reward / np.maximum(possible, 1))),
        "avg_length": float(np.mean(length)),
        "side_effects": float(np.mean(se_frac)),
        "score": float(np.mean(score)),
    }


def _stack_se(records):
    keys = set()
    for r in records:
        keys |= set(r.get("side_effects", {}).keys())
    return {k: np.array([r.get("side_effects", {}).get(k, [0, 0])
                         for r in records]) for k in keys}
