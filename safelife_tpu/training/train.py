"""Training-loop orchestration (the ``start-training.py`` equivalent).

Drives the jitted PPO / DQN iteration units: schedules, periodic reports,
validation runs, checkpoints (every 100k steps, keep 3), level-pool
refreshes, and the final benchmark sweep — all host-side control around
device-resident compute. Parity targets: ``training/ppo.py:184-219``,
``training/dqn.py:177-214``, ``start-training.py:237-315``.
"""

import logging
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..env import env as E, wrappers as W
from ..loggers import EpisodeCollector, SafeLifeLogger, summarize_run
from ..parallel import mesh as M
from ..models.nets import SafeLifePolicyNetwork, SafeLifeQNetwork
from . import dqn as dqn_mod, ppo as ppo_mod, runner
from .checkpoints import CheckpointManager
from .global_config import build_config

logger = logging.getLogger(__name__)


def build_model(bundle, algo):
    """(model, init_dummy, obs_shape, obs_dtype) for the bundle's
    observation mode.

    In packed-obs mode the env emits raw packed int32 views and the
    network unpacks ``bundle.obs_channels`` at its input boundary
    (models/nets.py:unpack_obs); otherwise the env emits uint8 binary
    channels directly.
    """
    unpack = tuple(bundle.obs_channels) if bundle.packed_obs else None
    cls = SafeLifePolicyNetwork if algo == "ppo" else SafeLifeQNetwork
    # Training-math precision (models/nets.py:PRECISIONS). "float32"
    # matches the reference's strict-f32 torch math on the TPU MXU;
    # "bfloat16" trades learning-curve parity for raw MXU throughput.
    from .global_config import config as global_config
    model = cls(unpack_channels=unpack,
                precision=global_config.setdefault(
                    "train.precision", "float32"),
                # torch-matched weight/bias init distributions
                # (models/nets.py:_TORCH_KERNEL_INIT) — the reference's
                # init recipe; opt-out via train.torch_init: false.
                torch_init=bool(global_config.setdefault(
                    "train.torch_init", True)))
    vh, vw = bundle.env_cfg.view_shape
    if bundle.packed_obs:
        return model, np.zeros((1, vh, vw), np.int32), (vh, vw), np.int32
    n_ch = len(bundle.env_cfg.output_channels)
    return (model, np.zeros((1, vh, vw, n_ch), np.float32),
            (vh, vw, n_ch), np.uint8)


def load_for_eval(algo, bundle, data_dir):
    """Load the latest checkpoint's params for benchmark-only runs.

    Parity: start-training.py's run_type='benchmark' path (:276-285).
    """
    if not data_dir:
        raise ValueError("benchmark run type needs a data_dir with "
                         "checkpoints")
    model = build_model(bundle, algo)[0]
    ckpt = CheckpointManager(data_dir)
    state, step = ckpt.restore_raw()
    if state is None:
        raise FileNotFoundError("no checkpoints under %s" % data_dir)
    logger.info("benchmarking checkpoint at step %s", step)
    return model, state["params"]


def _sampled_side_effects(ep_samples, bundle, key):
    """Score one sampled finished episode's side effects.

    Returns a dict of scalars for the training logger: the weighted total
    fraction plus one ``side_effects.<category>`` entry per cell type
    (emd relative to the inaction total — the same per-category
    quantities the reference logs per episode,
    safelife_logger.py:286-312). None if no episode finished this chunk.
    """
    found = np.asarray(ep_samples["found"])
    hits = np.nonzero(found)[0]
    if not len(hits):
        return None
    i = int(hits[-1])
    from ..side_effects import side_effect_score, weighted_side_effect_total
    se = side_effect_score(
        np.asarray(ep_samples["init_board"][i]),
        np.asarray(ep_samples["final_board"][i]),
        int(np.asarray(ep_samples["num_steps"][i])),
        float(np.asarray(ep_samples["spawn_prob"][i])),
        strkeys=True, key=key)
    total = weighted_side_effect_total(se, bundle.side_effect_weights)
    out = {"side_effects_sampled":
           float(total[0]) / max(float(total[1]), 1.0)}
    for name, (emd, inaction_total) in se.items():
        out["side_effects." + name] = \
            float(emd) / max(float(inaction_total), 1.0)
    return out


def _exhaustive_side_effects(ep_samples, bundle, env_cfg, key):
    """Score EVERY finished episode captured this chunk.

    Returns {flattened-row-index: side-effect dict} keyed the same way
    EpisodeCollector iterates the flattened episode records. Occupancy
    rollouts for all episodes run as one device batch (padded to
    power-of-two buckets so the jit cache sees a handful of shapes, not
    one per chunk); the EMD scoring is per-episode host work.
    """
    found = np.asarray(ep_samples["found"])
    hits = np.nonzero(found)[0]
    if not len(hits):
        return {}
    n = len(hits)
    bucket = 1 << (n - 1).bit_length()
    pad = np.concatenate([hits, np.repeat(hits[:1], bucket - n)])
    init_b = np.asarray(ep_samples["init_board"])[pad]
    fin_b = np.asarray(ep_samples["final_board"])[pad]
    steps = np.asarray(ep_samples["num_steps"])[pad]
    sp = np.asarray(ep_samples["spawn_prob"])[pad]
    num_samples = 1000
    inaction, action = runner.batched_occupancy(
        jnp.asarray(init_b), jnp.asarray(fin_b), jnp.asarray(steps),
        jnp.asarray(sp), key, num_samples=num_samples,
        max_pre_steps=env_cfg.time_limit)
    inaction = np.asarray(inaction)
    action = np.asarray(action)
    out = {}
    for j, lane in enumerate(hits):
        out[int(lane)] = runner.episode_side_effects(
            init_b[j], fin_b[j], int(steps[j]), float(sp[j]),
            inaction[j], action[j], num_samples,
            side_effect_weights=bundle.side_effect_weights)
    return out


def _summarize_se_map(se_map):
    """Mean weighted side-effect fraction over the chunk's episodes."""
    if not se_map:
        return None
    fracs = []
    for se in se_map.values():
        emd, inaction_total = se.get("total", (0.0, 0.0))
        fracs.append(float(emd) / max(float(inaction_total), 1.0))
    return {"side_effects_mean": float(np.mean(fracs)),
            "side_effects_episodes": float(len(fracs))}


def eval_params(mesh, state):
    """Host-local params for evaluation jits (validation, benchmarks,
    videos run per-host, outside the global SPMD program)."""
    return jax.device_get(state.params) if mesh is not None \
        else state.params


def _maybe_record_best_episode(bundle, model, params, env_cfg, pool, key):
    """When the curriculum records a new per-stage best, capture one
    episode of that stage with the current policy as a trajectory video
    (parity: CurricularLevelIterator.record_video,
    env_factory.py:148-152)."""
    it = bundle.pool_manager.iterator
    pop = getattr(it, "pop_best_improvement", None)
    if pop is None:
        return
    best = pop()
    if best is None or bundle.training_logger.logdir is None:
        return
    stage, perf = best
    idx = next(
        (i for i, lv in enumerate(bundle.pool_manager._host_levels)
         if it._stage_key(lv.name or "") == stage), 0)
    history, vstats = runner.record_episode_history(
        env_cfg, pool, model.apply, params, idx, key, env_cfg.time_limit)
    bundle.training_logger.log_episode(
        {"level_name": "best-%s-%.3f" % (stage, perf), **vstats},
        history=history)


def _restore_latest(ckpt, learner_t, ws, bundle, env_cfg, mesh):
    """Restore the latest checkpoint for a training loop (PPO and DQN).

    The restore template is built from the checkpoint's OWN stored
    structure (:meth:`CheckpointManager.structure`), so older formats
    (pre-pool, pre-env-state, pre-opt-state) restore whatever they
    contain without exception-driven format guessing — and a genuinely
    broken checkpoint (corruption, permissions, orbax drift) raises
    instead of silently discarding training progress. Pool arrays are
    restored shape-accurately from metadata, so a resume whose freshly
    generated pool differs structurally (row packing, exit padding)
    still reinstalls the checkpointed pool; the pool manager recomputes
    the static flags from the restored content.

    Returns ``(learner_fields, ws, obs, pool, extra, step)``; the first
    is None when no checkpoint exists. ``obs``/``pool`` are None when
    the checkpoint predates env-state / pool checkpointing.
    """
    struct, _ = ckpt.structure()
    if struct is None:
        return None, ws, None, None, None, None
    tmpl = {k: v for k, v in learner_t.items() if k in struct}
    missing = sorted(set(learner_t) - set(struct))
    if missing:
        logger.info("checkpoint predates field(s) %s; restoring the "
                    "fields it has", missing)

    def _leaf_shapes(tree):
        return sorted((tuple(x.shape), str(np.dtype(x.dtype)))
                      for x in jax.tree.leaves(tree))

    env_compatible = ("env_state" in struct
                      and _leaf_shapes(struct["env_state"])
                      == _leaf_shapes(ws))
    if env_compatible:
        tmpl["env_state"] = ws
    elif "env_state" in struct:
        # A legitimate config change (batch size, wrapper ring period)
        # reshapes the env batch; resume the learner only rather than
        # failing the run. The pool is skipped with it — installing the
        # checkpointed pool under freshly reset lanes would break the
        # lane <-> level coherence the pool checkpoint exists for.
        logger.warning(
            "checkpoint env state does not match this run's shapes "
            "(batch size or wrapper config changed); resuming learner "
            "state only with fresh episodes and levels")
    if "pool" in struct and env_compatible:
        shard = mesh and jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec())
        tmpl["pool"] = jax.tree.map(
            lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype,
                                           sharding=shard or None),
            struct["pool"])
    # The template must span the whole saved tree; anything this run
    # does not use is restored shape-accurately from metadata (these
    # subtrees are small — an env batch / level pool) and discarded.
    wanted = set(tmpl)
    for k in struct:
        tmpl.setdefault(k, jax.tree.map(
            lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype), struct[k]))
    restored, extra, step = ckpt.restore(tmpl)
    restored = {k: restored[k] for k in wanted}
    pool = None
    if "pool" in restored:
        pool = bundle.pool_manager.restore_pool(restored.pop("pool"))
    elif "env_state" in restored:
        logger.warning(
            "checkpoint has env state but no level pool (old format); "
            "resumed mid-episode lanes score against freshly generated "
            "levels")
    obs = new_ws = None
    if "env_state" in restored:
        new_ws = restored.pop("env_state")
        obs = E._batch_obs(
            env_cfg, pool if pool is not None
            else bundle.pool_manager.pool, new_ws.env)
    logger.info("restored checkpoint at step %s", step)
    return restored, new_ws if new_ws is not None else ws, obs, pool, \
        extra, step


def train_ppo(bundle, total_steps=6e6, batch_size=64, seed=0,
              data_dir=None, report_interval=None, test_interval=5e5,
              checkpoint_interval=100_000, pool_refresh=4,
              iters_per_chunk=8):
    """Train PPO to ``total_steps`` env steps. Returns (model, ppo_state)."""
    ppo_cfg = build_config(ppo_mod.PPOConfig, "ppo")
    if report_interval is None:
        report_interval = ppo_cfg.report_interval
    env_cfg, wcfg = bundle.env_cfg, bundle.wrapper_cfg
    key = jax.random.PRNGKey(seed)

    model, dummy_obs, _, _ = build_model(bundle, "ppo")
    key, kinit, kreset = jax.random.split(key, 3)
    params = model.init(kinit, dummy_obs)
    pstate = ppo_mod.init_ppo_state(ppo_cfg, params)

    # Multi-process runs train one global SPMD program: lanes sharded over
    # every device of every host, learner replicated (gradient reductions
    # inserted by XLA). batch_size is the GLOBAL lane count. The pool is
    # the allgathered union of every host's level stream (LevelPoolManager
    # keeps it replicated-identical), and the reset key is host-identical,
    # so the globalization below lifts host-identical values.
    mesh = M.training_mesh()
    pool = bundle.pool_manager.pool
    ws, obs = W.reset(env_cfg, wcfg, pool, kreset, batch_size,
                      min_perf_fraction=bundle.exit_difficulty_schedule())
    if mesh is not None:
        if batch_size % len(jax.devices()):
            raise ValueError(
                "global batch_size %d must divide over %d global devices"
                % (batch_size, len(jax.devices())))
        ws = M.global_batch(jax.device_get(ws), mesh)
        obs = M.global_batch(jax.device_get(obs), mesh)
        pstate = M.global_replicated(jax.device_get(pstate), mesh)

    ckpt = data_dir and CheckpointManager(
        data_dir, interval=checkpoint_interval)
    if ckpt:
        # Full resume includes the env-batch state (mid-episode boards)
        # AND the level pool those lanes index into — possible here
        # because both are just arrays, unlike the reference, whose
        # resume restarts every episode. Restoring the env state without
        # its pool would score every resumed mid-episode lane against
        # whatever levels the fresh iterator happened to generate.
        learner_t = {"params": pstate.params, "opt_state": pstate.opt_state,
                     "num_steps": pstate.num_steps}
        restored, ws, robs, rpool, extra, _ = _restore_latest(
            ckpt, learner_t, ws, bundle, env_cfg, mesh)
        if restored is not None:
            if robs is not None:
                obs = robs
            if rpool is not None:
                pool = bundle.pool_manager.pool
            pstate = pstate.replace(**restored)
            if extra:
                bundle.training_logger.cumulative_stats.update(extra)

    collector = EpisodeCollector(
        bundle.training_logger,
        level_meta=bundle.pool_manager.level_meta())
    se_map = {}
    steps_per_iter = ppo_cfg.steps_per_env * batch_size
    next_report = report_interval
    next_test = test_interval
    t0 = time.time()

    while int(pstate.num_steps) < total_steps:
        key, k = jax.random.split(key)
        pool = bundle.pool_manager.pool
        if mesh is not None:
            pool = M.global_replicated(pool, mesh)
        pstate, ws, obs, metrics = ppo_mod.train_chunk(
            env_cfg, wcfg, ppo_cfg, model.apply, pool, pstate, ws, obs, k,
            iters_per_chunk,
            se_penalty_coef=bundle.se_penalty_schedule(),
            min_perf_fraction=bundle.exit_difficulty_schedule())
        # Episode records gather to every host; only host 0 logs them.
        # batch_size is global, so the step accounting is fleet-wide
        # already.
        episodes = M.gather_episodes(metrics.pop("episodes"))
        ep_samples = M.gather_episodes(metrics.pop("ep_samples"))
        if wcfg.exhaustive_se:
            # Per-lane capture: flatten [chunk_steps, B, ...] the same
            # way the episode records were flattened so row indices
            # align, then score every finished episode (the reference's
            # per-episode behavior, safelife_env.py:183-193) and attach
            # the results to the episode log through the collector.
            ep_samples = {
                k2: np.asarray(v).reshape((-1,) + np.asarray(v).shape[2:])
                for k2, v in ep_samples.items()}
            if M.is_logging_host():
                key, kse = jax.random.split(key)
                se_map = _exhaustive_side_effects(
                    ep_samples, bundle, env_cfg, kse)
                collector.side_effects_fn = \
                    lambda lane, info: se_map.get(int(lane))
        collector.observe(
            episodes, batch_steps=steps_per_iter * iters_per_chunk,
            # Non-zero hosts only refresh curriculum/last-episode state;
            # the log files belong to host 0.
            record_only=not M.is_logging_host())
        n = int(pstate.num_steps)
        bundle.training_logger.cumulative_stats["training_steps"] = n

        # Live lanes pin the slots they are mid-episode on — refresh must
        # never swap those (lane_level re-gathers per step; see
        # LevelPoolManager.refresh). One tiny [B] readback per chunk.
        bundle.pool_manager.refresh(
            pool_refresh,
            in_use=np.unique(M.addressable_values(ws.env.level_idx)))

        if ckpt:
            # `pool` is the pool this chunk's env state was stepped
            # against (pre-refresh) — the pair must stay coherent so a
            # resume scores mid-episode lanes against their own levels.
            ckpt.save_if_needed(
                n, {"params": pstate.params, "opt_state": pstate.opt_state,
                    "num_steps": pstate.num_steps, "env_state": ws,
                    "pool": pool},
                dict(bundle.training_logger.cumulative_stats))

        if n >= next_report:
            next_report = (n // report_interval + 1) * report_interval
            m = {k2: float(v) for k2, v in metrics.items()}
            rate = n / max(time.time() - t0, 1e-9)
            # Replication check: the L1 norm of the params. Multi-host
            # replicas must agree on this bitwise — parameters evolve
            # through collective (psum'd) gradients, so any drift means
            # real trouble (lost determinism, data corruption). Scalar
            # *metrics* like the loss are NOT held to that bar: XLA may
            # compute a replicated scalar redundantly per host, and
            # e.g. the CPU backend's threaded reductions are order-
            # nondeterministic under load (~1e-3 relative wobble).
            # One bulk fetch (per-leaf device_gets each pay the tunnel
            # round trip); the float64 sum stays on the host because it
            # must be bitwise host-independent, and XLA:CPU's threaded
            # reductions are order-nondeterministic under load.
            host_params = jax.device_get(pstate.params)
            pcheck = float(sum(
                np.abs(np.asarray(p, np.float64)).sum()
                for p in jax.tree.leaves(host_params)))
            logger.info(
                "n=%d: loss=%.3g entropy=%.3f reward=%.4f (%.0f steps/s) "
                "pcheck=%.17g",
                n, m["loss"], m["entropy"], m["reward_mean"], rate, pcheck)
            if M.is_logging_host():
                # Scalar logging and its occupancy/EMD sampling are host
                # 0's job; other hosts would duplicate the work and
                # corrupt the shared log files.
                if wcfg.exhaustive_se:
                    se = _summarize_se_map(se_map)
                else:
                    se = _sampled_side_effects(ep_samples, bundle, key)
                if se is not None:
                    m.update(se)
                bundle.training_logger.log_scalars(m, n, "ppo")
                _maybe_record_best_episode(
                    bundle, model, eval_params(mesh, pstate), env_cfg,
                    bundle.pool_manager.pool, key)

        if bundle.validation_levels and n >= next_test:
            next_test = (n // test_interval + 1) * test_interval
            if M.is_logging_host():
                run_validation(model, eval_params(mesh, pstate), bundle,
                               data_dir, key)

    if ckpt:
        if mesh is not None:
            # The loop may not have run (already past total_steps on
            # restore), leaving host-local pool arrays; orbax collective
            # saves need global ones.
            pool = M.global_replicated(jax.device_get(pool), mesh)
        ckpt.save(int(pstate.num_steps),
                  {"env_state": ws, "pool": pool,
                   "params": pstate.params, "opt_state": pstate.opt_state,
                   "num_steps": pstate.num_steps},
                  dict(bundle.training_logger.cumulative_stats))
    if mesh is not None:
        # Hand back host-local values so post-training evaluation (plain
        # per-host jits) can consume the result directly.
        pstate = jax.device_get(pstate)
    return model, pstate


def train_dqn(bundle, total_steps=6e6, batch_size=32, seed=0,
              data_dir=None, report_interval=None,
              checkpoint_interval=100_000):
    """Train DQN to ``total_steps`` env steps.

    Multi-process runs train one global SPMD program, like PPO: env
    lanes (and their per-lane n-step assembly rings) shard over every
    device of every host; the learner AND the replay buffer replicate.
    Replicating replay exceeds the reference (single-device torch) and
    is cheap at DQN scale: inserting a global batch's rows into the
    replicated buffer costs one row-allgather per step (~KBs over
    ICI/DCN), sampling reads the local replica, and identical sample
    keys keep every replica's optimizer step bitwise-identical.
    """
    cfg = build_config(dqn_mod.DQNConfig, "dqn")
    if report_interval is None:
        report_interval = cfg.report_interval
    env_cfg, wcfg = bundle.env_cfg, bundle.wrapper_cfg
    key = jax.random.PRNGKey(seed)
    model, dummy_obs, obs_shape, obs_dtype = build_model(bundle, "dqn")
    key, kinit, kreset = jax.random.split(key, 3)
    params = model.init(kinit, dummy_obs)
    mesh = M.training_mesh()
    pool = bundle.pool_manager.pool
    # One n-step assembly ring per flattened lane x agent slot;
    # batch_size is the GLOBAL lane count.
    dstate = dqn_mod.init_dqn_state(
        cfg, params, batch_size * pool.num_agents, obs_shape, obs_dtype)
    ws, obs = W.reset(env_cfg, wcfg, pool, kreset, batch_size)
    if mesh is not None:
        if batch_size % len(jax.devices()):
            raise ValueError(
                "global batch_size %d must divide over %d global devices"
                % (batch_size, len(jax.devices())))
        ws = M.global_batch(jax.device_get(ws), mesh)
        obs = M.global_batch(jax.device_get(obs), mesh)
        traj = M.global_batch(jax.device_get(dstate.traj), mesh)
        dstate = M.global_replicated(jax.device_get(
            dstate.replace(traj=None)), mesh).replace(traj=traj)

    ckpt = data_dir and CheckpointManager(
        data_dir, interval=checkpoint_interval)
    if ckpt:
        # Resume learner + env batch + the level pool the env lanes
        # index into. The replay/trajectory buffers are deliberately NOT
        # checkpointed (they are capacity x obs — most of a checkpoint's
        # weight for state that refills within one optimize interval);
        # a resumed run re-warms the buffer before optimizing resumes.
        learner_t = {"params": dstate.params,
                     "target_params": dstate.target_params,
                     "opt_state": dstate.opt_state,
                     "num_steps": dstate.num_steps}
        restored, ws, robs, rpool, extra, _ = _restore_latest(
            ckpt, learner_t, ws, bundle, env_cfg, mesh)
        if restored is not None:
            if robs is not None:
                obs = robs
            if rpool is not None:
                pool = bundle.pool_manager.pool
            dstate = dstate.replace(**restored)
            if extra:
                bundle.training_logger.cumulative_stats.update(extra)
    collector = EpisodeCollector(
        bundle.training_logger,
        level_meta=bundle.pool_manager.level_meta())
    chunk = max(cfg.optimize_interval // batch_size, 1)
    # Over a tunneled device every host round trip costs tens of ms;
    # large chunks keep the loop device-bound.
    iters_per_chunk = 32
    next_report = report_interval
    while int(dstate.num_steps) < total_steps:
        key, k = jax.random.split(key)
        pool = bundle.pool_manager.pool
        if mesh is not None:
            pool = M.global_replicated(pool, mesh)
        dstate, ws, obs, metrics = dqn_mod.train_chunk(
            env_cfg, wcfg, cfg, model.apply, pool,
            dstate, ws, obs, k, chunk, iters_per_chunk)
        episodes = M.gather_episodes(jax.device_get(metrics.pop("episodes")))
        if M.is_logging_host():
            collector.observe(
                episodes,
                # batch_size is already the global lane count.
                batch_steps=chunk * batch_size * iters_per_chunk)
        n = int(dstate.num_steps)
        bundle.training_logger.cumulative_stats["training_steps"] = n
        bundle.pool_manager.refresh(
            2, in_use=np.unique(M.addressable_values(ws.env.level_idx)))
        if ckpt:
            ckpt.save_if_needed(
                n, {"params": dstate.params,
                    "target_params": dstate.target_params,
                    "opt_state": dstate.opt_state,
                    "num_steps": dstate.num_steps,
                    # The chunk's own (pre-refresh) pool: the saved env
                    # state's lanes must resume against the levels they
                    # are mid-episode on.
                    "env_state": ws,
                    "pool": pool},
                dict(bundle.training_logger.cumulative_stats))
        if n >= next_report:
            next_report = (n // report_interval + 1) * report_interval
            m = {k2: float(v) for k2, v in metrics.items()}
            # Same replication invariant as PPO: multi-host replicas
            # must agree bitwise on the parameters (they evolve through
            # identical replicated optimizer steps on identical samples).
            host_params = jax.device_get(dstate.params)
            pcheck = float(sum(
                np.abs(np.asarray(p, np.float64)).sum()
                for p in jax.tree.leaves(host_params)))
            logger.info("n=%d: loss=%.3g eps=%.3f q=%.3g pcheck=%.17g", n,
                        m["loss"], m["epsilon"], m["q_model_mean"], pcheck)
            bundle.training_logger.log_scalars(m, n, "dqn")
    if ckpt:
        # Terminal state regardless of interval alignment (same contract
        # as PPO); `pool` is the last chunk's pre-refresh pool, coherent
        # with ws like the in-loop saves.
        ckpt.save(int(dstate.num_steps),
                  {"params": dstate.params,
                   "target_params": dstate.target_params,
                   "opt_state": dstate.opt_state,
                   "num_steps": dstate.num_steps,
                   "env_state": ws, "pool": pool},
                  dict(bundle.training_logger.cumulative_stats))
    return model, dstate


def run_validation(model, params, bundle, data_dir, key):
    vlogger = SafeLifeLogger(data_dir, episode_type="validation")
    records, summary = runner.benchmark(
        model.apply, params, bundle.validation_levels,
        num_episodes=len(bundle.validation_levels),
        env_cfg=bundle.env_cfg, key=key,
        side_effect_weights=bundle.side_effect_weights,
        data_logger=vlogger, record_videos=bool(data_dir))
    logger.info("validation: %s", summary)
    return summary


def run_benchmark(model, params, bundle, data_dir, key, num_episodes=1000):
    """Final benchmark sweep (parity: start-training.py:276-285).

    Multi-agent tasks ship no frozen benchmark archives (as in the
    reference); their validation levels double as the evaluation suite.
    """
    levels = bundle.benchmark_levels or bundle.validation_levels
    blogger = SafeLifeLogger(data_dir, episode_type="benchmark")
    records, summary = runner.benchmark(
        model.apply, params, levels,
        num_episodes=num_episodes, env_cfg=bundle.env_cfg, key=key,
        side_effect_weights=bundle.side_effect_weights,
        data_logger=blogger)
    logger.info("benchmark: %s", summary)
    if data_dir:
        summarize_run(data_dir)
    return summary
