"""PPO training throughput: packed int32 obs vs unpacked uint8 channels.

Times `train_chunk` (rollout + GAE + 3 epochs of minibatch SGD, all under
one jit) on the frozen v1.0 append-still pool. The packed mode stores
raw int32 views in the trajectory and unpacks channels inside the
network; unpacked stores the uint8 [.., 25, 25, 15] channel tensors.

Run on the real chip:
  PYTHONPATH=/root/repo:/root/.axon_site python bench/bench_train.py [batch]

``--grid`` sweeps batch 1024/4096 x float32/bfloat16 x packed/unpacked,
streaming one JSON line per config to stdout (JSONL; a killed grid
still lands everything it measured) — the ROOFLINE.md training table.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

GRID = "--grid" in sys.argv
argv = [a for a in sys.argv[1:] if not a.startswith("--")]
BATCH = int(argv[0]) if argv else 1024
# Training-math precision (models/nets.py:PRECISIONS): float32 is the
# training default (learning-curve parity); pass bfloat16 to measure the
# raw-MXU upside this knob trades away.
PRECISION = argv[1] if len(argv) > 1 else "float32"
ITERS_PER_CHUNK = 8
TIMED_CHUNKS = 5


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_mode(packed, batch=None, precision=None):
    batch = BATCH if batch is None else batch
    precision = PRECISION if precision is None else precision
    import jax

    from safelife_tpu.env import env as E, wrappers as W
    from safelife_tpu.env.state import pack_levels
    from safelife_tpu.io.levels import load_levels
    from safelife_tpu.models.nets import SafeLifePolicyNetwork
    from safelife_tpu.training import ppo
    from safelife_tpu.training.env_factory import TRAINING_CHANNELS

    pool = pack_levels(load_levels(
        "/root/repo/safelife_tpu/levels/benchmarks/v1.0/append-still.npz"))
    env_cfg = E.EnvConfig(
        view_shape=(25, 25),
        output_channels=None if packed else TRAINING_CHANNELS,
        time_limit=1000, goals_may_evolve=False, stochastic=False)
    wcfg = W.WrapperConfig()
    ppo_cfg = ppo.PPOConfig()

    model = SafeLifePolicyNetwork(
        unpack_channels=TRAINING_CHANNELS if packed else None,
        precision=precision)
    dummy = (np.zeros((1, 25, 25), np.int32) if packed
             else np.zeros((1, 25, 25, 15), np.float32))
    params = model.init(jax.random.PRNGKey(0), dummy)
    pstate = ppo.init_ppo_state(ppo_cfg, params)
    ws, obs = W.reset(env_cfg, wcfg, pool, jax.random.PRNGKey(1), batch)

    name = "packed" if packed else "unpacked"
    compile_t0 = time.perf_counter()
    pstate, ws, obs, metrics = ppo.train_chunk(
        env_cfg, wcfg, ppo_cfg, model.apply, pool, pstate, ws, obs,
        jax.random.PRNGKey(2), ITERS_PER_CHUNK)
    jax.block_until_ready(pstate)
    compile_s = time.perf_counter() - compile_t0
    log("%s compile+warmup: %.1fs" % (name, compile_s))

    t0 = time.perf_counter()
    for i in range(TIMED_CHUNKS):
        pstate, ws, obs, metrics = ppo.train_chunk(
            env_cfg, wcfg, ppo_cfg, model.apply, pool, pstate, ws, obs,
            jax.random.PRNGKey(3 + i), ITERS_PER_CHUNK)
    jax.block_until_ready(pstate)
    dt = time.perf_counter() - t0
    steps = int(pstate.num_steps)
    rate = (ppo_cfg.steps_per_env * batch * ITERS_PER_CHUNK
            * TIMED_CHUNKS) / dt
    log("%s: %.0f train env-steps/s (loss %.4f, %d total steps)"
        % (name, rate, float(metrics["loss"]), steps))
    return rate, compile_s


def main():
    import jax
    if GRID:
        # Most-valuable configs first and one JSON line streamed per
        # config: a killed grid still lands everything it measured.
        configs = [
            (4096, "float32", True),    # the training default
            (4096, "float32", False),
            (4096, "bfloat16", True),   # the bf16 upside f32 trades away
            (1024, "float32", True),
            (1024, "float32", False),
            (4096, "bfloat16", False),
            (1024, "bfloat16", True),
            (1024, "bfloat16", False),
        ]
        device = jax.devices()[0].device_kind
        for batch, precision, packed in configs:
            log("== batch %d %s %s" % (
                batch, precision, "packed" if packed else "unpacked"))
            rate, compile_s = run_mode(packed, batch, precision)
            print(json.dumps({
                "device": device, "unit": "train env-steps/s",
                "batch": batch, "precision": precision,
                "obs": "packed" if packed else "unpacked",
                "rate": round(rate),
                "compile_warmup_s": round(compile_s, 1)}), flush=True)
        return
    log("device:", jax.devices()[0].device_kind, "batch:", BATCH,
        "precision:", PRECISION)
    packed, _ = run_mode(True)
    unpacked, _ = run_mode(False)
    log("packed/unpacked speedup: %.2fx" % (packed / unpacked))


if __name__ == "__main__":
    main()
