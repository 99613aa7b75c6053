"""Headline benchmark: env-steps/s on append-still, batch 4096, one chip.

Runs a fused on-device rollout (random policy) over 4096 lockstep SafeLife
boards loaded from the frozen v1.0 append-still benchmark suite and
reports throughput for the full reference-equivalent step: physics +
actions + exit logic + scoring + a live 25x25 observation every step
(what the reference env pays in ``safelife_env.py:105-146`` /
``env_factory.py:311-327``).

The headline measures the TRAINING-DEFAULT observation mode
(``SAFELIFE_TPU_BENCH_OBS=packed``): the env emits raw packed int32
views — bit-for-bit the same information as the reference's 15 binary
channels, which the networks unpack at their input boundary
(models/nets.py:unpack_obs, loss-parity tested). The observation is a
live data dependency of the action stream (folded into a checksum), so
nothing dead-code-eliminates. ``SAFELIFE_TPU_BENCH_OBS=channels``
measures the step with the 15-channel uint8 unpack inside the env
instead (the reference's layout, our non-default mode).

Unless ``SAFELIFE_TPU_BENCH_BOTH=0``, BOTH obs modes run and land in a
``BENCH_MODES.json`` sidecar next to this file (so cross-round
regressions in either mode are visible without re-runs), with trace /
XLA-compile / warmup times split out per mode. Stdout stays exactly one
JSON line: the headline mode.

Baseline: the reference publishes no throughput numbers (BASELINE.md). Its
serial Python-loop + C-kernel engine runs on the order of 1e4 env-steps/s
per process (upper end of the locally-estimated range in BASELINE.md), which
is the denominator used for ``vs_baseline``.
"""

import json
import os
import sys
import time

import numpy as np

REFERENCE_BASELINE_STEPS_PER_S = 1.0e4
# Overridable for smoke tests on slow backends (e.g. CPU); the defaults
# are the headline configuration.
BATCH = int(os.environ.get("SAFELIFE_TPU_BENCH_BATCH", 4096))
SCAN_STEPS = int(os.environ.get("SAFELIFE_TPU_BENCH_SCAN", 100))
TIMED_REPS = int(os.environ.get("SAFELIFE_TPU_BENCH_REPS", 20))
# Observation mode: "packed" = raw packed int32 views (this repo's
# TRAINING DEFAULT — env.packed_obs: networks unpack at their input,
# bit-exact, ~6x less obs memory); "channels" = unpacked 15-channel
# uint8 inside the env (what the reference env emits,
# safelife_env.py:140-143; our non-default mode); "flat" = channels
# flattened to [B, A, vh*vw*C].
OBS_MODE = os.environ.get("SAFELIFE_TPU_BENCH_OBS", "packed")
RUN_BOTH = os.environ.get("SAFELIFE_TPU_BENCH_BOTH", "1") != "0"

OBS_DESC = {
    "channels": "full 15-channel 25x25 obs",
    "packed": "packed int32 25x25 obs (training default)",
    "flat": "flat 15-channel 25x25 obs",
}


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def load_pool():
    from safelife_tpu.env.state import pack_levels
    from safelife_tpu.io.levels import load_levels

    candidates = [
        os.path.join(os.path.dirname(__file__),
                     "safelife_tpu/levels/benchmarks/v1.0/append-still.npz"),
    ]
    for path in candidates:
        if os.path.exists(path):
            log("levels:", path)
            return pack_levels(load_levels(path))
    from __graft_entry__ import _crafted_levels
    log("levels: crafted fallback")
    return pack_levels(_crafted_levels(8))


def bench_mode(pool, obs_mode):
    """Measure one obs mode. Returns a result dict with the rate and the
    trace/compile/warmup split (VERDICT r4: lumping compile+warmup into
    one number hid compile-time regressions)."""
    import jax
    import jax.numpy as jnp

    from safelife_tpu.env import env as E
    from safelife_tpu.training.env_factory import TRAINING_CHANNELS

    cfg = E.EnvConfig(
        view_shape=(25, 25),
        output_channels=(None if obs_mode == "packed"
                         else TRAINING_CHANNELS),
        time_limit=1000,
        goals_may_evolve=False,  # append-still goals are static
        stochastic=False,         # append-still boards are spawner-free
        auto_reset=True,
        flat_obs=(obs_mode == "flat"),
    )

    state, obs = E.reset(cfg, pool, jax.random.PRNGKey(0), BATCH)

    def run_chunk(carry, key):
        def body(carry, k):
            state, obs = carry
            ka, ke = jax.random.split(k)
            base = jax.random.randint(
                ka, (BATCH, pool.num_agents), 0, 9, jnp.int32)
            # Fold the observation into the action stream so the full
            # 15-channel obs unpack is a live data dependency every step
            # (exactly as it is for a real policy); still uniform over
            # the 9 actions.
            checksum = obs.reshape(BATCH, pool.num_agents, -1).sum(
                axis=-1, dtype=jnp.int32)
            actions = (base + checksum) % 9
            state, obs, reward, done, info = E.step_impl(
                cfg, pool, state, actions, ke)
            return (state, obs), reward.sum()
        keys = jax.random.split(key, SCAN_STEPS)
        carry, rs = jax.lax.scan(body, carry, keys)
        return carry, rs.sum()

    carry = (state, obs)
    key = jax.random.PRNGKey(1)
    # Split trace (host-side jaxpr/StableHLO) from XLA compile from
    # first-execution warmup: three different bottlenecks with three
    # different fixes.
    t0 = time.perf_counter()
    lowered = jax.jit(run_chunk, donate_argnums=0).lower(carry, key)
    trace_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    run = lowered.compile()
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    carry, _ = run(carry, key)
    jax.block_until_ready(carry)
    warmup_s = time.perf_counter() - t0
    log("%s: trace %.1fs, XLA compile %.1fs, warmup %.1fs"
        % (obs_mode, trace_s, compile_s, warmup_s))

    t0 = time.perf_counter()
    for i in range(TIMED_REPS):
        carry, rsum = run(carry, jax.random.PRNGKey(2 + i))
    # A real scalar fetch: the donated state chains the calls, so waiting
    # on the last reward sum forces completion of every timed rep (over a
    # tunneled device, block_until_ready alone can under-report).
    log("reward checksum:", float(rsum))
    jax.block_until_ready(carry)
    dt = time.perf_counter() - t0

    steps = BATCH * SCAN_STEPS * TIMED_REPS
    rate = steps / dt
    log("%.0f env-steps/s over %d steps in %.2fs on %s"
        % (rate, steps, dt, jax.devices()[0].device_kind))
    return {
        "metric": "env-steps/s/chip (append-still, batch %d, %s)"
                  % (BATCH, OBS_DESC[obs_mode]),
        "value": round(rate),
        "unit": "env-steps/s",
        "vs_baseline": round(rate / REFERENCE_BASELINE_STEPS_PER_S, 2),
        "trace_s": round(trace_s, 1),
        "xla_compile_s": round(compile_s, 1),
        "warmup_s": round(warmup_s, 1),
    }


def main():
    import jax

    # Honor an explicit JAX_PLATFORMS even under site shims that
    # re-register their accelerator backend after clearing the env
    # selection (same workaround as safelife_tpu.__main__._pin_platform);
    # otherwise a CPU smoke run can block on an unreachable device.
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from safelife_tpu.utils.cache import enable_compilation_cache
    cache_dir = enable_compilation_cache()
    log("compilation cache:", cache_dir or "disabled")

    pool = load_pool()
    results = {OBS_MODE: bench_mode(pool, OBS_MODE)}
    if RUN_BOTH:
        other = "channels" if OBS_MODE == "packed" else "packed"
        try:
            results[other] = bench_mode(pool, other)
        except Exception as exc:  # secondary mode must not sink the bench
            log("secondary mode %s failed: %s" % (other, exc))
        sidecar = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_MODES.json")
        with open(sidecar, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
            f.write("\n")
        log("both-mode sidecar:", sidecar)

    headline = dict(results[OBS_MODE])
    for k in ("trace_s", "xla_compile_s", "warmup_s"):
        headline.pop(k)
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
