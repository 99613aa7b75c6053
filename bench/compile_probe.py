#!/usr/bin/env python
"""Cold-compile attribution probe for the headline bench program.

VERDICT r4 weak-item 2: cold compile grew 69s (r02) -> 151s (r03) ->
401s/1419s (r04) and nobody measured WHERE the time goes. This probe
compiles the exact bench.py rollout program under a throwaway
compilation cache (always cold) and reports the trace / XLA-compile /
warmup split for one configuration per invocation:

  python bench/compile_probe.py MODE [SCAN] [BATCH]

MODE is "packed", "channels", or "packed-nokernel" / "channels-nokernel"
(SAFELIFE_TPU_OBS_KERNEL=0 — the XLA one-hot matmul obs path instead of
the Pallas kernel; isolates the Mosaic kernel's share of compile time).
Scan-length sweeps isolate per-iteration costs (lax.scan compiles its
body once, so compile time should be ~flat in SCAN; growth means
something is being re-processed per step).

Each invocation runs in a fresh process (JAX caches aggressively
in-process); drive sweeps from the shell:

  for m in packed packed-nokernel channels; do
      python bench/compile_probe.py $m 100 4096
  done

Prints one JSON line per run.
"""

import json
import os
import sys
import time

MODE = sys.argv[1] if len(sys.argv) > 1 else "packed"
SCAN = int(sys.argv[2]) if len(sys.argv) > 2 else 100
BATCH = int(sys.argv[3]) if len(sys.argv) > 3 else 4096

if MODE.endswith("-nokernel"):
    os.environ["SAFELIFE_TPU_OBS_KERNEL"] = "0"
    MODE = MODE[:-len("-nokernel")]
    KERNEL = False
else:
    KERNEL = True

# No persistent compilation cache: measure a genuine cold compile
# every run (nothing in this probe enables the cache, but pinning the
# env var keeps it cold even if a future refactor shares bench.py's
# enable_compilation_cache() prologue).
os.environ["SAFELIFE_TPU_CACHE_DIR"] = "off"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    # Honor an explicit JAX_PLATFORMS even under site shims that
    # re-register their accelerator backend after clearing the env
    # selection (same workaround as bench.py / __main__._pin_platform).
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    import jax.numpy as jnp

    from safelife_tpu.env import env as E
    from safelife_tpu.env.state import pack_levels
    from safelife_tpu.io.levels import load_levels
    from safelife_tpu.training.env_factory import TRAINING_CHANNELS

    pool = pack_levels(load_levels(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))),
            "safelife_tpu/levels/benchmarks/v1.0/append-still.npz")))
    cfg = E.EnvConfig(
        view_shape=(25, 25),
        output_channels=None if MODE == "packed" else TRAINING_CHANNELS,
        time_limit=1000, goals_may_evolve=False, stochastic=False,
        auto_reset=True)
    state, obs = E.reset(cfg, pool, jax.random.PRNGKey(0), BATCH)

    def run_chunk(carry, key):
        def body(carry, k):
            state, obs = carry
            ka, ke = jax.random.split(k)
            base = jax.random.randint(
                ka, (BATCH, pool.num_agents), 0, 9, jnp.int32)
            checksum = obs.reshape(BATCH, pool.num_agents, -1).sum(
                axis=-1, dtype=jnp.int32)
            actions = (base + checksum) % 9
            state, obs, reward, done, info = E.step_impl(
                cfg, pool, state, actions, ke)
            return (state, obs), reward.sum()
        keys = jax.random.split(key, SCAN)
        carry, rs = jax.lax.scan(body, carry, keys)
        return carry, rs.sum()

    carry = (state, obs)
    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    lowered = jax.jit(run_chunk, donate_argnums=0).lower(carry, key)
    trace_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    carry, _ = compiled(carry, key)
    jax.block_until_ready(carry)
    warmup_s = time.perf_counter() - t0
    print(json.dumps({
        "mode": MODE, "obs_kernel": KERNEL, "scan": SCAN, "batch": BATCH,
        "backend": jax.default_backend(),
        "trace_s": round(trace_s, 1),
        "xla_compile_s": round(compile_s, 1),
        "warmup_s": round(warmup_s, 1),
    }))


if __name__ == "__main__":
    main()
