"""Microbenchmarks for the hot kernels. Prints one JSON line per metric.

Usage: PYTHONPATH must reach the repo and /root/.axon_site on the TPU host:

    python bench/bench_kernels.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

BATCH = 4096
STEPS = 100


def timeit_scan(fn, carry, steps=STEPS, reps=5):
    import jax
    import jax.numpy as jnp

    def run(c, key):
        def body(c, k):
            return fn(c, k), None
        c, _ = jax.lax.scan(body, c, jax.random.split(key, steps))
        # A scalar checksum the host fetches: through a tunneled device,
        # block_until_ready can return before execution finishes; a real
        # data fetch cannot.
        chk = sum(jnp.sum(x).astype(jnp.float32)
                  for x in jax.tree.leaves(c))
        return c, chk

    f = jax.jit(run, donate_argnums=0)
    c, chk = f(jax.tree.map(lambda x: x + 0, carry), jax.random.PRNGKey(0))
    float(chk)
    t0 = time.perf_counter()
    for i in range(reps):
        c, chk = f(c, jax.random.PRNGKey(1 + i))
    float(chk)  # forces completion of the whole donated chain
    return (time.perf_counter() - t0) / reps / steps


def emit(name, seconds, unit="us"):
    print(json.dumps({
        "metric": name,
        "value": round(seconds * 1e6, 1),
        "unit": "us/batch-step",
        "batch": BATCH,
    }))


def main():
    import jax
    import jax.numpy as jnp

    from safelife_tpu.core import actions as AC, advance, cells as C, \
        scoring
    from safelife_tpu.env import env as E
    from safelife_tpu.env.state import pack_levels
    from safelife_tpu.io.levels import LEVEL_DIRECTORY, load_levels

    pool = pack_levels(load_levels(os.path.join(
        LEVEL_DIRECTORY, "benchmarks/v1.0/append-still.npz")))
    cfg = E.EnvConfig(view_shape=(25, 25), output_channels=None,
                      time_limit=1000, goals_may_evolve=False,
                      stochastic=False, auto_reset=True)
    state, _ = E.reset(cfg, pool, jax.random.PRNGKey(0), BATCH)

    emit("advance_deterministic", timeit_scan(
        lambda b, k: advance.advance_board_deterministic(b), state.board))
    emit("advance_stochastic", timeit_scan(
        lambda b, k: advance.advance_board(b, k, 0.3), state.board))

    locs = state.agent_locs

    def acts(carry, k):
        b, l = carry
        a = jax.random.randint(k, (BATCH, pool.num_agents), 0, 9, jnp.int32)
        return jax.vmap(AC.execute_actions)(b, l, a)

    emit("execute_actions", timeit_scan(acts, (state.board, locs)))

    emit("points_base_packed", timeit_scan(
        lambda b, k: b + 0 * scoring.points_base_packed(
            b, jnp.take(pool.row_w0, state.level_idx, axis=0),
            jnp.take(pool.row_w8, state.level_idx, axis=0)
        ).sum().astype(b.dtype), state.board))

    def full(st, k):
        ka, ke = jax.random.split(k)
        a = jax.random.randint(ka, (BATCH, pool.num_agents), 0, 9, jnp.int32)
        st, obs, r, d, info = E.step_impl(cfg, pool, st, a, ke)
        return st

    emit("full_env_step", timeit_scan(full, state))

    if os.environ.get("SAFELIFE_TPU_PALLAS"):
        from safelife_tpu import ops

        b, h, w = state.board.shape

        def pallas_phys(carry, k):
            bd, l = carry
            a = jax.random.randint(k, (BATCH, pool.num_agents), 0, 9,
                                   jnp.int32)
            nb, nl, cells = ops.fused_actions_advance(
                bd.reshape(BATCH, h * w), l, a,
                jnp.full((BATCH,), 0.3, jnp.float32), 0,
                h=h, w=w, stochastic=False)
            return nb.reshape(BATCH, h, w), nl

        emit("pallas_fused_physics", timeit_scan(
            pallas_phys, (state.board, locs)))


if __name__ == "__main__":
    main()
