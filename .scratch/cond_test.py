"""Isolate lax.cond pass-through overhead at bench shapes."""
import time

import jax
import jax.numpy as jnp

B = 4096
STEPS = 100

state = {
    "board": jnp.zeros((B, 26, 26), jnp.int32),
    "goals": jnp.zeros((B, 26, 26), jnp.int32),
    "exit_mask": jnp.zeros((B, 26, 26), bool),
    "small": jnp.zeros((B, 8), jnp.float32),
}


def timeit(name, fn):
    f = jax.jit(fn, donate_argnums=0)
    s = f(jax.tree.map(jnp.copy, state), jax.random.PRNGKey(0))
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    for i in range(5):
        s = f(s, jax.random.PRNGKey(i))
    jax.block_until_ready(s)
    print("%-36s %8.1f us/step"
          % (name, (time.perf_counter() - t0) / 5 / STEPS * 1e6))


def work(s, k):
    # stand-in for the step: a couple of fused passes
    return jax.tree.map(lambda x: (x ^ 1) if x.dtype == jnp.int32 else x, s)


def no_cond(s0, key):
    def body(s, k):
        return work(s, k), None
    s, _ = jax.lax.scan(body, s0, jax.random.split(key, STEPS))
    return s


def with_cond(s0, key):
    def body(s, k):
        s = work(s, k)
        pred = s["small"].sum() > 1e30  # always false
        s = jax.lax.cond(
            pred,
            lambda st: jax.tree.map(lambda x: x + 0 if x.dtype != bool else x,
                                    st),
            lambda st: st, s)
        return s, None
    s, _ = jax.lax.scan(body, s0, jax.random.split(key, STEPS))
    return s


def with_cond_heavy_true(s0, key):
    def body(s, k):
        s = work(s, k)
        pred = s["small"].sum() > 1e30  # always false
        def true_fn(st):
            # gather-style fresh build + merge, like the reset branch
            idx = jnp.zeros((B,), jnp.int32)
            fresh = jax.tree.map(lambda x: jnp.take(x, idx, axis=0), st)
            return jax.tree.map(lambda a, f: jnp.where(
                jnp.zeros((B,) + (1,) * (a.ndim - 1), bool), f, a), st, fresh)
        s = jax.lax.cond(pred, true_fn, lambda st: st, s)
        return s, None
    s, _ = jax.lax.scan(body, s0, jax.random.split(key, STEPS))
    return s


timeit("scan, no cond", no_cond)
timeit("scan + cond(identity vs light)", with_cond)
timeit("scan + cond(identity vs heavy)", with_cond_heavy_true)
