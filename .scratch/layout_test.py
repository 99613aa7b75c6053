import time
import jax, jax.numpy as jnp

B, H, W = 4096, 26, 26

def timeit(name, fn, x):
    f = jax.jit(fn)
    y = f(x); jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(20):
        y = f(y)
    jax.block_until_ready(y)
    dt = (time.perf_counter() - t0) / 20
    print("%-32s %8.1f us" % (name, dt * 1e6))

def heavy(x):
    # 20 chained elementwise passes
    for _ in range(20):
        x = (x ^ (x >> 3)) + 1
    return x

x1 = jnp.zeros((B, H, W), jnp.int32)
x2 = jnp.zeros((H, W, B), jnp.int32)
x3 = jnp.zeros((B, H * W), jnp.int32)
timeit("elementwise [B,26,26]", heavy, x1)
timeit("elementwise [26,26,B]", heavy, x2)
timeit("elementwise [B,676]", heavy, x3)

def nbsum(axes):
    def f(x):
        for _ in range(5):
            r = x + jnp.roll(x, 1, axes[1]) + jnp.roll(x, -1, axes[1])
            x = r + jnp.roll(r, 1, axes[0]) + jnp.roll(r, -1, axes[0])
        return x
    return f
timeit("5x nbsum [B,26,26]", nbsum((-2, -1)), x1)
timeit("5x nbsum [26,26,B]", nbsum((0, 1)), x2)
