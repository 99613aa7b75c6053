"""Prototype: advance kernel with cells on sublanes, lanes on lane axis."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys
sys.path.insert(0, "/root/repo")
from safelife_tpu.core import cells as C
from safelife_tpu.core import advance as ADV

H = W = 26
HW = H * W
B = 4096
LB = 512


def _rollsub(v, shift):
    return pltpu.roll(v, shift % v.shape[0], axis=0)


def _advance_kernel_t(board_ref, out_ref, *, h, w):
    hw = h * w
    b = board_ref[:]
    rowy = jax.lax.broadcasted_iota(jnp.int32, (hw, b.shape[1]), 0)
    colx = rowy % w

    def west(v):
        return jnp.where(colx == 0, _rollsub(v, -(w - 1)), _rollsub(v, 1))

    def east(v):
        return jnp.where(colx == w - 1, _rollsub(v, w - 1), _rollsub(v, -1))

    def nb_sum(v):
        r = v + west(v) + east(v)
        return r + _rollsub(r, w) + _rollsub(r, -w)

    def nb_or(v):
        r = v | west(v) | east(v)
        return r | _rollsub(r, w) | _rollsub(r, -w)

    m = b | ((b & C.DESTRUCTIBLE) << 5)
    alive = m & 1
    packed = (alive | (((m >> 8) & alive) << 5) | (((m >> 9) & alive) << 10)
              | (((m >> 10) & alive) << 15) | (((m >> 11) & alive) << 20))
    s = nb_sum(packed)
    count = s & 31
    cnt_d2 = (s >> 5) & 31
    cnt_r = (s >> 10) & 31
    cnt_g = (s >> 15) & 31
    cnt_b = (s >> 20) & 31
    spawner = (m >> C.SPAWNING_BIT) & 1
    orv = (m & (C.PRESERVING | C.INHIBITING | C.SPAWNING)) | \
        ((m & C.COLORS) * spawner)
    orred = nb_or(orv)
    spawn_colors = orred & C.COLORS
    cons_colors = (jnp.where(cnt_r >= 2, C.COLOR_R, 0)
                   | jnp.where(cnt_g >= 2, C.COLOR_G, 0)
                   | jnp.where(cnt_b >= 2, C.COLOR_B, 0) | spawn_colors)
    cons_destr = jnp.where(cnt_d2 >= 2, C.DESTRUCTIBLE, 0)
    is_alive = (b & C.ALIVE) != 0
    frozen = (b & C.FROZEN) != 0
    preserved = (orred & C.PRESERVING) != 0
    inhibited = (orred & C.INHIBITING) != 0
    survives = frozen | preserved | (count == 3) | (count == 4)
    live_out = jnp.where(survives, b, 0)
    newborn = C.ALIVE | cons_colors | cons_destr
    dead_out = jnp.where(frozen | inhibited, b,
                         jnp.where(count == 3, newborn, b))
    out_ref[:] = jnp.where(is_alive, live_out, dead_out)


def advance_t(board_t, h, w):
    hw, bsz = board_t.shape
    kernel = functools.partial(_advance_kernel_t, h=h, w=w)
    return pl.pallas_call(
        kernel,
        grid=(bsz // LB,),
        in_specs=[pl.BlockSpec((hw, LB), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((hw, LB), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hw, bsz), jnp.int32),
    )(board_t)


rng = np.random.default_rng(0)
board = ((rng.random((B, H, W)) < 0.2) * (C.ALIVE | C.DESTRUCTIBLE)
         ).astype(np.int32)
board |= ((rng.random((B, H, W)) < 0.1) * C.FROZEN).astype(np.int32)
bj = jnp.asarray(board)
bt = jnp.asarray(board.reshape(B, HW).T.copy())

ref = np.asarray(ADV.advance_board_deterministic(bj))
out = np.asarray(jax.jit(lambda x: advance_t(x, H, W))(bt))
print("correct:", (out.T.reshape(B, H, W) == ref).all())


def timeit(name, fn, x):
    f = jax.jit(fn)
    STEPS = 200

    def run(x):
        def body(c, _):
            return f(c), None
        c, _ = jax.lax.scan(body, x, None, length=STEPS)
        return c
    r = jax.jit(run)
    y = r(x)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(5):
        y = r(y)
    jax.block_until_ready(y)
    print("%-34s %8.1f us/step" % (name, (time.perf_counter()-t0)/5/STEPS*1e6))


timeit("pallas sublane advance [676,B]", lambda x: advance_t(x, H, W), bt)
timeit("xla advance [B,26,26]", ADV.advance_board_deterministic, bj)
timeit("transpose-roundtrip only",
       lambda x: jnp.swapaxes(x.reshape(B, HW), 0, 1).swapaxes(0, 1)
       .reshape(B, H, W) + 1, bj)
