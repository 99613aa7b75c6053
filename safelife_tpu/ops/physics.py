"""Fused Pallas TPU kernel for the per-step environment physics.

One kernel invocation performs, entirely in VMEM, what the reference
splits across two C kernels plus Python glue (``execute_actions``
``speedups_src/advance_board.c:217-300`` and ``advance_board``
``advance_board.c:12-125``):

1. sequential multi-agent action execution (moves/toggles/pushes/pulls),
2. one cellular-automaton physics step (with optional stochastic
   spawning from the on-core PRNG),
3. readback of each agent's post-advance cell value (consumed by the
   scoring/exit logic downstream).

Boards are processed as flat ``[lanes, H*W]`` tiles so the cell axis
lands on the TPU lane dimension (a ``[B, 26, 26]`` layout would pad 26
lanes to 128, wasting ~80% of VPU throughput and VMEM). The 3x3
neighborhood is built from cyclic lane rolls: vertical neighbors are
clean ±W rolls (toroidal wrap falls out of the cyclic roll over H*W),
horizontal neighbors are ±1 rolls with a column-0/W-1 fixup select.

Per-agent cell reads/writes use one-hot masked reductions over the cell
axis — vector lanes cannot diverge, so this is the natural (and fast)
TPU form of a 4-cell gather/scatter.

Semantics are bit-identical to the XLA formulations in
:mod:`safelife_tpu.core.actions` / :mod:`safelife_tpu.core.advance`
(which are themselves parity-tested against a NumPy port of the C
kernels); `tests/test_pallas.py` checks the equivalence on-device.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import cells as C

#: Lanes (boards) processed per grid step. 256 boards x 676 cells x 4 B
#: is ~0.7 MB per VMEM buffer; the kernel keeps ~6 live -> ~4 MB.
LANE_BLOCK = 256

#: Upper bound on cells per board for the fused kernel (VMEM budget).
MAX_CELLS = 4096


def use_fused_physics(board_shape, batch):
    """Whether the fused kernel handles this configuration.

    **Negative result, kept as a documented appendix** (opt-in via
    ``SAFELIFE_TPU_PALLAS=1``; the production step always uses the
    fused-XLA formulation). Measured on v5e at batch 4096 x 26x26:

    * fused Pallas kernel (this file, cells-on-lanes): ~457 us for the
      physics phase — the cross-lane one-hot reductions for per-agent
      cell access dominate;
    * cells-on-sublanes layouts (two variants, round-1
      ``.scratch/pallas_v2.py``/``pallas_v3.py``, in git history at
      ``7a34a45``): the plain CA advance alone already loses to XLA in
      that layout, so the fused form was not pursued;
    * fused-XLA formulation (``core/advance.py`` + ``core/actions.py``
      under one jit): ~234 us, within ~1.5x of the HBM-bandwidth bound
      for the arrays the step must touch.

    XLA's fusion is already near speed-of-light for this elementwise,
    bandwidth-bound workload; a hand kernel can only win here by fusing
    *more* of the step than XLA does, and XLA fuses all of it. The
    kernels stay bit-exact-tested (``tests/test_pallas.py``, on real
    TPU) as evidence and a base for future large-board work.
    """
    if not os.environ.get("SAFELIFE_TPU_PALLAS"):
        return False
    if jax.default_backend() != "tpu":
        return False
    h, w = board_shape
    if min(h, w) < 4 or h * w > MAX_CELLS:
        return False
    return batch % 8 == 0


def _pick_block(batch):
    lb = LANE_BLOCK
    while batch % lb:
        lb //= 2
    return lb


def _seed_words(seed):
    """Normalize a scalar or 2-vector seed to the (1, 2) SMEM layout."""
    s = jnp.atleast_1d(jnp.asarray(seed, jnp.int32)).reshape(-1)
    if s.shape[0] == 1:
        s = jnp.concatenate([s, jnp.zeros((1,), jnp.int32)])
    return s.reshape(1, 2)


def _roll(v, shift):
    """Cyclic roll along the cell axis; out[i] = in[(i - shift) mod n].

    ``pltpu.roll`` only accepts non-negative shifts, so negative shifts
    are normalized mod the axis length.
    """
    n = v.shape[1]
    return pltpu.roll(v, shift % n, axis=1)


def _west(v, w, colx):
    """Value of the (y, x-1 mod w) neighbor, flat layout."""
    return jnp.where(colx == 0, _roll(v, -(w - 1)), _roll(v, 1))


def _east(v, w, colx):
    return jnp.where(colx == w - 1, _roll(v, w - 1), _roll(v, -1))


def _nb_sum(v, w, colx):
    """3x3 neighborhood sum (self included), toroidal."""
    r = v + _west(v, w, colx) + _east(v, w, colx)
    return r + _roll(r, w) + _roll(r, -w)


def _nb_or(v, w, colx):
    r = v | _west(v, w, colx) | _east(v, w, colx)
    return r | _roll(r, w) | _roll(r, -w)


def _advance_block(b, w, colx, spawn_lt):
    """One CA step on a [LB, H*W] block. Mirrors core.advance exactly."""
    m = b | ((b & C.DESTRUCTIBLE) << 5)
    alive = m & 1
    packed = (
        alive
        | (((m >> 8) & alive) << 5)
        | (((m >> 9) & alive) << 10)
        | (((m >> 10) & alive) << 15)
        | (((m >> 11) & alive) << 20)
    )
    s = _nb_sum(packed, w, colx)
    count = s & 31
    cnt_d2 = (s >> 5) & 31
    cnt_r = (s >> 10) & 31
    cnt_g = (s >> 15) & 31
    cnt_b = (s >> 20) & 31

    spawner = (m >> C.SPAWNING_BIT) & 1
    orv = (m & (C.PRESERVING | C.INHIBITING | C.SPAWNING)) | \
        ((m & C.COLORS) * spawner)
    orred = _nb_or(orv, w, colx)
    spawn_colors = orred & C.COLORS

    cons_colors = (
        jnp.where(cnt_r >= 2, C.COLOR_R, 0)
        | jnp.where(cnt_g >= 2, C.COLOR_G, 0)
        | jnp.where(cnt_b >= 2, C.COLOR_B, 0)
        | spawn_colors
    )
    cons_destr = jnp.where(cnt_d2 >= 2, C.DESTRUCTIBLE, 0)

    is_alive = (b & C.ALIVE) != 0
    frozen = (b & C.FROZEN) != 0
    preserved = (orred & C.PRESERVING) != 0
    inhibited = (orred & C.INHIBITING) != 0
    spawn_nbr = (orred & C.SPAWNING) != 0

    survives = frozen | preserved | (count == 3) | (count == 4)
    live_out = jnp.where(survives, b, 0)

    newborn = C.ALIVE | cons_colors | cons_destr
    spawned = C.ALIVE | C.DESTRUCTIBLE | cons_colors
    dead_out = jnp.where(
        frozen | inhibited, b,
        jnp.where(count == 3, newborn,
                  jnp.where(spawn_nbr & spawn_lt, spawned, b)))
    return jnp.where(is_alive, live_out, dead_out)


def _actions_block(b, locs, acts, f, h, w, n_agents):
    """Sequential agent actions on a [LB, H*W] block.

    Port of ``core.actions._execute_one_fast`` with [LB, 1] per-agent
    columns; valid because min(h, w) >= 4 keeps the four touched cells
    distinct. Returns (board, new_ys [LB, A], new_xs [LB, A]).
    """
    out_ys, out_xs = [], []
    for k in range(n_agents):
        act = acts[:, k:k + 1]
        y0 = locs[:, k, 0:1] % h
        x0 = locs[:, k, 1:2] % w
        dirn = (act - 1) & 3
        odd = (dirn & 1) == 1
        dx = jnp.where(odd, 2 - dirn, 0)
        dy = jnp.where(odd, 0, dirn - 1)
        i0 = y0 * w + x0
        i1 = ((y0 + dy) % h) * w + (x0 + dx) % w
        i2 = ((y0 + 2 * dy) % h) * w + (x0 + 2 * dx) % w
        i3 = ((y0 - dy) % h) * w + (x0 - dx) % w
        m0 = f == i0
        m1 = f == i1
        m2 = f == i2
        m3 = f == i3
        v0 = jnp.sum(jnp.where(m0, b, 0), axis=1, keepdims=True)
        v1 = jnp.sum(jnp.where(m1, b, 0), axis=1, keepdims=True)
        v2 = jnp.sum(jnp.where(m2, b, 0), axis=1, keepdims=True)
        v3 = jnp.sum(jnp.where(m3, b, 0), axis=1, keepdims=True)

        active = (act != 0) & ((v0 & C.AGENT) != 0)
        v0o = jnp.where(
            active,
            (v0 & ~C.ORIENTATION_MASK) | (dirn << C.ORIENTATION_BIT), v0)
        is_toggle = act >= 5

        # ---- toggle branch ----
        t_create = v1 == 0
        t_destr = ~t_create & ((v1 & C.DESTRUCTIBLE) != 0)
        t_destr_agent = t_destr & ((v1 & C.AGENT) != 0)
        t_shove = ~t_create & ~t_destr & ((~v0o & v1 & C.PUSHABLE) != 0)
        shove_empty = t_shove & (v2 == 0)
        shove_exit = t_shove & (v2 != 0) & ((v2 & C.EXIT) != 0)
        tog_v1 = jnp.where(
            t_create, C.ALIVE | C.DESTRUCTIBLE | (v0o & C.COLORS),
            jnp.where(t_destr_agent,
                      (v1 ^ (C.AGENT | C.DESTRUCTIBLE)) | C.FROZEN,
                      jnp.where(t_destr, 0,
                                jnp.where(shove_empty | shove_exit, 0, v1))))
        tog_v2 = jnp.where(shove_empty, v1, v2)

        # ---- move branch ----
        m_push = (~v0o & v1 & C.PUSHABLE) != 0
        m_push_empty = m_push & (v2 == 0)
        m_push_exit = m_push & (v2 != 0) & ((v2 & C.EXIT) != 0)
        m_empty = ~m_push & (v1 == 0)
        m_exit = ~m_push & ~m_empty & ((v0o & v1 & C.EXIT) != 0) & \
            ((v1 & C.AGENT) == 0)
        do_move = m_push_empty | m_push_exit | m_empty
        do_reloc = do_move | m_exit
        pull = do_reloc & ((~v0o & v3 & C.PULLABLE) != 0)
        mov_v0 = jnp.where(do_reloc, jnp.where(pull, v3, 0), v0o)
        mov_v1 = jnp.where(do_move, v0o, v1)
        mov_v2 = jnp.where(m_push_empty, v1, v2)
        mov_v3 = jnp.where(pull, 0, v3)

        n0 = jnp.where(is_toggle, v0o, mov_v0)
        n1 = jnp.where(is_toggle, tog_v1, mov_v1)
        n2 = jnp.where(is_toggle, tog_v2, mov_v2)
        n3 = jnp.where(is_toggle, v3, mov_v3)
        n0 = jnp.where(active, n0, v0)
        n1 = jnp.where(active, n1, v1)
        n2 = jnp.where(active, n2, v2)
        n3 = jnp.where(active, n3, v3)
        b = jnp.where(m0, n0,
                      jnp.where(m1, n1,
                                jnp.where(m2, n2,
                                          jnp.where(m3, n3, b))))

        relocated = active & ~is_toggle & do_reloc
        out_ys.append(jnp.where(relocated, (y0 + dy) % h, locs[:, k, 0:1]))
        out_xs.append(jnp.where(relocated, (x0 + dx) % w, locs[:, k, 1:2]))
    return b, out_ys, out_xs


def _physics_kernel(board_ref, locs_ref, act_ref, sprob_ref, seed_ref,
                    out_board_ref, out_locs_ref, out_cells_ref,
                    *, h, w, n_agents, stochastic):
    hw = h * w
    lb = board_ref.shape[0]
    b = board_ref[:]
    f = jax.lax.broadcasted_iota(jnp.int32, (lb, hw), 1)
    colx = f % w

    locs = locs_ref[:]
    acts = act_ref[:]
    b, out_ys, out_xs = _actions_block(b, locs, acts, f, h, w, n_agents)

    if stochastic:
        # Two seed words keep the per-step stream unique over long runs
        # (a single 31-bit word birthday-collides within ~1e5 steps).
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0), seed_ref[0, 1])
        bits = pltpu.prng_random_bits((lb, hw))
        # bits may arrive as signed int32; take the top 24 bits unsigned.
        u = ((bits >> 8) & 0xFFFFFF).astype(jnp.float32) * (1.0 / (1 << 24))
        spawn_lt = u < sprob_ref[:]
    else:
        spawn_lt = jnp.zeros((lb, hw), bool)
    nb = _advance_block(b, w, colx, spawn_lt)
    out_board_ref[:] = nb

    for k in range(n_agents):
        idx = out_ys[k] * w + out_xs[k]
        cell = jnp.sum(jnp.where(f == idx, nb, 0), axis=1, keepdims=True)
        out_cells_ref[:, k:k + 1] = cell
        out_locs_ref[:, k, 0:1] = out_ys[k]
        out_locs_ref[:, k, 1:2] = out_xs[k]


def fused_actions_advance(board, agent_locs, actions, spawn_prob, seed,
                          *, h, w, stochastic):
    """Fused actions + CA advance + agent-cell readback over a batch.

    Parameters
    ----------
    board : int32[B, H*W] (flat; caller reshapes — free under fusion)
    agent_locs : int32[B, A, 2]
    actions : int32[B, A] (masked actions; padded agents must be 0)
    spawn_prob : float32[B] (ignored unless stochastic)
    seed : int32[2] seed words for the on-core PRNG (two words so the
        per-step spawn-noise stream stays unique over long runs)
    """
    bsz, hw = board.shape
    a = agent_locs.shape[1]
    lb = _pick_block(bsz)
    grid = bsz // lb
    kernel = functools.partial(
        _physics_kernel, h=h, w=w, n_agents=a, stochastic=stochastic)
    out_board, out_locs, out_cells = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((lb, hw), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, a, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, a), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((lb, hw), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, a, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, a), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, hw), jnp.int32),
            jax.ShapeDtypeStruct((bsz, a, 2), jnp.int32),
            jax.ShapeDtypeStruct((bsz, a), jnp.int32),
        ],
    )(
        board.astype(jnp.int32),
        agent_locs.astype(jnp.int32),
        actions.astype(jnp.int32),
        spawn_prob.reshape(bsz, 1).astype(jnp.float32),
        _seed_words(seed),
    )
    return out_board, out_locs, out_cells


def _advance_kernel(board_ref, sprob_ref, seed_ref, out_ref,
                    *, h, w, stochastic):
    hw = h * w
    lb = board_ref.shape[0]
    b = board_ref[:]
    f = jax.lax.broadcasted_iota(jnp.int32, (lb, hw), 1)
    colx = f % w
    if stochastic:
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0), seed_ref[0, 1])
        bits = pltpu.prng_random_bits((lb, hw))
        # bits may arrive as signed int32; take the top 24 bits unsigned.
        u = ((bits >> 8) & 0xFFFFFF).astype(jnp.float32) * (1.0 / (1 << 24))
        spawn_lt = u < sprob_ref[:]
    else:
        spawn_lt = jnp.zeros((lb, hw), bool)
    out_ref[:] = _advance_block(b, w, colx, spawn_lt)


def advance_pallas(board, spawn_prob, seed, *, h, w, stochastic):
    """Plain batched CA advance (no agents) — used for evolving goals."""
    bsz, hw = board.shape
    lb = _pick_block(bsz)
    kernel = functools.partial(_advance_kernel, h=h, w=w,
                               stochastic=stochastic)
    return pl.pallas_call(
        kernel,
        grid=(bsz // lb,),
        in_specs=[
            pl.BlockSpec((lb, hw), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((lb, hw), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, hw), jnp.int32),
    )(
        board.astype(jnp.int32),
        spawn_prob.reshape(bsz, 1).astype(jnp.float32),
        _seed_words(seed),
    )
