"""Device-batched pattern annealing: N regions annealed in lockstep.

The host annealers (``native/annealer.cpp``, ``pattern.py``) run one
region at a time at ~10 levels/s per worker — fine for trickle pool
refreshes, but the lockstep env finishes on the order of a thousand
episodes per second, so per-episode-fresh levels need level *generation*
at device scale too. This module is the TPU-native equivalent SURVEY
§2.3 calls for ("annealing as a masked parallel Metropolis kernel"):
one jitted ``lax.while_loop`` advances N independent annealing chains —
one per region — in lockstep, with every per-iteration quantity
(violation maps, candidate deltas, Boltzmann sampling) computed as
batched whole-board tensor ops.

Algorithm parity (distribution, not draw-stream) with the C++ annealer
(reference semantics: ``speedups_src/gen_board.c:316-510``):

* violation = cycle-closure failure of the simple Life rule (self-
  inclusive 3x3 count; survive on {3, 4}, birth on 3; frozen inert),
  plus non-oscillatable oscillation;
* cell sampling prefers violating cells, then a shrinking seed set,
  then any writable cell;
* each iteration Boltzmann-picks among the 3 alternative palette types
  (empty / wall / life / tree) for every writable cell in the
  (2·period+1)² neighborhood, scored by violation delta, oscillation
  bonus, and density penalties;
* termination when no (tracked) violations remain and the fill floor is
  met, failure when a per-lane ``max_iter·area·period`` budget expires.

A deliberate simplification the C++ cannot afford: violations depend
only on the *alive* and *frozen* bit planes, and the alive planes of
layers 1..p-1 are a pure function of layer 0 (frozen bits never change,
colors never feed back) — so the device chain carries layer 0 only and
recomputes the stack per iteration as cheap batched convolutions,
instead of maintaining an incrementally evolved stack with light-cone
bookkeeping.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import cells as C

NEW_CELL_MASK = 1
CAN_OSCILLATE_MASK = 2
INCLUDE_VIOLATIONS_MASK = 4

#: Palette, indexed by ``alive·2 + frozen``: empty, wall, life, tree.
CELL_TYPES = (0, C.FROZEN, C.ALIVE | C.DESTRUCTIBLE, C.FROZEN | C.ALIVE)

_NEG = -1e30  # -inf stand-in that survives arithmetic


def _count3x3(a):
    """Self-inclusive wrapped 3x3 count of ``a`` (int32 [..., H, W])."""
    r = a + jnp.roll(a, 1, -2) + jnp.roll(a, -1, -2)
    return r + jnp.roll(r, 1, -1) + jnp.roll(r, -1, -1)


def _alive_planes(alive0, frozen0, period):
    """Alive planes of the layer stack (period entries, layer 0 first)."""
    planes = [alive0]
    for _ in range(period - 1):
        prev = planes[-1]
        n = _count3x3(prev.astype(jnp.int32))
        nxt = jnp.where(frozen0, prev,
                        jnp.where(prev, (n == 3) | (n == 4), n == 3))
        planes.append(nxt)
    return planes


def _violations(board0, can_osc, period):
    """Per-cell violation counts (int32 [..., H, W]).

    Parity: ``annealer.cpp::cellViolations`` — advance of the last layer
    must reproduce the first; frozen cells are inert; oscillation where
    the mask forbids it adds one.
    """
    alive0 = (board0 & C.ALIVE) > 0
    frozen0 = (board0 & C.FROZEN) > 0
    planes = _alive_planes(alive0, frozen0, period)
    last = planes[-1]
    n = _count3x3(last.astype(jnp.int32))
    predicted = jnp.where(last, (n == 3) | (n == 4), n == 3)
    v = (predicted ^ alive0).astype(jnp.int32)
    if period > 1:
        stack = jnp.stack(planes)
        osc = stack.any(0) & (~stack).any(0)
        v = v + (osc & ~can_osc).astype(jnp.int32)
    return jnp.where(frozen0, 0, v)


def _palette_index(cell):
    return ((cell & C.ALIVE) > 0) * 2 + ((cell & C.FROZEN) > 0)


def _window_still_violations(win):
    """Still-life violations over the interior (1..5)² of a 7x7 window.

    The window is a verbatim (rolled) copy of the board, so every
    interior cell's 3x3 neighborhood lies inside it and the result is
    bit-identical to the full-board :func:`_violations` at those cells.
    Returns int32 [5, 5].
    """
    alive = ((win & C.ALIVE) > 0).astype(jnp.int32)
    frozen = (win & C.FROZEN) > 0
    r = alive[:-2] + alive[1:-1] + alive[2:]           # [5, 7]
    n = r[:, :-2] + r[:, 1:-1] + r[:, 2:]              # [5, 5]
    a = alive[1:-1, 1:-1].astype(bool)
    predicted = jnp.where(a, (n == 3) | (n == 4), n == 3)
    v = (predicted ^ a).astype(jnp.int32)
    return jnp.where(frozen[1:-1, 1:-1], 0, v)


def _lane_candidates(board0, can_osc, r0, c0, period):
    """Violation/oscillation deltas for every candidate move of one lane.

    Candidates are the 4 palette types at each cell of the
    (2·period+1)² neighborhood of (r0, c0); the caller masks out the
    cell's current type and non-writable cells. Returns
    (flat_cell_index [P], dv [P, 4], dosc [P, 4]) with P = (2p+1)².

    For still lifes (period 1) on boards of at least 7x7, the change's
    light cone is the 5x5 block around the mutated cell, so deltas come
    from a 7x7 window around (r0, c0) — ~20x less work per iteration
    than the full-board recompute used for oscillators.
    """
    h, w = board0.shape
    offs = np.arange(-period, period + 1)
    dy, dx = np.meshgrid(offs, offs, indexing="ij")
    rr = (r0 + dy.ravel()) % h                       # [P]
    cc = (c0 + dx.ravel()) % w
    pos = rr * w + cc

    types = jnp.asarray(CELL_TYPES, jnp.int32)

    if period == 1 and h >= 7 and w >= 7:
        # Roll (r0, c0) to the window center (3, 3); candidate cells sit
        # at (2+i, 2+j), their light cones within interior (1..5)².
        win = jnp.roll(board0, (3 - r0, 3 - c0), (-2, -1))[:7, :7]
        base = _window_still_violations(win).sum()

        def one(i, j, t):
            w2 = win.at[2 + i, 2 + j].set(t)
            return (_window_still_violations(w2).sum()
                    - base).astype(jnp.float32)

        ii, jj = np.meshgrid([0, 1, 2], [0, 1, 2], indexing="ij")
        dv = jax.vmap(
            lambda i, j: jax.vmap(lambda t: one(i, j, t))(types)
        )(jnp.asarray(ii.ravel()), jnp.asarray(jj.ravel()))    # [9, 4]
        return pos, dv, jnp.zeros_like(dv)

    base_v = _violations(board0, can_osc, period)
    base_osc = _osc_count(board0, period)

    def one(p_idx, t):
        b = board0.reshape(-1).at[p_idx].set(t).reshape(h, w)
        dv = (_violations(b, can_osc, period).sum()
              - base_v.sum()).astype(jnp.float32)
        if period == 1:
            do = jnp.float32(0.0)
        else:
            do = (_osc_count(b, period) - base_osc).astype(jnp.float32)
        return dv, do

    # vmap over positions x types; full-board recompute per candidate is
    # the general formulation (oscillator light cones span the stack).
    dv, do = jax.vmap(lambda p: jax.vmap(lambda t: one(p, t))(types))(pos)
    return pos, dv, do


def _osc_count(board0, period):
    if period == 1:
        return jnp.int32(0)
    alive0 = (board0 & C.ALIVE) > 0
    frozen0 = (board0 & C.FROZEN) > 0
    stack = jnp.stack(_alive_planes(alive0, frozen0, period))
    return (stack.any(0) & (~stack).any(0)).sum().astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("period",))
def anneal_batch(board0, mask, seeds, min_fill, max_iter, temperature,
                 osc_bonus, penalties, key, *, period=1):
    """Anneal N regions in lockstep on device.

    Parameters
    ----------
    board0 : int32 [N, H, W] — working boards (layer 0; annealed in place).
    mask : int32 [N, H, W] — per-cell permission flags (NEW_CELL /
        CAN_OSCILLATE / INCLUDE_VIOLATIONS).
    seeds : bool [N, H, W] — initial seed set (each seed sampled at most
        once across the chain).
    min_fill, max_iter, temperature, osc_bonus : float32 [N] — relative
        fill floor, relative iteration budget, Boltzmann temperature,
        oscillation bonus.
    penalties : float32 [N, 8] — (base, at-full-density) pairs for
        empty/wall/life/tree; the empty pair is ignored (the fill-
        progress penalty is built in).
    key : PRNG key.
    period : static int — oscillation period (1 = still life).

    Returns
    -------
    (board0, ok, fill): annealed boards, per-lane success, per-lane
    fill fraction over the writable area. Lanes with zero writable area
    return unchanged with ok=False.
    """
    n, h, w = board0.shape
    board0 = board0.astype(jnp.int32)
    newcell = (mask & NEW_CELL_MASK) > 0
    inclv = (mask & INCLUDE_VIOLATIONS_MASK) > 0
    can_osc = (mask & CAN_OSCILLATE_MASK) > 0

    area = newcell.sum((-2, -1)).astype(jnp.float32)          # [N]
    min_fill_abs = min_fill * area
    budget = (max_iter * area * period).astype(jnp.int32)     # [N]
    beta = 1.0 / temperature

    types = jnp.asarray(CELL_TYPES, jnp.int32)

    def lane_step(board, seed_rem, k, beta_l, ob, pens, mfa, co, nc, iv):
        """One annealing iteration for one lane. Returns the updated
        (board, seed_rem, converged)."""
        v = _violations(board, co, period)
        bad = (v > 0) & iv
        pal = _palette_index(board)
        totals = jnp.stack([((pal == j) & nc).sum() for j in range(4)])
        not_empty = (totals[1] + totals[2] + totals[3]).astype(jnp.float32)
        converged = ~bad.any() & (not_empty >= mfa)

        ku, kc = jax.random.split(k)
        # Uniform pick from the highest-priority non-empty set: argmax of
        # iid uniforms over the set is a uniform draw from it.
        sel = jnp.where(bad.any(), bad,
                        jnp.where(seed_rem.any(), seed_rem, nc))
        u = jax.random.uniform(ku, (h, w))
        k0 = jnp.argmax(jnp.where(sel, u, -1.0))
        r0, c0 = k0 // w, k0 % w
        seed_rem = seed_rem & ~(jnp.arange(h * w).reshape(h, w) == k0)

        # Density penalties for this iteration.
        t0 = jnp.where(mfa > 0, not_empty / jnp.maximum(mfa, 1e-9),
                       jnp.float32(2.0))
        pen0 = jnp.where(t0 < 0.9, 2.0,
                         jnp.where(t0 < 1.0, 20.0 * (1.0 - t0), 0.0))
        tj = totals[1:].astype(jnp.float32) / (not_empty + 1.0)
        penj = pens[2::2] + tj * (pens[3::2] - pens[2::2])
        pen = jnp.concatenate([pen0[None], penj])              # [4]

        pos, dv, do = _lane_candidates(board, co, r0, c0, period)
        cur_pal = _palette_index(board.reshape(-1)[pos])       # [P]
        writable = nc.reshape(-1)[pos]                         # [P]
        pal_of_type = _palette_index(types)                    # [4]
        lp = -beta_l * (dv - ob * do + pen[pal_of_type][None, :])
        lp = jnp.where(writable[:, None], lp, _NEG)
        lp = jnp.where(cur_pal[:, None] == pal_of_type[None, :], _NEG, lp)

        flat_lp = lp.reshape(-1)
        g = -jnp.log(-jnp.log(
            jax.random.uniform(kc, flat_lp.shape, minval=1e-20, maxval=1.0)))
        pick = jnp.argmax(flat_lp + g)
        has_cand = flat_lp.max() > _NEG / 2
        cell = types[pick % 4]
        target = pos[pick // 4]
        new_board = board.reshape(-1).at[target].set(cell).reshape(h, w)

        do_move = ~converged & has_cand
        board = jnp.where(do_move, new_board, board)
        return board, seed_rem, converged

    def cond(state):
        board, seed_rem, done, it, k = state
        return jnp.any(~done & (it < budget))

    def body(state):
        board, seed_rem, done, it, k = state
        k, sub = jax.random.split(k)
        lane_keys = jax.random.split(sub, n)
        active = ~done & (it < budget)
        nb, nsr, conv = jax.vmap(lane_step)(
            board, seed_rem, lane_keys, beta, osc_bonus,
            penalties, min_fill_abs, can_osc, newcell, inclv)
        sel = active.reshape(n, 1, 1)
        board = jnp.where(sel, nb, board)
        seed_rem = jnp.where(sel, nsr, seed_rem)
        done = done | (active & conv)
        return board, seed_rem, done, it + 1, k

    done0 = jnp.zeros((n,), bool)
    state = (board0, seeds.astype(bool), done0, jnp.int32(0), key)
    board0, _, done, _, _ = jax.lax.while_loop(cond, body, state)

    ok = done & (area > 0)
    filled = ((board0 != 0) & newcell).sum((-2, -1)).astype(jnp.float32)
    fill = filled / jnp.maximum(area, 1.0)
    return board0, ok, fill


def anneal_with_retries_batched(board0, mask, seeds, params, key,
                                attempts=10):
    """Batched analog of the host retry ladder (``generate.py:91-120``):
    non-convergence lowers ``min_fill`` by 6% per attempt, an overfull
    result raises ``max_fill`` by 7%; lanes that exhaust the ladder (or
    have no writable area) return unchanged.

    ``params`` is a dict of per-lane float32 [N] arrays: min_fill,
    max_fill, max_iter, temperature, osc_bonus, plus penalties [N, 8]
    and the static int ``period``.

    Returns (boards [N, H, W], resolved_ok [N]).
    """
    n = board0.shape[0]
    period = int(params.get("period", 1))
    min_fill = jnp.asarray(params["min_fill"], jnp.float32)
    max_fill = jnp.asarray(params["max_fill"], jnp.float32)
    out = jnp.asarray(board0, jnp.int32)
    # Lanes with no writable area can never anneal (host semantics:
    # InsufficientArea returns the board unchanged, no retries).
    no_area = ((jnp.asarray(mask, jnp.int32) & NEW_CELL_MASK) > 0) \
        .sum((-2, -1)) == 0
    resolved = no_area
    success = jnp.zeros((n,), bool)

    for _ in range(attempts + 1):
        key, sub = jax.random.split(key)
        # Resolved lanes run with a zero budget (immediate no-op).
        budget = jnp.where(resolved, 0.0,
                           jnp.asarray(params["max_iter"], jnp.float32))
        res, ok, fill = anneal_batch(
            jnp.asarray(board0, jnp.int32), jnp.asarray(mask, jnp.int32),
            jnp.asarray(seeds, bool), min_fill, budget,
            jnp.asarray(params["temperature"], jnp.float32),
            jnp.asarray(params["osc_bonus"], jnp.float32),
            jnp.asarray(params["penalties"], jnp.float32),
            sub, period=period)
        overfull = ok & (fill > max_fill)
        good = ~resolved & ok & ~overfull
        out = jnp.where(good.reshape(n, 1, 1), res, out)
        success = success | good
        # Ladder updates for the lanes that failed this attempt.
        min_fill = jnp.where(~resolved & ~ok, min_fill * 0.94, min_fill)
        max_fill = jnp.where(~resolved & overfull, max_fill * 1.07,
                             max_fill)
        resolved = resolved | good
        if bool(jax.device_get(resolved.all())):
            break
    return out, success
