"""Naive NumPy oracle for SafeLife physics, used only by the test suite.

This is an intentionally slow, per-cell, loop-based implementation written
directly from the SafeLife rule specification (reference semantics:
``safelife/speedups_src/advance_board.c``). It shares no code or structure
with the vectorized TPU kernels in ``safelife_tpu.core`` — neighborhoods are
enumerated cell-by-cell here, packed bit-trick-free — so agreement between
the two is a meaningful check.

Spawn randomness consumes ``rng.random()`` once per eligible cell in raster
order, matching the reference's draw sequence from the NumPy bit generator.
"""

import numpy as np

ALIVE = 1 << 0
AGENT = 1 << 1
PUSHABLE = 1 << 2
DESTRUCTIBLE = 1 << 3
FROZEN = 1 << 4
PRESERVING = 1 << 5
INHIBITING = 1 << 6
SPAWNING = 1 << 7
EXIT = 1 << 8
COLOR_BIT = 9
COLORS = 7 << 9
ORIENTATION_BIT = 12
ORIENTATION_MASK = 3 << 12
PULLABLE = 1 << 15


def advance_board(board, rng, spawn_prob=0.3):
    """One physics step. board: (H, W) integer array. Returns new array."""
    board = np.asarray(board).astype(np.int64)
    h, w = board.shape
    new = np.zeros_like(board)
    # Threshold goes through a C `float` in the reference.
    thresh = float(np.float32(spawn_prob))

    for i in range(h):
        for j in range(w):
            cell = board[i, j]
            # Gather the 3x3 neighborhood (self included), wrapped.
            nbrs = [
                int(board[(i + di) % h, (j + dj) % w])
                for di in (-1, 0, 1)
                for dj in (-1, 0, 1)
            ]
            # The destructible bit is mirrored onto the exit-bit position so
            # it flows through the color-consensus machinery.
            nbrs = [x | ((x & DESTRUCTIBLE) << 5) for x in nbrs]

            count = sum(x & 1 for x in nbrs)
            any_preserving = any(x & PRESERVING for x in nbrs)
            any_inhibiting = any(x & INHIBITING for x in nbrs)
            any_spawning = any(x & SPAWNING for x in nbrs)

            cons = 0
            for bit in (8, 9, 10, 11):
                n_set = sum(1 for x in nbrs if (x & 1) and (x >> bit) & 1)
                if n_set >= 2:
                    cons |= 1 << bit
            spawn_colors = 0
            for x in nbrs:
                if x & SPAWNING:
                    spawn_colors |= x & COLORS
            cons_colors = (cons & COLORS) | spawn_colors
            cons_destr = DESTRUCTIBLE if (cons >> 8) & 1 else 0

            if cell & ALIVE:
                if (cell & FROZEN) or any_preserving or count in (3, 4):
                    new[i, j] = cell
                else:
                    new[i, j] = 0
            else:
                if (cell & FROZEN) or any_inhibiting:
                    new[i, j] = cell
                elif count == 3:
                    new[i, j] = ALIVE | cons_colors | cons_destr
                elif any_spawning:
                    if rng.random() < thresh:
                        new[i, j] = ALIVE | DESTRUCTIBLE | cons_colors
                    else:
                        new[i, j] = cell
                else:
                    new[i, j] = cell
    return new.astype(np.asarray(board).dtype)


def execute_actions(board, agent_locs, actions):
    """Sequential action application on a single board (modifies copies).

    board: (H, W) int array; agent_locs: (A, 2) (row, col); actions: (A,).
    Returns (new_board, new_agent_locs).
    """
    board = np.array(board, dtype=np.int64)
    locs = np.array(agent_locs, dtype=np.int64)
    actions = np.atleast_1d(np.asarray(actions, dtype=np.int64))
    h, w = board.shape

    for k in range(len(locs)):
        action = int(actions[k])
        if action == 0:
            continue
        dirn = (action - 1) & 3
        if dirn & 1:
            dx, dy = 2 - dirn, 0
        else:
            dx, dy = 0, dirn - 1
        y0, x0 = int(locs[k, 0]) % h, int(locs[k, 1]) % w
        p0 = (y0, x0)
        p1 = ((y0 + dy) % h, (x0 + dx) % w)
        p2 = ((y0 + 2 * dy) % h, (x0 + 2 * dx) % w)
        p3 = ((y0 - dy) % h, (x0 - dx) % w)

        if not board[p0] & AGENT:
            continue
        board[p0] = (board[p0] & ~ORIENTATION_MASK) | (dirn << ORIENTATION_BIT)

        if action >= 5:  # toggle
            if board[p1] == 0:
                board[p1] = ALIVE | DESTRUCTIBLE | (board[p0] & COLORS)
            elif board[p1] & DESTRUCTIBLE:
                if board[p1] & AGENT:
                    board[p1] ^= AGENT | DESTRUCTIBLE
                    board[p1] |= FROZEN
                else:
                    board[p1] = 0
            elif ~board[p0] & board[p1] & PUSHABLE:
                if board[p2] == 0:
                    board[p2] = board[p1]
                    board[p1] = 0
                elif board[p2] & EXIT:
                    board[p1] = 0
        else:  # move
            moved = False
            exited = False
            if ~board[p0] & board[p1] & PUSHABLE:
                if board[p2] == 0:
                    board[p2] = board[p1]
                    moved = True
                elif board[p2] & EXIT:
                    moved = True
            elif board[p1] == 0:
                moved = True
            elif (board[p0] & board[p1] & EXIT) and not (board[p1] & AGENT):
                exited = True
            if moved:
                board[p1] = board[p0]
            if moved or exited:
                locs[k, 0] = (y0 + dy) % h
                locs[k, 1] = (x0 + dx) % w
                if ~board[p0] & board[p3] & PULLABLE:
                    board[p0] = board[p3]
                    board[p3] = 0
                else:
                    board[p0] = 0
    return board, locs


def alive_counts(board, goals):
    """(8 goal colors x 9 cell colors-or-empty) census of changeable cells."""
    board = np.asarray(board).astype(np.int64)
    goals = np.asarray(goals).astype(np.int64)
    out = np.zeros((8, 9), dtype=np.int64)
    movable = DESTRUCTIBLE | PUSHABLE | PULLABLE
    for b, g in zip(board.ravel(), goals.ravel()):
        if (b & movable) or not (b & FROZEN):
            bc = (b & COLORS) >> COLOR_BIT
            gc = (g & COLORS) >> COLOR_BIT
            if b & ALIVE:
                out[gc, bc] += 1
            else:
                out[gc, 8] += 1
    return out


def life_occupancy(board, rng, spawn_prob, n_steps):
    """Occupancy counts over n advanced steps; (H, W, 8) int array."""
    board = np.asarray(board)
    counts = np.zeros(board.shape + (8,), dtype=np.int32)
    b = board
    for _ in range(n_steps):
        b = advance_board(b, rng, spawn_prob)
        free = (b & ALIVE).astype(bool) & ~(b & (AGENT | EXIT | FROZEN)).astype(bool)
        color = (b >> COLOR_BIT) & 7
        for c in range(8):
            counts[..., c] += (free & (color == c)).astype(np.int32)
    return counts
