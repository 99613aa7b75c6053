"""Agent action execution, TPU-native.

Semantics parity with the reference C kernel ``execute_actions``
(``safelife/speedups_src/advance_board.c:217-300``):

* Actions: 0 = noop; 1-4 = move up/right/down/left; 5-8 = toggle in the same
  directions.
* Agents act **sequentially** in index order — agent k observes agent k-1's
  board writes. This ordering is semantic (simultaneous multi-agent actions
  mutate shared cells) and must not be parallelized over agents; the loop
  body itself is fully vectorized over the board batch via ``vmap``.
* Every action first re-orients the agent (writes orientation bits 12-13).
* Toggle: empty target → create ``life`` colored like the agent; destructible
  target → destroy it (a destroyed *agent* becomes a frozen block instead);
  pushable target (when the actor itself is not pushable) → "shove" it one
  cell without moving, deleting it if shoved into an exit.
* Move: push a pushable chain of length 1 (into empty, or into an exit which
  deletes the block), walk into empty cells, or walk into the level exit
  (only when both the agent cell and the exit cell carry the EXIT bit — the
  agent then vanishes from the board but its recorded location moves onto the
  exit cell). A pullable block behind the agent is dragged into the vacated
  cell.

All reads and writes are issued in the same order as the C kernel so that the
result is correct even when the 4 involved cells alias on tiny boards.
"""

import jax
import jax.numpy as jnp

from . import cells as C


def _read(board, pos):
    return board[pos[0], pos[1]]


def _cond_write(board, pos, value, cond):
    """Write ``value`` at pos iff cond, else keep the current value."""
    cur = board[pos[0], pos[1]]
    return board.at[pos[0], pos[1]].set(jnp.where(cond, value, cur))


def _agent_positions(board, locs_k, action):
    """The four cells an action touches: agent, ahead, two-ahead, behind."""
    h, w = board.shape
    dirn = (action - 1) & 3
    odd = (dirn & 1) == 1
    dx = jnp.where(odd, 2 - dirn, 0)
    dy = jnp.where(odd, 0, dirn - 1)
    y0 = locs_k[0] % h
    x0 = locs_k[1] % w
    ys = jnp.stack([y0, (y0 + dy) % h, (y0 + 2 * dy) % h, (y0 - dy) % h])
    xs = jnp.stack([x0, (x0 + dx) % w, (x0 + 2 * dx) % w, (x0 - dx) % w])
    return dirn, dy, dx, y0, x0, ys, xs


def _execute_one_fast(board, locs_k, action):
    """One agent's action as a pure 4-cell transform + single fused write.

    Valid only when min(H, W) >= 4 so the four touched cells are distinct
    (no aliasing); then the C kernel's sequential read-modify-write chain
    collapses to a pure function of the four initial cell values.

    Cell reads and writes are expressed as one-hot compare/select/reduce
    passes over the flattened board rather than gather/scatter ops: under
    ``vmap`` a per-lane dynamic gather lowers to an XLA gather (slow,
    unfusible on TPU), while compare+select+reduce passes fuse into a
    couple of linear sweeps of the batch.
    """
    h, w = board.shape
    dirn, dy, dx, y0, x0, ys, xs = _agent_positions(board, locs_k, action)
    flat = board.reshape(-1)
    idx = ys * w + xs                                   # int32[4]
    iota = jnp.arange(h * w, dtype=idx.dtype)
    masks = iota[None, :] == idx[:, None]               # bool[4, H*W]
    v = jnp.sum(jnp.where(masks, flat[None, :], 0), axis=1)
    v0, v1, v2, v3 = v[0], v[1], v[2], v[3]

    active = (action != 0) & ((v0 & C.AGENT) != 0)
    v0o = jnp.where(
        active, (v0 & ~C.ORIENTATION_MASK) | (dirn << C.ORIENTATION_BIT), v0)
    is_toggle = action >= 5

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
    new_vals = jnp.where(active, jnp.stack([n0, n1, n2, n3]), v)
    # The four indices are distinct, so a where-chain equals the scatter.
    flat = jnp.where(masks[0], new_vals[0],
                     jnp.where(masks[1], new_vals[1],
                               jnp.where(masks[2], new_vals[2],
                                         jnp.where(masks[3], new_vals[3],
                                                   flat))))
    board = flat.reshape(h, w)

    relocated = active & ~is_toggle & do_reloc
    new_loc = jnp.stack([(y0 + dy) % h, (x0 + dx) % w])
    locs_k = jnp.where(relocated, new_loc, locs_k)
    return board, locs_k


def execute_actions(board, agent_locs, actions):
    """Apply one action per agent, sequentially, on a single board.

    Parameters
    ----------
    board : int32[H, W]
    agent_locs : int32[A, 2] — (row, col) per agent. Padding rows are fine as
        long as the corresponding action is 0 (noop).
    actions : int32[A] — in [0, 8].

    Returns
    -------
    (new_board, new_agent_locs)
    """
    h, w = board.shape
    n_agents = agent_locs.shape[0]
    if n_agents == 0:  # levels may have no agents at all
        return board, agent_locs

    if min(h, w) >= 4:
        # Fast path: no cell aliasing possible; agents still sequential.
        def fast_body(k, carry):
            board, locs = carry
            b, lk = _execute_one_fast(board, locs[k], actions[k])
            return b, locs.at[k].set(lk)

        return jax.lax.fori_loop(
            0, n_agents, fast_body, (board, agent_locs))

    def agent_body(k, carry):
        board, locs = carry
        action = actions[k]

        dirn = (action - 1) & 3
        odd = (dirn & 1) == 1
        dx = jnp.where(odd, 2 - dirn, 0)
        dy = jnp.where(odd, 0, dirn - 1)

        y0 = locs[k, 0] % h
        x0 = locs[k, 1] % w
        pos0 = (y0, x0)
        pos1 = ((y0 + dy) % h, (x0 + dx) % w)
        pos2 = ((y0 + 2 * dy) % h, (x0 + 2 * dx) % w)
        pos3 = ((y0 - dy) % h, (x0 - dx) % w)

        v0 = _read(board, pos0)
        active = (action != 0) & ((v0 & C.AGENT) != 0)
        is_toggle = action >= 5
        is_move = active & ~is_toggle
        do_toggle = active & is_toggle

        # Re-orient the agent (C: advance_board.c:244-245).
        v0 = jnp.where(
            active, (v0 & ~C.ORIENTATION_MASK) | (dirn << C.ORIENTATION_BIT), v0
        )
        board = _cond_write(board, pos0, v0, active)

        # ---- toggle branch (C: advance_board.c:248-268) ----
        v1 = _read(board, pos1)
        t_create = do_toggle & (v1 == 0)
        t_destr = do_toggle & ~t_create & ((v1 & C.DESTRUCTIBLE) != 0)
        t_destr_agent = t_destr & ((v1 & C.AGENT) != 0)
        t_shove = do_toggle & ~t_create & ~t_destr & \
            ((~v0 & v1 & C.PUSHABLE) != 0)

        new_v1 = jnp.where(
            t_create,
            C.ALIVE | C.DESTRUCTIBLE | (v0 & C.COLORS),
            jnp.where(
                t_destr_agent,
                (v1 ^ (C.AGENT | C.DESTRUCTIBLE)) | C.FROZEN,
                jnp.where(t_destr, 0, v1),
            ),
        )
        board = _cond_write(board, pos1, new_v1, t_create | t_destr)

        v2 = _read(board, pos2)
        shove_to_empty = t_shove & (v2 == 0)
        shove_to_exit = t_shove & (v2 != 0) & ((v2 & C.EXIT) != 0)
        board = _cond_write(board, pos2, v1, shove_to_empty)
        board = _cond_write(board, pos1, 0, shove_to_empty | shove_to_exit)

        # ---- move branch (C: advance_board.c:269-298) ----
        v1 = _read(board, pos1)
        v2 = _read(board, pos2)
        m_push = is_move & ((~v0 & v1 & C.PUSHABLE) != 0)
        m_push_empty = m_push & (v2 == 0)
        m_push_exit = m_push & (v2 != 0) & ((v2 & C.EXIT) != 0)
        m_empty = is_move & ~m_push & (v1 == 0)
        m_exit = is_move & ~m_push & ~m_empty & \
            ((v0 & v1 & C.EXIT) != 0) & ((v1 & C.AGENT) == 0)

        do_move = m_push_empty | m_push_exit | m_empty   # p1 = p0
        do_reloc = do_move | m_exit                      # location changes

        board = _cond_write(board, pos2, v1, m_push_empty)
        # Re-read p0: its orientation write landed above, and on degenerate
        # tiny boards pos1/pos2 writes may alias pos0.
        v0f = _read(board, pos0)
        board = _cond_write(board, pos1, v0f, do_move)

        v3 = _read(board, pos3)
        pull = do_reloc & ((~v0f & v3 & C.PULLABLE) != 0)
        board = _cond_write(board, pos0, jnp.where(pull, v3, 0), do_reloc)
        board = _cond_write(board, pos3, 0, pull)

        new_loc = jnp.stack([(y0 + dy) % h, (x0 + dx) % w])
        locs = locs.at[k].set(jnp.where(do_reloc, new_loc, locs[k]))
        return board, locs

    board, agent_locs = jax.lax.fori_loop(
        0, n_agents, agent_body, (board, agent_locs)
    )
    return board, agent_locs


# Batched version: sequential over agents, vectorized over boards.
execute_actions_batch = jax.vmap(execute_actions, in_axes=(0, 0, 0))
