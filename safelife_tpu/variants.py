"""Experimental cellular-automata rule variants.

Parity: reference ``safelife/safelife_game.py:768-936`` — ``GameOfLife``
(arbitrary Born/Survive rules via neighborhood convolution; note its color
consensus, destructibility inheritance and spawn-probability compounding
*intentionally* differ from the main C-kernel rules) and ``AsyncGame``
(asynchronous single-cell updates with an energy/temperature rule,
including the Ising and vine rule sets).

Host classes operate on numpy boards like :class:`safelife_tpu.game
.SafeLifeGame`; :func:`advance_board_general` is the batched, jittable
device formulation of the GameOfLife rules for training-scale use.
"""

import jax
import jax.numpy as jnp
import numpy as np

from .core import cells as C
from .game import SafeLifeGame
from .utils.rng import coinflip, get_rng

_NEIGHBORHOODS = {
    4: np.array([[0, 1, 0], [1, 0, 1], [0, 1, 0]]),   # Von Neumann
    6: np.array([[0, 1, 1], [1, 0, 1], [1, 1, 0]]),   # hexagonal
    8: np.array([[1, 1, 1], [1, 0, 1], [1, 1, 1]]),   # Moore
}


def _wrapped_conv3(x, kernel):
    """3x3 convolution with toroidal wrap (numpy, any integer dtype)."""
    out = np.zeros_like(x)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            k = kernel[1 + dy, 1 + dx]
            if k:
                out += k * np.roll(np.roll(x, dy, 0), dx, 1)
    return out


class GameOfLife(SafeLifeGame):
    """SafeLife with configurable Born/Survive rules (classic Conway is
    B3/S23). Parity: reference ``GameOfLife`` (safelife_game.py:768-838).
    """

    survive_rule = (2, 3)
    born_rule = (3,)

    def advance_board(self):
        self.num_steps += 1
        self._needs_new_counts = True
        rng = self.rng
        board = self.board.copy()
        cfilter = _NEIGHBORHOODS[8]

        alive = (board & C.ALIVE) > 0
        spawning = (board & C.SPAWNING) > 0
        frozen = (board & C.FROZEN) > 0

        can_die = ~frozen & (
            _wrapped_conv3(board & C.PRESERVING, cfilter) == 0)
        can_grow = ~frozen & (
            _wrapped_conv3(board & C.INHIBITING, cfilter) == 0)

        num_neighbors = _wrapped_conv3(alive.astype(np.int64), cfilter)
        num_spawn = _wrapped_conv3(spawning.astype(np.int64), cfilter)
        spawn_prob = 1 - (1 - self.spawn_prob) ** num_spawn
        has_spawned = rng.random(board.shape) < spawn_prob

        born = np.zeros(9, dtype=bool)
        born[list(self.born_rule)] = True
        dead = np.ones(9, dtype=bool)
        dead[list(self.survive_rule)] = False

        new_alive = (born[num_neighbors] | has_spawned) & ~alive & can_grow
        new_dead = dead[num_neighbors] & alive & can_die

        # Color consensus: alive neighbors weigh 1, spawners weigh 2; two
        # or more weighted votes pass the color to any newborn cell.
        new_flags = np.zeros_like(board)
        color_weights = 1 * alive + 2 * spawning
        for color in (C.COLOR_R, C.COLOR_G, C.COLOR_B):
            has_color = (board & color) > 0
            votes = _wrapped_conv3(
                (has_color * color_weights).astype(np.int64), cfilter)
            new_flags += color * (votes >= 2)
        indestructible = alive & ((board & C.DESTRUCTIBLE) == 0)
        new_flags += C.DESTRUCTIBLE * (
            _wrapped_conv3(indestructible.astype(np.int64), cfilter) < 2)

        board *= ~(new_alive | new_dead)
        board += (new_alive * (C.ALIVE + new_flags)).astype(board.dtype)
        self.board = board
        # Goals do not evolve in this variant (matching the reference,
        # whose GameOfLife.advance_board only touches the board).

    @property
    def is_stochastic(self):
        return bool((self.board & C.SPAWNING).any())


class AsyncGame(SafeLifeGame):
    """Asynchronous single-cell updates with an energy rule + temperature.

    Parity: reference ``AsyncGame`` (safelife_game.py:845-936): each board
    update performs ``cells_per_update * board.size`` random single-cell
    updates; a cell flips alive/dead with probability
    ``sigmoid-like 0.5 + 0.5*tanh(H / T)`` where H is the energy gain from
    living given the live-neighbor count, further compounded by spawner
    neighbors.
    """

    energy_rule_sets = {
        'conway': (
            (-1, -1, +1, +1, -1, -1, -1, -1, -1),
            (-1, -1, -1, +1, -1, -1, -1, -1, -1),
        ),
        'ising': (
            (-2, -1, 0, +1, +2),
            (-2, -1, 0, +1, +2),
        ),
        'vine': (
            (-1, -1, +1, +1, +1),
            (-1, +1, -1, -1, -1),
        ),
    }
    energy_rules = energy_rule_sets['conway']
    temperature = 0
    cells_per_update = 0.3

    def serialize(self):
        data = super().serialize()
        data['energy_rules'] = self.energy_rules
        return data

    def deserialize(self, data, as_initial_state=True):
        super().deserialize(data, as_initial_state)
        if 'energy_rules' in data:
            self.energy_rules = tuple(
                tuple(int(v) for v in row) for row in
                np.asarray(data['energy_rules']))

    def advance_board(self):
        self.num_steps += 1
        self._needs_new_counts = True
        board = self.board
        rules = self.energy_rules
        h, w = board.shape
        beta = 1.0 / max(1e-20, self.temperature)
        n_neighbors = len(rules[0]) - 1
        if n_neighbors not in _NEIGHBORHOODS:
            raise RuntimeError("async rules must have length 5, 7, or 9")
        neighborhood = _NEIGHBORHOODS[n_neighbors]
        rng = get_rng()
        for _ in range(int(board.size * self.cells_per_update)):
            x = int(rng.integers(w))
            y = int(rng.integers(h))
            if board[y, x] & C.FROZEN:
                continue
            ys = (np.arange(y - 1, y + 2) % h)[:, None]
            xs = (np.arange(x - 1, x + 2) % w)[None, :]
            neighbors = board[ys, xs] * neighborhood
            alive_neighbors = int(((neighbors & C.ALIVE) > 0).sum())
            spawn_neighbors = int(((neighbors & C.SPAWNING) > 0).sum())
            if (neighbors & C.FREEZING).any():
                continue
            if board[y, x] & C.ALIVE:
                H = rules[0][alive_neighbors]
            else:
                H = rules[1][alive_neighbors]
            P = 0.5 + 0.5 * np.tanh(H * beta)
            P = 1 - (1 - P) * (1 - self.spawn_prob) ** spawn_neighbors
            board[y, x] = C.LIFE if coinflip(P) else C.EMPTY


def advance_board_general(board, key, spawn_prob, born_rule=(3,),
                          survive_rule=(2, 3)):
    """Batched, jittable GameOfLife-variant advance (device formulation).

    Same rules as :class:`GameOfLife` but vectorized over any leading batch
    dims; spawn draws use independent per-cell uniforms.

    board: int32[..., H, W]; key: PRNG key; spawn_prob: float.
    """
    def conv(x):
        r = jnp.roll(x, 1, -1) + jnp.roll(x, -1, -1)
        rows = x + r
        return (jnp.roll(rows, 1, -2) + jnp.roll(rows, -1, -2) + r)

    alive = (board & C.ALIVE) > 0
    spawning = (board & C.SPAWNING) > 0
    frozen = (board & C.FROZEN) > 0

    can_die = ~frozen & (conv(board & C.PRESERVING) == 0)
    can_grow = ~frozen & (conv(board & C.INHIBITING) == 0)

    nn = conv(alive.astype(jnp.int32))
    ns = conv(spawning.astype(jnp.int32))
    sp = 1 - (1 - jnp.float32(spawn_prob)) ** ns
    has_spawned = jax.random.uniform(key, board.shape) < sp

    born = jnp.zeros(9, bool).at[jnp.array(born_rule)].set(True)
    dead = jnp.ones(9, bool).at[jnp.array(survive_rule)].set(False)

    new_alive = (born[nn] | has_spawned) & ~alive & can_grow
    new_dead = dead[nn] & alive & can_die

    new_flags = jnp.zeros_like(board)
    weights = 1 * alive + 2 * spawning
    for color in (C.COLOR_R, C.COLOR_G, C.COLOR_B):
        votes = conv(((board & color) > 0) * weights)
        new_flags = new_flags + color * (votes >= 2)
    indestructible = alive & ((board & C.DESTRUCTIBLE) == 0)
    new_flags = new_flags + C.DESTRUCTIBLE * (
        conv(indestructible.astype(jnp.int32)) < 2)

    out = board * ~(new_alive | new_dead)
    return out + new_alive * (C.ALIVE + new_flags)
