"""Experimental rule variants (parity: safelife_game.py:768-936)."""

import numpy as np

import jax

from safelife_tpu.core import cells as C
from safelife_tpu.variants import (
    AsyncGame, GameOfLife, advance_board_general)


def _blinker(n=12):
    b = np.zeros((n, n), np.int64)
    b[5, 4:7] = C.ALIVE | C.DESTRUCTIBLE
    return b


class TestGameOfLife:
    def test_blinker_oscillates(self):
        g = GameOfLife((12, 12))
        g.board = _blinker()
        g.goals = np.zeros_like(g.board)
        before = np.argwhere(g.board & C.ALIVE)
        g.advance_board()
        mid = np.argwhere(g.board & C.ALIVE)
        assert not (mid == before).all()
        g.advance_board()
        np.testing.assert_array_equal(
            np.argwhere(g.board & C.ALIVE), before)

    def test_custom_rules(self):
        # B1/S012345678: any neighbor births, nothing dies -> growth.
        g = GameOfLife((12, 12))
        g.born_rule = (1, 2, 3, 4, 5, 6, 7, 8)
        g.survive_rule = tuple(range(9))
        g.board = _blinker()
        g.goals = np.zeros_like(g.board)
        n0 = int(((g.board & C.ALIVE) > 0).sum())
        g.advance_board()
        assert int(((g.board & C.ALIVE) > 0).sum()) > n0

    def test_frozen_cells_inert(self):
        g = GameOfLife((12, 12))
        g.board = _blinker()
        g.board[5, 5] |= C.FROZEN
        g.goals = np.zeros_like(g.board)
        g.advance_board()
        assert g.board[5, 5] & C.ALIVE

    def test_device_variant_matches_host_deterministic(self):
        b = _blinker()
        host = GameOfLife((12, 12))
        host.board = b.copy()
        host.goals = np.zeros_like(b)
        host.advance_board()
        dev = advance_board_general(
            b.astype(np.int32)[None], jax.random.PRNGKey(0), 0.0)
        np.testing.assert_array_equal(np.asarray(dev[0]),
                                      host.board.astype(np.int32))


class TestAsyncGame:
    def test_advance_and_serialize(self):
        a = AsyncGame((10, 10))
        a.board = _blinker(10)
        a.goals = np.zeros_like(a.board)
        a.energy_rules = AsyncGame.energy_rule_sets["vine"]
        a.temperature = 0.3
        a.seed = 7
        a.advance_board()
        assert a.num_steps == 1
        data = a.serialize()
        a2 = AsyncGame((10, 10))
        a2.deserialize(data)
        assert a2.energy_rules == a.energy_rules

    def test_zero_temperature_deterministic_flip(self):
        # ising rules at T=0: an isolated live cell (0 neighbors, H=-2)
        # dies with certainty once selected.
        a = AsyncGame((6, 6))
        a.board = np.zeros((6, 6), np.int64)
        a.board[3, 3] = C.LIFE
        a.goals = np.zeros_like(a.board)
        a.energy_rules = AsyncGame.energy_rule_sets["ising"]
        a.temperature = 0
        a.cells_per_update = 20.0  # touch every cell many times
        a.seed = 3
        a.advance_board()
        assert not (a.board & C.ALIVE).any()
