"""Spatially-sharded CA advance: halo exchange over the device ring.

Bit-equality of the row-sharded advance (one board split over the
8-device virtual mesh, one-row ppermute halo exchange per step) against
the single-device kernel — the correctness contract for the context-
parallelism analog (SURVEY.md §5).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import random_board
from safelife_tpu.core import advance
from safelife_tpu.parallel import mesh as M
from safelife_tpu.parallel import spatial as S


@pytest.fixture
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return M.make_mesh(8)


class TestShardedAdvance:
    def test_deterministic_matches_unsharded(self, mesh8, rng):
        board = jnp.asarray(
            random_board(rng, shape=(64, 32)), jnp.int32)
        ref = advance.advance_board_deterministic(board)
        out = S.advance_sharded(board, jax.random.PRNGKey(0), 0.3, mesh8,
                                stochastic=False)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_given_spawns_matches_unsharded(self, mesh8, rng):
        board = jnp.asarray(
            random_board(rng, shape=(64, 32), spawners=True), jnp.int32)
        draws = jnp.asarray(rng.random((64, 32)) < 0.4)
        ref = advance.advance_board_given_spawns(board, draws)
        out = S.advance_sharded_given_spawns(board, draws, mesh8)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_wrap_crosses_shard_boundary(self, mesh8):
        # A vertical blinker straddling the torus seam (rows 63, 0, 1):
        # its evolution depends on the ring halo exchange being correct
        # at the wrap point.
        from safelife_tpu.core import cells as C

        board = np.zeros((64, 32), np.int32)
        for r in (63, 0, 1):
            board[r, 5] = C.ALIVE
        board = jnp.asarray(board)
        ref = advance.advance_board_deterministic(board)
        out = S.advance_sharded(board, jax.random.PRNGKey(0), 0.3, mesh8,
                                stochastic=False)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
        # And it actually oscillates: the horizontal phase appears.
        row0 = np.asarray(out)[0]
        assert (row0[[4, 5, 6]] != 0).all()

    def test_nstep_scan(self, mesh8, rng):
        board = jnp.asarray(random_board(rng, shape=(64, 32)), jnp.int32)
        ref = board
        for _ in range(5):
            ref = advance.advance_board_deterministic(ref)
        out = S.advance_sharded_nstep(
            board, jax.random.PRNGKey(0), 0.3, 5, mesh8, stochastic=False)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_stochastic_spawn_fraction(self, mesh8, rng):
        board = jnp.asarray(
            random_board(rng, shape=(64, 64), spawners=True), jnp.int32)
        elig = np.asarray(advance.spawn_eligible(board))
        det = np.asarray(advance.advance_board_deterministic(board))
        out = np.asarray(S.advance_sharded(
            board, jax.random.PRNGKey(3), 0.3, mesh8, stochastic=True))
        frac = ((out != det) & elig).sum() / max(elig.sum(), 1)
        assert 0.15 < frac < 0.45  # ~spawn_prob of eligible cells fire

    def test_single_shard_mesh(self, rng):
        mesh1 = M.make_mesh(1)
        board = jnp.asarray(random_board(rng, shape=(16, 16)), jnp.int32)
        ref = advance.advance_board_deterministic(board)
        out = S.advance_sharded(board, jax.random.PRNGKey(0), 0.3, mesh1,
                                stochastic=False)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
