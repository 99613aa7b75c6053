"""Tests for the CA advance kernel: known Life patterns, oracle agreement
(deterministic and stochastic), batch consistency, and PCG64 exactness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracle as O
from conftest import random_board
from safelife_tpu.core import advance, cells as C, pcg64


def adv_det(board):
    fn = jax.jit(advance.advance_board_deterministic)
    return np.asarray(fn(jnp.asarray(board, jnp.int32)))


def place(board, pattern, r, c, value=C.ALIVE):
    for dr, row in enumerate(pattern):
        for dc, ch in enumerate(row):
            if ch == "X":
                board[r + dr, c + dc] = value
    return board


class TestLifePatterns:
    def test_empty_board_is_identity(self):
        b = np.zeros((8, 8), np.int64)
        assert (adv_det(b) == 0).all()

    def test_block_still_life(self):
        b = place(np.zeros((8, 8), np.int64), ["XX", "XX"], 2, 2)
        assert (adv_det(b) == b).all()

    def test_blinker_oscillates(self):
        b = place(np.zeros((8, 8), np.int64), ["XXX"], 3, 2)
        b1 = adv_det(b)
        expected = place(np.zeros((8, 8), np.int64), ["X", "X", "X"], 2, 3)
        assert (b1 == expected).all()
        assert (adv_det(b1) == b).all()

    def test_glider_translates_with_wrap(self):
        b = place(np.zeros((10, 10), np.int64), [".X.", "..X", "XXX"], 1, 1)
        out = b
        for _ in range(4 * 10):  # 4 steps per cell of diagonal travel
            out = adv_det(out)
        assert (out == b).all()

    def test_frozen_cells_never_change(self):
        rng = np.random.default_rng(0)
        b = random_board(rng, (10, 10))
        b |= O.FROZEN
        assert (adv_det(b) == b).all()

    def test_tree_feeds_neighbors_but_does_not_die(self):
        # A tree (frozen alive) with two live neighbors makes a birth.
        b = np.zeros((8, 8), np.int64)
        b[3, 3] = C.TREE
        b[3, 4] = C.ALIVE
        b[4, 3] = C.ALIVE
        out = adv_det(b)
        assert out[3, 3] == C.TREE  # frozen: survives
        assert out[4, 4] & C.ALIVE  # birth from 3 neighbors

    def test_preserving_neighbor_prevents_death(self):
        b = np.zeros((8, 8), np.int64)
        b[3, 3] = C.ALIVE  # lone cell would die...
        b[3, 4] = C.FOUNTAIN  # ...but a fountain preserves it
        out = adv_det(b)
        assert out[3, 3] == C.ALIVE

    def test_inhibiting_neighbor_prevents_birth(self):
        b = place(np.zeros((8, 8), np.int64), ["XXX"], 3, 2)
        b[1, 3] = C.PARASITE  # inhibits the cell above the blinker center
        out = adv_det(b)
        assert out[2, 3] == 0  # birth suppressed
        assert out[4, 3] & C.ALIVE  # other side still born

    def test_color_consensus_two_of_three(self):
        # Two green parents + one red -> green child.
        b = np.zeros((8, 8), np.int64)
        b[3, 2] = C.ALIVE | C.COLOR_G
        b[3, 3] = C.ALIVE | C.COLOR_G
        b[3, 4] = C.ALIVE | C.COLOR_R
        out = adv_det(b)
        for r in (2, 4):
            assert out[r, 3] & C.COLORS == C.COLOR_G

    def test_indestructible_consensus(self):
        # Two hard (indestructible) parents -> hard child; two destructible
        # parents -> destructible child.
        b = np.zeros((8, 8), np.int64)
        b[3, 2] = C.ALIVE
        b[3, 3] = C.ALIVE
        b[3, 4] = C.ALIVE | C.DESTRUCTIBLE
        out = adv_det(b)
        assert out[2, 3] & C.DESTRUCTIBLE == 0
        b2 = np.zeros((8, 8), np.int64)
        b2[3, 2] = C.LIFE
        b2[3, 3] = C.LIFE
        b2[3, 4] = C.ALIVE
        out2 = adv_det(b2)
        assert out2[2, 3] & C.DESTRUCTIBLE


class TestOracleAgreement:
    @pytest.mark.parametrize("seed", range(5))
    def test_deterministic_random_soup(self, seed):
        rng = np.random.default_rng(seed)
        b = random_board(rng, (13, 11))
        ours = np.asarray(b, np.int64)
        theirs = np.asarray(b, np.int64)
        for _ in range(8):
            ours = adv_det(ours)
            theirs = O.advance_board(theirs, rng)
        assert (ours == theirs).all()

    @pytest.mark.parametrize("seed", range(3))
    def test_stochastic_oracle_mode_matches_numpy_stream(self, seed):
        rng_theirs = np.random.default_rng(1000 + seed)
        rng_ours = np.random.default_rng(1000 + seed)
        b = random_board(np.random.default_rng(seed), (9, 9), spawners=True)

        state, inc = pcg64.state_from_numpy(rng_ours)
        k_hi, k_lo = pcg64.threshold_53(0.3)
        step = jax.jit(advance.advance_board_oracle)

        ours = jnp.asarray(b, jnp.int32)
        theirs = np.asarray(b, np.int64)
        for _ in range(6):
            ours, state = step(ours, state, inc, k_hi, k_lo)
            theirs = O.advance_board(theirs, rng_theirs, 0.3)
            assert (np.asarray(ours) == theirs).all()

        # The streams must also end in the same place.
        pcg64.state_to_numpy(rng_ours, state)
        assert rng_ours.random() == rng_theirs.random()

    def test_fast_mode_spawn_rate(self):
        # Statistical check: long-run spawn occupancy near the oracle's.
        b = np.zeros((16, 16), np.int64)
        b[8, 8] = C.SPAWNER
        key = jax.random.PRNGKey(0)
        bb = jnp.asarray(b, jnp.int32)
        occ = advance.life_occupancy(bb, key, 0.3, 400)
        ours = float(np.asarray(occ).sum()) / 400

        rng = np.random.default_rng(7)
        theirs = O.life_occupancy(b, rng, 0.3, 400).sum() / 400
        assert abs(ours - theirs) / max(theirs, 1e-9) < 0.25

    def test_spawn_eligibility_matches_draw_count(self):
        # The number of draws consumed per step must match the oracle's.
        rng = np.random.default_rng(3)
        b = random_board(rng, (9, 9), spawners=True)
        elig = np.asarray(advance.spawn_eligible(jnp.asarray(b, jnp.int32)))

        class CountingRng:
            def __init__(self):
                self.n = 0

            def random(self):
                self.n += 1
                return 0.99

        cr = CountingRng()
        O.advance_board(b, cr, 0.3)
        assert cr.n == int(elig.sum())


class TestBatchConsistency:
    def test_vmap_equals_single(self):
        rng = np.random.default_rng(11)
        boards = np.stack([random_board(rng, (10, 10)) for _ in range(6)])
        batched = jax.jit(jax.vmap(advance.advance_board_deterministic))(
            jnp.asarray(boards, jnp.int32))
        for i in range(6):
            assert (np.asarray(batched[i]) == adv_det(boards[i])).all()

    def test_nstep_matches_iterated(self):
        rng = np.random.default_rng(12)
        b = jnp.asarray(random_board(rng, (10, 10)), jnp.int32)
        key = jax.random.PRNGKey(5)
        out = advance.advance_board_nstep(b, key, 0.3, 4)
        keys = jax.random.split(key, 4)
        b2 = b
        for k in keys:
            b2 = advance.advance_board(b2, k, 0.3)
        assert (np.asarray(out) == np.asarray(b2)).all()


class TestPCG64:
    def test_doubles_match_numpy(self):
        rng = np.random.default_rng(999)
        state, inc = pcg64.state_from_numpy(rng)

        def gen(state, n):
            def body(st, _):
                st, (hi, lo) = pcg64.next_double53(st, inc)
                return st, (hi, lo)
            return jax.lax.scan(body, state, None, length=n)

        state, (his, los) = jax.jit(gen, static_argnums=1)(state, 50)
        ours = (np.asarray(his, np.uint64) << np.uint64(32)
                | np.asarray(los, np.uint64)) * 2.0 ** -53
        assert (ours == rng.random(50)).all()

    def test_threshold_exactness(self):
        for p in (0.3, 0.5, 0.25, 0.7, 1e-4, 0.999):
            k_hi, k_lo = pcg64.threshold_53(p)
            k = (int(k_hi) << 32) | int(k_lo)
            t = float(np.float32(p))
            # u < k  iff  u * 2^-53 < t for all u in [0, 2^53)
            for u in (0, k - 1, k, k + 1, (1 << 53) - 1):
                if 0 <= u < (1 << 53):
                    assert (u < k) == (u * 2.0 ** -53 < t)
