"""Fuzz tests for execute_actions against the naive oracle, plus targeted
semantic cases (push/pull/shove/exit/destroy-agent)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracle as O
from conftest import random_board
from safelife_tpu.core import actions, cells as C


def run(board, locs, acts):
    fn = jax.jit(actions.execute_actions)
    b, l = fn(
        jnp.asarray(board, jnp.int32),
        jnp.asarray(locs, jnp.int32),
        jnp.asarray(np.atleast_1d(acts), jnp.int32),
    )
    return np.asarray(b), np.asarray(l)


class TestTargetedSemantics:
    def board_with_agent(self, h=8, w=8, loc=(4, 4)):
        b = np.zeros((h, w), np.int64)
        b[loc] = C.PLAYER
        return b, np.array([loc])

    def test_noop(self):
        b, locs = self.board_with_agent()
        nb, nl = run(b, locs, [0])
        assert (nb == b).all() and (nl == locs).all()

    def test_move_into_empty(self):
        b, locs = self.board_with_agent()
        nb, nl = run(b, locs, [2])  # move right
        assert tuple(nl[0]) == (4, 5)
        assert nb[4, 4] == 0
        assert nb[4, 5] == C.PLAYER | (1 << C.ORIENTATION_BIT)

    def test_move_blocked_by_wall(self):
        b, locs = self.board_with_agent()
        b[4, 5] = C.WALL
        nb, nl = run(b, locs, [2])
        assert tuple(nl[0]) == (4, 4)
        # Orientation still updates.
        assert nb[4, 4] & C.ORIENTATION_MASK == 1 << C.ORIENTATION_BIT

    def test_push_crate(self):
        b, locs = self.board_with_agent()
        b[4, 5] = C.CRATE
        nb, nl = run(b, locs, [2])
        assert tuple(nl[0]) == (4, 5)
        assert nb[4, 6] == C.CRATE
        assert nb[4, 5] & C.AGENT

    def test_push_blocked_chain(self):
        b, locs = self.board_with_agent()
        b[4, 5] = C.CRATE
        b[4, 6] = C.CRATE
        nb, nl = run(b, locs, [2])
        assert tuple(nl[0]) == (4, 4)

    def test_push_crate_out_exit(self):
        b, locs = self.board_with_agent()
        b[4, 5] = C.CRATE
        b[4, 6] = C.LEVEL_EXIT
        nb, nl = run(b, locs, [2])
        assert tuple(nl[0]) == (4, 5)
        assert nb[4, 6] == C.LEVEL_EXIT  # crate deleted, exit kept
        assert nb[4, 5] & C.AGENT

    def test_pull_crate(self):
        b, locs = self.board_with_agent()
        b[4, 3] = C.CRATE  # crate is pullable (movable = push|pull)
        nb, nl = run(b, locs, [2])  # move right, dragging crate
        assert tuple(nl[0]) == (4, 5)
        assert nb[4, 4] == C.CRATE
        assert nb[4, 3] == 0

    def test_exit_when_open(self):
        b, locs = self.board_with_agent()
        b[4, 4] |= C.EXIT  # exit bit set on the agent (door open)
        b[4, 5] = C.LEVEL_EXIT
        nb, nl = run(b, locs, [2])
        assert tuple(nl[0]) == (4, 5)
        assert nb[4, 4] == 0      # agent vanished
        assert nb[4, 5] == C.LEVEL_EXIT

    def test_no_exit_when_closed(self):
        b, locs = self.board_with_agent()
        b[4, 5] = C.LEVEL_EXIT
        nb, nl = run(b, locs, [2])
        assert tuple(nl[0]) == (4, 4)

    def test_toggle_creates_life(self):
        b, locs = self.board_with_agent()
        b[4, 4] |= C.COLOR_G
        nb, _ = run(b, locs, [6])  # toggle right
        assert nb[4, 5] == C.ALIVE | C.DESTRUCTIBLE | C.COLOR_G

    def test_toggle_destroys_life(self):
        b, locs = self.board_with_agent()
        b[4, 5] = C.LIFE
        nb, _ = run(b, locs, [6])
        assert nb[4, 5] == 0

    def test_toggle_destroyed_agent_becomes_block(self):
        b, locs = self.board_with_agent()
        b[4, 5] = C.PLAYER
        nb, _ = run(b, locs, [6])
        expect = (C.PLAYER ^ (C.AGENT | C.DESTRUCTIBLE)) | C.FROZEN
        assert nb[4, 5] == expect

    def test_toggle_shoves_block(self):
        b, locs = self.board_with_agent()
        b[4, 5] = C.CRATE
        nb, nl = run(b, locs, [6])
        assert tuple(nl[0]) == (4, 4)  # agent doesn't move
        assert nb[4, 5] == 0
        assert nb[4, 6] == C.CRATE

    def test_directions(self):
        for action, (dy, dx) in [(1, (-1, 0)), (2, (0, 1)),
                                 (3, (1, 0)), (4, (0, -1))]:
            b, locs = self.board_with_agent()
            nb, nl = run(b, locs, [action])
            assert tuple(nl[0]) == (4 + dy, 4 + dx)
            assert nb[4 + dy, 4 + dx] & C.ORIENTATION_MASK == \
                (action - 1) << C.ORIENTATION_BIT

    def test_wrap_around_edge(self):
        b = np.zeros((6, 6), np.int64)
        b[0, 0] = C.PLAYER
        nb, nl = run(b, np.array([[0, 0]]), [1])  # move up wraps
        assert tuple(nl[0]) == (5, 0)
        assert nb[5, 0] & C.AGENT

    def test_two_agents_sequential(self):
        # Agent 0 moves into a cell; agent 1 tries to enter the same cell
        # and must be blocked because agent 0 already wrote it.
        b = np.zeros((8, 8), np.int64)
        b[4, 3] = C.PLAYER
        b[4, 5] = C.PLAYER
        locs = np.array([[4, 3], [4, 5]])
        nb, nl = run(b, locs, [2, 4])  # both walk toward (4, 4)
        assert tuple(nl[0]) == (4, 4)
        assert tuple(nl[1]) == (4, 5)  # blocked
        assert nb[4, 4] & C.AGENT
        assert nb[4, 5] & C.AGENT


class TestActionFuzz:
    @pytest.mark.parametrize("seed", range(8))
    def test_random_boards_match_oracle(self, seed):
        rng = np.random.default_rng(seed)
        h, w = 9, 11
        b = random_board(rng, (h, w), density=0.35, flag_prob=0.2)
        # Sprinkle agents and exits.
        n_agents = int(rng.integers(1, 4))
        locs = []
        for _ in range(n_agents):
            loc = (int(rng.integers(h)), int(rng.integers(w)))
            b[loc] = C.PLAYER | (int(rng.integers(0, 8)) << C.COLOR_BIT)
            locs.append(loc)
        for _ in range(2):
            b[rng.integers(h), rng.integers(w)] = C.LEVEL_EXIT
        locs = np.array(locs)

        ours_b, ours_l = np.asarray(b), locs
        theirs_b, theirs_l = np.asarray(b), locs
        for _ in range(12):
            acts = rng.integers(0, 9, n_agents)
            ours_b, ours_l = run(ours_b, ours_l, acts)
            theirs_b, theirs_l = O.execute_actions(theirs_b, theirs_l, acts)
            assert (ours_b == theirs_b).all(), "board diverged"
            assert (ours_l == theirs_l).all(), "locations diverged"

    def test_batch_consistency(self):
        rng = np.random.default_rng(77)
        B = 5
        boards, locs, acts = [], [], []
        for _ in range(B):
            b = random_board(rng, (8, 8), density=0.3)
            loc = (int(rng.integers(8)), int(rng.integers(8)))
            b[loc] = C.PLAYER
            boards.append(b)
            locs.append([loc])
            acts.append([int(rng.integers(0, 9))])
        boards = jnp.asarray(np.stack(boards), jnp.int32)
        locsj = jnp.asarray(np.array(locs), jnp.int32)
        actsj = jnp.asarray(np.array(acts), jnp.int32)
        bb, bl = jax.jit(actions.execute_actions_batch)(boards, locsj, actsj)
        for i in range(B):
            sb, sl = run(np.asarray(boards[i]), np.array(locs[i]), acts[i])
            assert (np.asarray(bb[i]) == sb).all()
            assert (np.asarray(bl[i]) == sl).all()
