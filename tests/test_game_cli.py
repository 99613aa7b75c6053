"""Tests for the host SafeLifeGame API, graphics renderer, and CLI."""

import subprocess
import sys

import numpy as np
import pytest

import oracle as O
from conftest import random_board
from safelife_tpu.core import cells as C
from safelife_tpu.game import SafeLifeGame
from safelife_tpu.io.levels import Level, load_levels_npz
from safelife_tpu.core.scoring import DEFAULT_POINTS_TABLE


def make_game(seed=0, size=(12, 12)):
    rng = np.random.default_rng(seed)
    board = random_board(rng, size, density=0.15)
    loc = (size[0] // 2, size[1] // 2)
    board[loc] = C.PLAYER
    board[1, 1] = C.LEVEL_EXIT
    goals = np.zeros(size, np.int64)
    goals[2:5, 2:5] = C.COLOR_B
    lv = Level(
        board=board.astype(np.int32), goals=goals.astype(np.int32),
        agent_locs=np.array([loc]), agent_names=np.array(["agent0"]),
        points_table=np.tile(DEFAULT_POINTS_TABLE, (1, 1, 1)),
        min_performance=0.3, spawn_prob=0.3, name="test")
    g = SafeLifeGame(board_size=None)
    g.deserialize(lv)
    return g


class TestHostGame:
    def test_matches_env_rollout(self):
        """The host game class and the batched TPU env must evolve a
        deterministic level identically."""
        import jax
        import jax.numpy as jnp

        from safelife_tpu.env import env as E
        from safelife_tpu.env.state import pack_levels

        g = make_game(3)
        lv = g.level
        pool = pack_levels([lv])
        cfg = E.EnvConfig(auto_reset=False)
        state, obs = E.reset(cfg, pool, jax.random.PRNGKey(0), 1)

        rng = np.random.default_rng(0)
        for t in range(20):
            a = int(rng.integers(0, 9))
            g.execute_actions(a)
            g.advance_board()
            g.update_exit_colors()
            state, obs, reward, done, info = E.step(
                cfg, pool, state, jnp.asarray([[a]], jnp.int32),
                jax.random.PRNGKey(t))
            assert (np.asarray(state.board[0]) == g.board).all(), t
            assert (np.asarray(state.agent_locs[0]) == g.agent_locs).all()

    def test_named_actions(self):
        g = make_game(1)
        y0, x0 = g.agent_locs[0]
        g.board[(y0 + 1) % g.height, x0] = 0  # clear the way down
        g.execute_action("MOVE DOWN")
        assert tuple(g.agent_locs[0]) == ((y0 + 1) % g.height, x0)
        g.execute_action("FACE LEFT")
        assert g.orientation[0] == 3
        g.execute_action("MOVE FORWARD")  # relative move

    def test_serialize_roundtrip(self, tmp_path):
        g = make_game(2)
        path = str(tmp_path / "saved.npz")
        g.save(path)
        g2 = SafeLifeGame.load(path)
        assert (g2.board == g.board).all()
        assert (g2.goals == g.goals).all()
        assert (g2.agent_locs == g.agent_locs).all()
        assert g2.min_performance == g.min_performance
        # File is reference-format loadable.
        lvs = load_levels_npz(path)
        assert len(lvs) == 1

    def test_edit_commands(self):
        g = make_game(0)
        g.edit_loc = (3, 3)
        g.execute_edit("PUT WALL")
        assert g.board[3, 3] == C.WALL
        g.execute_edit("NEXT EDIT COLOR")
        g.execute_edit("PUT LIFE")
        assert g.board[3, 3] == C.LIFE | C.COLOR_R
        g.execute_edit("TOGGLE FROZEN")
        assert g.board[3, 3] & C.FROZEN
        g.execute_edit("GOALS PUT WALL")
        # the active edit color (red, set above) is applied to placed cells
        assert g.goals[3, 3] == C.WALL | C.COLOR_R

    def test_edit_move_matches_reference_quirks(self):
        """MOVE FORWARD/BACKWARD jump the cursor 3/5 rows down and unknown
        directions raise KeyError (reference safelife_game.py:431-436)."""
        import pytest

        g = make_game(0)
        h, w = g.board.shape
        g.edit_loc = (3, 3)
        g.execute_edit("MOVE RIGHT")
        assert g.edit_loc == (3, 4)
        g.execute_edit("MOVE FORWARD")
        assert g.edit_loc == ((3 + 3) % h, 4)
        g.execute_edit("MOVE BACKWARD")
        assert g.edit_loc == ((3 + 3 + 5) % h, 4)
        with pytest.raises(KeyError):
            g.execute_edit("MOVE SIDEWAYS")
        # A bare unknown command is still silently ignored.
        assert g.execute_edit("TELEPORT") is None

    def test_revert(self):
        g = make_game(5)
        b0 = g.board.copy()
        for _ in range(5):
            g.execute_actions(2)
            g.advance_board()
        g.revert()
        assert (g.board == b0).all()
        assert g.num_steps == 0

    def test_advance_matches_oracle(self):
        g = make_game(7)
        g.seed = 99
        rng_check = np.random.default_rng(np.random.SeedSequence(99))
        expect = O.advance_board(g.board.copy(), rng_check, 0.3)
        g.advance_board()
        assert (g.board == expect).all()


class TestGraphics:
    def test_render_board_shape(self):
        from safelife_tpu.render.graphics import render_board
        g = make_game(0)
        img = render_board(g.board, g.goals)
        assert img.shape == (12 * 14, 12 * 14, 3)
        assert img.dtype == np.uint8
        # agent sprite renders something dark on its cell
        y, x = g.agent_locs[0]
        cell = img[y * 14:(y + 1) * 14, x * 14:(x + 1) * 14]
        assert cell.std() > 0

    def test_movie_batch(self):
        from safelife_tpu.render.graphics import render_board
        boards = np.zeros((3, 6, 6), np.int64)
        boards[:, 2, 2] = C.LIFE
        img = render_board(boards, np.zeros_like(boards))
        assert img.shape == (3, 84, 84, 3)

    def test_render_file(self, tmp_path):
        from safelife_tpu.io.levels import save_level
        from safelife_tpu.render.graphics import render_file
        g = make_game(0)
        path = str(tmp_path / "lvl.npz")
        save_level(g.level, path)
        outs = render_file(path)
        assert len(outs) == 1 and outs[0].endswith(".png")


class TestCLI:
    def run_cli(self, *args):
        return subprocess.run(
            [sys.executable, "-m", "safelife_tpu"] + list(args),
            capture_output=True, text=True, timeout=300,
            env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
                 "PYTHONPATH": "."},
            cwd=".")

    def test_print(self):
        r = self.run_cli("print", "random/append-still", "--seed", "1")
        assert r.returncode == 0, r.stderr
        assert "append-still" in r.stdout

    def test_existing_data_dir_prompt(self, tmp_path, monkeypatch):
        """Reusing a data_dir: tmp*-named dirs auto-overwrite, a tty
        prompt honors overwrite/append/abort, and non-tty runs append
        (parity: start-training.py:126-140)."""
        from safelife_tpu.__main__ import _confirm_data_dir

        d = tmp_path / "tmp-job"
        d.mkdir()
        (d / "stale.log").write_text("x")
        _confirm_data_dir(str(d))  # tmp* => silent overwrite
        assert not d.exists()

        d = tmp_path / "job"
        d.mkdir()
        (d / "ckpt").write_text("x")
        monkeypatch.setattr("sys.stdin.isatty", lambda: False)
        _confirm_data_dir(str(d))  # no tty => append (keep contents)
        assert (d / "ckpt").exists()

        monkeypatch.setattr("sys.stdin.isatty", lambda: True)
        monkeypatch.setattr("builtins.input", lambda *_: "abort")
        with pytest.raises(SystemExit):
            _confirm_data_dir(str(d))
        assert (d / "ckpt").exists()
        monkeypatch.setattr("builtins.input", lambda *_: "overwrite")
        _confirm_data_dir(str(d))
        assert not d.exists()

    def test_new_and_render(self, tmp_path):
        out = str(tmp_path / "gen.npz")
        r = self.run_cli("new", "random/prune-still", out, "--seed", "2")
        assert r.returncode == 0, r.stderr
        lvs = load_levels_npz(out)
        assert len(lvs) == 1
        r = self.run_cli("render", out)
        assert r.returncode == 0, r.stderr


class TestBoardEditing:
    """shift/resize/clip board utilities (parity:
    safelife_game.py:464-493,721-735)."""

    def _game(self):
        from safelife_tpu.core import cells as C
        from safelife_tpu.game import SafeLifeGame

        g = SafeLifeGame((8, 10))
        g.board[:] = 0
        g.board[2, 3] = C.LIFE
        g.board[g.agent_locs[0, 0], g.agent_locs[0, 1]] = C.PLAYER
        g.goals[1, 1] = C.COLOR_B
        return g

    def test_shift_wraps(self):
        from safelife_tpu.core import cells as C

        g = self._game()
        loc0 = g.agent_locs[0].copy()
        g.shift_board(2, 3)
        assert g.board[(2 + 3) % 8, (3 + 2) % 10] == C.LIFE
        assert g.goals[(1 + 3) % 8, (1 + 2) % 10] == C.COLOR_B
        np.testing.assert_array_equal(
            g.agent_locs[0], (loc0 + [3, 2]) % [8, 10])

    def test_resize_and_clip(self):
        g = self._game()
        g.resize_board(2, -1)
        assert g.board.shape == (7, 12)
        assert g.goals.shape == (7, 12)
        g2 = self._game()
        g2.clip_board(left=1, top=1)
        assert g2.board.shape == (7, 9)

    def test_resize_drops_out_of_bounds_agents(self):
        g = self._game()
        g.agent_locs = np.array([[6, 9]])
        g.resize_board(-4, -4)
        assert len(g.agent_locs) == 0


class TestInteractiveRecording:
    def test_save_recording_writes_npz(self, tmp_path):
        from safelife_tpu.interactive import GameLoop
        from safelife_tpu.io.iterator import SafeLifeLevelIterator

        it = SafeLifeLevelIterator("random/append-still", seed=11,
                                   num_workers=0)
        loop = GameLoop(it, record_to=str(tmp_path))
        loop.next_level(+1)
        loop.step_game("MOVE RIGHT")
        loop.step_game("MOVE DOWN")
        path = loop.save_recording()
        assert path and path.endswith("rec-001.npz")
        data = np.load(path)
        # initial state + two steps
        assert data["board"].shape[0] == 3
        assert data["goals"].shape == data["board"].shape
        assert data["agent_locs"].shape[0] == 3
        # second recording numbers up
        loop.step_game("MOVE LEFT")
        assert loop.save_recording().endswith("rec-002.npz")


class TestGraphicalFrontend:
    """The windowed (pygame) frontend runs headless under the SDL dummy
    driver: synthetic key events drive the shared GameLoop logic and
    frames render."""

    def test_headless_play_and_draw(self, monkeypatch, tmp_path):
        monkeypatch.setenv("SDL_VIDEODRIVER", "dummy")
        import pygame

        from safelife_tpu.interactive_gl import GraphicalGameLoop
        from safelife_tpu.io.iterator import SafeLifeLevelIterator

        it = SafeLifeLevelIterator("random/append-still", seed=21,
                                   num_workers=0)
        loop = GraphicalGameLoop(it, record_to=str(tmp_path), fps=1000)
        pygame.init()
        try:
            pygame.event.post(pygame.event.Event(
                pygame.KEYDOWN, key=pygame.K_RIGHT, unicode=""))
            pygame.event.post(pygame.event.Event(
                pygame.KEYDOWN, key=pygame.K_DOWN, unicode=""))
            loop.run(max_frames=3)
        finally:
            pygame.quit()
        assert loop.game.num_steps == 2  # both key events stepped the game

    def test_quit_key_saves_recording(self, monkeypatch, tmp_path):
        monkeypatch.setenv("SDL_VIDEODRIVER", "dummy")
        import os

        import pygame

        from safelife_tpu.interactive_gl import GraphicalGameLoop
        from safelife_tpu.io.iterator import SafeLifeLevelIterator

        it = SafeLifeLevelIterator("random/append-still", seed=22,
                                   num_workers=0)
        loop = GraphicalGameLoop(it, record_to=str(tmp_path), fps=1000)
        pygame.init()
        try:
            pygame.event.post(pygame.event.Event(
                pygame.KEYDOWN, key=pygame.K_UP, unicode=""))
            pygame.event.post(pygame.event.Event(
                pygame.KEYDOWN, key=pygame.K_q, unicode="q"))
            loop.run(max_frames=10)
        finally:
            pygame.quit()
        recs = [f for f in os.listdir(str(tmp_path))
                if f.startswith("rec-")]
        assert recs, "quit must flush the play recording"
