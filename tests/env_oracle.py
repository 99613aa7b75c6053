"""Full-environment numpy oracle: game scoring + env step semantics written
directly from the reference specification, loop-based, independent of the
TPU implementation. Used to validate safelife_tpu.env step-for-step."""

import numpy as np

import oracle as O

DEFAULT_POINTS_TABLE = np.array([
    [+0, -1, +0, +0, +0, +0, +0, +0, 0],
    [-3, +3, -3, +0, -3, +0, -3, -3, 0],
    [+0, -3, +5, +0, +0, +0, +3, +0, 0],
    [-3, +0, +0, +3, +0, +0, +0, +0, 0],
    [+3, -3, +3, +0, +5, +3, +3, +3, 0],
    [-3, +3, -3, +0, -3, +5, -3, -3, 0],
    [+3, -3, +3, +0, +3, +0, +5, +3, 0],
    [+0, -1, +0, +0, +0, +0, +0, +0, 0],
], dtype=np.int64)

RAINBOW = 7 << 9
LEVEL_EXIT = O.FROZEN | O.EXIT
COLOR_R = 1 << 9


class GameOracle:
    def __init__(self, board, goals, agent_locs, points_table=None,
                 min_performance=-1.0, spawn_prob=0.3, rng=None):
        self.board = np.array(board, dtype=np.int64)
        self.goals = np.array(goals, dtype=np.int64)
        self.agent_locs = np.array(agent_locs, dtype=np.int64).reshape(-1, 2)
        n = len(self.agent_locs)
        if points_table is None:
            points_table = np.tile(DEFAULT_POINTS_TABLE, (n, 1, 1))
        self.points_table = np.asarray(points_table, dtype=np.int64)
        self.min_performance = float(min_performance)
        self.spawn_prob = float(spawn_prob)
        self.rng = rng or np.random.default_rng()
        self.num_steps = 0
        self._static_goals = None

        # exit locations from the initial board
        exits = (self.board & (O.EXIT | O.AGENT)) == O.EXIT
        self.exit_locs = np.nonzero(exits)

        self.initial_counts = O.alive_counts(self.board, self.goals)
        gen = O.AGENT | O.ALIVE | O.SPAWNING
        self.initial_colors = np.zeros(9, dtype=bool)
        cols = self.board[(self.board & gen) > 0] & RAINBOW
        self.initial_colors[np.unique(cols) >> 9] = True
        self.initial_colors[8] = True

    # -- scoring ---------------------------------------------------------
    def alive_counts(self):
        return O.alive_counts(self.board, self.goals)

    def agent_cells(self):
        return np.array([self.board[y, x] for y, x in self.agent_locs])

    def has_exited(self):
        return self.agent_cells() & (O.AGENT | O.EXIT) == O.EXIT

    def agent_is_active(self):
        return self.agent_cells() & O.AGENT > 0

    def current_points(self):
        counts = self.alive_counts()
        pts = (self.points_table * counts).reshape(len(self.agent_locs), -1)
        return pts.sum(axis=1) + 1.0 * self.has_exited()

    def points_earned(self):
        delta = self.alive_counts() - self.initial_counts
        pts = (self.points_table * delta).reshape(len(self.agent_locs), -1)
        return pts.sum(axis=1) + 1.0 * self.has_exited()

    def initial_available_points(self):
        goal_counts = self.initial_counts.sum(axis=1)
        table = self.points_table * self.initial_colors
        max_points = table.max(axis=2)
        total = (max_points * goal_counts).sum(axis=1)
        init = (self.points_table * self.initial_counts)
        init = init.reshape(len(self.agent_locs), -1).sum(axis=1)
        return total - init

    def required_points(self):
        req = self.min_performance * self.initial_available_points()
        return np.maximum(0, np.int64(np.ceil(req)))

    def can_exit(self):
        earned = np.maximum(0, self.points_earned())
        return self.agent_is_active() & (earned >= self.required_points())

    def update_exit_colors(self):
        ce = self.can_exit()
        idx = tuple(self.agent_locs.T)
        self.board[idx] &= ~O.EXIT
        self.board[idx] |= O.EXIT * ce
        exit_type = LEVEL_EXIT | (COLOR_R if ce.any() else 0)
        self.board[self.exit_locs] = exit_type

    # -- dynamics --------------------------------------------------------
    def execute_actions(self, actions):
        self.board, self.agent_locs = O.execute_actions(
            self.board, self.agent_locs, actions)

    def advance(self):
        self.num_steps += 1
        self.board = O.advance_board(self.board, self.rng, self.spawn_prob)
        if not self._static_goals:
            new_goals = O.advance_board(self.goals, self.rng, self.spawn_prob)
            if self._static_goals is None:
                self._static_goals = (
                    not (new_goals & O.SPAWNING).any()
                    and (new_goals == self.goals).all())
            self.goals = new_goals


class EnvOracle:
    """Reference env semantics (safelife_env.py:105-218), multi-agent form."""

    def __init__(self, game, view_shape=(15, 15),
                 output_channels=tuple(range(16)) + (25, 26, 27),
                 time_limit=1000, remove_white_goals=True):
        self.game = game
        self.view_shape = view_shape
        self.output_channels = output_channels
        self.time_limit = time_limit
        self.remove_white_goals = remove_white_goals

    def reset_bookkeeping(self):
        g = self.game
        g.update_exit_colors()
        self._old_value = g.current_points()
        n = len(g.agent_locs)
        self.is_active = np.ones(n, dtype=bool)
        self.episode_reward = np.zeros(n, dtype=np.float64)
        self.episode_length = np.zeros(n, dtype=np.int64)
        return self.get_obs()

    def get_obs(self):
        g = self.game
        h, w = g.board.shape
        vh, vw = self.view_shape
        goals = g.goals & RAINBOW
        if self.remove_white_goals:
            goals = goals * (goals != RAINBOW)
        packed = g.board.astype(np.int64) + (goals.astype(np.int64) << 16)

        views = []
        for (y0, x0) in g.agent_locs:
            rows = (np.arange(y0 - vh // 2, y0 - vh // 2 + vh)) % h
            cols = (np.arange(x0 - vw // 2, x0 - vw // 2 + vw)) % w
            view = packed[np.ix_(rows, cols)].copy()
            iy, ix = g.exit_locs
            jy = (iy - y0 + h // 2) % h - h // 2
            jx = (ix - x0 + w // 2) % w - w // 2
            jy = np.clip(jy + vh // 2, 0, vh - 1)
            jx = np.clip(jx + vw // 2, 0, vw - 1)
            for a, b, c, d in zip(jy, jx, iy, ix):
                view[a, b] = packed[c, d]
            views.append(view)
        views = np.stack(views) if views else np.zeros((0, vh, vw), np.int64)
        if self.output_channels:
            shift = np.array(self.output_channels)
            views = (views[..., None] >> shift) & 1
            views = views.astype(np.uint8)
        return views

    def step(self, actions):
        g = self.game
        g.execute_actions(actions)
        g.advance()
        g.update_exit_colors()

        times_up = g.num_steps >= self.time_limit
        value = g.current_points()
        reward = (value - self._old_value) * self.is_active
        self._old_value = value
        success = g.has_exited()
        done = ~g.agent_is_active() | times_up
        self.episode_reward += reward
        self.episode_length += self.is_active
        self.is_active &= ~done
        return self.get_obs(), reward, done, {
            "times_up": times_up, "success": success}
