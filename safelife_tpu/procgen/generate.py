"""Top-level procedural level generation.

Semantics parity: reference ``safelife/proc_gen.py`` — region partitioning,
layered region population (fences, spawners, tree lattices, annealed
patterns, movable/hardened conversions, buffer zones, fountains, goal
extraction), agent/exit placement, the recursive randomization DSL
(``{choices: ...}`` / ``{uniform: [lo, hi]}``), and ``stability_mask``.
YAML level-parameter files written for the reference load unchanged.
"""

import numpy as np
from scipy import ndimage

from ..core import cells as C
from ..io.levels import Level
from ..core.scoring import DEFAULT_POINTS_TABLE
from ..utils.rng import get_rng, coinflip
from . import pattern as P
from .regions import build_fence, make_lattice, make_partitioned_regions

COLORS = {
    'black': 0,
    'red': C.COLOR_R,
    'green': C.COLOR_G,
    'blue': C.COLOR_B,
    'yellow': C.COLOR_R | C.COLOR_G,
    'magenta': C.COLOR_R | C.COLOR_B,
    'cyan': C.COLOR_G | C.COLOR_B,
    'white': C.RAINBOW_COLOR,
}

AGENT_PROPERTIES = {
    "alive": C.ALIVE,
    "pushable": C.PUSHABLE,
    "pullable": C.PULLABLE,
    "destructible": C.DESTRUCTIBLE,
    "frozen": C.FROZEN,
    "preserving": C.PRESERVING,
    "inhibiting": C.INHIBITING,
    "spawning": C.SPAWNING,
}

DEFAULT_AGENT = {
    'color': 'black',
    'flags': ['preserving', 'inhibiting'],
    'points_table': DEFAULT_POINTS_TABLE,
}

_MASK_ALL = (P.NEW_CELL_MASK | P.CAN_OSCILLATE_MASK
             | P.INCLUDE_VIOLATIONS_MASK)
_NOT_RAINBOW = np.uint16(~C.RAINBOW_COLOR & 0xFFFF)


def fix_random_values(val):
    """Resolve the stochastic-parameter DSL: ``{choices: ..., weights: ...}``
    picks an option, ``{uniform: [lo, hi]}`` samples a float; dicts recurse.
    Parity: ``proc_gen.py:170-196``."""
    if not isinstance(val, dict):
        return val
    if 'choices' in val:
        choices = val['choices']
        if isinstance(choices, list):
            keys = choices
            weights = val.get('weights')
            vals = (np.asanyarray(weights) if weights is not None
                    else np.ones(len(choices)))
        elif isinstance(choices, dict):
            keys = list(choices.keys())
            vals = np.array(list(choices.values()), dtype=float)
        else:
            raise ValueError("'choices' must be a list or a dict of weights")
        if (vals < 0).any() or vals.sum() <= 0:
            raise ValueError("choice weights must be non-negative and sum"
                             " to a positive value")
        return get_rng().choice(keys, p=vals / vals.sum())
    if 'uniform' in val:
        low, high = np.array(val['uniform'])
        return float(low + (high - low) * get_rng().random())
    return {key: fix_random_values(x) for key, x in val.items()}


def _gen_pattern_retry(board, mask, seeds=None, num_retries=10, **kwargs):
    """Retry ladder around the annealer (parity: proc_gen.py:199-231):
    lower min_fill on non-convergence, raise max_fill on overfull output."""
    min_fill = kwargs.setdefault('min_fill', 0.2)
    max_fill = kwargs.pop('max_fill', min_fill * 2)
    try:
        new_board = P.gen_pattern(board, mask, seeds=seeds, **kwargs)
    except P.InsufficientAreaException:
        return board
    except P.MaxIterException:
        if num_retries > 0:
            kwargs['min_fill'] = min_fill * 0.94
            kwargs['max_fill'] = max_fill
            return _gen_pattern_retry(board, mask, seeds, num_retries - 1,
                                      **kwargs)
        return board
    except P.BoardGenException:
        return board
    working = (mask & P.NEW_CELL_MASK) > 0
    fill_ratio = ((new_board != 0) & working).sum() / max(working.sum(), 1)
    if fill_ratio > max_fill:
        if num_retries > 0:
            kwargs['max_fill'] = 1.07 * max_fill
            return _gen_pattern_retry(board, mask, seeds, num_retries - 1,
                                      **kwargs)
        return board
    return new_board


def populate_region(mask, layer_params):
    """Fill one isolated region with layered content. Returns (board, goals).

    Parity: ``proc_gen.py:241-489``; see that docstring for the layer
    parameter reference (color, fences, spawners, pattern, tree_lattice,
    movable_walls, movable_trees, hardened_life, buffer_zone, target,
    fountains).
    """
    rng = get_rng()
    mask = np.asarray(mask, bool)
    border = ndimage.maximum_filter(mask, size=3, mode='wrap') ^ mask
    gen_mask = (mask * _MASK_ALL
                + border * P.INCLUDE_VIOLATIONS_MASK).astype(np.int32)
    board = np.zeros(mask.shape, dtype=np.uint16)
    foreground = np.zeros(mask.shape, dtype=bool)
    background = np.zeros(mask.shape, dtype=bool)
    background_color = np.zeros(mask.shape, dtype=bool)
    seeds = None
    max_period = 1

    for layer in layer_params:
        if not isinstance(layer, dict):
            raise ValueError("layer_params must be a list of dicts")
        layer = fix_random_values(layer)
        old_board = board.copy()
        gen_mask0 = gen_mask.copy()
        interior = ndimage.minimum_filter(
            (gen_mask & P.NEW_CELL_MASK) > 0, size=3, mode='wrap')
        color = COLORS.get(layer.get('color'), 0)

        fence_frac = layer.get('fences', 0.0)
        if fence_frac > 0:
            fences = build_fence(gen_mask & P.NEW_CELL_MASK)
            fences *= coinflip(fence_frac, fences.shape)
            gen_mask &= ~(fences * (P.NEW_CELL_MASK | P.CAN_OSCILLATE_MASK))
            board += fences.astype(np.uint16) * C.WALL

        spawners = layer.get('spawners', 0)
        if spawners > 0:
            _m = ((gen_mask0 & P.NEW_CELL_MASK) > 0) & interior
            new_cells = _m & coinflip(spawners, board.shape)
            if not new_cells.any() and _m.any():
                i, j = np.nonzero(_m)
                k = rng.choice(len(i))  # always place at least one spawner
                new_cells[i[k], j[k]] = True
            gen_mask[new_cells] ^= P.NEW_CELL_MASK
            board[new_cells] = C.SPAWNER + color

        tree_lattice = layer.get('tree_lattice')
        if tree_lattice is not None:
            if not isinstance(tree_lattice, dict):
                tree_lattice = {}
            h, w = board.shape
            stagger = tree_lattice.get('stagger', True)
            spacing = float(tree_lattice.get('spacing', 5))
            if not stagger:
                new_cells = make_lattice(h, w, spacing, spacing, 0)
            elif spacing <= 3:
                new_cells = make_lattice(h, w, 3, 3, 1)
            elif spacing == 4:
                new_cells = make_lattice(h, w, 10, 1, 3)
            elif spacing == 5:
                new_cells = make_lattice(h, w, 13, 1, 5)
            else:
                new_cells = make_lattice(h, w, 6, 3, 3)
            new_cells &= (gen_mask & P.NEW_CELL_MASK) > 0
            board[new_cells] = C.TREE + color

        period = 1
        if 'pattern' in layer:
            pattern_args = dict(layer['pattern'])
            period = pattern_args.get('period', 1)
            if period == 1:
                gen_mask2 = gen_mask & ~P.CAN_OSCILLATE_MASK
                pattern_args.update(period=max_period, osc_bonus=0)
            elif period == 0:
                gen_mask2 = gen_mask & ~P.INCLUDE_VIOLATIONS_MASK
                pattern_args.update(period=max_period, osc_bonus=0)
            elif period < max_period:
                raise ValueError(
                    "Periods for sequential layers in a region must be "
                    "either 0, 1, or at least as large as prior layers.")
            else:
                gen_mask2 = gen_mask
                max_period = period

            board = _gen_pattern_retry(board, gen_mask2, seeds,
                                       **pattern_args)

            # Freeze this layer's pattern against later edits: compute the
            # oscillation cycle and mask still/oscillating cells (and the
            # neighbors of oscillating cells).
            from ..core.advance_np import advance_board_np
            boards = [board.astype(np.int64)]
            for _ in range(1, max_period):
                boards.append(advance_board_np(boards[-1]))
            non_empty = np.array(boards) != 0
            still_cells = non_empty.all(axis=0)
            osc_cells = still_cells ^ non_empty.any(axis=0)
            osc_neighbors = ndimage.maximum_filter(osc_cells, size=3,
                                                   mode='wrap')
            gen_mask[osc_cells] &= ~(P.NEW_CELL_MASK
                                     | P.INCLUDE_VIOLATIONS_MASK)
            gen_mask[still_cells | osc_neighbors] &= \
                ~(P.NEW_CELL_MASK | P.CAN_OSCILLATE_MASK)

            new_mask = board != old_board
            life_mask = ((board & C.ALIVE) > 0) & new_mask
            board += (color * new_mask * life_mask).astype(np.uint16)
            seeds = ((board & C.ALIVE) > 0) & mask

        new_mask = board != old_board

        movable_walls = layer.get('movable_walls', 0)
        if movable_walls > 0:
            new_cells = coinflip(movable_walls, board.shape) * new_mask
            new_cells *= (board & _NOT_RAINBOW) == C.WALL
            board += (new_cells * C.MOVABLE).astype(np.uint16)

        movable_trees = layer.get('movable_trees', 0)
        if movable_trees > 0:
            new_cells = coinflip(movable_trees, board.shape) * new_mask
            new_cells *= (board & _NOT_RAINBOW) == C.TREE
            board += (new_cells * C.MOVABLE).astype(np.uint16)

        hardened_life = layer.get('hardened_life', 0)
        if hardened_life > 0:
            new_cells = coinflip(hardened_life, board.shape) * new_mask
            new_cells *= (board & _NOT_RAINBOW) == C.LIFE
            board -= (new_cells * C.DESTRUCTIBLE).astype(np.uint16)

        buffer_size = layer.get('buffer_zone', 0) * 2 + 1
        life_cells = (board & C.ALIVE) > 0
        buf = ndimage.maximum_filter(life_cells, size=buffer_size,
                                     mode='wrap')
        gen_mask[buf] &= ~P.NEW_CELL_MASK

        target = layer.get('target', 'board')
        if target == 'board':
            foreground[new_mask] = True
            if period > 0:
                background[new_mask] = True
        elif target == 'goals':
            background[new_mask] = True
            background_color[new_mask] = True
            foreground[new_mask & ((board & C.ALIVE) == 0)] = True
        elif target == 'both':
            foreground[new_mask] = True
            if period > 0:
                background[new_mask] = True
                background_color[new_mask] = True
        else:
            raise ValueError("Unexpected value for 'target': %s" % (target,))

        fountains = layer.get('fountains', 0)
        if fountains > 0:
            new_cells = coinflip(fountains, board.shape)
            new_cells *= (gen_mask & P.NEW_CELL_MASK) > 0
            neighbors = ndimage.maximum_filter(new_cells, size=3,
                                               mode='wrap')
            neighbors *= (gen_mask & P.NEW_CELL_MASK) > 0
            gen_mask[neighbors] = P.INCLUDE_VIOLATIONS_MASK
            if buffer_size > 1:
                buf = ndimage.maximum_filter(neighbors, size=buffer_size,
                                             mode='wrap')
                gen_mask[buf] &= ~P.NEW_CELL_MASK
            board[neighbors] = C.WALL + color
            board[new_cells] = C.FOUNTAIN + color
            foreground[new_cells] = True
            background[neighbors] = True
            background_color[neighbors] = True

    goals = board.copy()
    board *= foreground
    goals *= background
    goals &= ~np.uint16(C.SPAWNING)
    goals &= ~np.uint16(C.RAINBOW_COLOR * ~background_color)

    return board, goals


def add_agents_and_exit(board, regions, agents, agent_types):
    """Place agents in the buffer region and the exit as far from them as
    possible. Modifies board and regions in place.
    Parity: ``proc_gen.py:492-573``."""
    rng = get_rng()
    agent_vals, point_tables, agent_names = [], [], []
    agent_types = {'default': DEFAULT_AGENT, **agent_types}
    for agent_type in fix_random_values(agents):
        agent_type = fix_random_values(agent_type)
        if agent_type not in agent_types:
            continue
        agent = {**DEFAULT_AGENT, **agent_types[agent_type]}
        val = C.AGENT | C.FROZEN
        val |= COLORS.get(agent['color'], 0)
        for flag in agent['flags']:
            val |= AGENT_PROPERTIES.get(flag, 0)
        agent_vals.append(val)
        point_tables.append(np.asarray(agent['points_table']))
        agent_names.append(agent_type)

    if not agent_vals:
        return (np.zeros((0, 2), dtype=int), np.zeros((0, 8, 9), dtype=int),
                [])

    zero_reg = regions == 0
    zero_idx = np.array(np.nonzero(zero_reg)).T
    agent_vals = agent_vals[:len(zero_idx)]
    agent_locs = zero_idx[
        rng.choice(len(zero_idx), len(agent_vals), replace=False)]
    board[tuple(agent_locs.T)] = agent_vals

    # Exit at the max wrapped-L1 distance from all agents, within the buffer.
    row_dist = np.abs(np.arange(board.shape[0])[:, None] - agent_locs[:, 0])
    col_dist = np.abs(np.arange(board.shape[1])[:, None] - agent_locs[:, 1])
    row_dist = np.sum(np.minimum(row_dist, board.shape[0] - row_dist), -1)
    col_dist = np.sum(np.minimum(col_dist, board.shape[1] - col_dist), -1)
    dist = (row_dist[:, None] + col_dist[None, :]) * zero_reg
    k = np.argmax(dist)
    exit_loc = k // board.shape[1], k % board.shape[1]
    board[exit_loc] = C.LEVEL_EXIT | C.COLOR_R

    # Keep other regions away from the agents and exit.
    all_locs = np.append(agent_locs, [exit_loc], axis=0)
    n = np.array([[-1, 0, 1, -1, 0, 1, -1, 0, 1],
                  [-1, -1, -1, 0, 0, 0, 1, 1, 1]]).T
    new_locs = (all_locs[:, None] + n).reshape(-1, 2) % board.shape
    regions[tuple(new_locs.T)] = -1

    return agent_locs, np.array(point_tables), agent_names


def gen_game(board_shape=(25, 25), min_performance=-1, partitioning={},
             starting_region=None, later_regions=None, buffer_region=None,
             named_regions={}, agents=['default'], agent_types={}, **etc):
    """Generate one random level. Returns a
    :class:`~safelife_tpu.io.levels.Level`.
    Parity: ``proc_gen.py:576-687`` (same YAML parameter schema)."""
    board_shape = tuple(fix_random_values(board_shape))
    min_performance = fix_random_values(min_performance)
    partitioning = fix_random_values(partitioning)

    regions = make_partitioned_regions(board_shape, **partitioning)
    board = np.zeros(board_shape, dtype=np.uint16)
    goals = np.zeros(board_shape, dtype=np.uint16)

    agent_locs, points_table, agent_names = add_agents_and_exit(
        board, regions, agents, agent_types)

    for k in np.unique(regions)[2:]:
        mask = regions == k
        if starting_region is not None:
            region_name = fix_random_values(starting_region)
        else:
            region_name = fix_random_values(later_regions)
        if region_name not in named_regions:
            continue
        rboard, rgoals = populate_region(mask, named_regions[region_name])
        board += rboard
        goals += rgoals
        starting_region = None

    buffer_region = fix_random_values(buffer_region)
    if buffer_region in named_regions:
        mask = regions == 0
        rboard, rgoals = populate_region(mask, named_regions[buffer_region])
        board += rboard
        goals += rgoals

    # White-color the buffer goals as a visual hint.
    buffer_mask = (regions <= 0) & ((goals & C.RAINBOW_COLOR) == 0)
    goals[buffer_mask] += C.RAINBOW_COLOR

    board = board.astype(np.int32)
    # Agents start facing right (parity: gen_game passes orientation=1).
    board[tuple(agent_locs.T)] |= 1 << C.ORIENTATION_BIT

    if len(agent_locs) == 0:
        points_table = np.zeros((0, 8, 9), np.int32)
    return Level(
        board=board,
        goals=goals.astype(np.int32),
        agent_locs=np.asarray(agent_locs, np.int64).reshape(-1, 2),
        agent_names=np.array(agent_names),
        points_table=np.asarray(points_table, np.int32).reshape(-1, 8, 9),
        min_performance=float(min_performance),
        spawn_prob=0.3,
        name="procgen",
    )


def stability_mask(board, period=6, remove_agent=True):
    """Separable regions stable under the given period.
    Parity: ``proc_gen.py:690-731``."""
    from ..core.advance_np import advance_board_np

    board = np.asarray(board).astype(np.int64)
    if remove_agent:
        board = board * ((board & C.AGENT) == 0)

    neighborhood = np.ones((3, 3))
    alive = (board & C.ALIVE) // C.ALIVE
    neighbors = ndimage.convolve(alive, neighborhood, mode='wrap')
    max_neighbors = neighbors
    ever_alive = alive
    orig_board = board
    cur = board
    for _ in range(period):
        cur = advance_board_np(cur)
        alive = (cur & C.ALIVE) // C.ALIVE
        neighbors = ndimage.convolve(alive, neighborhood, mode='wrap')
        ever_alive = ever_alive | alive
        max_neighbors = np.maximum(max_neighbors, neighbors)
    board_end = cur
    is_boundary = (board_end & C.FROZEN) > 0
    is_boundary |= (ever_alive == 0) & (max_neighbors <= 2)
    labels, num_labels = P.wrapped_label(~is_boundary)
    mask = np.zeros(board.shape, dtype=bool)
    for idx in range(1, num_labels + 1):
        region = labels == idx
        if (board_end[region] == orig_board[region]).all():
            mask |= region
    return mask
