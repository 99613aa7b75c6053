"""Board partitioning and fencing for procedural generation.

Semantics parity targets in the reference:

* :func:`make_partitioned_regions` — ``proc_gen.py:44-110``: grow regions by
  a Dirichlet-process-like frontier expansion; regions stay >= 2 cells apart.
* :func:`build_fence` — ``proc_gen.py:113-167``: two-pass heuristic walling
  that keeps patterns from escaping a region.
* :func:`make_lattice` — ``proc_gen.py:234-238``.
"""

import numpy as np
from scipy import ndimage, signal

from ..utils.rng import get_rng


def make_partitioned_regions(shape, alpha=1.0, max_regions=5, min_regions=2):
    """Partition a wrapped board into distinct, well-separated regions.

    Returns an int array: 0 marks buffer cells between regions, k >= 1 marks
    region k's cells.
    """
    rng = get_rng()
    ring = np.array([[1, 1, 1], [1, 0, 1], [1, 1, 1]], dtype=np.int16)
    adjacent = np.array([(-1, 0), (1, 0), (0, -1), (0, 1)])
    nearby = np.meshgrid([-2, -1, 0, 1, 2], [-2, -1, 0, 1, 2])

    board = np.zeros(shape, dtype=np.int16)
    # perimeters[0] is the global unassigned frontier; perimeters[k] the
    # growth frontier of region k.
    perimeters = [{(i, j) for i in range(shape[0]) for j in range(shape[1])}]
    exclusions = [set()]
    while sum(len(p) for p in perimeters) > 0:
        weights = np.array([len(p) for p in perimeters], dtype=float)
        weights[0] = (min(alpha, weights[0])
                      if len(weights) <= max_regions else 1e-10)
        if len(weights) <= min_regions:
            weights[1:] = 1e-10
        weights /= weights.sum()
        k = rng.choice(len(perimeters), p=weights)
        plist = list(perimeters[k])
        i, j = plist[rng.choice(len(plist))]
        perimeters[0].discard((i, j))
        perimeters[k].discard((i, j))
        if (i, j) in exclusions[k]:
            continue
        exclusions[0].add((i, j))
        exclusions[k].add((i, j))
        b = board[(i + nearby[0]) % shape[0], (j + nearby[1]) % shape[1]]
        b[2, 2] = k or -1
        num_neighbors = signal.convolve2d(b != 0, ring, mode='valid')
        num_foreign = signal.convolve2d((b > 0) & (b != k), ring,
                                        mode='valid')
        if ((num_foreign > 0) & (num_neighbors > 2)).any() \
                or num_foreign[1, 1] > 0:
            continue
        if k == 0:
            k = len(perimeters)
            perimeters.append(set())
            exclusions.append(set())
        board[i, j] = k
        for i2, j2 in (adjacent + (i, j)) % shape:
            if board[i2, j2] == 0:
                perimeters[k].add((i2, j2))
    return board


def build_fence(mask, shuffle=True):
    """Wall off unmasked regions so nothing inside can escape.

    Two passes: greedily add fence cells where an outside cell could be
    born (3+ inside neighbors), then remove fence cells that turned out
    unnecessary.
    """
    rng = get_rng()
    mask = np.asarray(mask).astype(np.int32)
    _i = np.array([-1, -1, -1, 0, 0, 0, 1, 1, 1], dtype=np.int32)
    _j = np.array([-1, 0, 1, -1, 0, 1, -1, 0, 1], dtype=np.int32)
    neighbors = ndimage.convolve(mask, np.ones((3, 3)), mode='wrap')
    fence = np.zeros_like(mask)
    edge_i, edge_j = np.nonzero(mask * neighbors % 9)
    neighbors *= (1 - mask)
    if edge_i.size == 0:
        return fence

    if shuffle:
        k = rng.permutation(len(edge_i))
        edge_i, edge_j = edge_i[k], edge_j[k]
    for i, j in zip(edge_i, edge_j):
        n_i = (i + _i) % mask.shape[0]
        n_j = (j + _j) % mask.shape[1]
        if (neighbors[n_i, n_j] >= 3).any():
            neighbors[n_i, n_j] -= 1
            fence[i, j] += 1

    fence_i, fence_j = np.nonzero(fence)
    if shuffle:
        k = rng.permutation(len(fence_i))
        fence_i, fence_j = fence_i[k], fence_j[k]
    for i, j in zip(fence_i, fence_j):
        n_i = (i + _i) % mask.shape[0]
        n_j = (j + _j) % mask.shape[1]
        if (neighbors[n_i, n_j] < 2).all():
            neighbors[n_i, n_j] += 1
            fence[i, j] -= 1

    return fence


def make_lattice(h, w, col_skip, row_skip, stagger):
    """Periodic lattice mask used for tree grids."""
    rows = np.arange(h)[:, None]
    cols = np.arange(w)[None, :]
    return (rows % row_skip < 1) & (
        (cols + (rows // row_skip) * stagger) % col_skip < 1)
