"""Procedural generation tests: partitioning invariants, fence containment,
annealed patterns, the full gen_game pipeline, wrapped labeling, and
host/device advance equivalence."""

import numpy as np
import pytest

import oracle as O
from conftest import random_board
from safelife_tpu.core import cells as C
from safelife_tpu.core.advance_np import advance_board_np
from safelife_tpu.procgen import pattern as P
from safelife_tpu.procgen.generate import (
    fix_random_values, gen_game, populate_region, stability_mask)
from safelife_tpu.procgen.regions import build_fence, make_partitioned_regions
from safelife_tpu.utils.rng import set_rng


class TestAdvanceNp:
    @pytest.mark.parametrize("seed", range(4))
    def test_matches_oracle(self, seed):
        rng = np.random.default_rng(seed)
        b = random_board(rng, (12, 12))
        ours = advance_board_np(b)
        theirs = O.advance_board(b, rng)
        assert (ours == theirs).all()


class TestPartitioning:
    def test_regions_are_separated(self):
        with set_rng(np.random.default_rng(0)):
            regions = make_partitioned_regions((26, 26), max_regions=4)
        ids = [k for k in np.unique(regions) if k > 0]
        assert 2 <= len(ids) <= 4
        # Distinct regions never touch (8-neighborhood separation).
        for k in ids:
            mask = regions == k
            grown = np.zeros_like(mask)
            for dr in (-1, 0, 1):
                for dc in (-1, 0, 1):
                    grown |= np.roll(np.roll(mask, dr, 0), dc, 1)
            others = (regions > 0) & (regions != k)
            assert not (grown & others).any()


class TestFence:
    def test_fence_contains_life(self):
        # A fully fenced region: no life strictly inside can ever escape.
        with set_rng(np.random.default_rng(1)):
            mask = np.zeros((16, 16), np.int32)
            mask[4:12, 4:12] = 1
            fence = build_fence(mask)
        # Fill the region with a worst-case block of life and advance.
        board = np.zeros((16, 16), np.int64)
        board[mask.astype(bool)] = O.ALIVE
        board[fence.astype(bool)] = O.FROZEN
        rng = np.random.default_rng(0)
        outside = ~(mask.astype(bool)
                    | np.roll(np.roll(mask, 1, 0), 0, 1).astype(bool))
        b = board
        for _ in range(8):
            b = O.advance_board(b, rng)
        # No life outside the fenced area + one-cell border.
        grown = mask.astype(bool)
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                grown |= np.roll(np.roll(mask.astype(bool), dr, 0), dc, 1)
        assert not ((b & O.ALIVE).astype(bool) & ~grown).any()


class TestRandomDSL:
    def test_uniform(self):
        with set_rng(np.random.default_rng(0)):
            v = fix_random_values({"uniform": [2.0, 3.0]})
        assert 2.0 <= v <= 3.0

    def test_choices(self):
        with set_rng(np.random.default_rng(0)):
            v = fix_random_values({"choices": ["a", "b"]})
        assert v in ("a", "b")

    def test_weighted_choices(self):
        with set_rng(np.random.default_rng(0)):
            v = fix_random_values({"choices": {"a": 0, "b": 1}})
        assert v == "b"

    def test_nested(self):
        with set_rng(np.random.default_rng(0)):
            v = fix_random_values({"x": {"uniform": [0, 1]}, "y": 3})
        assert 0 <= v["x"] <= 1 and v["y"] == 3


class TestGenPattern:
    def test_still_life_is_stable(self):
        rng = np.random.default_rng(5)
        mask = np.full((14, 14), 7, np.int32)
        out = P.gen_pattern(np.zeros((14, 14), np.uint16), mask,
                            period=1, min_fill=0.15, rng=rng)
        assert (advance_board_np(out) == out).all()
        assert (out != 0).mean() >= 0.1

    def test_insufficient_area(self):
        with pytest.raises(P.InsufficientAreaException):
            P.gen_pattern(np.zeros((8, 8), np.uint16),
                          np.zeros((8, 8), np.int32),
                          rng=np.random.default_rng(0))

    def test_python_fallback_agrees_on_tiny_board(self):
        # The pure-Python annealer and the C++ annealer implement the same
        # MCMC; check both produce valid still lifes on a small board.
        rng = np.random.default_rng(2)
        mask = np.full((8, 8), 7, np.int32)
        import os
        out_cpp = P.gen_pattern(np.zeros((8, 8), np.uint16), mask,
                                period=1, min_fill=0.1, rng=rng)
        os.environ["SAFELIFE_TPU_NO_NATIVE"] = "1"
        try:
            from safelife_tpu import native
            native._lib = None
            out_py = P.gen_pattern(np.zeros((8, 8), np.uint16), mask,
                                   period=1, min_fill=0.1, rng=rng)
        finally:
            del os.environ["SAFELIFE_TPU_NO_NATIVE"]
            native._lib = None
        for out in (out_cpp, out_py):
            assert (advance_board_np(out) == out).all()
            assert (out != 0).any()


class TestWrappedLabel:
    def test_wrap_connectivity(self):
        data = np.zeros((6, 6), np.int32)
        data[0, 0] = data[5, 5] = data[0, 5] = data[5, 0] = 1
        labels, n = P.wrapped_label(data)
        assert n == 1  # corners all touch through the wrap

    def test_distinct_components(self):
        data = np.zeros((8, 8), np.int32)
        data[1, 1] = 1
        data[5, 5] = 1
        labels, n = P.wrapped_label(data)
        assert n == 2
        assert labels[1, 1] != labels[5, 5]

    def test_agrees_with_python(self):
        rng = np.random.default_rng(0)
        data = (rng.random((10, 10)) < 0.4).astype(np.int32)
        l1, n1 = P.wrapped_label(data)
        l2, n2 = P._wrapped_label_python(data)
        assert n1 == n2
        # label names may differ; compare partitions
        for k in range(1, n1 + 1):
            cells = l1 == k
            assert len(np.unique(l2[cells])) == 1


class TestGenGame:
    def test_append_still_structure(self):
        with set_rng(np.random.default_rng(3)):
            from safelife_tpu.io.iterator import _load_param_file
            import os
            from safelife_tpu.io.levels import LEVEL_DIRECTORY
            params = _load_param_file(
                os.path.join(LEVEL_DIRECTORY, "random/append-still.yaml"))
            lv = gen_game(**params)
        assert lv.num_agents == 1
        assert (lv.board[tuple(lv.agent_locs[0])] & C.AGENT)
        assert ((lv.board & (C.EXIT | C.AGENT)) == C.EXIT).any()
        assert ((lv.goals & C.RAINBOW_COLOR) == C.COLOR_B).sum() > 5
        assert lv.min_performance == 0.5

    def test_seeding_reproducibility(self):
        from safelife_tpu.io.iterator import SafeLifeLevelIterator
        lvs1 = [next(SafeLifeLevelIterator("random/prune-still", seed=11))
                for _ in range(1)]
        lvs2 = [next(SafeLifeLevelIterator("random/prune-still", seed=11))
                for _ in range(1)]
        assert (lvs1[0].board == lvs2[0].board).all()
        assert (lvs1[0].goals == lvs2[0].goals).all()

    def test_playable_in_env(self):
        import jax
        import jax.numpy as jnp

        from safelife_tpu.env import env as E
        from safelife_tpu.env.state import pack_levels
        from safelife_tpu.io.iterator import SafeLifeLevelIterator

        it = SafeLifeLevelIterator("random/append-still", seed=5)
        pool = pack_levels([next(it) for _ in range(2)])
        cfg = E.EnvConfig(view_shape=(25, 25), auto_reset=True)
        state, obs = E.reset(cfg, pool, jax.random.PRNGKey(0), 4)
        key = jax.random.PRNGKey(1)
        for _ in range(10):
            key, k1, k2 = jax.random.split(key, 3)
            acts = jax.random.randint(k1, (4, 1), 0, 9, jnp.int32)
            state, obs, reward, done, info = E.step(cfg, pool, state,
                                                    acts, k2)
        assert np.isfinite(np.asarray(reward)).all()


class TestStabilityMask:
    def test_still_life_is_stable_region(self):
        board = np.zeros((12, 12), np.int64)
        board[4:6, 4:6] = C.LIFE  # block
        mask = stability_mask(board, period=2)
        assert mask[4, 4] and mask[5, 5]

    def test_unstable_region_excluded(self):
        board = np.zeros((12, 12), np.int64)
        board[4:7, 4] = C.LIFE  # blinker: stable period 2, unstable period 1
        assert stability_mask(board, period=2).any()
        assert not stability_mask(board, period=1)[4:7, 4].all()


class TestArchiveTooling:
    """gen_many/combine/expand round-trips (parity:
    level_iterator.py:290-357)."""

    def test_combine_expand_roundtrip(self, tmp_path):
        from safelife_tpu.io import levels as L
        from safelife_tpu.io.iterator import (
            SafeLifeLevelIterator, combine_levels, expand_levels, gen_many)

        d = tmp_path / "mini"
        gen_many("random/append-still", str(d), 3, num_workers=0, seed=11)
        archive = combine_levels(str(d))
        levels = L.load_levels(archive)
        assert len(levels) == 3
        out = expand_levels(archive, str(tmp_path / "expanded"))
        again = L.load_levels(out)
        assert len(again) == 3
        for a, b in zip(levels, sorted(again, key=lambda x: x.name)):
            np.testing.assert_array_equal(a.board, b.board)
            np.testing.assert_array_equal(a.goals, b.goals)

    def test_packaged_benchmarks_load(self):
        import os
        from safelife_tpu.env.state import pack_levels
        from safelife_tpu.io import levels as L
        from safelife_tpu.io.iterator import BENCHMARK_TASKS

        # The packaged canonical suite is the reference's frozen v1.0.
        base = os.path.join(L.LEVEL_DIRECTORY, "benchmarks", "v1.0")
        assert len(BENCHMARK_TASKS) == 8
        for task in BENCHMARK_TASKS:
            levels = L.load_levels(os.path.join(base, task + ".npz"))
            assert len(levels) == 100, task
        pool = pack_levels(levels[:10])
        assert pool.num_levels == 10


class TestDeviceAnnealer:
    """The device-batched annealer (procgen/anneal_jax.py): N lockstep
    Metropolis chains must produce valid patterns with the same output
    distribution as the host annealer."""

    def _mask(self, h=12, w=12):
        from safelife_tpu.procgen import anneal_jax as AJ
        mask = np.zeros((h, w), np.int32)
        mask[2:10, 2:10] = AJ.NEW_CELL_MASK | AJ.INCLUDE_VIOLATIONS_MASK
        mask[1:11, 1:11] |= AJ.INCLUDE_VIOLATIONS_MASK
        return mask

    def test_still_life_invariants(self):
        import jax
        import jax.numpy as jnp
        from safelife_tpu.procgen import anneal_jax as AJ

        mask = self._mask()
        n = 12
        out, ok, fill = AJ.anneal_batch(
            jnp.zeros((n, 12, 12), jnp.int32),
            jnp.tile(mask, (n, 1, 1)),
            jnp.tile((mask & 1) > 0, (n, 1, 1)),
            jnp.full((n,), 0.2, jnp.float32),
            jnp.full((n,), 40.0, jnp.float32),
            jnp.full((n,), 0.5, jnp.float32),
            jnp.full((n,), 0.0, jnp.float32),
            jnp.tile(np.array([0, 0, 100, 100, 0, 0, 100, 100],
                              np.float32), (n, 1)),
            jax.random.PRNGKey(3), period=1)
        out, ok, fill = map(np.asarray, (out, ok, fill))
        assert ok.all()
        assert (fill >= 0.2).all()
        area = ((mask & 1) > 0)
        for b in out.astype(np.int64):
            adv = advance_board_np(b)
            nonfrozen = (b & C.FROZEN) == 0
            # A converged still life: the alive plane is a fixed point.
            assert ((adv & 1) == (b & 1))[nonfrozen].all()
            # Writes stay inside the writable area.
            assert (b[~area] == 0).all()

    def test_zero_area_lane_fails_cleanly(self):
        import jax
        import jax.numpy as jnp
        from safelife_tpu.procgen import anneal_jax as AJ

        mask = np.stack([self._mask(), np.zeros((12, 12), np.int32)])
        boards = np.zeros((2, 12, 12), np.int32)
        boards[1, 5, 5] = C.WALL  # must pass through unchanged
        out, ok = AJ.anneal_with_retries_batched(
            boards, mask, (mask & 1) > 0,
            dict(min_fill=np.full(2, 0.2, np.float32),
                 max_fill=np.full(2, 0.4, np.float32),
                 max_iter=np.full(2, 40.0, np.float32),
                 temperature=np.full(2, 0.5, np.float32),
                 osc_bonus=np.zeros(2, np.float32),
                 penalties=np.tile(np.array(
                     [0, 0, 100, 100, 0, 0, 100, 100], np.float32), (2, 1)),
                 period=1),
            jax.random.PRNGKey(0))
        out, ok = np.asarray(out), np.asarray(ok)
        assert ok[0] and not ok[1]
        assert out[1, 5, 5] == C.WALL and (np.delete(out[1].ravel(),
                                                     5 * 12 + 5) == 0).all()

    def test_fill_distribution_matches_host(self):
        import jax
        import jax.numpy as jnp
        from safelife_tpu.procgen import anneal_jax as AJ

        mask = self._mask()
        n = 24
        out, ok, fill = AJ.anneal_batch(
            jnp.zeros((n, 12, 12), jnp.int32),
            jnp.tile(mask, (n, 1, 1)),
            jnp.tile((mask & 1) > 0, (n, 1, 1)),
            jnp.full((n,), 0.2, jnp.float32),
            jnp.full((n,), 40.0, jnp.float32),
            jnp.full((n,), 0.5, jnp.float32),
            jnp.full((n,), 0.0, jnp.float32),
            jnp.tile(np.array([0, 0, 100, 100, 0, 0, 100, 100],
                              np.float32), (n, 1)),
            jax.random.PRNGKey(7), period=1)
        fill = np.asarray(fill)[np.asarray(ok)]
        host_fill = []
        for s in range(24):
            with set_rng(np.random.default_rng(100 + s)):
                hb = P.gen_pattern(
                    np.zeros((12, 12), np.uint16), mask, min_fill=0.2,
                    max_iter=40, temperature=0.5, alive=(0., 0.),
                    wall=(100., 100.), tree=(100., 100.))
            host_fill.append(((hb != 0) & ((mask & 1) > 0)).sum() / 64)
        # Means within 25% relative — catches a broken rule/penalty layer
        # while robust to 24-sample noise (both sit near min_fill).
        assert abs(fill.mean() - np.mean(host_fill)) \
            < 0.25 * np.mean(host_fill)

    @pytest.mark.slow  # whole-level distribution sweep (~30s)
    def test_batched_gen_levels_distribution(self):
        """gen_games_batched produces append-still-like levels whose
        life/goal populations match the host generator's."""
        from safelife_tpu.io.iterator import SafeLifeLevelIterator

        n = 6
        host = SafeLifeLevelIterator("random/append-still", seed=42,
                                     num_workers=0)
        dev = SafeLifeLevelIterator("random/append-still", seed=42,
                                    device_batch=n)
        hl = [next(host) for _ in range(n)]
        dl = [next(dev) for _ in range(n)]

        def stats(levels):
            b = np.array([lv.board for lv in levels], np.int64)
            g = np.array([lv.goals for lv in levels], np.int64)
            return np.array([((b & 1) > 0).mean(), (g != 0).mean(),
                             ((b & C.FROZEN) > 0).mean()])

        hs, ds = stats(hl), stats(dl)
        np.testing.assert_allclose(ds, hs, rtol=0.5, atol=0.01)
        for lv in dl:
            assert len(lv.agent_locs) == 1
            assert ((lv.board & C.EXIT) > 0).sum() == 1

    def test_batched_refill_whole_rounds(self, monkeypatch):
        """The device-batched queue refills in whole device_batch rounds
        (only when empty) — per-__next__ top-ups would degenerate to
        single-chain annealer calls after the first fill."""
        from safelife_tpu.io import iterator as I
        from safelife_tpu.procgen import batched as B

        sizes = []
        real = B.gen_games_batched

        def spy(param_dicts, rngs, key):
            sizes.append(len(param_dicts))
            return real(param_dicts, rngs, key)

        monkeypatch.setattr(B, "gen_games_batched", spy)
        it = I.SafeLifeLevelIterator("random/append-still-easy", seed=7,
                                     device_batch=4)
        for _ in range(8):
            next(it)
        assert sizes == [4, 4], sizes

    def test_batched_gen_deterministic(self):
        from safelife_tpu.io.iterator import SafeLifeLevelIterator

        a = SafeLifeLevelIterator("random/append-still-easy", seed=5,
                                  device_batch=4)
        b = SafeLifeLevelIterator("random/append-still-easy", seed=5,
                                  device_batch=4)
        for _ in range(4):
            la, lb = next(a), next(b)
            np.testing.assert_array_equal(la.board, lb.board)
            np.testing.assert_array_equal(la.goals, lb.goals)
