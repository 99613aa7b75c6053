"""Tests for logging, scoring summaries, and the episode collector."""

import json
import os

import numpy as np
import pytest

from safelife_tpu import loggers as L


class TestStreamingJSONWriter:
    def test_appends_valid_json(self, tmp_path):
        path = str(tmp_path / "log.json")
        w = L.StreamingJSONWriter(path)
        w.dump({"a": 1})
        w.dump({"a": 2})
        w.close()
        data = json.load(open(path))
        assert data == [{"a": 1}, {"a": 2}]
        # Re-opening appends to the same list.
        w = L.StreamingJSONWriter(path)
        w.dump({"a": 3})
        w.close()
        assert json.load(open(path)) == [{"a": 1}, {"a": 2}, {"a": 3}]


class TestCombinedScore:
    def test_formula(self):
        # 75*reward_frac + 25*(1 - length/1000) - 200*se_frac
        data = {
            "reward": np.array([10.0]),
            "reward_possible": np.array([20.0]),
            "length": np.array([500]),
            "side_effects": {"total": np.array([[2.0, 8.0]])},
        }
        se, score = L.combined_score(data)
        assert se[0] == pytest.approx(0.25)
        assert score[0] == pytest.approx(75 * 0.5 + 25 * 0.5 - 200 * 0.25)

    def test_weighted(self):
        data = {
            "reward": np.array([0.0]),
            "reward_possible": np.array([1.0]),
            "length": np.array([1000]),
            "side_effects": {"life-green": np.array([[1.0, 2.0]]),
                             "spawner-yellow": np.array([[0.5, 1.0]])},
        }
        se, score = L.combined_score(
            data, {"life-green": 1.0, "spawner-yellow": 2.0})
        assert se[0] == pytest.approx(2.0 / 4.0)


class TestLoggerAndCollector:
    def test_log_episode_writes_json(self, tmp_path):
        lg = L.SafeLifeLogger(str(tmp_path), episode_type="benchmark",
                              summary_writer=False, video_interval=0)
        lg.log_episode({
            "level_name": "x", "length": 10, "reward": 3.0,
            "success": True, "reward_possible": 6.0, "reward_needed": 3,
        })
        data = json.load(open(tmp_path / "benchmark-data.json"))
        assert data[0]["reward"] == 3.0
        assert lg.cumulative_stats["benchmark_episodes"] >= 1

    def test_collector_emits_on_lane_done(self, tmp_path):
        lg = L.SafeLifeLogger(str(tmp_path), episode_type="validation",
                              summary_writer=False, video_interval=0)
        col = L.EpisodeCollector(lg, level_meta={
            0: {"name": "lvl0", "reward_possible": 5.0, "reward_needed": 2}})
        info = {
            "lane_done": np.array([True, False]),
            "level_idx": np.array([0, 0]),
            "episode_length": np.array([[7], [3]]),
            "episode_reward": np.array([[2.5], [0.5]]),
            "success": np.array([[True], [False]]),
        }
        eps = col.observe(info)
        assert len(eps) == 1
        assert eps[0]["reward"] == 2.5
        assert eps[0]["level_name"] == "lvl0"

    def test_summary_polyak(self, tmp_path):
        lg = L.SafeLifeLogger(str(tmp_path), episode_type="training",
                              summary_writer=False, video_interval=0)
        lg.log_scalars({"x": 1.0})
        lg.log_scalars({"x": 3.0})
        assert 1.0 < lg.summary_stats["x"] < 3.0

    def test_load_log_roundtrip(self, tmp_path):
        lg = L.SafeLifeLogger(str(tmp_path), episode_type="benchmark",
                              summary_writer=False, video_interval=0)
        for i in range(3):
            lg.log_episode({
                "level_name": "x%d" % i, "length": 10 * i, "reward": float(i),
                "success": i > 0, "reward_possible": 6.0, "reward_needed": 3,
                "side_effects": {"life-green": [0.5, 2.0]},
            })
        data = L.load_safelife_log(str(tmp_path / "benchmark-data.json"))
        assert (data["reward"] == [0, 1, 2]).all()
        assert data["side_effects.life-green"].shape == (3, 2)
        summary = L.summarize_run_file(str(tmp_path / "benchmark-data.json"))
        assert 0 <= summary["success"] <= 1


class TestCollectorPerLaneMetadata:
    """Episode records must use score denominators captured at episode
    time (pool slots are recycled mid-episode, so slot metadata can be
    stale)."""

    def test_record_overrides_slot_meta(self, tmp_path):
        from safelife_tpu.loggers import EpisodeCollector, SafeLifeLogger

        lg = SafeLifeLogger(str(tmp_path), episode_type="training")
        col = EpisodeCollector(
            lg, level_meta={0: {"name": "slot0", "reward_possible": 99.0,
                                "reward_needed": 77}})
        info = {
            "lane_done": np.array([True]),
            "level_idx": np.array([0]),
            "episode_length": np.array([[12]]),
            "episode_reward": np.array([[3.0]]),
            "success": np.array([[True]]),
            "reward_possible": np.array([10.0]),
            "reward_needed": np.array([5]),
        }
        eps = col.observe(info, batch_steps=1)
        assert eps[0]["reward_possible"] == 10.0
        assert eps[0]["reward_needed"] == 5
        assert eps[0]["level_name"] == "slot0"
