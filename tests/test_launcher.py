"""Multi-scene launcher tests (aggregation + host sharding; no training)."""

import json

import pytest

from sin_inn_tpu.parallel.launcher import (SceneResult, aggregate_aepe,
                                           aggregate_from_files,
                                           shard_for_process)


def test_shard_for_process_round_robin():
    scenes = [f"s{i}" for i in range(7)]
    shards = [shard_for_process(scenes, i, 3) for i in range(3)]
    assert sorted(sum(shards, [])) == sorted(scenes)
    assert shards[0] == ["s0", "s3", "s6"]
    assert shard_for_process(scenes, 0, 1) == scenes


def test_aggregate_aepe_frame_weighted():
    results = [SceneResult("a", epe=1.0, num_frames=10, metrics={}),
               SceneResult("b", epe=3.0, num_frames=30, metrics={})]
    assert aggregate_aepe(results) == pytest.approx(2.5)
    assert aggregate_aepe([]) == 0.0


def test_aggregate_from_files(tmp_path):
    f1 = tmp_path / "host0.json"
    f2 = tmp_path / "host1.json"
    json.dump([SceneResult("a", 1.0, 10, {}).__dict__], open(f1, "w"))
    json.dump([SceneResult("b", 3.0, 30, {}).__dict__], open(f2, "w"))
    assert aggregate_from_files([str(f1), str(f2)]) == pytest.approx(2.5)
