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


def test_run_scenes_end_to_end(tmp_path, monkeypatch):
    """Scale-out path: train+test two tiny scenes, aggregate AEPE."""
    import numpy as np
    import imageio.v2 as io

    from sin_inn_tpu.core.config import FlowConfig
    from sin_inn_tpu.data.synthetic import moving_texture_video
    from sin_inn_tpu.parallel.launcher import aggregate_aepe, run_scenes

    monkeypatch.chdir(tmp_path)
    root = tmp_path / "scenes"
    for s in ("a", "b"):
        d = root / s
        d.mkdir(parents=True)
        frames = (moving_texture_video(3, 10, 14, seed=ord(s)) * 255
                  ).astype(np.uint8)
        for i, f in enumerate(frames):
            io.imwrite(str(d / f"frame_{i+1:04d}.png"), f)

    cfg = FlowConfig(input_video=str(root / "a"), name="t", size=10,
                     test_size=10, net="RBF", num_frequencies=8,
                     hidden_dim=16, num_layers=2, epochs=2, batch=2,
                     results_dir=str(tmp_path / "results"),
                     checkpoints_dir=str(tmp_path / "ckpt"))
    results = run_scenes(cfg, root=str(root),
                         out_path=str(tmp_path / "host0.json"))
    assert [r.scene for r in results] == ["a", "b"]
    assert all(r.num_frames == 2 for r in results)
    aepe = aggregate_aepe(results)
    assert np.isfinite(aepe)
    assert (tmp_path / "host0.json").exists()


def test_launcher_main_aggregate_and_forwarding(tmp_path, monkeypatch, capsys):
    """python -m sin_inn_tpu.parallel.launcher: --aggregate reduces per-host
    JSONs; otherwise flow-train flags are forwarded into the FlowConfig and
    run_scenes is invoked with --root/--out."""
    import sin_inn_tpu.parallel.launcher as L

    res = [SceneResult("a", 2.0, 1, {}), SceneResult("b", 5.0, 3, {})]
    p = tmp_path / "host0.json"
    p.write_text(json.dumps([r.__dict__ for r in res]))
    assert L.main(["--aggregate", str(p)]) == 0
    assert "Normalized AEPE: 4.25" in capsys.readouterr().out

    seen = {}

    def fake_run_scenes(cfg, root=None, out_path=None):
        seen.update(cfg=cfg, root=root, out_path=out_path)
        return res

    monkeypatch.setattr(L, "run_scenes", fake_run_scenes)
    assert L.main(["--root", str(tmp_path), "--out", str(p),
                   "--net", "PFF", "--epochs", "7",
                   "--splat-max-dy", "32"]) == 0
    assert seen["root"] == str(tmp_path) and seen["out_path"] == str(p)
    assert seen["cfg"].net == "PFF" and seen["cfg"].epochs == 7
    assert seen["cfg"].splat_max_dy == 32
    assert "Normalized AEPE: 4.25" in capsys.readouterr().out
