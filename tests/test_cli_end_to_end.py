"""End-to-end CLI smoke tests on tiny on-disk datasets.

Exercises the full user surface: prepare -> sr train -> sr test, and
flow train -> flow test, through the real file formats (PNG frame dirs,
checkpoints, result artifacts) — the integration level the reference only
had as manual experiments (SURVEY §4).
"""

import json
import os
import os.path as path

import numpy as np
import pytest

from sin_inn_tpu.core.config import FlowConfig, PrepareConfig, SRConfig
from sin_inn_tpu.data.prepare import prepare_video
from sin_inn_tpu.data.synthetic import moving_texture_video
from sin_inn_tpu.train import loop as L


@pytest.fixture(scope="module")
def prepared_dataset(tmp_path_factory):
    """Write a tiny video, run the prepare pipeline, return (dataset, scene)."""
    import imageio.v2 as io

    root = tmp_path_factory.mktemp("ds")
    vid_dir = root / "videos"
    vid_dir.mkdir()
    frames = (moving_texture_video(80, 16, 16) * 255).astype(np.uint8)
    vpath = str(vid_dir / "clip.mp4")
    try:
        io.mimsave(vpath, list(frames), fps=30)
    except Exception:
        # no video codec available: fall back to a GIF container
        vpath = str(vid_dir / "clip.gif")
        io.mimsave(vpath, list(frames), format="GIF", fps=30)
    cfg = PrepareConfig(video=vpath, scale=2)
    dataset, scene = prepare_video(cfg)
    return dataset, scene


def test_prepare_outputs(prepared_dataset):
    dataset, scene = prepared_dataset
    hr = sorted(os.listdir(path.join(dataset, "hr_frames", scene)))
    lr = sorted(os.listdir(path.join(dataset, "lr_frames", scene)))
    dm = sorted(os.listdir(path.join(dataset, "lr_frames_demosaiced", scene)))
    assert len(hr) == len(lr) == len(dm) >= 70
    import imageio.v2 as io

    hr0 = io.imread(path.join(dataset, "hr_frames", scene, hr[0]))
    lr0 = io.imread(path.join(dataset, "lr_frames", scene, lr[0]))
    assert hr0.shape == (16, 16, 3)
    assert lr0.shape == (4, 4, 4)     # HR/(2*scale), 4-channel RGGB


def test_sr_train_and_test_cli_flow(prepared_dataset, tmp_path):
    dataset, scene = prepared_dataset
    cfg = SRConfig(dataset=dataset, scene=scene, architecture="IRN", scale=2,
                   num_coupling=1, lr_window=1, fps=30, batch_size=4,
                   epochs=2, save_iter=1, print_iter=1,
                   hidden_channels=8, dense_gc=8,
                   working_dir=str(tmp_path / "exp"))
    out = L.run_sr_train(cfg)
    assert "loss" in out["metrics"]
    assert np.isfinite(out["metrics"]["loss"])
    ckpts = os.listdir(path.join(out["exp_dir"], "checkpoints"))
    assert ckpts

    video_path = L.run_sr_test(cfg, state=out["state"], spec=out["spec"])
    assert os.path.exists(video_path)

    # resume path: training again continues from the checkpoint
    out2 = L.run_sr_train(cfg)
    assert int(out2["state"].step) >= int(out["state"].step)


def test_flow_train_and_test_cli_flow(tmp_path, monkeypatch):
    import imageio.v2 as io

    monkeypatch.chdir(tmp_path)
    scene_dir = tmp_path / "frames" / "scene_a"
    scene_dir.mkdir(parents=True)
    frames = (moving_texture_video(4, 12, 16) * 255).astype(np.uint8)
    for i, f in enumerate(frames):
        io.imwrite(str(scene_dir / f"frame_{i+1:04d}.png"), f)

    cfg = FlowConfig(input_video=str(scene_dir), name="t", size=12,
                     test_size=12, net="RBF", num_frequencies=8, hidden_dim=16,
                     num_layers=2, epochs=2, batch=2,
                     results_dir=str(tmp_path / "results"),
                     checkpoints_dir=str(tmp_path / "ckpt"))
    out = L.run_flow_train(cfg)
    assert np.isfinite(out["metrics"]["loss"])

    res = L.run_flow_test(cfg, scene=out["scene"])
    assert os.path.exists(res["flow_path"])
    # the returned artifact must be the FLOW gif, not the occlusion gif
    # (round-1 bug: the occlusion VideoWriter rebinding leaked into the dict)
    assert path.basename(res["flow_path"]).startswith("flow_")
    assert res["occl_path"] is not None     # occl='wang' default writes one
    assert path.basename(res["occl_path"]).startswith("occl_")
    meta = json.load(open(path.join(cfg.results_dir, "flow_scene_a_t.json")))
    assert meta["frames"] == res["num_frames"] > 0


def test_flow_sintel_submission_writer(tmp_path, monkeypatch):
    """`flow sintel` (reference main.py:109-130): one trained scene ->
    sintel_submission/<pass>/<scene>/frame_%04d.flo at frame resolution."""
    import imageio.v2 as io

    from sin_inn_tpu.data.flo import read_flo

    monkeypatch.chdir(tmp_path)
    root = tmp_path / "final"
    scene_dir = root / "alley_9"
    scene_dir.mkdir(parents=True)
    frames = (moving_texture_video(3, 12, 16) * 255).astype(np.uint8)
    for i, f in enumerate(frames):
        io.imwrite(str(scene_dir / f"frame_{i+1:04d}.png"), f)

    cfg = FlowConfig(input_video=str(scene_dir), name="sub_final", size=12,
                     test_size=12, net="RBF", num_frequencies=8,
                     hidden_dim=16, num_layers=2, epochs=2, batch=2,
                     results_dir=str(tmp_path / "results"),
                     checkpoints_dir=str(tmp_path / "ckpt"))
    L.run_flow_train(cfg)
    L.run_flow_sintel(cfg, outroot=str(tmp_path / "sintel_submission"))
    out = tmp_path / "sintel_submission" / "final" / "alley_9"
    flos = sorted(os.listdir(out))
    assert flos == ["frame_0001.flo", "frame_0002.flo"]
    assert read_flo(str(out / flos[0])).shape == (12, 16, 2)
