"""Tuner (LR/batch finders), profiler, metrics writer, config validation."""

import json
import os

import jax
import numpy as np
import pytest

from sin_inn_tpu.core.config import FlowConfig, SRConfig
from sin_inn_tpu.core.metrics import MetricsWriter
from sin_inn_tpu.core.profiler import StepTimer
from sin_inn_tpu.data.synthetic import synthetic_sr_video
from sin_inn_tpu.data.sr_video import SRDataset, train_indices


def tiny_cfg(**kw):
    return SRConfig(architecture="IRN", scale=2, num_coupling=1, lr_window=1,
                    fps=30, hidden_channels=8, dense_gc=8, **kw)


def test_config_validation():
    with pytest.raises(ValueError):
        SRConfig(scale=3)                      # not a power of two
    with pytest.raises(ValueError):
        SRConfig(scale=2, lr_window=20)        # lr_dims >= total channels
    with pytest.raises(ValueError):
        FlowConfig(edge_func="bogus")
    with pytest.raises(ValueError):
        FlowConfig(occl="bogus")
    # tiny 2x config is valid (generalizes the reference scale%4 assert)
    assert SRConfig(scale=2, lr_window=1).z_dims == 36


def test_find_lr_picks_descending(key):
    from sin_inn_tpu.train.tuner import find_lr

    cfg = tiny_cfg()
    video = synthetic_sr_video(cfg, h=16, w=16)
    ds = SRDataset(video, cfg, train_indices(cfg, video.num_lr))
    batch = jax.device_put(ds.gather(np.arange(min(2, len(ds)))))
    lr = find_lr(cfg, batch, key, lrs=[1e-4, 1e-3], steps=4)
    assert lr in (1e-4, 1e-3)


def test_find_batch_size(key):
    from sin_inn_tpu.train.tuner import find_batch_size

    cfg = tiny_cfg()
    video = synthetic_sr_video(cfg, h=16, w=16)
    ds = SRDataset(video, cfg, train_indices(cfg, video.num_lr))

    def make_batch(b):
        return jax.device_put(ds.gather(np.arange(b) % len(ds)))

    b = find_batch_size(cfg, make_batch, key, start=1, limit=2)
    assert b in (1, 2)


def test_step_timer():
    t = StepTimer(window=3)
    t.start()
    for _ in range(5):
        t.stop()
    assert len(t._times) == 3
    assert t.mean >= 0.0
    assert t.throughput(8) >= 0.0


def test_metrics_writer(tmp_path):
    with MetricsWriter(str(tmp_path), run_name="r",
                       hyperparams={"lr": 1e-4}) as w:
        w.log(0, {"loss": 1.5})
        w.log(1, {"loss": np.float32(1.25)})
        w.log_artifact(str(tmp_path / "art.gif"), {"epe": 2.5})
    lines = open(tmp_path / "r.metrics.jsonl").read().strip().splitlines()
    assert len(lines) == 2
    assert json.loads(lines[1])["loss"] == 1.25
    assert json.load(open(tmp_path / "art.gif.json"))["epe"] == 2.5
    assert json.load(open(tmp_path / "r.config.json"))["lr"] == 1e-4
