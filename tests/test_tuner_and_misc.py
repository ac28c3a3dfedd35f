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


class _FakeWandbRun:
    def __init__(self):
        self.logged = []

    def log(self, payload, step=None):
        self.logged.append((step, payload))

    def finish(self):
        pass


class _FakeWandb:
    """Minimal wandb stand-in capturing Video/Image media calls."""

    def __init__(self):
        self.run = _FakeWandbRun()

    def init(self, **kw):
        return self.run

    class Video:
        def __init__(self, arr, fps=4, format=None):
            self.shape = arr.shape

    class Image:
        def __init__(self, arr):
            self.shape = arr.shape


def test_wandb_media_logging(monkeypatch, tmp_path):
    """Media parity (reference trainer.py:114-131, main.py:60-69): with wandb
    enabled, flow train logs source video media and flow test logs predicted
    flow + occlusion videos."""
    import sys

    import numpy as np

    fake = _FakeWandb()
    monkeypatch.setitem(sys.modules, "wandb", fake)

    from sin_inn_tpu.core.config import FlowConfig
    from sin_inn_tpu.data.flow_media import FlowMedia
    from sin_inn_tpu.data.synthetic import moving_texture_video
    from sin_inn_tpu.train import loop as L

    frames = moving_texture_video(4, 8, 8)
    media = FlowMedia(frames, flow=np.zeros((3, 8, 8, 2), np.float32))
    cfg = FlowConfig(net="RBF", num_frequencies=8, hidden_dim=16,
                     num_layers=2, epochs=1, batch=3, mesh_data=1,
                     checkpoints_dir=str(tmp_path / "ck"),
                     results_dir=str(tmp_path / "res"))
    out = L.run_flow_train(cfg, media=media, scene="s", use_wandb=True,
                           val_media=media)
    keys = [k for _, payload in fake.run.logged for k in payload]
    assert "media/source" in keys
    assert "media/gt_flow" in keys

    L.run_flow_test(cfg, media=media, scene="s", state=out["state"],
                    spec=out["spec"], consts=out["consts"],
                    ctrl_cfg=out["ctrl_cfg"], use_wandb=True)
    keys = [k for _, payload in fake.run.logged for k in payload]
    assert any(k.startswith("flow/") for k in keys)
    assert any(k.startswith("occl/") for k in keys)


def test_wandb_sr_sample_media(monkeypatch, tmp_path):
    import sys

    import numpy as np

    fake = _FakeWandb()
    monkeypatch.setitem(sys.modules, "wandb", fake)

    from sin_inn_tpu.core.config import SRConfig
    from sin_inn_tpu.data.synthetic import synthetic_sr_video
    from sin_inn_tpu.train import loop as L

    cfg = SRConfig(scale=2, num_coupling=1, lr_window=1, fps=30,
                   architecture="IRN", hidden_channels=8, dense_gc=8,
                   batch_size=4, val_batch_size=4, epochs=1, save_iter=10,
                   print_iter=1, mesh_data=1,
                   working_dir=str(tmp_path / "exp"))
    video = synthetic_sr_video(cfg, h=16, w=16)
    L.run_sr_train(cfg, video=video, use_wandb=True)
    keys = [k for _, payload in fake.run.logged for k in payload]
    assert "media/sample_hr" in keys


def test_metrics_writer_non_primary_is_noop(tmp_path):
    from sin_inn_tpu.core.metrics import MetricsWriter

    w = MetricsWriter(str(tmp_path / "m"), run_name="r", primary=False)
    w.log(0, {"a": 1.0})
    w.log_artifact(str(tmp_path / "x.gif"), {"b": 2})
    w.close()
    import os
    assert not os.path.exists(str(tmp_path / "m"))


def test_flow_train_profile_trace(tmp_path, rng):
    """--profile N writes a jax.profiler trace under <ckpt>/trace."""
    import numpy as np
    import os

    from sin_inn_tpu.core.config import FlowConfig
    from sin_inn_tpu.data.flow_media import FlowMedia
    from sin_inn_tpu.train.loop import run_flow_train

    video = rng.rand(3, 12, 16, 3).astype(np.float32)
    cfg = FlowConfig(net="RBF", num_frequencies=8, hidden_dim=16,
                     num_layers=2, epochs=3, profile_steps=2,
                     checkpoints_dir=str(tmp_path / "ckpt"),
                     results_dir=str(tmp_path / "res"))
    run_flow_train(cfg, media=FlowMedia(video), scene="prof")
    trace_dir = tmp_path / "ckpt" / "prof" / "temp" / "trace"
    assert trace_dir.is_dir()
    found = [f for _, _, fs in os.walk(trace_dir) for f in fs]
    assert found, "no trace files written"


def test_trace_window_counts_exactly_n(monkeypatch, tmp_path):
    """TraceWindow traces exactly N steps after the warmup (regression for
    an off-by-one that captured N-1)."""
    import jax

    from sin_inn_tpu.core.profiler import TraceWindow

    events = []
    monkeypatch.setattr(jax.profiler, "start_trace",
                        lambda d: events.append(("start",)))
    monkeypatch.setattr(jax.profiler, "stop_trace",
                        lambda: events.append(("stop",)))
    for n in (1, 2, 5):
        events.clear()
        tw = TraceWindow(str(tmp_path), n, warmup=2)
        traced = 0
        for i in range(20):
            before = tw._active
            tw.tick()
            if before and events and events[-1] != ("stop",):
                traced += 1
            elif before and events[-1] == ("stop",):
                traced += 1
        assert tw.done and events == [("start",), ("stop",)]
        # steps traced = ticks between start (exclusive) and stop (inclusive)
        assert traced == n, f"N={n}: traced {traced}"


def test_graceful_stop_catches_sigterm():
    import os
    import signal

    from sin_inn_tpu.core.preempt import GracefulStop

    prev = signal.getsignal(signal.SIGTERM)
    with GracefulStop() as stop:
        assert not stop
        os.kill(os.getpid(), signal.SIGTERM)
        for _ in range(100):      # pending signals run between bytecodes
            if stop:
                break
        assert stop
    # prior handler restored
    assert signal.getsignal(signal.SIGTERM) is prev


def test_flow_train_loop_checkpoints_on_preemption(tmp_path, rng, monkeypatch):
    """A stop request mid-run makes the loop checkpoint the CURRENT epoch
    and return early — no work lost to the save cadence."""
    import numpy as np

    from sin_inn_tpu.core.checkpoint import CheckpointStore
    from sin_inn_tpu.core.config import FlowConfig
    from sin_inn_tpu.data.flow_media import FlowMedia
    from sin_inn_tpu.train import loop as L

    class FakeStop:
        def __init__(self):
            self.checks = 0

        def install(self):
            return self

        def restore(self):
            pass

        def __bool__(self):
            self.checks += 1
            return self.checks >= 3          # request stop at epoch 3

    monkeypatch.setattr(L, "GracefulStop", FakeStop)
    video = rng.rand(3, 12, 16, 3).astype(np.float32)
    cfg = FlowConfig(net="RBF", num_frequencies=8, hidden_dim=16,
                     num_layers=2, epochs=500,   # save cadence = every 5
                     checkpoints_dir=str(tmp_path / "ckpt"),
                     results_dir=str(tmp_path / "res"))
    L.run_flow_train(cfg, media=FlowMedia(video), scene="pre")
    store = CheckpointStore(L.flow_ckpt_dir(cfg, "pre"))
    assert store.latest_step() == 3
