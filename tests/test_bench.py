"""Smoke coverage for the driver-facing bench harness (bench.py).

The driver records BENCH_r{N}.json from `python bench.py`; these tests pin
that the harness itself keeps working: the TPU-side step runs (on the
forced-CPU test backend), both torch-CPU replicas produce finite warm
throughputs, and the flow path accepts the tuned defaults.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def bench():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(root, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_bench_tpu_step_runs_tiny(bench):
    fps = bench.bench_tpu(1, 24, 40, steps=2)
    assert np.isfinite(fps) and fps > 0


def test_bench_torch_sr_baseline(bench):
    fps = bench.bench_torch_cpu_baseline(24, 40)
    assert fps is not None and np.isfinite(fps) and fps > 0


def test_bench_torch_flow_baseline(bench):
    fps = bench.bench_torch_cpu_flow_baseline(16, 24)
    assert fps is not None and np.isfinite(fps) and fps > 0


def test_bench_flow_tuned_defaults_run(bench):
    # the shipped defaults (windowed splat/warps + bf16 INR) at toy size;
    # window bounds larger than the image degenerate to exact ops
    fps = bench.bench_flow(1, 16, 24, steps=1, net="RBF",
                           splat_max_dy=8, splat_max_dx=8)
    assert np.isfinite(fps) and fps > 0


def test_guarded_baseline_contention_annotation(monkeypatch, bench):
    """The contention guard (VERDICT r3 weak #1): contaminated draws retry
    and are ANNOTATED contended; quiet draws record spin metadata."""
    vals = iter([0.2, 0.5, 0.5, 0.5, 0.5])       # contended throughout
    monkeypatch.setattr(bench, "_spin_time", lambda: next(vals))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    v, m = bench.guarded_baseline(lambda: 1.0, max_tries=2)
    assert v == 1.0 and m["contended"] and m["tries"] == 2
    assert m["spin_ratio"] >= 1.3 and m["loadavg"] is not None

    vals2 = iter([0.2, 0.21, 0.2])               # quiet machine
    monkeypatch.setattr(bench, "_spin_time", lambda: next(vals2))
    v, m = bench.guarded_baseline(lambda: 2.0)
    assert v == 2.0 and not m["contended"] and m["tries"] == 1

    vals3 = iter([0.2, 0.5, 0.5, 0.2, 0.21])     # quiets down on retry
    monkeypatch.setattr(bench, "_spin_time", lambda: next(vals3))
    v, m = bench.guarded_baseline(lambda: 3.0, max_tries=3)
    assert v == 3.0 and not m["contended"] and m["tries"] == 2

    # contention present for the WHOLE invocation: the relative ratio is
    # ~1.0, only the absolute quiet reference catches it
    vals4 = iter([0.5, 0.5, 0.5])
    monkeypatch.setattr(bench, "_spin_time", lambda: next(vals4))
    sleeps = []
    monkeypatch.setattr(bench.time, "sleep", sleeps.append)
    v, m = bench.guarded_baseline(lambda: 4.0, max_tries=1)
    assert v == 4.0 and m["contended"] and m["spin_ratio"] < 1.3
    assert m["spin_best_s"] == 0.5 and m["quiet_ref_s"] == 0.18
    assert sleeps == []                # no pointless sleep after the last try
