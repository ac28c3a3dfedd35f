#!/usr/bin/env python
"""Anchor the BASELINE.md north-star ratio at the north-star shape.

VERDICT r3 weak #2: the >=20x 1080p claim was bridged by a pixel-linear
extrapolation from one tiny measured shape. This tool MEASURES both sides
across a shape ladder up to full 1080p — torch-CPU replica (the reference
per-step work, contention-guarded) and the TPU flagship step — and emits a
JSON table for docs/PERF.md. No extrapolation: the 1080p row is measured
directly on both sides (the torch side runs seconds-per-step there, so its
rep counts scale down with shape; still warm best-of-N).

    python tools/northstar.py [--torch-only | --tpu-only] [--batch 8]

Run on a QUIET machine (no pytest hogging the core): the contention guard
annotates, but the number you want recorded is the quiet one.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

sys.path.insert(0, os.path.join(_ROOT, "tools"))
from _load import load_script  # noqa: E402

bench = load_script("bench.py")

# (h, w, torch reps, torch steps-per-rep): /8-divisible ladder from the
# round-2/3 common shape to the BASELINE.json 1080p north star
LADDER = [
    (88, 160, 8, 4),
    (176, 320, 6, 3),
    (352, 640, 4, 2),
    (720, 1280, 3, 1),
    (1080, 1920, 2, 1),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch-only", action="store_true")
    ap.add_argument("--tpu-only", action="store_true")
    ap.add_argument("--batch", type=int, default=1,
                    help="TPU batch (torch replica is batch 1; per-frame "
                         "throughput is the compared unit)")
    ap.add_argument("--steps", type=int, default=20,
                    help="TPU chained steps per measurement")
    args = ap.parse_args()

    rows = []
    for h, w, reps, steps in LADDER:
        row = {"h": h, "w": w}
        if not args.tpu_only:
            val, meta = bench.guarded_baseline(
                lambda h=h, w=w, r=reps, s=steps:
                bench.bench_torch_cpu_baseline(h, w, timeout_s=900.0,
                                               reps=r, steps=s))
            row["torch_fps"] = round(val, 5) if val else None
            row["torch_ms_per_step"] = (round(1000.0 / val, 1)
                                        if val else None)
            row["contention"] = meta
        if not args.torch_only:
            try:
                fps = bench.bench_tpu(args.batch, h, w, args.steps)
                row["tpu_fps"] = round(fps, 2)
                row["tpu_ms_per_step"] = round(1000.0 * args.batch / fps, 2)
            except Exception as e:  # noqa: BLE001 - report partial ladder
                row["tpu_error"] = str(e)[:200]
        if row.get("torch_fps") and row.get("tpu_fps"):
            row["ratio"] = round(row["tpu_fps"] / row["torch_fps"], 1)
        rows.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({"check": "northstar_ladder", "batch": args.batch,
                      "rows": rows}))


if __name__ == "__main__":
    main()
