#!/usr/bin/env python
"""End-to-end TPU check of the FLOW TRAIN LOOP control plane at Sintel size.

Unlike tools/validate.py (which drives the raw jitted step), this drives
``run_flow_train`` itself, so it exercises on real hardware everything the
loop adds around the step: the GT window probe, the per-batch window
monitor, the mid-training refit, the window_bounds.json sidecar, and the
checkpoint cadence. Reports steady-state frames/s (loop overhead included)
plus the effective bounds the run converged to.

Usage:  PYTHONPATH=/root/.axon_site:/root/repo \
            python tools/loop_check.py [--epochs 30] [--no-gt] [--size 436]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthetic_media(n=4, h=436, w=1024, dx=-2.0, blur=9):
    """Shift sequence with uniform GT flow (the validate.py fixture)."""
    import numpy as np
    rng = np.random.RandomState(0)
    big = rng.rand(h, w + 64, 3).astype(np.float32)
    k = np.ones(blur, np.float32) / blur
    for ax in (0, 1):
        big = np.apply_along_axis(
            lambda v: np.convolve(v, k, mode="same"), ax, big)
    frames = np.stack([big[:, 32 + int(i * -dx): 32 + int(i * -dx) + w]
                       for i in range(n)])
    flow = np.zeros((n - 1, h, w, 2), np.float32)
    flow[..., 0] = dx
    return frames, flow


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--size", type=int, default=436)
    ap.add_argument("--no-gt", action="store_true",
                    help="no GT flow: exercises the refit-only path")
    ap.add_argument("--dir", default=None,
                    help="persistent work dir: a SECOND run restores the "
                         "first run's converged window-bounds sidecar (and "
                         "checkpoint), so its frames_per_sec is the refit "
                         "FIXPOINT steady state instead of being diluted "
                         "by the mid-run rebuild compiles")
    args = ap.parse_args()

    from sin_inn_tpu.core import compile_cache
    compile_cache.enable()
    from sin_inn_tpu.core.config import FlowConfig
    from sin_inn_tpu.data.flow_media import FlowMedia
    from sin_inn_tpu.train.loop import run_flow_train

    h = args.size
    w = 1024 if h == 436 else max(128, int(h * 1024 / 436) // 128 * 128)
    frames, flow = synthetic_media(h=h, w=w)
    media = FlowMedia(frames, None if args.no_gt else flow)

    tmp = args.dir or tempfile.mkdtemp(prefix="loopcheck_")
    cfg = FlowConfig(net="RBF", epochs=args.epochs, lr=3e-3,
                     batch=len(media), compute_dtype="bfloat16",
                     checkpoints_dir=os.path.join(tmp, "ck"),
                     results_dir=os.path.join(tmp, "res"),
                     val_iter=10 ** 9)
    t0 = time.time()
    out = run_flow_train(cfg, media=media, scene="loopcheck")
    wall = time.time() - t0
    eff = out["cfg"]
    sidecar = os.path.join(cfg.checkpoints_dir, "loopcheck", cfg.name,
                           "window_bounds.json")
    print(json.dumps({
        "check": "flow_loop_e2e", "epochs": args.epochs, "size": [h, w],
        "gt": not args.no_gt, "wall_s": round(wall, 1),
        "frames_per_sec": round(out["metrics"].get("frames_per_sec", 0), 2),
        "final_loss": round(out["metrics"].get("loss", 0.0), 5),
        "epe": round(out["metrics"].get("epe", -1.0), 4),
        "bounds": {k: getattr(eff, k) for k in
                   ("splat_max_dy", "splat_max_dx",
                    "splat_local_dy", "splat_local_dx")},
        "sidecar": os.path.exists(sidecar),
    }))


if __name__ == "__main__":
    main()
