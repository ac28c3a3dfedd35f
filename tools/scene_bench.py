#!/usr/bin/env python
"""Measured TPU number for the scene-space gather (VERDICT r3 item 6: the
one pipeline with no perf row).

Synthesizes a realistic dense scene (N frames, noisy views of one textured
plane with per-frame camera translation and valid depth) and times the
jitted `gather_scene` warm: one fused program per (N, h, w, patch).

    PYTHONPATH=/root/.axon_site:/root/repo python tools/scene_bench.py \
        [--frames 24] [--height 480] [--width 640] [--reps 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_scene(n: int, h: int, w: int, seed: int = 0):
    from sin_inn_tpu.data.synthetic import synth_scene as _ss

    return _ss(n, h, w, seed)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--patch", type=int, default=3)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--window", default="auto", choices=("auto", "on", "off"),
                    help="windowed one-hot candidate read (gather.py)")
    args = ap.parse_args()

    from sin_inn_tpu.core import compile_cache
    compile_cache.enable()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sin_inn_tpu.scene_space.gather import gather_scene

    imgs, depths, poses, bds = synth_scene(args.frames, args.height,
                                           args.width)
    ji, jd = jnp.asarray(imgs), jnp.asarray(depths)
    fn = jax.jit(lambda a, b: gather_scene(a, b, poses, bds,
                                           patch=args.patch,
                                           window=args.window))
    out = fn(ji, jd)
    err0 = float(jnp.abs(out - ji[0]).mean())      # also a sanity number
    t0 = time.perf_counter()
    for _ in range(args.reps):
        out = fn(ji, jd)
    v = float(out.mean())                           # force execution (relay)
    dt = (time.perf_counter() - t0) / args.reps
    print(json.dumps({
        "check": "scene_gather_bench", "frames": args.frames,
        "size": [args.height, args.width], "patch": args.patch,
        "ms_per_gather": round(dt * 1000, 2),
        "frames_per_sec_equiv": round(args.frames / dt, 1),
        "mean_abs_vs_ref_frame": round(err0, 4), "out_mean": round(v, 4),
    }))


if __name__ == "__main__":
    main()
