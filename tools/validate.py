"""Reproducible flagship-scale convergence validation (run on TPU).

Re-runs the convergence evidence recorded in README.md "Numbers" on synthetic
single-video fixtures, printing one JSON line per milestone. These are the
scripts behind the claims, kept in-repo so the numbers can be regenerated:

  python tools/validate.py sr   [--epochs 60]
  python tools/validate.py flow [--iters 1500] [--net PFF]
                                [--splat-max-dy 64] [--splat-max-dx 128]

SR: SRF 4x, 21-frame window, batch 8 @ 640x360 (the reference 1080Ti config,
/root/reference/main.py:25-27) on a bayer-binned moving-texture video —
expects a monotone loss drop and rising HR-PSNR.

Flow: INR at Sintel size (436x1024) on a 2 px/frame horizontal-shift
sequence with the windowed splat + windowed metric warps, using the CLIP
pipeline's flow_scale=1.0 convention (data/flow_media.py load_video_clip —
precomputed-flow clips train with scale 1). Expects EPE vs the analytic
flow to fall from ~2 px (random init) to a few hundredths of a px in 1500
iters (measured 0.03-0.04, hardware record 2026-08).

Caveat measured on hardware: with the IMAGES pipeline's flow_scale = W/5
heuristic the random-init flows start ~19 px out — beyond the few-px
photometric basin of this blurred-noise texture — and a 1500-iter lr 3e-3
run DIVERGES (real Sintel runs use lr 1e-4, progressive nets, and
5000-epoch schedules ~ 250k steps, which this quick check is not).
"""

from __future__ import annotations

import argparse
import json
import time


def validate_sr(epochs: int, arch: str = "SRF",
                compute_dtype: str = "float32",
                texture: str = "smooth") -> dict:
    from sin_inn_tpu.core import compile_cache
    compile_cache.enable()
    import jax

    from sin_inn_tpu.core.config import SRConfig
    from sin_inn_tpu.core import rng as R
    from sin_inn_tpu.data.synthetic import synthetic_sr_video
    from sin_inn_tpu.train import sr as SR

    cfg = SRConfig(architecture=arch, scale=4, num_coupling=4, lr_window=10,
                   batch_size=8, epochs=epochs, compute_dtype=compute_dtype)
    video = synthetic_sr_video(cfg, h=360, w=640, texture=texture)
    spec, state, tx = SR.create_train_state(jax.random.key(0), cfg)
    step = SR.make_train_step(spec, cfg, tx)
    from sin_inn_tpu.data.sr_video import make_datasets
    sup, unsup, val = make_datasets(video, cfg)
    cached = sup.device_cache(cfg.batch_size)
    key = R.named_fold(R.root_key(0), "train")
    eval_step = SR.make_eval_step(spec, cfg)
    val_batch = next(iter(val.batches(cfg.val_batch_size)))
    losses, psnrs = [], []
    t0 = time.time()
    for epoch in range(epochs):
        for batch in cached:
            state, aux = step(state, batch, None, key)
        if (epoch + 1) % max(epochs // 6, 1) == 0 or epoch == epochs - 1:
            losses.append(round(float(aux["loss"]), 4))
            em = eval_step(state.params, val_batch, jax.random.key(1))
            psnrs.append(round(float(em["hr_psnr"]), 2))
    return {"check": "sr_convergence", "arch": arch, "dtype": compute_dtype,
            "texture": texture,
            "epochs": epochs, "loss_traj": losses,
            "hr_psnr": psnrs[-1], "psnr_traj": psnrs,
            "monotone": all(a >= b for a, b in zip(losses, losses[1:])),
            "wall_s": round(time.time() - t0, 1)}


def validate_flow(iters: int, net: str, splat_max_dy: int,
                  splat_max_dx: int, use_pallas: str = "auto",
                  scale: float = 1.0, spatial: bool = False,
                  splat_local_dy="off", fixture: str = "shift",
                  magnitude: float = 2.0) -> dict:
    from sin_inn_tpu.core import compile_cache
    compile_cache.enable()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sin_inn_tpu.core.config import FlowConfig
    from sin_inn_tpu.data.synthetic import (moving_texture_video,
                                            synthetic_flow_sequence)
    from sin_inn_tpu.train import flow as FT

    h, w, nf = 436, 1024, 4
    if fixture == "shift":
        base = moving_texture_video(1, h, w + 2 * nf + 2, seed=3)[0]
        frames = np.stack([base[:, 2 * i:2 * i + w] for i in range(nf)])
        gt = np.zeros((nf - 1, h, w, 2), np.float32)
        gt[..., 0] = -2.0
    else:
        # harder analytic-GT fixtures (rotation/zoom/occlusion) — the
        # flagship-scale versions of tests/test_convergence.py's bands
        frames, gt = synthetic_flow_sequence(fixture, nf, h, w, seed=3,
                                             magnitude=magnitude)
    f1 = jnp.asarray(frames[:-1])
    f2 = jnp.asarray(frames[1:])
    b = int(f1.shape[0])
    gt = jnp.asarray(gt)
    batch = {"frame1": f1, "frame2": f2, "times": jnp.linspace(-1, 1, b),
             "scale": jnp.asarray(np.float32(scale)), "gt_flow": gt}
    cfg = FlowConfig(net=net, epochs=iters, lr=3e-3,
                     splat_max_dy=splat_max_dy, splat_chunk=2,
                     splat_max_dx=splat_max_dx or None,
                     splat_local_dy=splat_local_dy,
                     use_pallas=use_pallas, spatially_adaptive=spatial)
    spec, state, consts, ctrl_cfg, tx = FT.create_flow_state(
        jax.random.key(0), cfg)
    step = FT.make_flow_train_step(spec, cfg, ctrl_cfg, tx)
    state, m = step(state, consts, batch)
    epe0 = float(m["epe"])
    t0 = time.time()
    stride = max(iters // 10, 1)
    epe_traj, psnr_traj = [], []
    for i in range(iters):
        state, m = step(state, consts, batch)
        if (i + 1) % stride == 0 or i == iters - 1:
            epe_traj.append(round(float(m["epe"]), 4))
            psnr_traj.append(round(float(m["psnr"]), 2))
    return {"check": "flow_convergence", "net": net, "iters": iters,
            "fixture": fixture, "magnitude": magnitude,
            "use_pallas": use_pallas, "scale": scale, "spatial": spatial,
            "splat_local_dy": splat_local_dy,
            "epe0": round(epe0, 3), "epe": epe_traj[-1],
            "psnr": psnr_traj[-1],
            "epe_traj": epe_traj, "psnr_traj": psnr_traj,
            "milestone_stride": stride,
            "frames_per_sec": round(b * iters / (time.time() - t0), 2),
            "wall_s": round(time.time() - t0, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("pipeline", choices=["sr", "flow"])
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--arch", choices=["SRF", "IRN"], default="SRF")
    ap.add_argument("--compute-dtype", default="float32",
                    choices=["float32", "bfloat16", "float32_highest"])
    ap.add_argument("--iters", type=int, default=1500)
    ap.add_argument("--net", default="RBF")
    ap.add_argument("--splat-max-dy", type=int, default=64)
    ap.add_argument("--splat-max-dx", type=int, default=128)
    ap.add_argument("--splat-local-dy", default="off",
                    help="LOCAL-window row bound for the Pallas kernels "
                         "('auto', 'off', or an int)")
    ap.add_argument("--use-pallas", default="auto",
                    help="flow: kernel routing for fused-vs-XLA A/Bs")
    ap.add_argument("--scale", type=float, default=1.0,
                    help="flow: output scale (the trainer uses W/5)")
    ap.add_argument("--spatial", action="store_true")
    ap.add_argument("--texture", default="smooth",
                    choices=["smooth", "natural"],
                    help="sr: HR texture statistics (natural = 1/f)")
    ap.add_argument("--fixture", default="shift",
                    choices=["shift", "rotation", "zoom", "occlusion"],
                    help="flow: synthetic fixture kind (harder-than-shift "
                         "analytic-GT fields, data/synthetic.py)")
    ap.add_argument("--magnitude", type=float, default=2.0,
                    help="flow fixture magnitude (px, deg, or %% per frame)")
    args = ap.parse_args()
    if args.pipeline == "sr":
        out = validate_sr(args.epochs, args.arch, args.compute_dtype,
                          texture=args.texture)
    else:
        ldy = args.splat_local_dy
        if ldy not in ("auto", "off"):
            ldy = int(ldy)
        out = validate_flow(args.iters, args.net, args.splat_max_dy,
                            args.splat_max_dx, use_pallas=args.use_pallas,
                            scale=args.scale, spatial=args.spatial,
                            splat_local_dy=ldy, fixture=args.fixture,
                            magnitude=args.magnitude)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
