#!/usr/bin/env python
"""Decompose the spatial controller's step toll (VERDICT r4 weak #6).

The StashedSpatial flow step ran 78.7 ms at pinned local-dy 16 vs 46.9 ms
non-spatial at the same bounds — a 1.7x toll with no component table. This
probe builds the full jitted train step in four ablations and times each as
an e2e chain (standalone per-op timings through the relay are garbage —
CLAUDE.md; only in-jit composition A/Bs are trustworthy):

  A  non-spatial PFF step (baseline)
  B  full StashedSpatial step
  C  B with the TRANSITION ablated (spatial_grid_update -> identity:
     removes the stash scatter + visit-counter outer products)
  D  B with MASK PRODUCTION ablated (spatial_grid_mask_slabs -> constant
     precomputed slabs: removes the per-step slab-rebuild einsums, keeps
     the fused-INR kernel consuming identical slab inputs)
  E  C+D (both ablated: the residual = kernel slab consumption + the
     point_loss map production in the loss)

B-C = transition cost; B-D = production cost; E-A = consumption residual.

    PYTHONPATH=/root/.axon_site:/root/repo python tools/spatial_toll.py \
        [--steps 20] [--height 436] [--width 1024] [--batch 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=436)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=3)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--local-dy", type=int, default=16)
    ap.add_argument("--max-dy", type=int, default=64)
    ap.add_argument("--max-dx", type=int, default=128)
    ap.add_argument("--ab-only", action="store_true",
                    help="only the matched non-spatial/spatial pair")
    args = ap.parse_args()

    from sin_inn_tpu.core import compile_cache
    compile_cache.enable()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sin_inn_tpu.core.config import FlowConfig
    from sin_inn_tpu.models import controllers as C
    from sin_inn_tpu.train import flow as FT

    h, w, b = args.height, args.width, args.batch
    rng = np.random.RandomState(0)
    batch = {
        "frame1": jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32)),
        "frame2": jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32)),
        "times": jnp.linspace(-1, 1, b, dtype=jnp.float32),
        "scale": jnp.asarray(w / 5.0, jnp.float32),
    }

    def cfg_for(spatial: bool) -> FlowConfig:
        return FlowConfig(net="PFF", epochs=5000,
                          spatially_adaptive=spatial,
                          splat_max_dy=args.max_dy, splat_max_dx=args.max_dx,
                          splat_local_dy=args.local_dy,
                          splat_local_dx="off",
                          compute_dtype="bfloat16", use_pallas="auto")

    def time_step(cfg, patches: dict) -> float:
        saved = {name: getattr(C, name) for name in patches}
        try:
            for name, fn in patches.items():
                setattr(C, name, fn)
            spec, state, consts, ctrl_cfg, tx = FT.create_flow_state(
                jax.random.key(0), cfg)
            step = FT.make_flow_train_step(spec, cfg, ctrl_cfg, tx)
            state, aux = step(state, consts, batch)
            float(aux["loss"])                        # compile + sync
            t0 = time.perf_counter()
            for _ in range(args.steps):
                state, aux = step(state, consts, batch)
            float(aux["loss"])
            return (time.perf_counter() - t0) / args.steps * 1000.0
        finally:
            for name, fn in saved.items():
                setattr(C, name, fn)

    out = {"bounds": [args.max_dy, args.max_dx, args.local_dy]}
    out["A_nonspatial_ms"] = time_step(cfg_for(False), {})
    print(json.dumps(out), flush=True)
    out["B_full_spatial_ms"] = time_step(cfg_for(True), {})
    print(json.dumps(out), flush=True)
    if args.ab_only:
        out["toll_ms"] = round(
            out["B_full_spatial_ms"] - out["A_nonspatial_ms"], 2)
        print(json.dumps(out))
        return

    no_update = lambda cfg, st, pl, t, hh, ww: st
    out["C_no_transition_ms"] = time_step(
        cfg_for(True), {"spatial_grid_update": no_update})
    print(json.dumps(out), flush=True)

    # D: precompute the real slabs once, then patch production to return
    # the constants (same structure -> the fused-INR gate and kernel see
    # identical inputs; only the rebuild einsums disappear)
    cfg = cfg_for(True)
    spec, state, consts, ctrl_cfg, _ = FT.create_flow_state(
        jax.random.key(0), cfg)
    from sin_inn_tpu.ops.pallas.inr import inr_mask_perm
    real = C.spatial_grid_mask_slabs(ctrl_cfg, state.ctrl_state,
                                     batch["times"], h, w,
                                     enc_perm=inr_mask_perm(spec),
                                     dtype=jnp.bfloat16)
    const = jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.asarray(x)), real)
    const_slabs = lambda *a, **k: const
    out["D_no_production_ms"] = time_step(
        cfg, {"spatial_grid_mask_slabs": const_slabs})
    print(json.dumps(out), flush=True)
    out["E_neither_ms"] = time_step(
        cfg, {"spatial_grid_mask_slabs": const_slabs,
              "spatial_grid_update": no_update})

    out["toll_ms"] = round(out["B_full_spatial_ms"] - out["A_nonspatial_ms"], 2)
    out["transition_ms"] = round(out["B_full_spatial_ms"] - out["C_no_transition_ms"], 2)
    out["production_ms"] = round(out["B_full_spatial_ms"] - out["D_no_production_ms"], 2)
    out["consumption_residual_ms"] = round(out["E_neither_ms"] - out["A_nonspatial_ms"], 2)
    print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                      for k, v in out.items()}))


if __name__ == "__main__":
    main()
