"""Single-image-pair optical flow experiment.

Equivalent of /root/reference/video-interpolation/pair_flow.py (the cell-style
notebook script): fit a 2-D progressive-RBF INR to ONE frame pair with the
same photometric loss stack, visualize the flow, and report PSNR — here as a
plain script over the framework APIs with an explicit jitted loop.

Usage:
    python examples/pair_flow.py --frames dir_with_frame_%04d.png \
        --index 28 --epochs 1000 [--net PRBF]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", required=True,
                    help="directory of frame_%%04d.png files")
    ap.add_argument("--index", type=int, default=0)
    ap.add_argument("--size", type=int, default=436)
    ap.add_argument("--epochs", type=int, default=1000)
    ap.add_argument("--net", default="PRBF")
    ap.add_argument("--out", default="pair_flow_out")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sin_inn_tpu.core.config import FlowConfig
    from sin_inn_tpu.data.flow_media import load_images
    from sin_inn_tpu.data.flow_viz import flow_to_image
    from sin_inn_tpu.train import flow as FT

    # 2-D domain (x, y only) as in the reference pair experiment
    # (pair_flow.py:41: ModelParams(domain_dim=2, std_rbf=50, std=50))
    cfg = FlowConfig(net=args.net, domain_dim=2, std_rbf=50.0, std=50.0,
                     epochs=args.epochs, lr=1e-3,
                     loss_l1=1.0, loss_census=0.1, loss_smooth1=0.1)
    media = load_images(args.frames, size=args.size)
    b = media.sample(np.asarray([args.index]))
    batch = {
        "frame1": jnp.asarray(b["frame1"]),
        "frame2": jnp.asarray(b["frame2"]),
        # single pair: the time coordinate collapses; feed t=0
        "times": jnp.zeros((1,), jnp.float32),
        "scale": jnp.asarray(b["scale"]),
    }
    if "gt_flow" in b:
        batch["gt_flow"] = jnp.asarray(b["gt_flow"])

    spec, state, consts, ctrl_cfg, tx = FT.create_flow_state(
        jax.random.key(0), cfg)
    step = FT.make_flow_train_step(spec, cfg, ctrl_cfg, tx)

    for epoch in range(args.epochs):
        state, m = step(state, consts, batch)
        if (epoch + 1) % max(args.epochs // 10, 1) == 0:
            msg = f"epoch {epoch+1}: loss {float(m['loss']):.4f} " \
                  f"psnr {float(m['psnr']):.2f}"
            if "epe" in m:
                msg += f" epe {float(m['epe']):.3f}"
            print(msg)

    infer = FT.make_flow_infer(spec, cfg, ctrl_cfg)
    h, w = batch["frame1"].shape[1:3]
    f12, _ = infer(state.params, consts, state.ctrl_state, batch["times"],
                   batch["scale"], h, w)
    os.makedirs(args.out, exist_ok=True)
    import imageio.v2 as io

    io.imwrite(os.path.join(args.out, "flow.png"),
               flow_to_image(np.asarray(f12[0])))
    print(f"wrote {args.out}/flow.png")


if __name__ == "__main__":
    main()
