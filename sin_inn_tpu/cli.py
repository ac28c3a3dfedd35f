"""Command-line interface: thin parsers over the typed configs.

Mirrors the reference entry points and their flags:
  * ``sin-inn sr {train,test}``      <- /root/reference/main.py:9-83
  * ``sin-inn flow {train,test,summarize,sintel}``
                                     <- video-interpolation/main.py:17-49
  * ``sin-inn prepare <video>``      <- datasets/prepare.py:7-33
  * ``sin-inn scene-space {...}``    <- scene-space/ pose/gather tools

Run as ``python -m sin_inn_tpu.cli <command> ...``.
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional

from sin_inn_tpu.core.config import FlowConfig, PrepareConfig, SRConfig


def _sr_parser(sub):
    ap = sub.add_parser("sr", help="INN space-time super-resolution")
    ap.add_argument("operation", choices=["train", "test", "export"])
    ap.add_argument("--export-out", default=None, metavar="CKPT",
                    help="sr export: output path for the reference-loadable "
                         "torch state_dict")
    ap.add_argument("--dataset", default="datasets/adobe240f")
    ap.add_argument("-s", "--scene", default="IMG_0028_binning_4x")
    ap.add_argument("--suffix", default="default")
    ap.add_argument("-f", "--fps", type=int, default=10)
    ap.add_argument("--lr_window", type=int, default=10)
    ap.add_argument("-b", "--batch_size", type=int, default=8)
    ap.add_argument("-a", "--architecture", choices=["SRF", "IRN"],
                    default="SRF")
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument("-c", "--num_coupling", type=int, default=4)
    ap.add_argument("-r", "--resume_state", default=None)
    ap.add_argument("--import-torch", default=None, metavar="CKPT",
                    help="seed params from a reference torch/Lightning "
                         "checkpoint (IRN or FrEIA-SRF state_dict); a "
                         "framework checkpoint on disk always takes "
                         "precedence (train resume AND test/export), "
                         "with a loud warning when both exist")
    ap.add_argument("-w", "--working_dir", default="experiments")
    ap.add_argument("-e", "--epochs", type=int, default=10000)
    ap.add_argument("--save_iter", type=int, default=100)
    ap.add_argument("-p", "--print_iter", type=int, default=10)
    ap.add_argument("-l", "--learning_rate", type=float, default=1e-4)
    ap.add_argument("--adam_betas", type=float, nargs=2, default=[0.9, 0.99])
    ap.add_argument("--weight_decay", type=float, default=1e-5)
    ap.add_argument("--lambda_fwd_rec", type=float, default=1)
    ap.add_argument("--lambda_fwd_mmd", type=float, default=0)
    ap.add_argument("--lambda_latent_nll", type=float, default=0)
    ap.add_argument("--lambda_bwd_rec", type=float, default=1)
    ap.add_argument("--lambda_bwd_mmd", type=float, default=0)
    ap.add_argument("--random_seed", type=int, default=0)
    ap.add_argument("--lambda_bwd_tcr", type=float, default=0)
    ap.add_argument("--rotation", type=float, default=5)
    ap.add_argument("--translation", type=float, default=5)
    ap.add_argument("--tcr_iters", type=int, default=5)
    ap.add_argument("-t", "--temp", type=float, default=0.8)
    ap.add_argument("--wandb", action="store_true")
    # runtime surface (round-2: every perf/runtime knob is CLI-reachable)
    ap.add_argument("--val_batch_size", type=int, default=40)
    ap.add_argument("--hidden_channels", type=int, default=256)
    ap.add_argument("--dense_gc", type=int, default=32)
    ap.add_argument("--compute_dtype", default="float32",
                    choices=["float32", "bfloat16", "float32_highest"])
    ap.add_argument("--use_pallas", default="auto",
                    choices=["auto", "on", "off"])
    ap.add_argument("--remat", action="store_true",
                    help="jax.checkpoint each coupling (stash only coupling "
                         "inputs; recompute subnets in the backward)")
    ap.add_argument("--mesh_data", type=int, default=None,
                    help="data-parallel mesh axis (default: all devices)")
    ap.add_argument("--mesh_model", type=int, default=1,
                    help="tensor-parallel mesh axis over subnet hidden")
    ap.add_argument("--distributed", action="store_true",
                    help="jax.distributed.initialize() first (multi-host)")
    ap.add_argument("--dist_coordinator", default=None, metavar="HOST:PORT",
                    help="explicit multi-host coordinator (default: TPU pod "
                         "auto-detect); requires --dist_num_processes and "
                         "--dist_process_id")
    ap.add_argument("--dist_num_processes", type=int, default=None)
    ap.add_argument("--dist_process_id", type=int, default=None)
    ap.add_argument("--tcr_stop_grad", action="store_true",
                    help="gradient-free TCR warp (reference parity)")
    ap.add_argument("--profile", type=int, default=0, metavar="N",
                    help="capture one jax.profiler trace of N train steps")
    ap.add_argument("--auto_lr", action="store_true",
                    help="LR range test before training (auto_lr_find)")
    ap.add_argument("--auto_batch", action="store_true",
                    help="probe the largest fitting batch size")
    ap.add_argument("--save_images", action="store_true",
                    help="sr test: dump PNG frames instead of a video")


def sr_config_from_args(a) -> SRConfig:
    return SRConfig(
        dataset=a.dataset, scene=a.scene, suffix=a.suffix, fps=a.fps,
        lr_window=a.lr_window, batch_size=a.batch_size,
        architecture=a.architecture, scale=a.scale,
        num_coupling=a.num_coupling, epochs=a.epochs, save_iter=a.save_iter,
        print_iter=a.print_iter, learning_rate=a.learning_rate,
        adam_betas=tuple(a.adam_betas), weight_decay=a.weight_decay,
        lambda_fwd_rec=a.lambda_fwd_rec, lambda_fwd_mmd=a.lambda_fwd_mmd,
        lambda_latent_nll=a.lambda_latent_nll,
        lambda_bwd_rec=a.lambda_bwd_rec, lambda_bwd_mmd=a.lambda_bwd_mmd,
        random_seed=a.random_seed, import_torch=a.import_torch,
        lambda_bwd_tcr=a.lambda_bwd_tcr,
        rotation=a.rotation, translation=a.translation,
        tcr_iters=a.tcr_iters, temp=a.temp, working_dir=a.working_dir,
        resume_state=a.resume_state,
        val_batch_size=a.val_batch_size, hidden_channels=a.hidden_channels,
        dense_gc=a.dense_gc, compute_dtype=a.compute_dtype,
        use_pallas=a.use_pallas, remat=a.remat, mesh_data=a.mesh_data,
        mesh_model=a.mesh_model, distributed=a.distributed,
        dist_coordinator=a.dist_coordinator,
        dist_num_processes=a.dist_num_processes,
        dist_process_id=a.dist_process_id,
        tcr_stop_grad=a.tcr_stop_grad, auto_lr=a.auto_lr,
        auto_batch=a.auto_batch, profile_steps=a.profile,
    )


def _splat_bound(s: str):
    """'auto' | 'off' | int for the splat window flags."""
    if s in ("auto", "off"):
        return s
    return int(s)


def _flow_parser(sub):
    ap = sub.add_parser("flow", help="INR optical flow / video interpolation")
    ap.add_argument("operation",
                    choices=["train", "test", "summarize", "sintel",
                             "export", "interpolate"])
    ap.add_argument("--export-out", default=None, metavar="CKPT",
                    help="flow export: output path for the reference-"
                         "loadable torch state_dict")
    ap.add_argument("--interp-factor", type=int, default=2, metavar="N",
                    help="flow interpolate: temporal upsampling factor "
                         "(N-1 synthesized frames per adjacent pair)")
    ap.add_argument("--input-video",
                    default="../datasets/sintel/training/final/alley_1")
    ap.add_argument("--name", default="temp")
    ap.add_argument("--end", type=int)
    ap.add_argument("--step", type=int)
    ap.add_argument("--size", default=436, type=int)
    ap.add_argument("--batch", default=1, type=int)
    ap.add_argument("--test-size", default=436, type=int)
    ap.add_argument("--test-batch", default=1, type=int)
    ap.add_argument("--net", default="RBF")
    ap.add_argument("--spatially-adaptive", action="store_true")
    ap.add_argument("--epochs", default=1000, type=int)
    ap.add_argument("--val-iter", type=int)
    ap.add_argument("--lr", default=1e-4, type=float)
    ap.add_argument("--loss-l1", default=1, type=float)
    ap.add_argument("--loss-census", default=0.1, type=float)
    ap.add_argument("--loss-ssim", default=0, type=float)
    ap.add_argument("--census-width", default=3, type=int)
    ap.add_argument("--loss-smooth1", default=0.1, type=float)
    ap.add_argument("--edge-constant", default=150, type=float)
    ap.add_argument("--edge-func", default="gauss", choices=["exp", "gauss"])
    ap.add_argument("--occl", default="wang", choices=["brox", "wang", "none"])
    ap.add_argument("--occl-thresh", default=0.7, type=float)
    ap.add_argument("--wandb", action="store_true")
    # runtime surface
    ap.add_argument("--spatial-res", type=int, default=50,
                    help="spatially-adaptive controller grid resolution")
    ap.add_argument("--num-frequencies", type=int, default=256)
    ap.add_argument("--hidden-dim", type=int, default=256)
    ap.add_argument("--num-layers", type=int, default=3)
    ap.add_argument("--compute-dtype", default="float32",
                    choices=["float32", "bfloat16", "float32_highest"])
    ap.add_argument("--splat-max-dy", type=_splat_bound, default="auto",
                    help="windowed MATMUL splat row bound |dy|<=N px: "
                         "'auto' (default, size-scaled), 'off' (exact "
                         "scatter), or an int")
    ap.add_argument("--splat-chunk", type=int, default=2)
    ap.add_argument("--splat-max-dx", type=_splat_bound, default="auto",
                    help="column bound |dx|<=N px for the windowed metric "
                         "warps: 'auto', 'off', or an int")
    ap.add_argument("--splat-col-chunk", type=int, default=256)
    ap.add_argument("--splat-local-dy", type=_splat_bound, default="auto",
                    help="LOCAL-window row bound for the Pallas kernels: "
                         "per-tile windows recenter vertically on the "
                         "tile-mean flow and this bounds only the "
                         "DEVIATION |fy - mean| ('auto' = half the global "
                         "bound, probe-tightened when GT flow exists; "
                         "'off' = static global windows; or an int)")
    ap.add_argument("--splat-local-dx", type=_splat_bound, default="auto",
                    help="LOCAL-window COLUMN bound: windows also "
                         "recenter horizontally on the 128-quantized "
                         "tile-mean flow ('auto' = engaged by the GT "
                         "probe only when it shrinks the window — pays "
                         "for fast scenes with a wide global dx; 'off'; "
                         "or an int, which needs --splat-local-dy)")
    ap.add_argument("--window-refit", default="auto",
                    choices=["auto", "off"],
                    help="mid-training refit of 'auto' splat-window bounds "
                         "from the measured flow stats at save cadence: "
                         "widen when flow nears the window (coverage), "
                         "tighten once it stabilizes (speed); 'off' = "
                         "static bounds + warnings")
    ap.add_argument("--use-pallas", default="auto",
                    choices=["auto", "on", "off"],
                    help="fused Pallas splat/gather/INR kernels: 'auto' "
                         "(TPU only), 'on' (forced; interpret mode "
                         "off-TPU), 'off' (XLA paths)")
    ap.add_argument("--mesh-data", type=int, default=None)
    ap.add_argument("--distributed", action="store_true")
    ap.add_argument("--dist-coordinator", default=None, metavar="HOST:PORT")
    ap.add_argument("--dist-num-processes", type=int, default=None)
    ap.add_argument("--dist-process-id", type=int, default=None)
    ap.add_argument("--profile", type=int, default=0, metavar="N",
                    help="capture one jax.profiler trace of N train steps")
    ap.add_argument("--flow-dir", default=None,
                    help="precomputed GT/pseudo-GT flow dir (.flo/.npy)")
    ap.add_argument("--flow-producer", default=None,
                    help="pseudo-GT producer when no GT exists: "
                         "'raft:<ckpt.pth>[@iters]' (TPU-native RAFT), "
                         "'py:<module>:<fn>', or a '{f1} {f2} {out}' command")
    ap.add_argument("--import-torch", default=None, metavar="CKPT",
                    help="seed weights/encoding buffers/controller mask from "
                         "a reference torch/Lightning flow checkpoint; a "
                         "framework checkpoint on disk always takes "
                         "precedence (train resume AND test/export), "
                         "with a loud warning when both exist")


def flow_config_from_args(a) -> FlowConfig:
    return FlowConfig(
        input_video=a.input_video, name=a.name, end=a.end, step=a.step,
        size=a.size, batch=a.batch, test_size=a.test_size,
        test_batch=a.test_batch, net=a.net,
        spatially_adaptive=a.spatially_adaptive, epochs=a.epochs,
        val_iter=a.val_iter, lr=a.lr, loss_l1=a.loss_l1,
        loss_census=a.loss_census, loss_ssim=a.loss_ssim,
        census_width=a.census_width, loss_smooth1=a.loss_smooth1,
        edge_constant=a.edge_constant, edge_func=a.edge_func,
        occl=None if a.occl == "none" else a.occl,
        occl_thresh=a.occl_thresh,
        spatial_res=a.spatial_res, num_frequencies=a.num_frequencies,
        hidden_dim=a.hidden_dim, num_layers=a.num_layers,
        compute_dtype=a.compute_dtype, splat_max_dy=a.splat_max_dy,
        splat_chunk=a.splat_chunk, splat_max_dx=a.splat_max_dx,
        splat_col_chunk=a.splat_col_chunk,
        splat_local_dy=a.splat_local_dy,
        splat_local_dx=a.splat_local_dx,
        window_refit=a.window_refit,
        use_pallas=a.use_pallas,
        mesh_data=a.mesh_data,
        distributed=a.distributed, dist_coordinator=a.dist_coordinator,
        dist_num_processes=a.dist_num_processes,
        dist_process_id=a.dist_process_id, flow_dir=a.flow_dir,
        flow_producer=a.flow_producer, import_torch=a.import_torch,
        profile_steps=a.profile,
    )


def _prepare_parser(sub):
    ap = sub.add_parser("prepare", help="extract HR/LR frames from a video")
    ap.add_argument("video")
    ap.add_argument("-d", "--downsampling", default=1.0, type=float)
    ap.add_argument("-p", "--operator", default="binning",
                    choices=["binning", "linear", "cubic", "lanczos4",
                             "nearest", "area"])
    ap.add_argument("-r", "--reduction", choices=["mean", "sum"],
                    default="mean")
    ap.add_argument("-s", "--scale", type=int, default=4)
    ap.add_argument("-b", "--bayer", action="store_true")
    ap.add_argument("-n", "--noise", type=float)


def _scene_space_parser(sub):
    ap = sub.add_parser("scene-space", help="COLMAP poses + multi-view gather")
    ap.add_argument("operation",
                    choices=["read_matrices", "depth_information",
                             "reproject", "gather"])
    ap.add_argument("--scene-dir", required=True)
    ap.add_argument("--out", default="scene_space_out")
    ap.add_argument("--frame", type=int, default=0)
    ap.add_argument("--patch", type=int, default=3)
    ap.add_argument("--window", default="auto", choices=("auto", "on", "off"),
                    help="gather: windowed one-hot candidate read "
                         "(scene_space/gather.py; auto = host cost model)")


def main(argv: Optional[List[str]] = None) -> int:
    parser = argparse.ArgumentParser(prog="sin-inn-tpu")
    sub = parser.add_subparsers(dest="command", required=True)
    _sr_parser(sub)
    _flow_parser(sub)
    _prepare_parser(sub)
    _scene_space_parser(sub)
    a = parser.parse_args(argv)

    if a.command == "sr":
        from sin_inn_tpu.train import loop as L

        cfg = sr_config_from_args(a)
        if a.operation == "train":
            L.run_sr_train(cfg, use_wandb=a.wandb)
        elif a.operation == "export":
            print(L.run_sr_export(cfg, out=a.export_out))
        else:
            print(L.run_sr_test(cfg, save_images=a.save_images))
    elif a.command == "flow":
        from sin_inn_tpu.train import loop as L

        cfg = flow_config_from_args(a)
        if a.operation == "train":
            out = L.run_flow_train(cfg, use_wandb=a.wandb, keep_writer=True)
            eff = out["cfg"]
            if eff.test_size != eff.size:
                # effective bounds were resolved/probed at the TRAIN frame
                # size; a different test size must start from the user's raw
                # values so run_flow_test's own size guard re-resolves them
                # (advisor r3: the resolved ints would bypass it)
                eff = eff.replace(splat_max_dy=cfg.splat_max_dy,
                                  splat_max_dx=cfg.splat_max_dx,
                                  splat_local_dy=cfg.splat_local_dy,
                                  splat_local_dx=cfg.splat_local_dx)
                out["cfg"] = eff
            L.run_flow_test(out["cfg"], state=out["state"], spec=out["spec"],
                            consts=out["consts"], ctrl_cfg=out["ctrl_cfg"],
                            scene=out["scene"], writer=out["writer"])
            out["writer"].close()
        elif a.operation == "test":
            print(L.run_flow_test(cfg, use_wandb=a.wandb))
        elif a.operation == "export":
            print(L.run_flow_export(cfg, out=a.export_out))
        elif a.operation == "interpolate":
            print(L.run_flow_interpolate(cfg, factor=a.interp_factor))
        elif a.operation == "summarize":
            L.run_flow_summarize(cfg)
        else:
            L.run_flow_sintel(cfg)
    elif a.command == "prepare":
        from sin_inn_tpu.data.prepare import prepare_video

        cfg = PrepareConfig(video=a.video, downsampling=a.downsampling,
                            operator=a.operator, reduction=a.reduction,
                            scale=a.scale, bayer=a.bayer, noise=a.noise)
        print(prepare_video(cfg))
    elif a.command == "scene-space":
        from sin_inn_tpu.scene_space import cli as SS

        SS.run(a)
    return 0


if __name__ == "__main__":
    sys.exit(main())
