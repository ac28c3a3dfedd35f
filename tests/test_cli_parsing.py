"""CLI argument parsing tests (no training)."""

import pytest

from sin_inn_tpu import cli


def parse(argv):
    import argparse

    parser = argparse.ArgumentParser(prog="sin-inn-tpu")
    sub = parser.add_subparsers(dest="command", required=True)
    cli._sr_parser(sub)
    cli._flow_parser(sub)
    cli._prepare_parser(sub)
    cli._scene_space_parser(sub)
    return parser.parse_args(argv)


def test_sr_defaults_match_reference():
    a = parse(["sr", "train"])
    cfg = cli.sr_config_from_args(a)
    assert cfg.architecture == "SRF"
    assert cfg.scale == 4
    assert cfg.num_coupling == 4
    assert cfg.lr_window == 10
    assert cfg.lr_dims == 84 and cfg.z_dims == 108
    assert cfg.epochs == 10000
    assert cfg.adam_betas == (0.9, 0.99)


def test_sr_overrides():
    a = parse(["sr", "test", "-a", "IRN", "--scale", "2", "--lr_window", "1",
               "-t", "0.5"])
    cfg = cli.sr_config_from_args(a)
    assert cfg.architecture == "IRN"
    assert cfg.scale == 2 and cfg.temp == 0.5
    assert cfg.z_dims == 36


def test_flow_defaults_match_reference():
    a = parse(["flow", "train"])
    cfg = cli.flow_config_from_args(a)
    assert cfg.net == "RBF"
    assert cfg.size == 436 and cfg.epochs == 1000
    assert cfg.occl == "wang" and cfg.occl_thresh == 0.7
    assert cfg.loss_l1 == 1 and cfg.loss_census == 0.1


def test_flow_occl_none():
    a = parse(["flow", "train", "--occl", "none"])
    cfg = cli.flow_config_from_args(a)
    assert cfg.occl is None


def test_prepare_parse():
    a = parse(["prepare", "v.mp4", "-s", "2", "-p", "binning", "-r", "sum"])
    assert a.video == "v.mp4" and a.scale == 2 and a.reduction == "sum"


def test_scene_space_parse():
    a = parse(["scene-space", "gather", "--scene-dir", "/x", "--frame", "3"])
    assert a.operation == "gather" and a.frame == 3


def test_sr_runtime_flags():
    a = parse(["sr", "train", "--compute_dtype", "bfloat16",
               "--use_pallas", "on", "--mesh_data", "4", "--mesh_model", "2",
               "--val_batch_size", "16", "--hidden_channels", "128",
               "--dense_gc", "16", "--tcr_stop_grad", "--auto_lr",
               "--auto_batch", "--distributed"])
    cfg = cli.sr_config_from_args(a)
    assert cfg.compute_dtype == "bfloat16"
    assert cfg.use_pallas == "on"
    assert cfg.mesh_data == 4 and cfg.mesh_model == 2
    assert cfg.val_batch_size == 16
    assert cfg.hidden_channels == 128 and cfg.dense_gc == 16
    assert cfg.tcr_stop_grad and cfg.auto_lr and cfg.auto_batch
    assert cfg.distributed


def test_sr_save_images_flag():
    a = parse(["sr", "test", "--save_images"])
    assert a.save_images


def test_sr_bad_compute_dtype_rejected():
    with pytest.raises(SystemExit):
        parse(["sr", "train", "--compute_dtype", "float16"])


def test_flow_runtime_flags():
    a = parse(["flow", "train", "--splat-max-dy", "64", "--splat-chunk", "8",
               "--spatial-res", "25", "--mesh-data", "2",
               "--compute-dtype", "bfloat16", "--num-frequencies", "32",
               "--hidden-dim", "64", "--num-layers", "2",
               "--flow-dir", "/flows", "--use-pallas", "on",
               "--flow-producer", "raft:ck.pth@8"])
    cfg = cli.flow_config_from_args(a)
    assert cfg.use_pallas == "on"
    assert cfg.splat_max_dy == 64 and cfg.splat_chunk == 8
    assert cfg.spatial_res == 25 and cfg.mesh_data == 2
    assert cfg.compute_dtype == "bfloat16"
    assert cfg.num_frequencies == 32 and cfg.hidden_dim == 64
    assert cfg.num_layers == 2
    assert cfg.flow_dir == "/flows"
    assert cfg.flow_producer == "raft:ck.pth@8"


def test_flow_windowed_warp_flags():
    a = parse(["flow", "train", "--splat-max-dy", "64",
               "--splat-max-dx", "128", "--splat-col-chunk", "512"])
    cfg = cli.flow_config_from_args(a)
    assert cfg.splat_max_dx == 128 and cfg.splat_col_chunk == 512
    assert cfg.resample_chunk == 8


def test_resolve_producer_specs():
    from sin_inn_tpu.data import flow_media as fm

    # template passthrough, py: scheme, callables, and bad specs
    tpl = "mytool {f1} {f2} {out}"
    assert fm.resolve_producer(tpl) == tpl
    fn = fm.resolve_producer("py:operator:add")
    assert fn(2, 3) == 5
    assert fm.resolve_producer(fn) is fn
    with pytest.raises(ValueError, match="producer spec"):
        fm.resolve_producer("not-a-spec")


def test_profile_flag():
    a = parse(["sr", "train", "--profile", "5"])
    assert cli.sr_config_from_args(a).profile_steps == 5
    a = parse(["flow", "train", "--profile", "3"])
    assert cli.flow_config_from_args(a).profile_steps == 3
