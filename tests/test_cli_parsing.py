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
