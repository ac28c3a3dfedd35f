"""Tests for data IO: .flo files, flow viz, prepare pipeline, flow media."""

import os

import numpy as np
import pytest

from sin_inn_tpu.data.flo import read_flo, write_flo
from sin_inn_tpu.data.flow_viz import flow_to_image
from sin_inn_tpu.data.prepare import (binning, demosaic_bilinear,
                                      extract_bayer, pack_bayer,
                                      pack_demosaic)
from sin_inn_tpu.data.flow_media import FlowMedia


def test_flo_roundtrip(tmp_path, rng):
    flow = rng.randn(7, 9, 2).astype(np.float32)
    p = str(tmp_path / "t.flo")
    write_flo(p, flow)
    back = read_flo(p)
    np.testing.assert_allclose(back, flow, atol=1e-7)


def test_flo_rejects_bad_magic(tmp_path):
    p = str(tmp_path / "bad.flo")
    with open(p, "wb") as f:
        f.write(b"\x00" * 16)
    with pytest.raises(ValueError):
        read_flo(p)


def test_flow_to_image_shape(rng):
    flow = rng.randn(6, 8, 2).astype(np.float32) * 3
    img = flow_to_image(flow)
    assert img.shape == (6, 8, 3)
    assert img.dtype == np.uint8
    # zero flow must not be fully saturated; distinct flows -> distinct colors
    img2 = flow_to_image(-flow)
    assert (img != img2).any()


def test_extract_bayer_rggb(rng):
    frame = rng.rand(8, 8, 3).astype(np.float32)
    bayer, hr = extract_bayer(frame)
    assert bayer.shape == (8, 8)
    assert bayer[0, 0] == frame[0, 0, 0]       # R
    assert bayer[0, 1] == frame[0, 1, 1]       # G1
    assert bayer[1, 0] == frame[1, 0, 1]       # G2
    assert bayer[1, 1] == frame[1, 1, 2]       # B


def test_binning_mean_constant(rng):
    img = np.ones((16, 16)) * 0.5
    out = binning(img, "mean", 2)
    assert out.shape == (4, 4, 4)
    np.testing.assert_allclose(out, 0.5)


def test_binning_spatial_reduction_matches_survey():
    """LR spatial = HR / (2*scale) (SURVEY §2.1 dimensional invariant)."""
    img = np.random.rand(32, 64)
    out = binning(img, "mean", 4)
    assert out.shape == (4, 8, 4)


def test_pack_bayer_roundtrip(rng):
    lr = rng.rand(4, 4, 4).astype(np.float32)
    bayer = pack_bayer(lr)
    assert bayer.shape == (8, 8)
    # unpack again
    np.testing.assert_array_equal(bayer[::2, ::2], lr[..., 0])
    np.testing.assert_array_equal(bayer[1::2, 1::2], lr[..., 3])


def test_demosaic_constant_image():
    bayer = np.ones((8, 8)) * 0.25
    rgb = demosaic_bilinear(bayer)
    assert rgb.shape == (8, 8, 3)
    np.testing.assert_allclose(rgb, 0.25, atol=1e-6)


def test_flow_media_samples(rng):
    video = rng.rand(5, 6, 10, 3).astype(np.float32)
    m = FlowMedia(video)
    assert len(m) == 4
    assert m.flow_scale == pytest.approx(2.0)   # W/5 heuristic
    b = m.sample(np.asarray([0, 2]))
    assert b["frame1"].shape == (2, 6, 10, 3)
    np.testing.assert_array_equal(b["frame2"][0], video[1])
    assert b["times"].shape == (2,)
    batches = list(m.batches(3))
    assert sum(x["frame1"].shape[0] for x in batches) == 4


def test_flow_media_with_gt(rng):
    video = rng.rand(4, 6, 10, 3).astype(np.float32)
    flow = rng.rand(3, 6, 10, 2).astype(np.float32)
    m = FlowMedia(video, flow)
    b = m.sample(np.asarray([1]))
    assert "gt_flow" in b
    np.testing.assert_array_equal(b["gt_flow"][0], flow[1])


def test_pseudo_gt_producer_callable(tmp_path):
    """Pluggable pseudo-GT hook (reference ran RAFT in-loop, data.py:32-62):
    a callable producer generates .flo files once, reused on re-attach."""
    import numpy as np
    from sin_inn_tpu.data.flow_media import (FlowMedia, attach_pseudo_gt,
                                             load_flow_dir)

    video = np.random.RandomState(0).rand(4, 8, 10, 3).astype(np.float32)
    media = FlowMedia(video)
    assert not media.gt_available

    calls = []

    def producer(f1, f2):
        calls.append(1)
        return np.full(f1.shape[:2] + (2,), 0.5, np.float32)

    out = str(tmp_path / "flows")
    attach_pseudo_gt(media, producer, out)
    assert media.gt_available
    assert media.flow.shape == (3, 8, 10, 2)
    assert len(calls) == 3
    # files on disk follow the load_flow_dir layout and are reused
    assert load_flow_dir(out, 3).shape == (3, 8, 10, 2)
    media2 = attach_pseudo_gt(FlowMedia(video), producer, out)
    assert len(calls) == 3            # no regeneration
    np.testing.assert_allclose(media2.flow, media.flow)


def test_pseudo_gt_producer_subprocess(tmp_path):
    """Subprocess command-template producer: any external tool plugs in."""
    import sys

    import numpy as np
    from sin_inn_tpu.data.flow_media import FlowMedia, generate_pseudo_gt

    video = np.random.RandomState(1).rand(3, 6, 8, 3).astype(np.float32)
    helper = tmp_path / "fake_flow.py"
    helper.write_text(
        "import sys, numpy as np\n"
        "sys.path.insert(0, '/root/repo')\n"
        "from sin_inn_tpu.data.flo import write_flo\n"
        "write_flo(sys.argv[3], np.ones((6, 8, 2), np.float32))\n")
    cmd = f"{sys.executable} {helper} {{f1}} {{f2}} {{out}}"
    flow = generate_pseudo_gt(video, cmd, str(tmp_path / "out"))
    assert flow.shape == (2, 6, 8, 2)
    np.testing.assert_allclose(flow, 1.0)


def test_flow_dir_rescale_uses_flow_resolution(tmp_path):
    """Explicit --flow-dir flows already at the training size must NOT be
    rescaled by the frames' source resolution (round-2 review finding);
    Sintel-style GT at the source resolution still gets size/h scaling."""
    import imageio.v2 as io
    import numpy as np
    from sin_inn_tpu.data.flo import write_flo
    from sin_inn_tpu.data.flow_media import load_images

    scene = tmp_path / "frames" / "sc"
    scene.mkdir(parents=True)
    frames = (np.random.RandomState(0).rand(3, 24, 32, 3) * 255).astype(
        np.uint8)
    for i, f in enumerate(frames):
        io.imwrite(str(scene / f"frame_{i+1:04d}.png"), f)

    # producer-style flow at the TRAINING size (12 rows): magnitudes kept
    d_train = tmp_path / "flow_train_res"
    d_train.mkdir()
    for i in range(2):
        write_flo(str(d_train / f"frame_{i+1:04d}.flo"),
                  np.full((12, 16, 2), 3.0, np.float32))
    m = load_images(str(scene), size=12, flow_dir=str(d_train))
    np.testing.assert_allclose(m.flow, 3.0, atol=1e-5)

    # GT-style flow at the SOURCE size (24 rows): rescaled by 12/24
    d_src = tmp_path / "flow_src_res"
    d_src.mkdir()
    for i in range(2):
        write_flo(str(d_src / f"frame_{i+1:04d}.flo"),
                  np.full((24, 32, 2), 3.0, np.float32))
    m2 = load_images(str(scene), size=12, flow_dir=str(d_src))
    np.testing.assert_allclose(m2.flow, 1.5, atol=1e-5)
