"""Parity tests for the JAX RAFT port (models/raft.py) against an
independent torch re-derivation of the public architecture (Teed & Deng,
ECCV 2020) — the model the reference shells out to for pseudo-GT flow
(/root/reference/video-interpolation/data.py:32-62).

The torch replica below mirrors the official module tree and parameter names
so its ``state_dict`` loads through ``load_torch_weights`` exactly like an
official ``raft-things.pth`` checkpoint. Random weights, eval mode, f32 CPU.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sin_inn_tpu.models import raft  # noqa: E402


# ---------------------------------------------------------------------------
# Torch replica (official structure + names)
# ---------------------------------------------------------------------------

def _make_norm(norm, c):
    if norm == "instance":
        return nn.InstanceNorm2d(c)
    return nn.BatchNorm2d(c)


class ResidualBlock(nn.Module):
    def __init__(self, cin, cout, norm, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1, stride=stride)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.relu = nn.ReLU(inplace=True)
        self.norm1 = _make_norm(norm, cout)
        self.norm2 = _make_norm(norm, cout)
        if stride == 1:
            self.downsample = None
        else:
            self.norm3 = _make_norm(norm, cout)
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride=stride), self.norm3)

    def forward(self, x):
        y = self.relu(self.norm1(self.conv1(x)))
        y = self.relu(self.norm2(self.conv2(y)))
        if self.downsample is not None:
            x = self.downsample(x)
        return self.relu(x + y)


class BasicEncoder(nn.Module):
    def __init__(self, out_dim, norm):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3)
        self.norm1 = _make_norm(norm, 64)
        self.relu1 = nn.ReLU(inplace=True)
        self.layer1 = nn.Sequential(ResidualBlock(64, 64, norm, 1),
                                    ResidualBlock(64, 64, norm, 1))
        self.layer2 = nn.Sequential(ResidualBlock(64, 96, norm, 2),
                                    ResidualBlock(96, 96, norm, 1))
        self.layer3 = nn.Sequential(ResidualBlock(96, 128, norm, 2),
                                    ResidualBlock(128, 128, norm, 1))
        self.conv2 = nn.Conv2d(128, out_dim, 1)

    def forward(self, x):
        x = self.relu1(self.norm1(self.conv1(x)))
        x = self.layer3(self.layer2(self.layer1(x)))
        return self.conv2(x)


def bilinear_sampler(img, coords):
    H, W = img.shape[-2:]
    xgrid, ygrid = coords.split([1, 1], dim=-1)
    xgrid = 2 * xgrid / (W - 1) - 1
    ygrid = 2 * ygrid / (H - 1) - 1
    grid = torch.cat([xgrid, ygrid], dim=-1)
    return F.grid_sample(img, grid, align_corners=True)


class CorrBlock:
    def __init__(self, fmap1, fmap2, num_levels=4, radius=4):
        self.num_levels = num_levels
        self.radius = radius
        b, dim, h, w = fmap1.shape
        self.shape = (b, h, w)
        corr = torch.matmul(fmap1.view(b, dim, h * w).transpose(1, 2),
                            fmap2.view(b, dim, h * w)) / math.sqrt(dim)
        corr = corr.reshape(b * h * w, 1, h, w)
        self.pyramid = [corr]
        for _ in range(num_levels - 1):
            corr = F.avg_pool2d(corr, 2, stride=2)
            self.pyramid.append(corr)

    def __call__(self, coords):
        coords = coords.permute(0, 2, 3, 1)
        b, h, w = self.shape
        r = self.radius
        out = []
        for i, corr in enumerate(self.pyramid):
            dx = torch.linspace(-r, r, 2 * r + 1)
            dy = torch.linspace(-r, r, 2 * r + 1)
            # official quirk: meshgrid(dy, dx) stacked then ADDED to (x, y)
            delta = torch.stack(torch.meshgrid(dy, dx, indexing="ij"), -1)
            centroid = coords.reshape(b * h * w, 1, 1, 2) / 2 ** i
            samp = bilinear_sampler(corr, centroid + delta.view(1, 2 * r + 1,
                                                                2 * r + 1, 2))
            out.append(samp.view(b, h, w, -1))
        return torch.cat(out, dim=-1).permute(0, 3, 1, 2).contiguous()


class BasicMotionEncoder(nn.Module):
    def __init__(self):
        super().__init__()
        cor_planes = 4 * (2 * 4 + 1) ** 2
        self.convc1 = nn.Conv2d(cor_planes, 256, 1)
        self.convc2 = nn.Conv2d(256, 192, 3, padding=1)
        self.convf1 = nn.Conv2d(2, 128, 7, padding=3)
        self.convf2 = nn.Conv2d(128, 64, 3, padding=1)
        self.conv = nn.Conv2d(64 + 192, 128 - 2, 3, padding=1)

    def forward(self, flow, corr):
        cor = F.relu(self.convc1(corr))
        cor = F.relu(self.convc2(cor))
        flo = F.relu(self.convf1(flow))
        flo = F.relu(self.convf2(flo))
        out = F.relu(self.conv(torch.cat([cor, flo], dim=1)))
        return torch.cat([out, flow], dim=1)


class SepConvGRU(nn.Module):
    def __init__(self, hidden=128, inp=256):
        super().__init__()
        self.convz1 = nn.Conv2d(hidden + inp, hidden, (1, 5), padding=(0, 2))
        self.convr1 = nn.Conv2d(hidden + inp, hidden, (1, 5), padding=(0, 2))
        self.convq1 = nn.Conv2d(hidden + inp, hidden, (1, 5), padding=(0, 2))
        self.convz2 = nn.Conv2d(hidden + inp, hidden, (5, 1), padding=(2, 0))
        self.convr2 = nn.Conv2d(hidden + inp, hidden, (5, 1), padding=(2, 0))
        self.convq2 = nn.Conv2d(hidden + inp, hidden, (5, 1), padding=(2, 0))

    def forward(self, h, x):
        hx = torch.cat([h, x], dim=1)
        z = torch.sigmoid(self.convz1(hx))
        r = torch.sigmoid(self.convr1(hx))
        q = torch.tanh(self.convq1(torch.cat([r * h, x], dim=1)))
        h = (1 - z) * h + z * q
        hx = torch.cat([h, x], dim=1)
        z = torch.sigmoid(self.convz2(hx))
        r = torch.sigmoid(self.convr2(hx))
        q = torch.tanh(self.convq2(torch.cat([r * h, x], dim=1)))
        return (1 - z) * h + z * q


class FlowHead(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(128, 256, 3, padding=1)
        self.conv2 = nn.Conv2d(256, 2, 3, padding=1)

    def forward(self, x):
        return self.conv2(F.relu(self.conv1(x)))


class BasicUpdateBlock(nn.Module):
    def __init__(self):
        super().__init__()
        self.encoder = BasicMotionEncoder()
        self.gru = SepConvGRU()
        self.flow_head = FlowHead()
        self.mask = nn.Sequential(nn.Conv2d(128, 256, 3, padding=1),
                                  nn.ReLU(inplace=True),
                                  nn.Conv2d(256, 64 * 9, 1))

    def forward(self, net, inp, corr, flow):
        motion = self.encoder(flow, corr)
        net = self.gru(net, torch.cat([inp, motion], dim=1))
        return net, 0.25 * self.mask(net), self.flow_head(net)


class TorchRAFT(nn.Module):
    def __init__(self):
        super().__init__()
        self.fnet = BasicEncoder(256, "instance")
        self.cnet = BasicEncoder(256, "batch")
        self.update_block = BasicUpdateBlock()

    @staticmethod
    def coords_grid(b, h, w):
        coords = torch.meshgrid(torch.arange(h), torch.arange(w),
                                indexing="ij")
        return torch.stack(coords[::-1], dim=0).float()[None].repeat(
            b, 1, 1, 1)

    @staticmethod
    def upsample_flow(flow, mask):
        n, _, h, w = flow.shape
        mask = torch.softmax(mask.view(n, 1, 9, 8, 8, h, w), dim=2)
        up = F.unfold(8 * flow, [3, 3], padding=1).view(n, 2, 9, 1, 1, h, w)
        up = torch.sum(mask * up, dim=2).permute(0, 1, 4, 2, 5, 3)
        return up.reshape(n, 2, 8 * h, 8 * w)

    def forward(self, image1, image2, iters):
        image1 = 2 * (image1 / 255.0) - 1.0
        image2 = 2 * (image2 / 255.0) - 1.0
        fmaps = self.fnet(torch.cat([image1, image2], dim=0))
        fmap1, fmap2 = torch.split(fmaps, image1.shape[0], dim=0)
        corr_fn = CorrBlock(fmap1, fmap2)
        cnet = self.cnet(image1)
        net, inp = torch.split(cnet, [128, 128], dim=1)
        net = torch.tanh(net)
        inp = torch.relu(inp)
        n, _, h8, w8 = fmap1.shape
        coords0 = self.coords_grid(n, h8, w8)
        coords1 = coords0.clone()
        for _ in range(iters):
            corr = corr_fn(coords1)
            flow = coords1 - coords0
            net, up_mask, dflow = self.update_block(net, inp, corr, flow)
            coords1 = coords1 + dflow
        return self.upsample_flow(coords1 - coords0, up_mask)


def _small_weights(model):
    """Shrink random init so recurrent iterations stay well-conditioned."""
    g = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for name, p in model.named_parameters():
            p.copy_(0.3 * torch.randn(p.shape, generator=g) /
                    math.sqrt(max(p.numel() // max(p.shape[0], 1), 1)))
        for name, b in model.named_buffers():
            if name.endswith("running_var"):
                b.copy_(torch.rand(b.shape, generator=g) + 0.5)
            elif name.endswith("running_mean"):
                b.copy_(0.1 * torch.randn(b.shape, generator=g))
    return model


@pytest.fixture(scope="module")
def torch_raft_and_params(tmp_path_factory):
    model = _small_weights(TorchRAFT()).eval()
    # save exactly like the official release: DataParallel 'module.' prefix
    path = tmp_path_factory.mktemp("raft") / "raft-synth.pth"
    sd = {f"module.{k}": v for k, v in model.state_dict().items()}
    torch.save(sd, path)
    params = raft.load_torch_weights(str(path))
    return model, params, str(path)


def test_param_schema_matches_torch_state_dict(torch_raft_and_params):
    model, params, _ = torch_raft_and_params
    assert set(params) == set(raft.param_schema())
    # every imported tensor matches the replica's (transposed for convs)
    sd = model.state_dict()
    w = np.asarray(params["fnet.conv1.weight"])
    assert np.allclose(w, sd["fnet.conv1.weight"].numpy().transpose(2, 3, 1, 0))


def test_encoders_match(torch_raft_and_params):
    model, params, _ = torch_raft_and_params
    rng = np.random.RandomState(0)
    img = rng.rand(2, 64, 96, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        ref_f = model.fnet(torch.from_numpy(img).permute(0, 3, 1, 2))
        ref_c = model.cnet(torch.from_numpy(img).permute(0, 3, 1, 2))
    got_f = raft._encoder(params, "fnet", jnp.asarray(img), "instance")
    got_c = raft._encoder(params, "cnet", jnp.asarray(img), "batch")
    np.testing.assert_allclose(np.asarray(got_f),
                               ref_f.permute(0, 2, 3, 1).numpy(),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_c),
                               ref_c.permute(0, 2, 3, 1).numpy(),
                               atol=2e-4, rtol=1e-3)


def test_corr_lookup_matches(torch_raft_and_params):
    # 128x128 -> 16x16 at 1/8: every pyramid level is >= 2x2, so the replica's
    # (W-1) normalization stays finite (official code divides by zero on 1x1
    # levels — sizes that small never occur in real use)
    rng = np.random.RandomState(1)
    f1 = rng.rand(1, 16, 16, 64).astype(np.float32)
    f2 = rng.rand(1, 16, 16, 64).astype(np.float32)
    coords = (rng.rand(1, 16, 16, 2).astype(np.float32) * 12 + 2)

    t1 = torch.from_numpy(f1).permute(0, 3, 1, 2)
    t2 = torch.from_numpy(f2).permute(0, 3, 1, 2)
    ref = CorrBlock(t1, t2)(torch.from_numpy(coords).permute(0, 3, 1, 2))

    pyr = raft.build_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2))
    got = raft.lookup_corr(pyr, jnp.asarray(coords))
    np.testing.assert_allclose(np.asarray(got),
                               ref.permute(0, 2, 3, 1).numpy(),
                               atol=1e-4, rtol=1e-3)

    # out-of-frame coordinates: the patch-form lookup's clamped-slice /
    # zero-margin contract must reproduce the official zero padding for
    # partially AND fully out-of-frame windows (incl. far-out coords whose
    # clamped window must land wholly in the zero margin)
    oob = coords.copy()
    oob[0, 0, :4, 0] = np.array([-2.0, -40.0, 17.5, 300.0], np.float32)
    oob[0, 0, 4:8, 1] = np.array([-3.25, -99.0, 16.2, 1e4], np.float32)
    ref2 = CorrBlock(t1, t2)(torch.from_numpy(oob).permute(0, 3, 1, 2))
    got2 = raft.lookup_corr(pyr, jnp.asarray(oob))
    np.testing.assert_allclose(np.asarray(got2),
                               ref2.permute(0, 2, 3, 1).numpy(),
                               atol=1e-4, rtol=1e-3)

    # the matmul form (hat-weighted batched contractions, the fast TPU
    # path raft_flow defaults to) must agree with the take form on the SAME
    # coords — in-frame, boundary, and far-out-of-frame (its iota-compare
    # zeros replace the padded margin) — to f32 einsum exactness on CPU
    for cset in (coords, oob):
        for r in (4, 3):        # basic and --small corr radii
            mm = raft.lookup_corr_matmul(pyr, jnp.asarray(cset), r=r)
            tk = raft.lookup_corr(pyr, jnp.asarray(cset), r=r)
            np.testing.assert_allclose(np.asarray(mm), np.asarray(tk),
                                       atol=1e-5, rtol=1e-5)


def test_full_flow_matches(torch_raft_and_params):
    model, params, _ = torch_raft_and_params
    rng = np.random.RandomState(2)
    img1 = (rng.rand(1, 128, 128, 3) * 255).astype(np.float32)
    img2 = (rng.rand(1, 128, 128, 3) * 255).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(img1).permute(0, 3, 1, 2),
                    torch.from_numpy(img2).permute(0, 3, 1, 2), iters=3)
    got = raft.raft_flow(params, jnp.asarray(img1), jnp.asarray(img2), iters=3)
    np.testing.assert_allclose(np.asarray(got),
                               ref.permute(0, 2, 3, 1).numpy(),
                               atol=2e-3, rtol=1e-2)


def test_producer_and_pseudo_gt(torch_raft_and_params, tmp_path):
    _, _, ckpt = torch_raft_and_params
    from sin_inn_tpu.data.flow_media import FlowMedia, attach_pseudo_gt

    producer = raft.make_raft_producer(ckpt, iters=2)
    rng = np.random.RandomState(3)
    # deliberately NOT a multiple of 8: exercises pad_to_multiple/unpad
    video = rng.rand(3, 120, 132, 3).astype(np.float32)
    media = attach_pseudo_gt(FlowMedia(video), producer,
                             str(tmp_path / "flow"))
    assert media.flow.shape == (2, 120, 132, 2)
    assert np.isfinite(media.flow).all()
    # cached re-attach loads the .flo files instead of recomputing
    media2 = attach_pseudo_gt(FlowMedia(video), "false {f1} {f2} {out}",
                              str(tmp_path / "flow"))
    np.testing.assert_allclose(media2.flow, media.flow, atol=1e-3)


def test_pseudo_gt_batched_matches_per_pair(torch_raft_and_params, tmp_path):
    """batch_pairs > 1 stacks consecutive pairs into one device call
    (relay-sync amortization); outputs must match the per-pair path exactly
    (every norm in the model is per-sample), including the padded ragged
    tail (5 pairs at batch 2)."""
    _, _, ckpt = torch_raft_and_params
    from sin_inn_tpu.data.flow_media import generate_pseudo_gt

    rng = np.random.RandomState(4)
    video = rng.rand(6, 64, 72, 3).astype(np.float32)
    per_pair = raft.make_raft_producer(ckpt, iters=2, batch_pairs=1)
    batched = raft.make_raft_producer(ckpt, iters=2, batch_pairs=2)
    f_a = generate_pseudo_gt(video, per_pair, str(tmp_path / "a"))
    f_b = generate_pseudo_gt(video, batched, str(tmp_path / "b"))
    assert f_a.shape == f_b.shape == (5, 64, 72, 2)
    np.testing.assert_allclose(f_b, f_a, atol=1e-4, rtol=1e-4)


def test_load_rejects_wrong_shapes(tmp_path):
    sd = {"module.fnet.conv1.weight": torch.zeros(64, 3, 7, 7)}
    p = tmp_path / "bad.pth"
    torch.save(sd, p)
    with pytest.raises(ValueError, match="missing"):
        raft.load_torch_weights(str(p))


# ---------------------------------------------------------------------------
# --small variant (SmallEncoder / BottleneckBlock / plain ConvGRU) — the
# official RAFT(args.small) model, importable from raft-small.pth
# ---------------------------------------------------------------------------

def _make_norm_small(norm, c):
    if norm == "instance":
        return nn.InstanceNorm2d(c)
    return nn.Sequential()   # norm_fn='none'


class BottleneckBlockT(nn.Module):
    def __init__(self, cin, planes, norm, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes // 4, 1)
        self.conv2 = nn.Conv2d(planes // 4, planes // 4, 3, padding=1,
                               stride=stride)
        self.conv3 = nn.Conv2d(planes // 4, planes, 1)
        self.relu = nn.ReLU(inplace=True)
        self.norm1 = _make_norm_small(norm, planes // 4)
        self.norm2 = _make_norm_small(norm, planes // 4)
        self.norm3 = _make_norm_small(norm, planes)
        if stride == 1:
            self.downsample = None
        else:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, planes, 1, stride=stride),
                _make_norm_small(norm, planes))

    def forward(self, x):
        y = self.relu(self.norm1(self.conv1(x)))
        y = self.relu(self.norm2(self.conv2(y)))
        y = self.relu(self.norm3(self.conv3(y)))
        if self.downsample is not None:
            x = self.downsample(x)
        return self.relu(x + y)


class SmallEncoderT(nn.Module):
    def __init__(self, out_dim, norm):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 32, 7, stride=2, padding=3)
        self.norm1 = _make_norm_small(norm, 32)
        self.relu1 = nn.ReLU(inplace=True)
        self.layer1 = nn.Sequential(BottleneckBlockT(32, 32, norm, 1),
                                    BottleneckBlockT(32, 32, norm, 1))
        self.layer2 = nn.Sequential(BottleneckBlockT(32, 64, norm, 2),
                                    BottleneckBlockT(64, 64, norm, 1))
        self.layer3 = nn.Sequential(BottleneckBlockT(64, 96, norm, 2),
                                    BottleneckBlockT(96, 96, norm, 1))
        self.conv2 = nn.Conv2d(96, out_dim, 1)

    def forward(self, x):
        x = self.relu1(self.norm1(self.conv1(x)))
        return self.conv2(self.layer3(self.layer2(self.layer1(x))))


class SmallMotionEncoderT(nn.Module):
    def __init__(self):
        super().__init__()
        cor_planes = 4 * (2 * 3 + 1) ** 2
        self.convc1 = nn.Conv2d(cor_planes, 96, 1)
        self.convf1 = nn.Conv2d(2, 64, 7, padding=3)
        self.convf2 = nn.Conv2d(64, 32, 3, padding=1)
        self.conv = nn.Conv2d(128, 80, 3, padding=1)

    def forward(self, flow, corr):
        cor = F.relu(self.convc1(corr))
        flo = F.relu(self.convf2(F.relu(self.convf1(flow))))
        out = F.relu(self.conv(torch.cat([cor, flo], dim=1)))
        return torch.cat([out, flow], dim=1)


class ConvGRUT(nn.Module):
    def __init__(self, hidden=96, inp=146):
        super().__init__()
        self.convz = nn.Conv2d(hidden + inp, hidden, 3, padding=1)
        self.convr = nn.Conv2d(hidden + inp, hidden, 3, padding=1)
        self.convq = nn.Conv2d(hidden + inp, hidden, 3, padding=1)

    def forward(self, h, x):
        hx = torch.cat([h, x], dim=1)
        z = torch.sigmoid(self.convz(hx))
        r = torch.sigmoid(self.convr(hx))
        q = torch.tanh(self.convq(torch.cat([r * h, x], dim=1)))
        return (1 - z) * h + z * q


class SmallUpdateBlockT(nn.Module):
    def __init__(self):
        super().__init__()
        self.encoder = SmallMotionEncoderT()
        self.gru = ConvGRUT()
        self.flow_head = FlowHeadSmallT()

    def forward(self, net, inp, corr, flow):
        motion = self.encoder(flow, corr)
        net = self.gru(net, torch.cat([inp, motion], dim=1))
        return net, self.flow_head(net)


class FlowHeadSmallT(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(96, 128, 3, padding=1)
        self.conv2 = nn.Conv2d(128, 2, 3, padding=1)

    def forward(self, x):
        return self.conv2(F.relu(self.conv1(x)))


class TorchRAFTSmall(nn.Module):
    def __init__(self):
        super().__init__()
        self.fnet = SmallEncoderT(128, "instance")
        self.cnet = SmallEncoderT(96 + 64, "none")
        self.update_block = SmallUpdateBlockT()

    def forward(self, image1, image2, iters):
        image1 = 2 * (image1 / 255.0) - 1.0
        image2 = 2 * (image2 / 255.0) - 1.0
        fmaps = self.fnet(torch.cat([image1, image2], dim=0))
        fmap1, fmap2 = torch.split(fmaps, image1.shape[0], dim=0)
        corr_fn = CorrBlock(fmap1, fmap2, radius=3)
        cnet = self.cnet(image1)
        net, inp = torch.split(cnet, [96, 64], dim=1)
        net = torch.tanh(net)
        inp = torch.relu(inp)
        n, _, h8, w8 = fmap1.shape
        coords0 = TorchRAFT.coords_grid(n, h8, w8)
        coords1 = coords0.clone()
        for _ in range(iters):
            corr = corr_fn(coords1)
            flow = coords1 - coords0
            net, dflow = self.update_block(net, inp, corr, flow)
            coords1 = coords1 + dflow
        flow = coords1 - coords0
        return 8 * F.interpolate(flow, size=(8 * h8, 8 * w8),
                                 mode="bilinear", align_corners=True)


@pytest.fixture(scope="module")
def torch_raft_small_and_params(tmp_path_factory):
    model = _small_weights(TorchRAFTSmall()).eval()
    path = tmp_path_factory.mktemp("raft") / "raft-small-synth.pth"
    sd = {f"module.{k}": v for k, v in model.state_dict().items()}
    torch.save(sd, path)
    params = raft.load_torch_weights(str(path))
    return model, params, str(path)


def test_small_schema_and_autodetect(torch_raft_small_and_params):
    model, params, _ = torch_raft_small_and_params
    assert raft.detect_variant(model.state_dict()) == "small"
    assert set(params) == set(raft.param_schema("small"))


def test_small_encoders_match(torch_raft_small_and_params):
    model, params, _ = torch_raft_small_and_params
    rng = np.random.RandomState(4)
    img = rng.rand(2, 64, 96, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        ref_f = model.fnet(torch.from_numpy(img).permute(0, 3, 1, 2))
        ref_c = model.cnet(torch.from_numpy(img).permute(0, 3, 1, 2))
    got_f = raft._small_encoder(params, "fnet", jnp.asarray(img), "instance")
    got_c = raft._small_encoder(params, "cnet", jnp.asarray(img), "none")
    np.testing.assert_allclose(np.asarray(got_f),
                               ref_f.permute(0, 2, 3, 1).numpy(),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_c),
                               ref_c.permute(0, 2, 3, 1).numpy(),
                               atol=2e-4, rtol=1e-3)


def test_small_gru_gate_order(torch_raft_small_and_params):
    """Convention test (VERDICT r2): the z/r/q gate-slab mapping is asserted
    directly on randomized weights, so a shape-preserving gate swap in the
    importer or kernel cannot pass."""
    model, params, _ = torch_raft_small_and_params
    rng = np.random.RandomState(5)
    net = rng.rand(1, 8, 10, 96).astype(np.float32) * 2 - 1
    inp = rng.rand(1, 8, 10, 146).astype(np.float32) * 2 - 1
    with torch.no_grad():
        ref = model.update_block.gru(
            torch.from_numpy(net).permute(0, 3, 1, 2),
            torch.from_numpy(inp).permute(0, 3, 1, 2))
    got = raft._conv_gru(params, jnp.asarray(net), jnp.asarray(inp))
    np.testing.assert_allclose(np.asarray(got),
                               ref.permute(0, 2, 3, 1).numpy(),
                               atol=2e-4, rtol=1e-3)


def test_small_full_flow_matches(torch_raft_small_and_params):
    model, params, _ = torch_raft_small_and_params
    rng = np.random.RandomState(6)
    img1 = (rng.rand(1, 128, 128, 3) * 255).astype(np.float32)
    img2 = (rng.rand(1, 128, 128, 3) * 255).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(img1).permute(0, 3, 1, 2),
                    torch.from_numpy(img2).permute(0, 3, 1, 2), iters=3)
    got = raft.raft_flow(params, jnp.asarray(img1), jnp.asarray(img2),
                         iters=3, variant="small")
    np.testing.assert_allclose(np.asarray(got),
                               ref.permute(0, 2, 3, 1).numpy(),
                               atol=2e-3, rtol=1e-2)


def test_small_producer_autodetects(torch_raft_small_and_params, tmp_path):
    _, _, ckpt = torch_raft_small_and_params
    producer = raft.make_raft_producer(ckpt, iters=2)
    rng = np.random.RandomState(7)
    flow = producer(rng.rand(96, 104, 3).astype(np.float32),
                    rng.rand(96, 104, 3).astype(np.float32))
    assert flow.shape == (96, 104, 2)
    assert np.isfinite(flow).all()
