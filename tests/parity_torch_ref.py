"""Torch re-derivation of the reference math, for parity testing.

This module re-implements, in torch (NCHW), the exact formulas of the
reference implementation — the FrEIA GLOW coupling clamp math
(/root/reference/archs.py:52-68), InvBlockExp + DenseBlock
(/root/reference/archs.py:74-160), Haar / iRevNet squeezes
(/root/reference/archs.py:162-199), the SR losses (/root/reference/loss.py),
and the entire flow photometric loss stack
(/root/reference/video-interpolation/trainer.py:47-87, my_utils/loss.py,
my_utils/occlusions.py, my_utils/softsplat.py) — so the JAX framework can be
pinned against an INDEPENDENT execution of the same math with ported weights.

It consumes the framework's own specs/params (weights ported HWIO->OIHW), so
any numerical drift in an op shows up as a parity failure, proving the
BASELINE.json north star ("PSNR within 0.1 dB of reference") by construction
rather than by assertion.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F

TWO_OVER_PI = 2.0 / math.pi


# ---------------------------------------------------------------------------
# Weight porting: JAX HWIO conv dicts -> torch OIHW tensors
# ---------------------------------------------------------------------------

def port_conv(p, requires_grad=False):
    w = torch.tensor(np.asarray(p["w"]).transpose(3, 2, 0, 1))
    b = torch.tensor(np.asarray(p["b"]))
    if requires_grad:
        w.requires_grad_()
        b.requires_grad_()
    return {"w": w, "b": b}


def port_params(params, requires_grad=False):
    """Port the INN params list (aligned with the spec) to torch tensors."""
    out = []
    for p in params:
        if p is None:
            out.append(None)
        else:
            out.append({k: {ck: port_conv(cv, requires_grad)
                            for ck, cv in v.items()}
                        for k, v in p.items()})
    return out


def unport_grads(tparams):
    """Collect torch .grad back into the JAX params layout (HWIO numpy)."""
    out = []
    for p in tparams:
        if p is None:
            out.append(None)
            continue
        d = {}
        for k, v in p.items():
            d[k] = {}
            for ck, cv in v.items():
                gw = cv["w"].grad
                gb = cv["b"].grad
                d[k][ck] = {
                    "w": (gw.detach().numpy().transpose(2, 3, 1, 0)
                          if gw is not None else None),
                    "b": gb.detach().numpy() if gb is not None else None,
                }
        out.append(d)
    return out


def torch_leaves(tparams):
    ls = []
    for p in tparams:
        if p is None:
            continue
        for v in p.values():
            for cv in v.values():
                ls.extend([cv["w"], cv["b"]])
    return ls


# ---------------------------------------------------------------------------
# INN layer math (reference formulas, NCHW)
# ---------------------------------------------------------------------------

def t_conv(x, p, pad):
    return F.conv2d(x, p["w"], p["b"], padding=pad)


def t_conv_subnet(p, x, k):
    h = F.relu(t_conv(x, p["conv1"], k // 2))
    return t_conv(h, p["conv2"], k // 2)


def t_dense_block(p, x):
    lrelu = lambda v: F.leaky_relu(v, 0.2)
    x1 = lrelu(t_conv(x, p["conv1"], 1))
    cat = torch.cat([x, x1], 1)
    x2 = lrelu(t_conv(cat, p["conv2"], 1))
    cat = torch.cat([cat, x2], 1)
    x3 = lrelu(t_conv(cat, p["conv3"], 1))
    cat = torch.cat([cat, x3], 1)
    x4 = lrelu(t_conv(cat, p["conv4"], 1))
    cat = torch.cat([cat, x4], 1)
    return t_conv(cat, p["conv5"], 1)


def t_log_e(s, clamp):
    return clamp * TWO_OVER_PI * torch.atan(s / clamp)


def t_glow_fwd(p, x, clamp, len1, k):
    x1, x2 = x[:, :len1], x[:, len1:]
    r2 = t_conv_subnet(p["s2"], x2, k)
    s2, t2 = r2[:, :len1], r2[:, len1:]
    y1 = torch.exp(t_log_e(s2, clamp)) * x1 + t2
    r1 = t_conv_subnet(p["s1"], y1, k)
    len2 = x2.shape[1]
    s1, t1 = r1[:, :len2], r1[:, len2:]
    y2 = torch.exp(t_log_e(s1, clamp)) * x2 + t1
    return torch.cat([y1, y2], 1)


def t_glow_inv(p, y, clamp, len1, k):
    y1, y2 = y[:, :len1], y[:, len1:]
    r1 = t_conv_subnet(p["s1"], y1, k)
    len2 = y2.shape[1]
    s1, t1 = r1[:, :len2], r1[:, len2:]
    x2 = (y2 - t1) * torch.exp(-t_log_e(s1, clamp))
    r2 = t_conv_subnet(p["s2"], x2, k)
    s2, t2 = r2[:, :len1], r2[:, len1:]
    x1 = (y1 - t2) * torch.exp(-t_log_e(s2, clamp))
    return torch.cat([x1, x2], 1)


def t_invblock_fwd(p, x, clamp, len1):
    x1, x2 = x[:, :len1], x[:, len1:]
    y1 = x1 + t_dense_block(p["F"], x2)
    s = clamp * (torch.sigmoid(t_dense_block(p["H"], y1)) * 2.0 - 1.0)
    y2 = x2 * torch.exp(s) + t_dense_block(p["G"], y1)
    return torch.cat([y1, y2], 1)


def t_invblock_inv(p, y, clamp, len1):
    y1, y2 = y[:, :len1], y[:, len1:]
    s = clamp * (torch.sigmoid(t_dense_block(p["H"], y1)) * 2.0 - 1.0)
    x2 = (y2 - t_dense_block(p["G"], y1)) * torch.exp(-s)
    x1 = y1 - t_dense_block(p["F"], x2)
    return torch.cat([x1, x2], 1)


def t_squeeze(x):
    """Component-major space-to-depth matching ops/squeeze.py: out channel =
    (2*dy + dx) * C + c."""
    n, c, h, w = x.shape
    x = x.view(n, c, h // 2, 2, w // 2, 2)
    x = x.permute(0, 3, 5, 1, 2, 4)
    return x.reshape(n, 4 * c, h // 2, w // 2)


def t_unsqueeze(y):
    n, c4, h, w = y.shape
    c = c4 // 4
    y = y.view(n, 2, 2, c, h, w)
    y = y.permute(0, 3, 4, 1, 5, 2)
    return y.reshape(n, c, 2 * h, 2 * w)


def t_haar(x):
    a = x[:, :, 0::2, 0::2]
    b = x[:, :, 0::2, 1::2]
    cc = x[:, :, 1::2, 0::2]
    d = x[:, :, 1::2, 1::2]
    ll = (a + b + cc + d) * 0.25
    lh = (a - b + cc - d) * 0.25
    hl = (a + b - cc - d) * 0.25
    hh = (a - b - cc + d) * 0.25
    return torch.cat([ll, lh, hl, hh], 1)


def t_unhaar(y):
    c = y.shape[1] // 4
    ll, lh, hl, hh = y[:, :c], y[:, c:2 * c], y[:, 2 * c:3 * c], y[:, 3 * c:]
    a = ll + lh + hl + hh
    b = ll - lh + hl - hh
    cc = ll + lh - hl - hh
    d = ll - lh - hl + hh
    n, _, h, w = ll.shape
    out = torch.zeros(n, c, 2 * h, 2 * w, dtype=y.dtype)
    out[:, :, 0::2, 0::2] = a
    out[:, :, 0::2, 1::2] = b
    out[:, :, 1::2, 0::2] = cc
    out[:, :, 1::2, 1::2] = d
    return out


def t_inn_apply(spec, tparams, x, rev=False):
    """Torch traversal of the framework's LayerSpec list (NCHW)."""
    pairs = list(zip(spec, tparams))
    if rev:
        pairs = pairs[::-1]
    for layer, p in pairs:
        if layer.kind == "squeeze":
            x = t_unsqueeze(x) if rev else t_squeeze(x)
        elif layer.kind == "haar":
            x = t_unhaar(x) if rev else t_haar(x)
        elif layer.kind == "permute":
            perm = layer.perm_inv if rev else layer.perm
            x = x[:, list(perm)]
        elif layer.kind == "glow":
            fn = t_glow_inv if rev else t_glow_fwd
            x = fn(p, x, layer.clamp, layer.split_len1, layer.kernel)
        elif layer.kind == "invblock":
            fn = t_invblock_inv if rev else t_invblock_fwd
            x = fn(p, x, layer.clamp, layer.split_len1)
        else:
            raise ValueError(layer.kind)
    return x


# ---------------------------------------------------------------------------
# SR losses (reference loss.py)
# ---------------------------------------------------------------------------

MMD_FWD = ((0.2, 2), (1.5, 2), (3.0, 2))
MMD_REV = ((0.2, 0.1), (0.2, 0.5), (0.2, 2))


def t_mmd(x, y, rev=False):
    kernels = MMD_REV if rev else MMD_FWD
    n = x.shape[0]
    xf = x.reshape(n, -1)
    yf = y.reshape(n, -1)
    xx, yy, xy = xf @ xf.T, yf @ yf.T, xf @ yf.T
    rx = torch.diag(xx)[None, :].expand_as(xx)
    ry = torch.diag(yy)[None, :].expand_as(yy)
    dxx = torch.clamp(rx.T + rx - 2 * xx, min=0)
    dyy = torch.clamp(ry.T + ry - 2 * yy, min=0)
    dxy = torch.clamp(rx.T + ry - 2 * xy, min=0)
    XX = torch.zeros_like(xx)
    YY = torch.zeros_like(xx)
    XY = torch.zeros_like(xx)
    for Ck, a in kernels:
        XX = XX + Ck ** a * ((Ck + dxx) / a) ** -a
        YY = YY + Ck ** a * ((Ck + dyy) / a) ** -a
        XY = XY + Ck ** a * ((Ck + dxy) / a) ** -a
    return (XX + YY - 2 * XY).mean()


def t_sr_loss(spec, tparams, cfg, hr, lr, z):
    """Bidirectional SR loss (reference lit_wrapper.py:29-56), NCHW inputs."""
    lr_z = torch.cat([lr, z], 1)
    lr_z_hat = t_inn_apply(spec, tparams, hr)
    fwd = cfg.lambda_fwd_rec * ((lr_z_hat[:, :cfg.lr_dims] - lr) ** 2).mean()
    if cfg.lambda_fwd_mmd:
        fwd = fwd + cfg.lambda_fwd_mmd * t_mmd(lr_z_hat, lr_z)
    if cfg.lambda_latent_nll:
        fwd = fwd + cfg.lambda_latent_nll * (lr_z_hat[:, cfg.lr_dims:] ** 2).mean()
    hr_hat = t_inn_apply(spec, tparams, lr_z, rev=True)
    bwd = cfg.lambda_bwd_rec * ((hr_hat - hr) ** 2).mean()
    if cfg.lambda_bwd_mmd:
        bwd = bwd + cfg.lambda_bwd_mmd * t_mmd(hr_hat, hr, rev=True)
    return fwd + bwd, hr_hat


# ---------------------------------------------------------------------------
# Flow photometric loss stack (reference trainer.py:47-87 + my_utils/*)
# ---------------------------------------------------------------------------

def t_resample2d(img, flow):
    """Reference Resample2d (resample2d.py:52-72): coords normalized by
    (size-1), sampled with grid_sample default align_corners=False."""
    n, c, h, w = img.shape
    ys, xs = torch.meshgrid(torch.arange(h, dtype=img.dtype),
                            torch.arange(w, dtype=img.dtype), indexing="ij")
    gx = (xs[None] + flow[:, 0]) / (w - 1) * 2 - 1
    gy = (ys[None] + flow[:, 1]) / (h - 1) * 2 - 1
    grid = torch.stack([gx, gy], -1)
    return F.grid_sample(img, grid, mode="bilinear", padding_mode="zeros",
                         align_corners=False)


def t_splat_scatter(values, flow):
    """Bilinear scatter-add (softsplat.py updateOutput semantics)."""
    n, c, h, w = values.shape
    ys, xs = torch.meshgrid(torch.arange(h, dtype=values.dtype),
                            torch.arange(w, dtype=values.dtype), indexing="ij")
    ox = xs[None] + flow[:, 0]
    oy = ys[None] + flow[:, 1]
    x0 = torch.floor(ox)
    y0 = torch.floor(oy)
    out = torch.zeros_like(values)
    for dx, dy in ((0, 0), (1, 0), (0, 1), (1, 1)):
        xi = x0 + dx
        yi = y0 + dy
        wgt = (1 - (ox - xi).abs()) * (1 - (oy - yi).abs())
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        wgt = torch.where(valid, wgt, torch.zeros_like(wgt))
        idx = (yi.clamp(0, h - 1) * w + xi.clamp(0, w - 1)).long()
        src = (values * wgt[:, None]).reshape(n, c, h * w)
        out.view(n, c, h * w).scatter_add_(
            2, idx.reshape(n, 1, h * w).expand(n, c, h * w), src)
    return out


def t_softsplat_softmax(inp, flow, metric):
    e = torch.exp(metric)
    cat = torch.cat([inp * e, e], 1)
    out = t_splat_scatter(cat, flow)
    num, den = out[:, :-1], out[:, -1:]
    return torch.where(den != 0, num / torch.where(den == 0,
                                                   torch.ones_like(den), den),
                       torch.zeros_like(num))


def t_occlusion_wang(flow, thresh):
    ones = torch.ones(flow.shape[0], 1, *flow.shape[2:], dtype=flow.dtype)
    corr = t_splat_scatter(ones, flow)
    return (corr > thresh).to(flow.dtype)


def t_masked_l1(im1, im2, mask, weight):
    if weight == 0:
        return torch.zeros(())
    diff = (im1 * mask - im2 * mask).abs().mean()
    return diff / mask.sum() * mask.numel() * weight


def t_census(im, im_warp, mask, weight, md=3):
    if weight == 0:
        return torch.zeros(())
    def ternary(img):
        lum = (img[:, 0] * 0.2989 + img[:, 1] * 0.5870
               + img[:, 2] * 0.1140)[:, None] * 255.0
        p = 2 * md + 1
        eye = torch.eye(p * p, dtype=img.dtype).view(p * p, 1, p, p)
        patches = F.conv2d(lum, eye, padding=md)
        transf = patches - lum
        return transf / torch.sqrt(0.81 + transf ** 2)
    t1 = ternary(im * mask)
    t2 = ternary(im_warp * mask)
    dist = (t1 - t2) ** 2
    dist = dist / (0.1 + dist)
    dist = dist.mean(1, keepdim=True)
    n, _, h, w = im.shape
    valid = torch.zeros(1, 1, h, w, dtype=im.dtype)
    valid[:, :, md:h - md, md:w - md] = 1.0
    return (dist * valid).mean() / mask.sum() * mask.numel() * weight


def t_ssim(x, y, mask, weight, md=1):
    if weight == 0:
        return torch.zeros(())
    x = x * mask
    y = y * mask
    k = 2 * md + 1
    pool = lambda v: F.avg_pool2d(v, k, 1, 0)
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    mu_x, mu_y = pool(x), pool(y)
    sigma_x = pool(x * x) - mu_x ** 2
    sigma_y = pool(y * y) - mu_y ** 2
    sigma_xy = pool(x * y) - mu_x * mu_y
    ssim_n = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    ssim_d = (mu_x ** 2 + mu_y ** 2 + c1) * (sigma_x + sigma_y + c2)
    dist = torch.clamp((1 - ssim_n / ssim_d) / 2, 0, 1)
    return dist.mean() / mask.sum() * mask.numel() * weight


def t_bilateral_smooth(img, flow, weight, edge_func, edge_constant, order=1):
    if weight == 0:
        return torch.zeros(())
    abs_fun = torch.abs if edge_func == "exp" else (lambda v: v ** 2)
    gh = lambda v, s=1: v[:, :, s:] - v[:, :, :-s]
    gw = lambda v, s=1: v[:, :, :, s:] - v[:, :, :, :-s]
    robust = lambda v: torch.sqrt(v ** 2 + 0.001 ** 2)
    img_gh, img_gw = gh(img, order), gw(img, order)
    w_h = torch.exp(-abs_fun(edge_constant * img_gh).mean(1, keepdim=True))
    w_w = torch.exp(-abs_fun(edge_constant * img_gw).mean(1, keepdim=True))
    f_gh, f_gw = gh(flow), gw(flow)
    if order == 1:
        return ((w_h * robust(f_gh)).mean()
                + (w_w * robust(f_gw)).mean()) / 2 * weight
    f_ghh = gh(f_gh)
    f_gww = gw(f_gw)
    return ((w_h * robust(f_ghh)).mean()
            + (w_w * robust(f_gww)).mean()) / 2 * weight


def t_photometric_flow_loss(cfg, frame1, frame2, flow12, flow21):
    """Torch re-derivation of the full training-step loss
    (trainer.py:47-87), NCHW inputs."""
    warped2 = t_resample2d(frame1, flow21)
    metric = (frame2 - warped2).abs().mean(1, keepdim=True)
    warped1 = t_resample2d(frame2, flow12)
    metric2 = (frame1 - warped1).abs().mean(1, keepdim=True)

    softmax1 = t_softsplat_softmax(frame2, flow21, -20.0 * metric)
    softmax2 = t_softsplat_softmax(frame1, flow12, -20.0 * metric2)
    if cfg.occl == "wang":
        mask1 = t_occlusion_wang(flow21, cfg.occl_thresh)
        mask2 = t_occlusion_wang(flow12, cfg.occl_thresh)
    else:
        mask1 = torch.ones_like(metric)
        mask2 = torch.ones_like(metric)
    # per-channel zero-coverage invalidation broadcast against the (N,1,H,W)
    # occlusion mask — same semantics as the NHWC framework code
    mask1 = mask1 * (softmax1 != 0).to(frame1.dtype)
    mask2 = mask2 * (softmax2 != 0).to(frame1.dtype)

    l1 = (t_masked_l1(softmax1, frame1, mask1, cfg.loss_l1)
          + t_masked_l1(softmax2, frame2, mask2, cfg.loss_l1))
    census = (t_census(softmax1, frame1, mask1, cfg.loss_census,
                       cfg.census_width)
              + t_census(softmax2, frame2, mask2, cfg.loss_census,
                         cfg.census_width))
    ssim = (t_ssim(softmax1, frame1, mask1, cfg.loss_ssim)
            + t_ssim(softmax2, frame2, mask2, cfg.loss_ssim))
    smooth = (t_bilateral_smooth(frame1, flow12, cfg.loss_smooth1,
                                 cfg.edge_func, cfg.edge_constant)
              + t_bilateral_smooth(frame2, flow21, cfg.loss_smooth1,
                                   cfg.edge_func, cfg.edge_constant))
    loss = l1 + census + ssim + smooth
    return loss, {"l1": l1, "census": census, "ssim": ssim, "smooth": smooth}
