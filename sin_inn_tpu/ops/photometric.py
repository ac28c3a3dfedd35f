"""Photometric losses: masked L1, census, SSIM, edge-aware smoothness.

Equivalents of /root/reference/video-interpolation/my_utils/loss.py (which in
turn credits ARFlow's loss blocks). All NHWC. Weight-zero losses short-circuit
to 0.0 — the reference's ``BaseLoss`` placeholder pattern (loss.py:6-13).

The census transform's patch extraction is a conv with one-hot kernels; XLA
turns it into an im2col-style gather fused with the normalization — no custom
kernel needed.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _avg_pool_valid(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """k x k mean pool, stride 1, VALID padding (torch AvgPool2d(k, 1, 0))."""
    s = lax.reduce_window(x, 0.0, lax.add, (1, k, k, 1), (1, 1, 1, 1), "VALID")
    return s / (k * k)


def masked_l1(im1: jnp.ndarray, im2: jnp.ndarray, mask: jnp.ndarray,
              weight: float) -> jnp.ndarray:
    """L1Loss (loss.py:16-25): mean|im1*m - im2*m| / m.sum() * m.numel() * w."""
    if weight == 0:
        return jnp.zeros((), im1.dtype)
    diff = jnp.mean(jnp.abs(im1 * mask - im2 * mask))
    return diff / jnp.sum(mask) * mask.size * weight


def _rgb_to_grayscale(img: jnp.ndarray) -> jnp.ndarray:
    """ITU-R 601 luma (loss.py:36-40)."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    return (r * 0.2989 + g * 0.5870 + b * 0.1140)[..., None]


def _ternary_transform(img: jnp.ndarray, max_distance: int) -> jnp.ndarray:
    """Census/ternary transform (loss.py:42-50). Reference implementation,
    kept for tests; the fused loop in :func:`census_loss` avoids
    materializing the (N, H, W, p^2) patch tensor."""
    p = 2 * max_distance + 1
    intensities = _rgb_to_grayscale(img) * 255.0
    eye = jnp.eye(p * p, dtype=img.dtype).reshape(p, p, 1, p * p)
    patches = lax.conv_general_dilated(
        intensities, eye, (1, 1), [(max_distance, max_distance)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    transf = patches - intensities
    return transf / jnp.sqrt(0.81 + transf ** 2)


def _shift2d(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """x[..., y+dy, x+dx] with zero padding, matching the one-hot conv's
    SAME-zero border semantics. x: (N, H, W)."""
    n, h, w = x.shape
    out = x
    if dy:
        if dy > 0:
            out = jnp.concatenate(
                [out[:, dy:], jnp.zeros((n, dy, w), x.dtype)], axis=1)
        else:
            out = jnp.concatenate(
                [jnp.zeros((n, -dy, w), x.dtype), out[:, :dy]], axis=1)
    if dx:
        if dx > 0:
            out = jnp.concatenate(
                [out[:, :, dx:], jnp.zeros((n, h, dx), x.dtype)], axis=2)
        else:
            out = jnp.concatenate(
                [jnp.zeros((n, h, -dx), x.dtype), out[:, :, :dx]], axis=2)
    return out


def census_loss(im: jnp.ndarray, im_warp: jnp.ndarray, mask: jnp.ndarray,
                weight: float, max_distance: int = 3) -> jnp.ndarray:
    """CensusLoss (loss.py:30-72): soft hamming distance of ternary patches,
    border-invalidated, mask-normalized.

    TPU note: the straightforward one-hot p^2-channel conv (cin=1) lowers
    poorly on the MXU and materializes two (N, H, W, p^2) tensors (~260 MB at
    Sintel scale). Identical math as a fused accumulation over the p^2
    shifts: each offset is a slice + a few VPU elementwise ops, fully fused
    by XLA — measured ~3x faster fwd+grad at 3x436x1024.
    """
    if weight == 0:
        return jnp.zeros((), im.dtype)
    md = max_distance
    p = 2 * md + 1
    c1 = _rgb_to_grayscale(im * mask)[..., 0] * 255.0        # (N, H, W)
    c2 = _rgb_to_grayscale(im_warp * mask)[..., 0] * 255.0

    acc = jnp.zeros_like(c1)
    for dy in range(-md, md + 1):
        for dx in range(-md, md + 1):
            t1 = _shift2d(c1, dy, dx) - c1
            t2 = _shift2d(c2, dy, dx) - c2
            f1 = t1 / jnp.sqrt(0.81 + t1 ** 2)
            f2 = t2 / jnp.sqrt(0.81 + t2 ** 2)
            d = (f1 - f2) ** 2
            acc = acc + d / (0.1 + d)
    dist_mean = acc / (p * p)

    n, h, w, _ = im.shape
    valid = jnp.zeros((1, h, w), im.dtype)
    valid = valid.at[:, md:h - md, md:w - md].set(1.0)
    return (jnp.mean(dist_mean * valid) / jnp.sum(mask) * mask.size * weight)


def ssim_loss(x: jnp.ndarray, y: jnp.ndarray, mask: jnp.ndarray,
              weight: float, md: int = 1) -> jnp.ndarray:
    """SSIMLoss (loss.py:75-103)."""
    if weight == 0:
        return jnp.zeros((), x.dtype)
    x = x * mask
    y = y * mask
    k = 2 * md + 1
    c1 = 0.01 ** 2
    c2 = 0.03 ** 2
    mu_x = _avg_pool_valid(x, k)
    mu_y = _avg_pool_valid(y, k)
    mu_xy = mu_x * mu_y
    mu_x2 = mu_x ** 2
    mu_y2 = mu_y ** 2
    sigma_x = _avg_pool_valid(x * x, k) - mu_x2
    sigma_y = _avg_pool_valid(y * y, k) - mu_y2
    sigma_xy = _avg_pool_valid(x * y, k) - mu_xy
    ssim_n = (2 * mu_xy + c1) * (2 * sigma_xy + c2)
    ssim_d = (mu_x2 + mu_y2 + c1) * (sigma_x + sigma_y + c2)
    dist = jnp.clip((1.0 - ssim_n / ssim_d) / 2.0, 0.0, 1.0)
    return jnp.mean(dist) / jnp.sum(mask) * mask.size * weight


def image_grads(img: jnp.ndarray, stride: int = 1):
    """(gh, gw) finite differences (my_utils/utils.py:6-9), NHWC."""
    gh = img[:, stride:] - img[:, :-stride]
    gw = img[:, :, stride:] - img[:, :, :-stride]
    return gh, gw


def robust_l1(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(x ** 2 + 0.001 ** 2)


def bilateral_smooth(img: jnp.ndarray, flow: jnp.ndarray, weight: float,
                     edge_func: str = "gauss", edge_constant: float = 150.0,
                     order: int = 1) -> jnp.ndarray:
    """BilateralSmooth (loss.py:106-132): edge-aware flow smoothness."""
    if weight == 0:
        return jnp.zeros((), img.dtype)
    abs_fun = jnp.abs if edge_func == "exp" else (lambda v: v ** 2)
    img_gh, img_gw = image_grads(img, stride=order)
    flow_gh, flow_gw = image_grads(flow)
    w_h = jnp.exp(-jnp.mean(abs_fun(edge_constant * img_gh), -1, keepdims=True))
    w_w = jnp.exp(-jnp.mean(abs_fun(edge_constant * img_gw), -1, keepdims=True))
    if order == 1:
        loss = (jnp.mean(w_h * robust_l1(flow_gh))
                + jnp.mean(w_w * robust_l1(flow_gw))) / 2.0
    elif order == 2:
        # stride-2 image grads already match the 2nd-order flow grad shapes
        flow_ghh, _ = image_grads(flow_gh)
        _, flow_gww = image_grads(flow_gw)
        loss = (jnp.mean(w_h * robust_l1(flow_ghh))
                + jnp.mean(w_w * robust_l1(flow_gww))) / 2.0
    else:
        raise ValueError(order)
    return loss * weight
