"""Backward warping and affine warping, pure XLA (NHWC).

Replaces three native/third-party ops of the reference:
  * ``grid_sample``-based flow warp (``Resample2d``, /root/reference/
    video-interpolation/my_utils/resample2d.py:52-72, and ``flow_warp`` in
    occlusions.py:85-95) — implemented as bilinear gathers, which XLA lowers
    to efficient dynamic-slice/gather on TPU;
  * the legacy ``resample2d_cuda`` extension (resample2d.py:19-50) — obsolete;
  * kornia's ``warp_affine`` used by TCR (/root/reference/tcr.py:35-43).

``grid_sample`` matches torch semantics (align_corners, zeros/border padding)
so the reference's two different call conventions can both be reproduced:
``Resample2d`` normalizes by (size-1) but samples with align_corners=False
(a subtle reference quirk), while ``flow_warp`` uses align_corners=True.
"""

from __future__ import annotations

import math
import jax.numpy as jnp


def _gather_2d(img: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray) -> jnp.ndarray:
    """Gather img[n, iy, ix, :] for per-sample integer index maps.

    img: (N, H, W, C); ix/iy: (N, Ho, Wo) int32 (already clipped in-range).
    """
    n, h, w, c = img.shape
    flat = img.reshape(n, h * w, c)
    idx = iy * w + ix                                     # (N, Ho, Wo)
    out = jnp.take_along_axis(
        flat, idx.reshape(n, -1, 1).astype(jnp.int32), axis=1)
    return out.reshape(n, ix.shape[1], ix.shape[2], c)


def sample_bilinear(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                    padding: str = "zeros") -> jnp.ndarray:
    """Bilinear sample at continuous pixel coords (x, y).

    img: (N, H, W, C); x/y: (N, Ho, Wo) float pixel coordinates.
    padding: 'zeros' (out-of-range contributes 0) or 'border' (clamp).
    """
    n, h, w, c = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def tap(xi, yi, weight):
        if padding == "border":
            xi_c = jnp.clip(xi, 0, w - 1)
            yi_c = jnp.clip(yi, 0, h - 1)
            val = _gather_2d(img, xi_c.astype(jnp.int32), yi_c.astype(jnp.int32))
            return val * weight[..., None]
        # zeros padding: mask taps that fall outside
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xi_c = jnp.clip(xi, 0, w - 1)
        yi_c = jnp.clip(yi, 0, h - 1)
        val = _gather_2d(img, xi_c.astype(jnp.int32), yi_c.astype(jnp.int32))
        return val * (weight * valid.astype(img.dtype))[..., None]

    out = (tap(x0, y0, (1 - wx) * (1 - wy))
           + tap(x0 + 1, y0, wx * (1 - wy))
           + tap(x0, y0 + 1, (1 - wx) * wy)
           + tap(x0 + 1, y0 + 1, wx * wy))
    return out


def grid_sample(img: jnp.ndarray, grid: jnp.ndarray, align_corners: bool = False,
                padding: str = "zeros") -> jnp.ndarray:
    """torch.nn.functional.grid_sample equivalent (bilinear, NHWC).

    grid: (N, Ho, Wo, 2) normalized (x, y) in [-1, 1].
    """
    n, h, w, c = img.shape
    gx = grid[..., 0]
    gy = grid[..., 1]
    if align_corners:
        x = (gx + 1.0) * 0.5 * (w - 1)
        y = (gy + 1.0) * 0.5 * (h - 1)
    else:
        x = ((gx + 1.0) * w - 1.0) * 0.5
        y = ((gy + 1.0) * h - 1.0) * 0.5
    return sample_bilinear(img, x, y, padding=padding)


def resample2d(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward warp by flow: out(p) = img(p + flow(p)).

    Matches the reference's current ``Resample2d`` exactly (resample2d.py:52-72):
    coords normalized by (size-1) (align_corners=True convention) but sampled
    with grid_sample's default align_corners=False and zeros padding.
    img: (N, H, W, C); flow: (N, H, W, 2) in pixels, channel order (dx, dy).
    """
    n, h, w, _ = flow.shape
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=img.dtype),
                          jnp.arange(w, dtype=img.dtype), indexing="ij")
    new_x = xs[None] + flow[..., 0]
    new_y = ys[None] + flow[..., 1]
    grid = jnp.stack([new_x / (w - 1) * 2.0 - 1.0,
                      new_y / (h - 1) * 2.0 - 1.0], axis=-1)
    return grid_sample(img, grid, align_corners=False, padding="zeros")


def flow_warp(img: jnp.ndarray, flow: jnp.ndarray, padding: str = "border") -> jnp.ndarray:
    """Backward warp with align_corners=True + border padding.

    Matches ``flow_warp`` used inside occlusion estimation
    (/root/reference/video-interpolation/my_utils/occlusions.py:85-95).
    """
    n, h, w, _ = flow.shape
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=img.dtype),
                          jnp.arange(w, dtype=img.dtype), indexing="ij")
    x = xs[None] + flow[..., 0]
    y = ys[None] + flow[..., 1]
    return sample_bilinear(img, x, y, padding=padding)


# ---------------------------------------------------------------------------
# Affine warp (TCR)
# ---------------------------------------------------------------------------

def rotation_matrix_2d(center: jnp.ndarray, angle_deg: jnp.ndarray,
                       scale: jnp.ndarray) -> jnp.ndarray:
    """kornia.get_rotation_matrix2d equivalent (cv2 convention).

    center: (N, 2) as (cx, cy); angle_deg: (N,); scale: (N,) or (N, 2).
    Returns (N, 2, 3) affine matrices mapping src -> dst.
    """
    if scale.ndim == 2:
        scale = scale[:, 0]
    rad = angle_deg * (math.pi / 180.0)
    alpha = scale * jnp.cos(rad)
    beta = scale * jnp.sin(rad)
    cx, cy = center[:, 0], center[:, 1]
    m00 = alpha
    m01 = beta
    m02 = (1.0 - alpha) * cx - beta * cy
    m10 = -beta
    m11 = alpha
    m12 = beta * cx + (1.0 - alpha) * cy
    return jnp.stack([jnp.stack([m00, m01, m02], axis=-1),
                      jnp.stack([m10, m11, m12], axis=-1)], axis=1)


def warp_affine(img: jnp.ndarray, mat: jnp.ndarray) -> jnp.ndarray:
    """kornia.warp_affine equivalent: apply src->dst affine ``mat`` (N, 2, 3).

    Samples src at inv(mat) @ dst coords, bilinear, zeros padding.
    """
    n, h, w, c = img.shape
    # invert the 2x3 affine: A' = A^-1, b' = -A^-1 b
    a = mat[:, :, :2]
    b = mat[:, :, 2]
    det = a[:, 0, 0] * a[:, 1, 1] - a[:, 0, 1] * a[:, 1, 0]
    inv_a = jnp.stack([
        jnp.stack([a[:, 1, 1], -a[:, 0, 1]], axis=-1),
        jnp.stack([-a[:, 1, 0], a[:, 0, 0]], axis=-1),
    ], axis=1) / det[:, None, None]
    inv_b = -jnp.einsum("nij,nj->ni", inv_a, b)

    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=img.dtype),
                          jnp.arange(w, dtype=img.dtype), indexing="ij")
    dst = jnp.stack([xs, ys], axis=-1)                       # (H, W, 2)
    src = jnp.einsum("nij,hwj->nhwi", inv_a, dst) + inv_b[:, None, None, :]
    return sample_bilinear(img, src[..., 0], src[..., 1], padding="zeros")


def resample2d_fast(img: jnp.ndarray, flow: jnp.ndarray,
                    max_dy: int, chunk: int = 8) -> jnp.ndarray:
    """resample2d with a scatter-free backward pass w.r.t. the image.

    Forward is identical to :func:`resample2d`. The vjp w.r.t. ``img`` of a
    bilinear gather is the transposed bilinear SCATTER of the cotangent at
    the same sample coordinates — routed here through the dense windowed
    matmul splat (ops/splat.py). Measured at Sintel size (3x436x1024,
    +-50 px flows): full grad 262 ms (scatter) -> 215 ms (this op).

    Use this when you differentiate a warp w.r.t. the *image* operand. The
    shipped train steps never do — in the Wang path the warped operands are
    constant frames (XLA dead-code-eliminates the image-grad scatter), and
    the Brox mask is a boolean with zero gradient — so the plain
    :func:`resample2d` stays the default there. The vjp w.r.t. ``flow`` is
    the standard 4-tap finite-difference gather (cheap). ``max_dy`` bounds
    the vertical sample displacement exactly like splat_windowed.
    """
    import jax

    from sin_inn_tpu.ops.splat import splat_windowed

    n, h, w, _ = flow.shape

    def sample_coords(flow):
        ys, xs = jnp.meshgrid(jnp.arange(h, dtype=img.dtype),
                              jnp.arange(w, dtype=img.dtype), indexing="ij")
        new_x = xs[None] + flow[..., 0]
        new_y = ys[None] + flow[..., 1]
        # the reference Resample2d normalization quirk (resample2d.py:52-72):
        # (size-1)-normalized coords sampled with align_corners=False
        px = ((new_x / (w - 1) * 2.0 - 1.0 + 1.0) * w - 1.0) * 0.5
        py = ((new_y / (h - 1) * 2.0 - 1.0 + 1.0) * h - 1.0) * 0.5
        return px, py, xs, ys

    @jax.custom_vjp
    def _resample(img, flow):
        px, py, _, _ = sample_coords(flow)
        return sample_bilinear(img, px, py, padding="zeros")

    def _fwd(img, flow):
        return _resample(img, flow), (img, flow)

    def _bwd(res, g):
        img_r, flow_r = res
        px, py, xs, ys = sample_coords(flow_r)

        # d_img: scatter of g at the sample coords == windowed splat of g
        # along the effective displacement field
        eff = jnp.stack([px - xs[None], py - ys[None]], axis=-1)
        d_img = splat_windowed(g, eff, max_dy, chunk)

        # d_flow: finite-difference taps dout/dpx, dout/dpy
        x0 = jnp.floor(px)
        y0 = jnp.floor(py)
        wx = px - x0
        wy = py - y0
        v00 = sample_bilinear(img_r, x0, y0, padding="zeros")
        v10 = sample_bilinear(img_r, x0 + 1, y0, padding="zeros")
        v01 = sample_bilinear(img_r, x0, y0 + 1, padding="zeros")
        v11 = sample_bilinear(img_r, x0 + 1, y0 + 1, padding="zeros")
        dpx = ((v10 - v00) * (1 - wy)[..., None]
               + (v11 - v01) * wy[..., None])
        dpy = ((v01 - v00) * (1 - wx)[..., None]
               + (v11 - v10) * wx[..., None])
        # chain through the normalization: dpx/dfx = w/(w-1), dpy/dfy = h/(h-1)
        gfx = jnp.sum(g * dpx, axis=-1) * (w / (w - 1))
        gfy = jnp.sum(g * dpy, axis=-1) * (h / (h - 1))
        return d_img, jnp.stack([gfx, gfy], axis=-1)

    _resample.defvjp(_fwd, _bwd)
    return _resample(img, flow)
