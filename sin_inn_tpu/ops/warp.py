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

import jax
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


def resample2d_windowed(img: jnp.ndarray, flow: jnp.ndarray,
                        max_dy: int, chunk: int = 8,
                        max_dx: int | None = None,
                        col_chunk: int = 128,
                        fused_backward: bool = True) -> jnp.ndarray:
    """``resample2d`` as dense windowed MXU matmuls — the gather twin of
    ``ops.splat.splat_windowed``.

    XLA's TPU gather serializes: the plain 4-tap ``resample2d`` forward costs
    ~40 ms at Sintel size (3x436x1024) and its flow-grad another ~40 ms — the
    two backward warps are the single biggest line in the flow train step
    after the splat. Like the splat, the bilinear GATHER weight is separable:
    out[y, x] = sum_k wy[y x, k] * sum_w cx[y x, w] img[k, w], so for a chunk
    of output rows sharing a K = 2*max_dy + chunk + 1 source-row window the
    whole warp is two contractions: one (X, W) @ (W, K*C) matmul against the
    column one-hots and a cheap (X, K) x (X, K, C) row-weight reduction.
    Output rows are disjoint across chunks (no scatter carry — simpler than
    the splat direction). Gradients w.r.t. ``flow`` flow through the one-hot
    weights by autodiff; ``jax.checkpoint`` keeps the scan from stashing the
    (X, W) one-hots.

    Matches :func:`resample2d` exactly (including the reference's
    (size-1)/align_corners=False normalization quirk, resample2d.py:52-72)
    for samples whose vertical displacement |py - y| <= max_dy - 1 (and
    horizontal displacement |px - x| <= max_dx - 1 when ``max_dx`` is set);
    taps beyond the window are dropped like out-of-frame taps. With
    ``max_dx`` the contraction width drops from the image width to
    KX = 2*max_dx + col_chunk + 1 (the same column windowing as the splat).

    ``fused_backward=True`` replaces autodiff-through-the-scan (~3.1x the
    forward: remat + two adjoint matmuls + one-hot rebuilds) with the
    analytic flow-gradient — one extra derivative-one-hot matmul next to a
    recomputed forward (see ``_resample_windowed_bwd``); the image gradient
    is the windowed-splat adjoint and is dead-code-eliminated when the
    image is a constant (the shipped flow train step).
    """
    if fused_backward:
        return _resample_windowed_fused(max_dy, chunk, max_dx, col_chunk,
                                        img, flow)
    return _resample_windowed_impl(img, flow, max_dy, chunk, max_dx,
                                   col_chunk)


def _resample_windowed_geometry(img, flow, max_dy, chunk, max_dx, col_chunk):
    """Shared block geometry of the windowed resample fwd/bwd."""
    n, h, w = flow.shape[0], flow.shape[1], flow.shape[2]
    h_pad = (h + chunk - 1) // chunk * chunk
    k = 2 * max_dy + chunk + 1
    if max_dx is None:
        cw, kxw, w_pad, x_off = w, w, w, 0
    else:
        cw = min(col_chunk, w)
        w_pad = (w + cw - 1) // cw * cw
        # NOTE kxw = cw + 2*max_dx would suffice (max tap index is
        # cw + 2*max_dx - 1) and makes the contraction lane-exact (512 vs
        # 513->640 padded) — but MEASURED SLOWER: 17.9 vs 13.0 ms fwd /
        # 42.8 vs 30.8 ms fwd+grad at Sintel size (the odd 513 evidently
        # gets a better XLA window tiling than the power-of-two 512).
        # Keep the +1.
        kxw = 2 * max_dx + cw + 1
        x_off = max_dx
    return n, h, w, h_pad, k, cw, kxw, w_pad, x_off


def _block_layout(n, h_pad, w_pad, chunk, cw):
    """Row-chunk x column-block scan decomposition shared by the windowed
    warp fwd/bwd (and the splat): per-block start indices plus converters
    between (N, H_pad, W_pad, ...) arrays and (steps, N, chunk*cw, ...)
    scan inputs / outputs."""
    steps_r = h_pad // chunk
    steps_c = w_pad // cw
    steps = steps_r * steps_c
    ys_idx = jnp.repeat(jnp.arange(steps_r, dtype=jnp.int32) * chunk, steps_c)
    xs_idx = jnp.tile(jnp.arange(steps_c, dtype=jnp.int32) * cw, steps_r)

    def to_chunks(a):
        rest = a.shape[3:]
        a = a.reshape(n, steps_r, chunk, steps_c, cw, *rest)
        a = jnp.moveaxis(a, 3, 2)
        return a.reshape(n, steps, chunk * cw, *rest).swapaxes(0, 1)

    def from_chunks(outs, trailing=()):
        outs = outs.swapaxes(0, 1).reshape(n, steps_r, steps_c, chunk, cw,
                                           *trailing)
        return jnp.moveaxis(outs, 3, 2).reshape(n, h_pad, w_pad, *trailing)

    return ys_idx, xs_idx, to_chunks, from_chunks


def _resample_prep(img, flow, max_dy, chunk, max_dx, col_chunk):
    """Shared fwd/bwd preamble: geometry, padded per-pixel target
    decomposition under the reference normalization quirk
    ((size-1)-normalized coords sampled align_corners=False =>
    p = coord * size/(size-1) - 0.5, resample2d.py:52-72), and the padded
    source image whose every block window is a static slice."""
    (n, h, w, h_pad, k, cw, kxw, w_pad, x_off) = _resample_windowed_geometry(
        img, flow, max_dy, chunk, max_dx, col_chunk)
    dtype = img.dtype
    ys = jnp.arange(h, dtype=dtype)[None, :, None]
    xs = jnp.arange(w, dtype=dtype)[None, None, :]
    px = (xs + flow[..., 0]) * (w / (w - 1)) - 0.5
    py = (ys + flow[..., 1]) * (h / (h - 1)) - 0.5
    r0 = jnp.floor(py)
    ay = py - r0
    c0 = jnp.floor(px)
    ax = px - c0
    if h_pad != h or w_pad != w:
        padder = ((0, 0), (0, h_pad - h), (0, w_pad - w))
        r0 = jnp.pad(r0, padder, constant_values=-1e9)  # sentinel: dropped
        ay = jnp.pad(ay, padder)
        c0 = jnp.pad(c0, padder, constant_values=-1e9)
        ax = jnp.pad(ax, padder)
    right_x = 0 if max_dx is None else (w_pad - w + x_off + 1)
    img_pad = jnp.pad(img, ((0, 0), (max_dy, h_pad - h + max_dy + chunk + 1),
                            (x_off, right_x), (0, 0)))
    geom = (n, h, w, h_pad, k, cw, kxw, w_pad, x_off)
    return geom, (r0, ay, c0, ax), img_pad


def _resample_windowed_impl(img: jnp.ndarray, flow: jnp.ndarray,
                            max_dy: int, chunk: int = 8,
                            max_dx: int | None = None,
                            col_chunk: int = 128) -> jnp.ndarray:
    geom, (r0, ay, c0, ax), img_pad = _resample_prep(
        img, flow, max_dy, chunk, max_dx, col_chunk)
    n, h, w, h_pad, k, cw, kxw, w_pad, x_off = geom
    c = img.shape[3]
    dtype = img.dtype

    col_iota = jnp.arange(kxw, dtype=jnp.int32)[None, None, :]
    win_iota = jnp.arange(k, dtype=jnp.int32)[None, None, :]

    @jax.checkpoint
    def block_out(y_idx, x_idx, r0_r, ay_r, c0_r, ax_r):
        # per-block pixel vectors (N, X = chunk*cw); window origin in padded
        # image coords = (y_idx, x_idx)
        win = jax.lax.dynamic_slice(img_pad, (0, y_idx, x_idx, 0),
                                    (n, k, kxw, c))
        j0 = jnp.where(r0_r < -1e8, -1,
                       r0_r - (y_idx - max_dy)).astype(jnp.int32)
        valid0 = (r0_r >= 0) & (r0_r <= h - 1)
        valid1 = (r0_r + 1 >= 0) & (r0_r + 1 <= h - 1)
        w1 = (jnp.where((win_iota == j0[..., None]) & valid0[..., None],
                        (1.0 - ay_r)[..., None], 0.0)
              + jnp.where((win_iota == j0[..., None] + 1) & valid1[..., None],
                          ay_r[..., None], 0.0))              # (N, X, K)
        ci = jnp.where(c0_r < -1e8, -10 * w,
                       c0_r - (x_idx - x_off)).astype(jnp.int32)
        vx0 = (c0_r >= 0) & (c0_r <= w - 1)
        vx1 = (c0_r + 1 >= 0) & (c0_r + 1 <= w - 1)
        cx = (jnp.where((col_iota == ci[..., None]) & vx0[..., None],
                        (1.0 - ax_r)[..., None], 0.0)
              + jnp.where((col_iota == ci[..., None] + 1) & vx1[..., None],
                          ax_r[..., None], 0.0))              # (N, X, KX)
        # column gather as ONE matmul against the window, then row weights
        tmp = jnp.einsum("nxw,nws->nxs", cx,
                         win.transpose(0, 2, 1, 3).reshape(n, kxw, k * c),
                         preferred_element_type=jnp.float32)  # (N, X, K*C)
        out = jnp.einsum("nxk,nxkc->nxc", w1,
                         tmp.reshape(n, -1, k, c)).astype(dtype)
        return out                                            # (N, X, C)

    ys_idx, xs_idx, to_chunks, from_chunks = _block_layout(
        n, h_pad, w_pad, chunk, cw)
    inputs = (ys_idx, xs_idx, to_chunks(r0), to_chunks(ay), to_chunks(c0),
              to_chunks(ax))
    _, outs = jax.lax.scan(lambda _, inp: (None, block_out(*inp)),
                           None, inputs)                # (steps, N, X, C)
    return from_chunks(outs, (c,))[:, :h, :w]


def _resample_windowed_bwd_flow(img, flow, g, max_dy, chunk, max_dx,
                                col_chunk):
    """Analytic flow-gradient of the windowed resample.

    Per block (X pixels, K x KX window):
      out[x,c]  = sum_k w1[x,k] tmp[x,k,c],  tmp = CX @ win   (fwd matmul)
      d_ay[x]   = sum_c g[x,c] sum_k f[x,k] tmp[x,k,c]
      d_ax[x]   = sum_c g[x,c] sum_k w1[x,k] tmp2[x,k,c], tmp2 = E @ win
    where f/E are the derivative one-hots (tap1 minus tap0). Two window
    matmuls + cheap reductions — vs autodiff's remat + two adjoint matmuls
    + one-hot rebuild transposes (41 -> ~29 ms fwd+grad at Sintel size).
    """
    geom, (r0, ay, c0, ax), img_pad = _resample_prep(
        img, flow, max_dy, chunk, max_dx, col_chunk)
    n, h, w, h_pad, k, cw, kxw, w_pad, x_off = geom
    c = img.shape[3]
    dtype = img.dtype
    sx = w / (w - 1)
    sy = h / (h - 1)
    g_p = g
    if h_pad != h or w_pad != w:
        g_p = jnp.pad(g, ((0, 0), (0, h_pad - h), (0, w_pad - w), (0, 0)))

    col_iota = jnp.arange(kxw, dtype=jnp.int32)[None, None, :]
    win_iota = jnp.arange(k, dtype=jnp.int32)[None, None, :]

    def block_grads(y_idx, x_idx, r0_r, ay_r, c0_r, ax_r, g_r):
        win = jax.lax.dynamic_slice(img_pad, (0, y_idx, x_idx, 0),
                                    (n, k, kxw, c))
        win_r = win.transpose(0, 2, 1, 3).reshape(n, kxw, k * c)
        j0 = jnp.where(r0_r < -1e8, -1,
                       r0_r - (y_idx - max_dy)).astype(jnp.int32)
        valid0 = ((r0_r >= 0) & (r0_r <= h - 1))[..., None]
        valid1 = ((r0_r + 1 >= 0) & (r0_r + 1 <= h - 1))[..., None]
        hit0 = (win_iota == j0[..., None]) & valid0
        hit1 = (win_iota == j0[..., None] + 1) & valid1
        w1 = (jnp.where(hit0, (1.0 - ay_r)[..., None], 0.0)
              + jnp.where(hit1, ay_r[..., None], 0.0))
        f = jnp.where(hit1, 1.0, 0.0) - jnp.where(hit0, 1.0, 0.0)
        ci = jnp.where(c0_r < -1e8, -10 * w,
                       c0_r - (x_idx - x_off)).astype(jnp.int32)
        vx0 = ((c0_r >= 0) & (c0_r <= w - 1))[..., None]
        vx1 = ((c0_r + 1 >= 0) & (c0_r + 1 <= w - 1))[..., None]
        chit0 = (col_iota == ci[..., None]) & vx0
        chit1 = (col_iota == ci[..., None] + 1) & vx1
        cx = (jnp.where(chit0, (1.0 - ax_r)[..., None], 0.0)
              + jnp.where(chit1, ax_r[..., None], 0.0))
        e = jnp.where(chit1, 1.0, 0.0) - jnp.where(chit0, 1.0, 0.0)
        tmp = jnp.einsum("nxw,nws->nxs", cx, win_r,
                         preferred_element_type=jnp.float32)
        tmp2 = jnp.einsum("nxw,nws->nxs", e, win_r,
                          preferred_element_type=jnp.float32)
        vy = jnp.einsum("nxk,nxkc->nxc", f, tmp.reshape(n, -1, k, c))
        vx = jnp.einsum("nxk,nxkc->nxc", w1, tmp2.reshape(n, -1, k, c))
        d_ay = jnp.sum(g_r * vy, axis=-1).astype(dtype)
        d_ax = jnp.sum(g_r * vx, axis=-1).astype(dtype)
        return jnp.stack([d_ax, d_ay], axis=-1)              # (N, X, 2)

    ys_idx, xs_idx, to_chunks, from_chunks = _block_layout(
        n, h_pad, w_pad, chunk, cw)
    inputs = (ys_idx, xs_idx, to_chunks(r0), to_chunks(ay), to_chunks(c0),
              to_chunks(ax), to_chunks(g_p))
    _, outs = jax.lax.scan(lambda _, inp: (None, block_grads(*inp)),
                           None, inputs)
    d = from_chunks(outs, (2,))[:, :h, :w]
    # chain rule through the reference normalization quirk
    return d * jnp.asarray([sx, sy], dtype)


from functools import partial as _wpartial


@_wpartial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _resample_windowed_fused(max_dy, chunk, max_dx, col_chunk, img, flow):
    return _resample_windowed_impl(img, flow, max_dy, chunk, max_dx,
                                   col_chunk)


def _resample_windowed_fused_fwd(max_dy, chunk, max_dx, col_chunk, img, flow):
    return (_resample_windowed_impl(img, flow, max_dy, chunk, max_dx,
                                    col_chunk), (img, flow))


def _resample_windowed_fused_bwd(max_dy, chunk, max_dx, col_chunk, res, g):
    img, flow = res
    d_flow = _resample_windowed_bwd_flow(img, flow, g, max_dy, chunk,
                                         max_dx, col_chunk)
    # image gradient = the windowed-splat adjoint of the cotangent along the
    # effective displacement (same window anchoring: both ops anchor at the
    # output/source pixel's block). XLA dead-code-eliminates this whole
    # branch when the warped image is a constant — the shipped train steps.
    from sin_inn_tpu.ops.splat import _splat_windowed_impl

    n, h, w, _ = flow.shape
    ys = jnp.arange(h, dtype=img.dtype)[None, :, None]
    xs = jnp.arange(w, dtype=img.dtype)[None, None, :]
    px = (xs + flow[..., 0]) * (w / (w - 1)) - 0.5
    py = (ys + flow[..., 1]) * (h / (h - 1)) - 0.5
    eff = jnp.stack([px - xs, py - ys], axis=-1)
    d_img = _splat_windowed_impl(g, eff, max_dy, chunk, max_dx, col_chunk)
    return d_img, d_flow


_resample_windowed_fused.defvjp(_resample_windowed_fused_fwd,
                                _resample_windowed_fused_bwd)
