"""Forward (softmax) splatting — bilinear scatter-add with gradients.

TPU-native replacement for the reference's runtime-compiled CUDA kernels
(/root/reference/video-interpolation/my_utils/softsplat.py:8-177: three raw
kernels — updateOutput scatter with atomicAdd, updateGradInput, updateGradFlow
— JIT-built through CuPy at :234-236 and wrapped in an autograd Function at
:239-332).

Here the forward is a single ``jnp.zeros(...).at[...].add(...)`` scatter-add,
which XLA lowers to a deterministic sorted scatter on TPU — unlike CUDA
``atomicAdd``, summation order is reproducible run-to-run (the determinism
story SURVEY §5 asks for). Gradients come from JAX autodiff of the scatter:
the VJP of scatter-add w.r.t. values is exactly the 4-tap gather the
reference's ``updateGradInput`` kernel hand-implements, and the flow gradient
(product rule through the bilinear weights) matches ``updateGradFlow``. The
fast path is :func:`splat_windowed` below — the scatter reformulated as
windowed dense MXU matmuls with a hand-derived gather backward.

Modes reproduce ``FunctionSoftsplat`` (softsplat.py:334-359):
  summation | average | linear | softmax.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def splat_scatter(values: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Bilinear scatter-add of ``values`` along ``flow``.

    values: (N, H, W, C); flow: (N, H, W, 2) pixel displacements (dx, dy).
    Returns (N, H, W, C). Out-of-range taps are dropped (matching the CUDA
    kernel's bounds checks, softsplat.py:33-50).
    """
    n, h, w, c = values.shape
    dtype = values.dtype

    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=dtype),
                          jnp.arange(w, dtype=dtype), indexing="ij")
    ox = xs[None] + flow[..., 0]                     # (N, H, W)
    oy = ys[None] + flow[..., 1]

    x0 = jnp.floor(ox)
    y0 = jnp.floor(oy)

    out = jnp.zeros((n, h, w, c), dtype)
    batch_idx = jnp.broadcast_to(jnp.arange(n)[:, None, None], (n, h, w))

    for dx, dy in ((0, 0), (1, 0), (0, 1), (1, 1)):
        xi = x0 + dx
        yi = y0 + dy
        wgt = (1.0 - jnp.abs(ox - xi)) * (1.0 - jnp.abs(oy - yi))
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        wgt = jnp.where(valid, wgt, 0.0)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        out = out.at[batch_idx, yi_c, xi_c].add(
            values * wgt[..., None], mode="drop")
    return out


def softsplat(inp: jnp.ndarray, flow: jnp.ndarray,
              metric: Optional[jnp.ndarray], mode: str = "softmax"
              ) -> jnp.ndarray:
    """FunctionSoftsplat equivalent (softsplat.py:334-359), NHWC.

    inp: (N, H, W, C); flow: (N, H, W, 2); metric: (N, H, W, 1) or None.
    """
    if mode not in ("summation", "average", "linear", "softmax"):
        raise ValueError(mode)
    if mode == "summation":
        return splat_scatter(inp, flow)

    if mode == "average":
        ones = jnp.ones(inp.shape[:3] + (1,), inp.dtype)
        cat = jnp.concatenate([inp, ones], axis=-1)
    elif mode == "linear":
        cat = jnp.concatenate([inp * metric, metric], axis=-1)
    else:  # softmax
        e = jnp.exp(metric)
        cat = jnp.concatenate([inp * e, e], axis=-1)

    out = splat_scatter(cat, flow)
    num, den = out[..., :-1], out[..., -1:]
    # softsplat.py:352-357: normalize where the denominator is nonzero
    return jnp.where(den != 0.0, num / jnp.where(den == 0.0, 1.0, den), 0.0)


def softmax_coverage_via(splat_fn, inp: jnp.ndarray, flow: jnp.ndarray,
                         metric: jnp.ndarray):
    """Shared softmax+coverage packing over any splat backend.

    Packs [inp*exp(metric), exp(metric), ones] so the softmax numerator,
    denominator, and Wang coverage channel all ride ONE splat pass
    (softsplat.py:334-359 packing; trainer.py:51-68 needs both outputs
    along the same flow). Used by the scatter, windowed-matmul, and Pallas
    region backends — keep the den==0 guard / coverage stop_gradient
    changes HERE so the three paths cannot diverge."""
    e = jnp.exp(metric)
    ones = jnp.ones(inp.shape[:3] + (1,), inp.dtype)
    out = splat_fn(jnp.concatenate([inp * e, e, ones], axis=-1), flow)
    num = out[..., :-2]
    den = out[..., -2:-1]
    coverage = out[..., -1:]
    soft = jnp.where(den != 0.0, num / jnp.where(den == 0.0, 1.0, den), 0.0)
    return soft, jax.lax.stop_gradient(coverage)


def softsplat_with_coverage(inp: jnp.ndarray, flow: jnp.ndarray,
                            metric: jnp.ndarray):
    """Softmax splat + plain coverage map in ONE scatter.

    The flow train step needs both the softmax-splatted frame and the Wang
    range map (splat of ones) along the SAME flow (trainer.py:51-68): the
    scatter indices/weights are identical, and the scatter's index sort is
    the dominant cost on TPU — so both payloads ride one scatter-add.
    Returns (softmax_out (N,H,W,C), coverage (N,H,W,1)).
    """
    return softmax_coverage_via(splat_scatter, inp, flow, metric)


def splat_windowed(values: jnp.ndarray, flow: jnp.ndarray,
                   max_dy: int, chunk: int = 8,
                   fused_backward: bool = True,
                   max_dx: Optional[int] = None,
                   col_chunk: int = 128) -> jnp.ndarray:
    """Windowed matmul splat with a hand-derived gather backward.

    ``fused_backward=True`` (default) replaces autodiff-through-the-scan
    (which rematerializes every dense row block and differentiates the
    einsums — 105 ms at Sintel size) with the analytic adjoint: the VJP of a
    scatter w.r.t. its values is the 4-tap bilinear GATHER of the cotangent
    at the target coords, and the flow VJP is the input-weighted
    finite-difference gather — exactly the reference's two CUDA grad kernels
    (softsplat.py:55-106 updateGradInput / updateGradFlow), as pure gathers
    with the same window/bounds masking as the forward. Measured 105 -> 21 ms
    for the full backward at 3x436x1024 (see CLAUDE.md).

    ``max_dx`` additionally windows the target COLUMNS to ``|dx| <= max_dx``
    (processed ``col_chunk`` columns at a time): the dense contraction width
    drops from the full image width to 2*max_dx + col_chunk + 1. ``None``
    keeps the splat exact in x.
    """
    if fused_backward:
        return _splat_windowed_fused(max_dy, chunk, max_dx, col_chunk,
                                     values, flow)
    return _splat_windowed_impl(values, flow, max_dy, chunk, max_dx,
                                col_chunk)


def _splat_windowed_impl(values: jnp.ndarray, flow: jnp.ndarray,
                         max_dy: int, chunk: int = 8,
                         max_dx: Optional[int] = None,
                         col_chunk: int = 128) -> jnp.ndarray:
    """Dense matmul-form splat, y-windowed to ``|dy| <= max_dy`` (and
    x-windowed to ``|dx| <= max_dx`` when given, else exact in x).

    The TPU has no fast scatter (XLA's sorted scatter serializes: ~225 ms for
    a 3x436x1024 softmax splat — see CLAUDE.md), but the bilinear splat
    weight is separable: pixel (y, x) contributes v * wy(r) * wx(c), with wy
    depending only on the target row and wx only on the target column. So for
    a block of source pixels, out[r, c] += (A^T @ CX)[r*c, c'] where
    A = w1 (x) v holds the row-weighted values and CX the column one-hots —
    ONE dense MXU matmul replaces the scatter. Scanning source blocks and
    windowing the target rows (and optionally columns) bounds the matmul.

    Semantics match :func:`splat_scatter` exactly for flows with
    ``|flow_y| <= max_dy - 1`` (and ``|flow_x| <= max_dx - 1`` when
    windowed); taps beyond the window are dropped (the caller picks bounds
    >= the scene's flow bound, mirroring the reference's drop of
    out-of-frame taps). Gradients come from plain autodiff of the dense ops
    — no scatter in either pass.
    """
    n, h, w, c = values.shape
    dtype = values.dtype
    # rows are processed `chunk` at a time with one shared target window of
    # K = 2*max_dy + chunk + 1 rows — fewer scan iterations, bigger matmuls.
    # With max_dx, columns are processed `col_chunk` at a time with a shared
    # KX = 2*max_dx + col_chunk + 1 column window.
    h_pad = (h + chunk - 1) // chunk * chunk
    k = 2 * max_dy + chunk + 1
    if max_dx is None:
        cw = w
        kx = w
        w_pad = w
    else:
        cw = min(col_chunk, w)
        w_pad = (w + cw - 1) // cw * cw
        kx = 2 * max_dx + cw + 1
    xs = jnp.arange(w, dtype=dtype)

    ox = xs[None, None, :] + flow[..., 0]            # (N, H, W)
    oy = (jnp.arange(h, dtype=dtype)[None, :, None] + flow[..., 1])

    # per-pixel target decomposition
    r0 = jnp.floor(oy)
    ay = oy - r0                                     # weight of row r0+1
    c0 = jnp.floor(ox)
    ax = ox - c0
    if h_pad != h or w_pad != w:
        padder = ((0, 0), (0, h_pad - h), (0, w_pad - w))
        r0 = jnp.pad(r0, padder, constant_values=-1e9)  # w1 drops pad rows
        ay = jnp.pad(ay, padder)
        c0 = jnp.pad(c0, padder, constant_values=-1e9)  # cx drops pad cols
        ax = jnp.pad(ax, padder)
        values = jnp.pad(values, padder + ((0, 0),))

    # scan over pixel blocks; carry the padded output
    out_pad = jnp.zeros((n, h_pad + k, w_pad + (kx - cw), c), dtype)

    col_iota = jnp.arange(kx, dtype=jnp.int32)[None, None, :]
    win_iota = jnp.arange(k, dtype=jnp.int32)[None, None, :]
    x_off = 0 if max_dx is None else max_dx

    # rematerialized block (jax.checkpoint: the scan's backward would
    # otherwise stash every block's dense one-hots — GBs at Sintel scale).
    # Factorization: block[k, wout, c] = sum_x (w1[x,k] v[x,c]) cx[x,wout]
    # — build the small A = w1 (x) v (X, K*C) first, then ONE matmul with the
    # column one-hot, avoiding the (X, Wout, C) column-spread tensor.
    @jax.checkpoint
    def pixel_block(y_idx, x_idx, r0_r, ay_r, c0_r, ax_r, v_r):
        # inputs are per-block: (N, chunk*cw) pixel vectors sharing the
        # window with origin (y_idx - max_dy, x_idx - max_dx)
        # ---- W1: (N, X, K) windowed one-hot row weights ----
        j0 = jnp.where(r0_r < -1e8, -1,
                       r0_r - (y_idx - max_dy)).astype(jnp.int32)
        valid0 = (r0_r >= 0) & (r0_r <= h - 1)
        valid1 = (r0_r + 1 >= 0) & (r0_r + 1 <= h - 1)
        w1 = (jnp.where((win_iota == j0[..., None]) & valid0[..., None],
                        (1.0 - ay_r)[..., None], 0.0)
              + jnp.where((win_iota == j0[..., None] + 1) & valid1[..., None],
                          ay_r[..., None], 0.0))            # (N, X, K)
        # ---- column one-hot: (N, X, KX) (window-relative when max_dx) ----
        ci = jnp.where(c0_r < -1e8, -10 * w,
                       c0_r - (x_idx - x_off)).astype(jnp.int32)
        vx0 = (c0_r >= 0) & (c0_r <= w - 1)
        vx1 = (c0_r + 1 >= 0) & (c0_r + 1 <= w - 1)
        cx = (jnp.where((col_iota == ci[..., None]) & vx0[..., None],
                        (1.0 - ax_r)[..., None], 0.0)
              + jnp.where((col_iota == ci[..., None] + 1) & vx1[..., None],
                          ax_r[..., None], 0.0))             # (N, X, KX)
        a = w1[..., :, None] * v_r[:, :, None, :]            # (N, X, K, C)
        a = a.reshape(a.shape[0], a.shape[1], k * c)
        block = jnp.einsum("nxs,nxw->nsw", a, cx,
                           preferred_element_type=jnp.float32)
        return (block.reshape(-1, k, c, kx).transpose(0, 1, 3, 2)
                .astype(dtype))                              # (N, K, KX, C)

    def block_step(out_pad, inp):
        y_idx, x_idx, r0_r, ay_r, c0_r, ax_r, v_r = inp
        block = pixel_block(y_idx, x_idx, r0_r, ay_r, c0_r, ax_r, v_r)
        out_pad = jax.lax.dynamic_update_slice(
            out_pad,
            jax.lax.dynamic_slice(
                out_pad, (0, y_idx, x_idx, 0), (n, k, kx, c)) + block,
            (0, y_idx, x_idx, 0))
        return out_pad, None

    from sin_inn_tpu.ops.warp import _block_layout

    ys_idx, xs_idx, to_chunks, _ = _block_layout(n, h_pad, w_pad, chunk, cw)
    inputs = (ys_idx, xs_idx, to_chunks(r0), to_chunks(ay), to_chunks(c0),
              to_chunks(ax), to_chunks(values))
    out_pad, _ = jax.lax.scan(block_step, out_pad, inputs)
    return out_pad[:, max_dy:max_dy + h, x_off:x_off + w]


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _splat_windowed_fused(max_dy, chunk, max_dx, col_chunk, values, flow):
    return _splat_windowed_impl(values, flow, max_dy, chunk, max_dx,
                                col_chunk)


def _splat_windowed_fused_fwd(max_dy, chunk, max_dx, col_chunk, values, flow):
    return (_splat_windowed_impl(values, flow, max_dy, chunk, max_dx,
                                 col_chunk), (values, flow))


def _splat_windowed_fused_bwd(max_dy, chunk, max_dx, col_chunk, res, g):
    """Analytic adjoint of the windowed bilinear scatter.

    For source pixel p at (y, x) with target (ox, oy) = (x, y) + flow(p) and
    taps (r0+dy, c0+dx), the forward adds v(p) * wy * wx to each in-window
    tap, so
      d v(p)      = sum_taps wy wx g[tap]                (updateGradInput)
      d flow_x(p) = sum_ch v sum_taps wy (dwx/dax) g[tap] (updateGradFlow)
      d flow_y(p) = sum_ch v sum_taps (dwy/day) wx g[tap]
    with the same validity mask as the forward: image bounds AND the
    K = 2*max_dy + chunk + 1 target-row window anchored at the pixel's row
    chunk (AND the KX column window when ``max_dx`` is set). Four masked
    gathers of ``g`` — no scatter, no remat.
    """
    from sin_inn_tpu.ops.warp import _gather_2d

    values, flow = res
    n, h, w, c = values.shape
    dtype = values.dtype
    k = 2 * max_dy + chunk + 1

    ys = jnp.arange(h, dtype=dtype)[None, :, None]
    xs = jnp.arange(w, dtype=dtype)[None, None, :]
    ox = xs + flow[..., 0]
    oy = ys + flow[..., 1]
    r0 = jnp.floor(oy)
    ay = oy - r0
    c0 = jnp.floor(ox)
    ax = ox - c0

    # target-row window of each source row's chunk (forward anchors the
    # K-row window at chunk_start - max_dy)
    chunk_start = (jnp.arange(h, dtype=jnp.int32) // chunk * chunk)
    win_lo = (chunk_start - max_dy).astype(dtype)[None, :, None]
    win_hi = win_lo + (k - 1)
    if max_dx is not None:
        cw = min(col_chunk, w)
        kxw = 2 * max_dx + cw + 1
        col_start = (jnp.arange(w, dtype=jnp.int32) // cw * cw)
        col_lo = (col_start - max_dx).astype(dtype)[None, None, :]
        col_hi = col_lo + (kxw - 1)

    d_values = jnp.zeros_like(values)
    d_ax = jnp.zeros((n, h, w), dtype)
    d_ay = jnp.zeros((n, h, w), dtype)

    for dy, dx in ((0, 0), (1, 0), (0, 1), (1, 1)):
        ri = r0 + dy
        ci = c0 + dx
        valid = ((ri >= 0) & (ri <= h - 1) & (ci >= 0) & (ci <= w - 1)
                 & (ri >= win_lo) & (ri <= win_hi))
        if max_dx is not None:
            valid &= (ci >= col_lo) & (ci <= col_hi)
        g_tap = _gather_2d(g, jnp.clip(ci, 0, w - 1).astype(jnp.int32),
                           jnp.clip(ri, 0, h - 1).astype(jnp.int32))
        g_tap = g_tap * valid.astype(dtype)[..., None]       # (N, H, W, C)
        wy = ay if dy else (1.0 - ay)
        wx = ax if dx else (1.0 - ax)
        d_values = d_values + (wy * wx)[..., None] * g_tap
        gv = jnp.sum(g_tap * values, axis=-1)                # (N, H, W)
        d_ax = d_ax + (wy if dx else -wy) * gv
        d_ay = d_ay + (wx if dy else -wx) * gv

    d_flow = jnp.stack([d_ax, d_ay], axis=-1)
    return d_values, d_flow


_splat_windowed_fused.defvjp(_splat_windowed_fused_fwd,
                             _splat_windowed_fused_bwd)


def softsplat_windowed_with_coverage(inp: jnp.ndarray, flow: jnp.ndarray,
                                     metric: jnp.ndarray, max_dy: int,
                                     chunk: int = 16,
                                     max_dx: Optional[int] = None,
                                     col_chunk: int = 128):
    """softsplat_with_coverage on the windowed matmul splat."""
    return softmax_coverage_via(
        lambda cat, fl: splat_windowed(cat, fl, max_dy, chunk, max_dx=max_dx,
                                       col_chunk=col_chunk),
        inp, flow, metric)
