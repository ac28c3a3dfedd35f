"""Fused Pallas TPU kernel for windowed bilinear GATHERS.

One kernel serves three roles in the flow train step:

  * ``resample2d`` forward — the backward warp
    (/root/reference/video-interpolation/my_utils/resample2d_package/
    resample2d.py:52-72) used for the occlusion warp metric;
  * its analytic flow-gradient (the reference's ``Resample2d`` backward
    CUDA kernel) via derivative one-hots in the same window pass;
  * the softmax-splat BACKWARD — the reference's ``updateGradInput`` /
    ``updateGradFlow`` kernels (softsplat.py:139-177) are, as pure
    functions, bilinear gathers of the output cotangent along the same
    flow, so they are this kernel with (A = cotangent, payload = values).

The XLA windowed-matmul resample (ops/warp.py ``resample2d_windowed``)
already recast the serializing 4-tap gather as dense contractions but
pays 1.25-1.33x lane padding (KXW 385->512, K*C 411->512) and round-trips
its one-hots through HBM (CLAUDE.md round-2 measurements: 26-46 TFLOP/s).
This kernel removes both:

  1. The grid runs over OUTPUT tiles of B x CB = 128 x 128 pixels; each
     step DMAs the (SH, SW) = (B + 2dy, CB + 2dx) channel-planar source
     window into VMEM once (SW is a lane multiple by construction).
  2. Output rows are processed RC = 8 at a time. Unlike the splat
     (ops/pallas/splat.py), a gather chunk only reads the
     KR = 2dy + RC source rows reachable from its RC rows — the
     contraction is (C*KR, SW) @ (SW, RC*128), every dim tile-aligned,
     FLOP-count equal to the XLA windowed form with zero padding waste.
  3. One-hots are hat functions relu(1 - |p - k|) built from a VPU iota
     compare in VMEM (both bilinear taps in one expression, no floor);
     the derivative one-hots -sign(p - k) on |p - k| < 1 ride the same
     compare, so the flow gradient costs exactly one extra matmul.

Out-of-image taps are handled by the zero padding of the source window
(a zero tap contributes zero to both value and gradient — equivalent to
the per-tap validity masks of the XLA form). Taps beyond the window are
unreachable by construction: the windowed-drop contract of
``resample2d_windowed`` / ``splat_windowed``, i.e. exact agreement with
the unwindowed ops for |py - y| <= max_dy - 1 and |px - x| <= max_dx - 1.

Coordinate transform: the reference resample2d normalizes by (size-1)
but samples align_corners=False, so the sampled point is
p = (x + flow) * size/(size-1) - 0.5; the kernel takes (scale, shift)
statics so the splat backward can run the same kernel with raw
coordinates (scale=1, shift=0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # Pallas is TPU/Mosaic-only; CPU tests run in interpret mode
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

_B = 128     # output-tile rows
_CB = 128    # output-tile cols (lane dim)
_RC = 8      # output rows per chunk (matmul N = RC*128 = 1024)


def _hat(d):
    return jnp.maximum(1.0 - jnp.abs(d), 0.0)


def _dhat(d):
    # d/dp relu(1 - |p - k|) = -sign(p - k) on |p - k| < 1 (the one-hot
    # difference hit1 - hit0 of the 4-tap form, warp.py:380,389)
    return jnp.where(jnp.abs(d) < 1.0,
                     jnp.where(d > 0.0, -1.0, jnp.where(d < 0.0, 1.0, 0.0)),
                     0.0)


def _gather_kernel(*refs, B, CB, SH, SW, KR, RC, dy, dx, C,
                   sx, sy, shx, shy, grads, capy=0, capx=0, local=False):
    if local and grads:
        off_ref, a_ref, fl_ref, p_ref, out_ref, a_s, sem = refs
    elif local:
        off_ref, a_ref, fl_ref, out_ref, a_s, sem = refs
        p_ref = None
    elif grads:
        a_ref, fl_ref, p_ref, out_ref, a_s, sem = refs
    else:
        a_ref, fl_ref, out_ref, a_s, sem = refs
        p_ref = None
    n = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    if local:
        # scalar-prefetched per-SOURCE-tile offsets (rows multiples of 8,
        # cols multiples of 128 — see splat.py): the window of taps
        # p = s + flow(s) recenters on the tile's mean flow, so dy/dx
        # bound only the deviation |flow - off| (ox = 0 when capx == 0,
        # the shipped row-only mode)
        oy = off_ref[n, i, j, 1].astype(jnp.int32)
        r0 = pl.multiple_of(i * B + capy + oy, 8)
        ox = off_ref[n, i, j, 0].astype(jnp.int32)
        c0 = pl.multiple_of(j * CB + capx + ox, 128)
    else:
        oy = 0
        r0 = i * B
        ox = 0
        c0 = j * CB + capx

    # ---- DMA the channel-planar source window into VMEM ----
    # padded window start: (i*B + capy + oy, j*CB + capx + ox), pad
    # (dy + capy, dx + capx); the static path has capy = capx = 0
    cp = pltpu.make_async_copy(
        a_ref.at[n, :, pl.ds(r0, SH), pl.ds(c0, SW)], a_s, sem)
    cp.start()
    cp.wait()

    # absolute coords of window cols / the tile's output cols
    scol = ((jax.lax.broadcasted_iota(jnp.int32, (SW, 1), 0)
             + (j * CB - dx)) + ox).astype(jnp.float32)      # (SW, 1)
    xs0 = (jax.lax.broadcasted_iota(jnp.int32, (1, CB), 1)
           + j * CB).astype(jnp.float32)                     # (1, CB)
    srow0 = jax.lax.broadcasted_iota(jnp.int32, (KR, 1), 0)  # (KR, 1)

    def chunk(ck, _):
        pxs = []
        pys = []
        for r in range(RC):
            row = ck * RC + r
            fx = fl_ref[0, 0, pl.ds(row, 1), :]              # (1, CB)
            fy = fl_ref[0, 1, pl.ds(row, 1), :]
            y_abs = (i * B + row).astype(jnp.float32)
            pxs.append((xs0 + fx) * sx + shx)
            pys.append((y_abs + fy) * sy + shy)
        px = jnp.concatenate(pxs, axis=1)                    # (1, RC*CB)
        py = jnp.concatenate(pys, axis=1)

        # window row coords of this chunk: abs row i*B - dy + oy + ck*RC + s
        srow = (srow0 + (ck * RC - dy + oy)).astype(jnp.float32) + i * B
        cxT = _hat(px - scol)                                # (SW, RC*CB)
        wy = _hat(py - srow)                                 # (KR, RC*CB)
        win = jnp.concatenate(
            [a_s[c, pl.ds(ck * RC, KR), :] for c in range(C)],
            axis=0)                                          # (C*KR, SW)
        t = jax.lax.dot_general(
            win, cxT, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (C*KR, RC*CB)
        if grads:
            dcxT = _dhat(px - scol)
            dwy = _dhat(py - srow)
            t2 = jax.lax.dot_general(
                win, dcxT, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dfx = jnp.zeros((RC, CB), jnp.float32)
            dfy = jnp.zeros((RC, CB), jnp.float32)
        for c in range(C):
            tc = t[c * KR:(c + 1) * KR, :]
            oc = jnp.sum(wy * tc, axis=0, keepdims=True)     # (1, RC*CB)
            out_ref[0, 0, pl.ds(c * B + ck * RC, RC), :] = (
                oc.reshape(RC, CB).astype(out_ref.dtype))
            if grads:
                s1 = jnp.sum(wy * t2[c * KR:(c + 1) * KR, :], axis=0,
                             keepdims=True).reshape(RC, CB)
                s2 = jnp.sum(dwy * tc, axis=0,
                             keepdims=True).reshape(RC, CB)
                pc = p_ref[0, c, pl.ds(ck * RC, RC), :]      # (RC, CB)
                dfx = dfx + pc * s1
                dfy = dfy + pc * s2
        if grads:
            out_ref[0, 0, pl.ds(C * B + ck * RC, RC), :] = (
                dfx.astype(out_ref.dtype))
            out_ref[0, 0, pl.ds((C + 1) * B + ck * RC, RC), :] = (
                dfy.astype(out_ref.dtype))
        return 0

    jax.lax.fori_loop(0, B // RC, chunk, 0)


def _pad_geometry(h, w, max_dy, max_dx):
    """Window geometry shared by wrapper call sites. dy is rounded so
    KR = 2dy + RC is sublane-aligned, dx so SW is a lane multiple —
    padding only widens the window (a superset of the requested bound)."""
    B, CB, RC = _B, _CB, _RC
    dy = -(-max_dy // 4) * 4
    dx = -(-max_dx // 64) * 64
    hb = -(-h // B)
    wb = -(-w // CB)
    sh = B + 2 * dy
    sw = CB + 2 * dx
    kr = 2 * dy + RC
    return B, CB, RC, dy, dx, hb, wb, sh, sw, kr


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
def _gather_region_call(a, flow, payload, max_dy, max_dx,
                        coord, grads: bool, interpret: bool = False):
    """Run the windowed gather kernel.

    a: (N, H, W, C) source image; flow: (N, H, W, 2) (dx, dy) at OUTPUT
    resolution; payload: (N, H, W, C) per-pixel multiplier for the flow
    grads (required iff grads). coord: ((sx, shx), (sy, shy)) static
    coordinate transform p = (x + flow) * s + sh.
    Returns out (N, H, W, C) [, dfx (N, H, W), dfy (N, H, W)] where
    dfx/dfy are d<payload, out>/d(px, py) (pre-chain-rule).
    """
    n, h, w, c = a.shape
    (sxc, shxc), (syc, shyc) = coord
    B, CB, RC, dy, dx, hb, wb, sh, sw, kr = _pad_geometry(h, w, max_dy,
                                                          max_dx)
    dtype = a.dtype

    top = dy
    bot = (hb - 1) * B + sh - (h + top)
    left = dx
    right = (wb - 1) * CB + sw - (w + left)
    a_pad = jnp.pad(a.astype(jnp.float32).transpose(0, 3, 1, 2),
                    ((0, 0), (0, 0), (top, bot), (left, right)))
    tile_pad = ((0, 0), (0, 0), (0, hb * B - h), (0, wb * CB - w))
    fl_pad = jnp.pad(flow.astype(jnp.float32).transpose(0, 3, 1, 2),
                     tile_pad)

    oc = c + (2 if grads else 0)
    fl_spec = pl.BlockSpec((1, 2, B, CB), lambda n_, i, j: (n_, 0, i, j),
                           memory_space=pltpu.VMEM)
    args = [a_pad, fl_pad]
    in_specs = [pl.BlockSpec(memory_space=pltpu.HBM), fl_spec]
    if grads:
        p_pad = jnp.pad(payload.astype(jnp.float32).transpose(0, 3, 1, 2),
                        tile_pad)
        args.append(p_pad)
        in_specs.append(pl.BlockSpec((1, c, B, CB),
                                     lambda n_, i, j: (n_, 0, i, j),
                                     memory_space=pltpu.VMEM))

    kern = functools.partial(_gather_kernel, B=B, CB=CB, SH=sh, SW=sw,
                             KR=kr, RC=RC, dy=dy, dx=dx, C=c,
                             sx=float(sxc), sy=float(syc), shx=float(shxc),
                             shy=float(shyc), grads=grads)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, hb, oc * B, wb * CB),
                                       jnp.float32),
        grid=(n, hb, wb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, oc * B, CB),
                               lambda n_, i, j: (n_, i, 0, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((c, sh, sw), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(*args)

    # (N, HB, OC, B, WB*CB) -> (N, HB*B, WB*CB, OC) -> crop
    out = out.reshape(n, hb, oc, B, wb * CB).transpose(0, 1, 3, 4, 2)
    out = out.reshape(n, hb * B, wb * CB, oc)[:, :h, :w].astype(dtype)
    if not grads:
        return out
    return out[..., :c], out[..., c], out[..., c + 1]


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7, 8, 9, 10))
def _gather_region_call_local(a, flow, payload, off_src, loc_dy: int,
                              loc_dx: int, cap_y: int, cap_x: int,
                              coord, grads: bool, interpret: bool = False):
    """LOCAL-window variant of :func:`_gather_region_call`: each SOURCE
    tile's tap window recenters VERTICALLY on the tile's mean flow
    (``off_src`` from ``ops.pallas.offsets.tile_flow_offsets``,
    scalar-prefetched row offsets in multiples of 8), so ``loc_dy`` bounds
    the deviation |flow_y - off_y| instead of |flow_y|. The contraction
    FLOPs scale with KR = 2*loc_dy + RC — 136 -> 80 rows at Sintel
    defaults (loc_dy 64 -> 32). With ``cap_x`` > 0 the window also
    recenters HORIZONTALLY on the 128-quantized mean (the lane-tiling DMA
    quantization costs up to 64 px of x budget — engaged by the GT probe
    only for fast scenes; cap_x = 0 keeps x on the static global bound
    ``loc_dx``). The caps bound |off| and size the padding (reach extends
    to cap + loc - 1 per axis).

    Note the resample coordinate quirk ((size-1)-normalized,
    align_corners=False) shifts taps by up to ~1.5 px relative to the raw
    flow the offsets are computed from — callers keep a >=3 px margin
    inside the local bounds (the train-loop monitor warns at loc - 3).
    """
    assert cap_y % 8 == 0, "cap_y must be a multiple of the sublane tiling"
    assert cap_x % 128 == 0, "cap_x must be a multiple of the lane tiling"
    n, h, w, c = a.shape
    (sxc, shxc), (syc, shyc) = coord
    B, CB, RC, dy, dx, hb, wb, sh, sw, kr = _pad_geometry(h, w, loc_dy,
                                                          loc_dx)
    dtype = a.dtype
    off_i = off_src.astype(jnp.int32)

    top = dy + cap_y
    bot = (hb - 1) * B + 2 * cap_y + sh - (h + top)
    left = dx + cap_x
    right = (wb - 1) * CB + 2 * cap_x + sw - (w + left)
    a_pad = jnp.pad(a.astype(jnp.float32).transpose(0, 3, 1, 2),
                    ((0, 0), (0, 0), (top, bot), (left, right)))
    tile_pad = ((0, 0), (0, 0), (0, hb * B - h), (0, wb * CB - w))
    fl_pad = jnp.pad(flow.astype(jnp.float32).transpose(0, 3, 1, 2),
                     tile_pad)

    oc = c + (2 if grads else 0)
    fl_spec = pl.BlockSpec((1, 2, B, CB),
                           lambda n_, i, j, off: (n_, 0, i, j),
                           memory_space=pltpu.VMEM)
    args = [a_pad, fl_pad]
    in_specs = [pl.BlockSpec(memory_space=pltpu.HBM), fl_spec]
    if grads:
        p_pad = jnp.pad(payload.astype(jnp.float32).transpose(0, 3, 1, 2),
                        tile_pad)
        args.append(p_pad)
        in_specs.append(pl.BlockSpec((1, c, B, CB),
                                     lambda n_, i, j, off: (n_, 0, i, j),
                                     memory_space=pltpu.VMEM))

    kern = functools.partial(_gather_kernel, B=B, CB=CB, SH=sh, SW=sw,
                             KR=kr, RC=RC, dy=dy, dx=dx, C=c,
                             sx=float(sxc), sy=float(syc), shx=float(shxc),
                             shy=float(shyc), grads=grads,
                             capy=cap_y, capx=cap_x, local=True)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, hb, wb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, oc * B, CB),
                               lambda n_, i, j, off: (n_, i, 0, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((c, sh, sw), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ])
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, hb, oc * B, wb * CB),
                                       jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(off_i, *args)

    out = out.reshape(n, hb, oc, B, wb * CB).transpose(0, 1, 3, 4, 2)
    out = out.reshape(n, hb * B, wb * CB, oc)[:, :h, :w].astype(dtype)
    if not grads:
        return out
    return out[..., :c], out[..., c], out[..., c + 1]


def pallas_gather_available() -> bool:
    if not _HAS_PALLAS:
        return False
    return jax.default_backend() not in ("cpu",)


_RAW = ((1.0, 0.0), (1.0, 0.0))


def _resample_coord(h, w):
    # resample2d.py:52-72 quirk: (size-1)-normalized, align_corners=False
    return ((w / (w - 1), -0.5), (h / (h - 1), -0.5))


# ---------------------------------------------------------------------------
# resample2d on the gather kernel (fused analytic backward)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def resample2d_region(max_dy: int, max_dx: int, interpret: bool,
                      img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """``ops.warp.resample2d`` on the fused Pallas gather kernel.

    Exact match (same contract as ``resample2d_windowed``) for samples
    within the window bounds; backward = one grads-mode kernel call for
    the flow gradient + the Pallas region splat as the image-gradient
    adjoint (dead-code-eliminated when the image is a constant, as in
    the shipped flow train step).
    """
    h, w = img.shape[1:3]
    return _gather_region_call(img, flow, None, max_dy, max_dx,
                               _resample_coord(h, w), False, interpret)


def _resample_region_fwd(max_dy, max_dx, interpret, img, flow):
    return (resample2d_region(max_dy, max_dx, interpret, img, flow),
            (img, flow))


def _resample_region_bwd(max_dy, max_dx, interpret, res, g):
    from sin_inn_tpu.ops.pallas.splat import _splat_region_call

    img, flow = res
    n, h, w, _ = flow.shape
    sx = w / (w - 1)
    sy = h / (h - 1)
    _, dpx, dpy = _gather_region_call(img, flow, g, max_dy, max_dx,
                                      _resample_coord(h, w), True,
                                      interpret)
    d_flow = jnp.stack([dpx * sx, dpy * sy], axis=-1).astype(flow.dtype)
    # image gradient = splat adjoint of the cotangent along the effective
    # displacement (warp.py:425-442); DCE'd when img is a constant.
    # Coordinates are built in f32 regardless of flow.dtype: a bf16 arange
    # cannot represent integers > 256 (multi-pixel placement error).
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    px = (xs + flow[..., 0].astype(jnp.float32)) * sx - 0.5
    py = (ys + flow[..., 1].astype(jnp.float32)) * sy - 0.5
    eff = jnp.stack([px - xs, py - ys], axis=-1)
    d_img = _splat_region_call(g, eff, max_dy, max_dx, interpret)
    return d_img, d_flow


resample2d_region.defvjp(_resample_region_fwd, _resample_region_bwd)


# ---------------------------------------------------------------------------
# resample2d on the LOCAL-window gather kernel
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def resample2d_region_local(loc_dy: int, loc_dx: int, cap_y: int,
                            cap_x: int, interpret: bool, img: jnp.ndarray,
                            flow: jnp.ndarray,
                            off_src: jnp.ndarray) -> jnp.ndarray:
    """:func:`resample2d_region` with flow-centered windows (``off_src``
    from ``ops.pallas.offsets.tile_flow_offsets(flow, ...)``)."""
    h, w = img.shape[1:3]
    return _gather_region_call_local(img, flow, None, off_src, loc_dy,
                                     loc_dx, cap_y, cap_x,
                                     _resample_coord(h, w), False, interpret)


def _resample_region_local_fwd(loc_dy, loc_dx, cap_y, cap_x, interpret,
                               img, flow, off_src):
    return (resample2d_region_local(loc_dy, loc_dx, cap_y, cap_x, interpret,
                                    img, flow, off_src),
            (img, flow, off_src))


def _resample_region_local_bwd(loc_dy, loc_dx, cap_y, cap_x, interpret,
                               res, g):
    from sin_inn_tpu.ops.pallas.offsets import tile_flow_offsets
    from sin_inn_tpu.ops.pallas.splat import _splat_region_call_local

    img, flow, off_src = res
    n, h, w, _ = flow.shape
    sx = w / (w - 1)
    sy = h / (h - 1)
    _, dpx, dpy = _gather_region_call_local(img, flow, g, off_src, loc_dy,
                                            loc_dx, cap_y, cap_x,
                                            _resample_coord(h, w), True,
                                            interpret)
    d_flow = jnp.stack([dpx * sx, dpy * sy], axis=-1).astype(flow.dtype)
    # image gradient = splat adjoint along the effective displacement.
    # eff differs from flow by <= ~1.5 px (the resample normalization), so
    # it gets its OWN output-tile offsets; the whole branch (including the
    # offsets einsums) DCEs when img is a constant, as in the shipped
    # train steps.
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    px = (xs + flow[..., 0].astype(jnp.float32)) * sx - 0.5
    py = (ys + flow[..., 1].astype(jnp.float32)) * sy - 0.5
    eff = jnp.stack([px - xs, py - ys], axis=-1)
    eff_off = tile_flow_offsets(eff, _B, _CB, cap_y, cap_x)
    d_img = _splat_region_call_local(g, eff, eff_off.off_out, loc_dy,
                                     loc_dx, cap_y, cap_x, interpret)
    return d_img, d_flow, jnp.zeros_like(off_src)


resample2d_region_local.defvjp(_resample_region_local_fwd,
                               _resample_region_local_bwd)
