"""Fused Pallas TPU kernel for the forward (softmax) splat.

TPU-native replacement for the reference's ``updateOutput`` CUDA scatter
kernel (/root/reference/video-interpolation/my_utils/softsplat.py:108-135).
The XLA windowed-matmul splat (ops/splat.py ``splat_windowed``) already
replaces the scatter with dense MXU contractions, but measures only
~50 TFLOP/s: its (X, K*C) a-buffer and one-hots round-trip HBM, and the
K*C=435->512 lane padding wastes MXU cycles (CLAUDE.md round-2
measurements; the round-2 verdict asked for exactly this kernel).

**Region-scatter decomposition.** The grid runs over OUTPUT tiles of
B x CB = 128 x 128 pixels. Every source pixel's taps land in exactly one
output tile (tiles partition the image), so each grid step computes its
tile completely — no scatter, no carry, no cross-step accumulation:

  1. DMA the (SH, SW) = (B + 2*max_dy, CB + 2*max_dx) source window of
     ``values`` and ``flow`` (channel-planar layout) into VMEM — for
     |flow| <= bound - 1 every contributing pixel lies in this window;
  2. per window row, build transposed one-hot weights in VMEM — row
     weights w1T (128, SW) and column weights cxT (128, SW), a VPU iota
     compare, never touching HBM — and the channel-slab operand
     vw1T = concat_c(w1T * v_c) of shape (C*128, SW);
  3. accumulate acc += vw1T @ cxT^T on the MXU into a (C*128, 128) VMEM
     accumulator. With B = CB = 128 every slab is exactly one lane tile:
     zero padding waste, and the channel concat is 128-aligned (the
     misaligned-concat Mosaic blocker recorded in coupling3x3.py never
     arises).

FLOPs drop too: SH*SW per source pixel-channel vs the row-windowed XLA
form's (2dy+chunk)*W — 1.35x fewer at Sintel 436x1024 (dy=64, dx=128).

Semantics: matches ``splat_scatter`` exactly for |flow_y| <= max_dy - 1
and |flow_x| <= max_dx - 1; farther taps are dropped (the windowed-drop
contract of ``splat_windowed``, monitored loudly by the train loop).
The backward is the hand-derived 4-tap gather adjoint
(ops/splat.py:272-336) with this kernel's tile-anchored window masks.
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

_B = 128     # output-tile rows (== one lane tile per channel slab)
_CB = 128    # output-tile cols (accumulator lane dim)


def _region_kernel(*refs, H, W, B, CB, SH, SW, RC, dy, dx, C,
                   capy=0, capx=0, local=False):
    if local:
        # scalar-prefetched per-tile window offsets: the source window
        # recenters on the tile's mean flow, so dy/dx are LOCAL deviation
        # half-widths instead of global flow bounds. Offsets must be
        # Mosaic-provable DMA starts (hence pl.multiple_of): rows quantize
        # to 8 (sublane tiling, <= 4 px of budget), columns to 128 (LANE
        # tiling, <= 64 px of budget — so x offsets only pay for fast
        # scenes with global dx >= 192 and are 0 whenever capx == 0, the
        # shipped row-only mode).
        off_ref, v_ref, fl_ref, out_ref, v_s, fl_s, acc_s, sem = refs
    else:
        v_ref, fl_ref, out_ref, v_s, fl_s, acc_s, sem = refs
    n = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    if local:
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
    # padded window start: (i*B + capy + oy, j*CB + capx + ox), i.e.
    # absolute (i*B - dy + oy, j*CB - dx + ox); static path has
    # capy = capx = oy = ox = 0
    cp_v = pltpu.make_async_copy(
        v_ref.at[n, :, pl.ds(r0, SH), pl.ds(c0, SW)], v_s, sem.at[0])
    cp_f = pltpu.make_async_copy(
        fl_ref.at[n, :, pl.ds(r0, SH), pl.ds(c0, SW)], fl_s,
        sem.at[1])
    cp_v.start()
    cp_f.start()
    cp_v.wait()
    cp_f.wait()

    acc_s[:] = jnp.zeros_like(acc_s)

    # absolute output row/col per one-hot lane, + static image-bound masks:
    # the bilinear weight of lane k for a pixel targeting o is the hat
    # function relu(1 - |o - k|) — it produces BOTH taps ((1-a) at floor(o),
    # a at floor(o)+1) in one expression, no floor/compares needed.
    sub = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
    krow = (sub + i * B).astype(jnp.float32)                 # (128, 1)
    kcol = (sub + j * CB).astype(jnp.float32)
    row_ok = jnp.where(krow <= H - 1.0, 1.0, 0.0)
    col_ok = jnp.where(kcol <= W - 1.0, 1.0, 0.0)
    xs0 = jax.lax.broadcasted_iota(jnp.int32, (1, SW), 1)

    def chunk(ck, _):
        rows_v = []
        rows_c = []
        for r in range(RC):
            row = ck * RC + r
            fy = fl_s[1, pl.ds(row, 1), :]                   # (1, SW)
            fx = fl_s[0, pl.ds(row, 1), :]
            y_abs = (i * B - dy + row + oy).astype(jnp.float32)
            ty = y_abs + fy
            tx = (xs0 + j * CB - dx + ox).astype(jnp.float32) + fx
            w1 = jnp.maximum(1.0 - jnp.abs(ty - krow), 0.0) * row_ok
            cx = jnp.maximum(1.0 - jnp.abs(tx - kcol), 0.0) * col_ok
            vw1 = jnp.concatenate(
                [w1 * v_s[c, pl.ds(row, 1), :] for c in range(C)],
                axis=0)                                      # (C*128, SW)
            rows_v.append(vw1)
            rows_c.append(cx)
        big_v = jnp.concatenate(rows_v, axis=1)              # (C*128, RC*SW)
        big_c = jnp.concatenate(rows_c, axis=1)              # (128, RC*SW)
        acc_s[:] += jax.lax.dot_general(
            big_v, big_c, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # (C*128, 128)
        return 0

    jax.lax.fori_loop(0, SH // RC, chunk, 0)
    out_ref[0, 0] = acc_s[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _splat_region_call(values: jnp.ndarray, flow: jnp.ndarray,
                       max_dy: int, max_dx: int,
                       interpret: bool = False) -> jnp.ndarray:
    """Run the region-scatter kernel. values: (N, H, W, C) f32;
    flow: (N, H, W, 2) pixel displacements (dx, dy). Returns (N, H, W, C).
    """
    n, h, w, c = values.shape
    out_dtype = values.dtype
    # the VMEM scratch windows are f32; DMA requires matching dtypes (the
    # sibling gather kernel casts likewise) — cast any bf16 operands here
    values = values.astype(jnp.float32)
    flow = flow.astype(jnp.float32)
    B, CB = _B, _CB
    hb = -(-h // B)
    wb = -(-w // CB)
    RC = 4
    # |fy| <= dy-1 puts every tap's source row within [tile - dy,
    # tile + B - 1 + dy]: SH = B + 2*dy exactly (8-aligned for dy % 4 == 0,
    # else padded up with inert zero rows); columns likewise, padded to a
    # lane multiple for the aligned row concat.
    sh = -(-(B + 2 * max_dy) // 8) * 8
    sw = -(-(CB + 2 * max_dx) // 128) * 128

    # pad so every tile's window is an in-bounds slice; zero padding is
    # inert (contributions are v-weighted and pad v = 0)
    top = max_dy
    bot = (hb - 1) * B + sh - (h + top)
    left = max_dx
    right = (wb - 1) * CB + sw - (w + left)
    # channel-planar layout so scratch windows tile (rows, cols) cleanly
    v_pad = jnp.pad(values.transpose(0, 3, 1, 2),
                    ((0, 0), (0, 0), (top, bot), (left, right)))
    f_pad = jnp.pad(flow.transpose(0, 3, 1, 2),
                    ((0, 0), (0, 0), (top, bot), (left, right)))

    kern = functools.partial(_region_kernel, H=h, W=w, B=B, CB=CB, SH=sh,
                             SW=sw, RC=RC, dy=max_dy, dx=max_dx, C=c)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, hb, c * B, wb * CB),
                                       values.dtype),
        grid=(n, hb, wb),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, 1, c * B, CB),
                               lambda n_, i, j: (n_, i, 0, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((c, sh, sw), jnp.float32),
            pltpu.VMEM((2, sh, sw), jnp.float32),
            pltpu.VMEM((c * B, CB), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(v_pad, f_pad)

    # (N, HB, C, B, WB*CB) -> (N, HB*B, WB*CB, C) -> crop
    out = out.reshape(n, hb, c, B, wb * CB).transpose(0, 1, 3, 4, 2)
    return out.reshape(n, hb * B, wb * CB, c)[:, :h, :w].astype(out_dtype)


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
def _splat_region_call_local(values: jnp.ndarray, flow: jnp.ndarray,
                             off_out: jnp.ndarray, loc_dy: int, loc_dx: int,
                             cap_y: int, cap_x: int,
                             interpret: bool = False) -> jnp.ndarray:
    """LOCAL-window region splat: same contraction as
    :func:`_splat_region_call`, but every output tile's source window is
    recentered VERTICALLY on its contributors' mean flow via
    scalar-prefetched per-tile row offsets
    (``ops.pallas.offsets.tile_flow_offsets``), so ``loc_dy`` bounds only
    the DEVIATION |flow_y - off_y| instead of |flow_y| — SH shrinks from
    B + 2*global_dy to B + 2*loc_dy (256 -> 192 at Sintel defaults, and
    the backward's gather windows shrink 136 -> 80 rows). ``cap_y`` bounds
    |off_y| (it sizes the padding; the resolved global bound, so the
    y-reach EXTENDS to cap_y + loc_dy - 1, beyond the static kernel's).
    Offsets are multiples of the tilings Mosaic can prove for dynamic DMA
    starts: rows 8 (sublane), columns 128 (lane). With ``cap_x`` = 0 (the
    default) x offsets are disabled and ``loc_dx`` is the static global
    bound; with ``cap_x`` > 0 the window also recenters HORIZONTALLY on
    the 128-quantized mean (up to 64 px of quantization eats the x
    budget, so the GT probe only engages x-local when the global dx is
    large enough that the shrunken window still wins — fast-pan scenes).

    Drop contract: a tap is produced iff its source pixel lies in the
    target tile's shifted window — guaranteed when
    |flow_y - off_y(target tile)| <= loc_dy - 1 and
    |flow_x - off_x(target tile)| <= loc_dx - 1 (off_x = 0 when x-local
    is off).
    """
    assert cap_y % 8 == 0, "cap_y must be a multiple of the sublane tiling"
    assert cap_x % 128 == 0, "cap_x must be a multiple of the lane tiling"
    n, h, w, c = values.shape
    out_dtype = values.dtype
    values = values.astype(jnp.float32)
    flow = flow.astype(jnp.float32)
    # the kernel shifts the window BY +off; the splat's contributors sit at
    # s = o - f, i.e. AGAINST their mean flow — so negate here (the gather
    # reads taps at p = s + f and passes its offsets through unnegated)
    off_i = (-off_out).astype(jnp.int32)
    B, CB = _B, _CB
    hb = -(-h // B)
    wb = -(-w // CB)
    RC = 4
    sh = -(-(B + 2 * loc_dy) // 8) * 8
    sw = -(-(CB + 2 * loc_dx) // 128) * 128

    # padding covers the farthest shifted window: start ranges over
    # [i*B, i*B + 2*cap] in padded coords (kernel start = i*B + cap + off)
    top = loc_dy + cap_y
    bot = (hb - 1) * B + 2 * cap_y + sh - (h + top)
    left = loc_dx + cap_x
    right = (wb - 1) * CB + 2 * cap_x + sw - (w + left)
    v_pad = jnp.pad(values.transpose(0, 3, 1, 2),
                    ((0, 0), (0, 0), (top, bot), (left, right)))
    f_pad = jnp.pad(flow.transpose(0, 3, 1, 2),
                    ((0, 0), (0, 0), (top, bot), (left, right)))

    kern = functools.partial(_region_kernel, H=h, W=w, B=B, CB=CB, SH=sh,
                             SW=sw, RC=RC, dy=loc_dy, dx=loc_dx, C=c,
                             capy=cap_y, capx=cap_x, local=True)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, hb, wb),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, 1, c * B, CB),
                               lambda n_, i, j, off: (n_, i, 0, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((c, sh, sw), jnp.float32),
            pltpu.VMEM((2, sh, sw), jnp.float32),
            pltpu.VMEM((c * B, CB), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ])
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, hb, c * B, wb * CB),
                                       values.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(off_i, v_pad, f_pad)

    out = out.reshape(n, hb, c, B, wb * CB).transpose(0, 1, 3, 4, 2)
    return out.reshape(n, hb * B, wb * CB, c)[:, :h, :w].astype(out_dtype)


def pallas_splat_available() -> bool:
    if not _HAS_PALLAS:
        return False
    return jax.default_backend() not in ("cpu",)


# ---------------------------------------------------------------------------
# Differentiable wrapper: Pallas forward + the 4-tap gather adjoint backward
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def splat_region(max_dy: int, max_dx: int, interpret: bool,
                 values: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    return _splat_region_call(values, flow, max_dy, max_dx, interpret)


def _splat_region_fwd(max_dy, max_dx, interpret, values, flow):
    return (_splat_region_call(values, flow, max_dy, max_dx, interpret),
            (values, flow))


def _splat_region_bwd(max_dy, max_dx, interpret, res, g):
    """Gather adjoint on the fused Pallas gather kernel: the reference's
    updateGradInput/updateGradFlow CUDA kernels (softsplat.py:139-177) are,
    as pure functions, bilinear gathers of the output cotangent along the
    same flow — so d_values is the gather kernel's forward (A = g) and the
    flow grads are its derivative-one-hot pass with payload = values,
    both in one grads-mode call (raw coordinates, no resample quirk).

    Window anchoring: the gather masks taps by the SOURCE pixel's tile
    window, the forward by the TAP's tile window — identical whenever
    |flow| respects the bound (the windowed-drop contract); only
    out-of-contract taps may differ, mirroring ops/splat.py:272-336."""
    from sin_inn_tpu.ops.pallas.gather import _gather_region_call, _RAW

    values, flow = res
    d_values, d_ax, d_ay = _gather_region_call(
        g, flow, values, max_dy, max_dx, _RAW, True, interpret)
    # the gather kernel's outputs carry g.dtype (== values.dtype); the flow
    # cotangent must match flow.dtype, which can differ under mixed bf16
    return (d_values.astype(values.dtype),
            jnp.stack([d_ax, d_ay], axis=-1).astype(flow.dtype))


splat_region.defvjp(_splat_region_fwd, _splat_region_bwd)


def softsplat_region_with_coverage(inp: jnp.ndarray, flow: jnp.ndarray,
                                   metric: jnp.ndarray, max_dy: int,
                                   max_dx: int, interpret: bool = False):
    """softsplat_with_coverage on the Pallas region kernel (softmax mode:
    softsplat.py:334-359 packing, shared coverage channel)."""
    from sin_inn_tpu.ops.splat import softmax_coverage_via

    return softmax_coverage_via(
        lambda cat, fl: splat_region(max_dy, max_dx, interpret, cat, fl),
        inp, flow, metric)


# ---------------------------------------------------------------------------
# Local-window variant: per-tile mean-flow offsets, deviation-sized windows
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def splat_region_local(loc_dy: int, loc_dx: int, cap_y: int, cap_x: int,
                       interpret: bool, values: jnp.ndarray,
                       flow: jnp.ndarray, off_out: jnp.ndarray,
                       off_src: jnp.ndarray) -> jnp.ndarray:
    """:func:`splat_region` with flow-centered windows.

    ``off_out``/``off_src`` come from
    ``ops.pallas.offsets.tile_flow_offsets(flow, ...)`` — the forward
    shifts each OUTPUT tile's window by the contributors' mean flow, the
    backward (gather adjoint) shifts each SOURCE tile's window by the
    tile's own mean flow. Offsets are f32 integer-valued arrays; their
    cotangents are zero (coverage parameters, not differentiable inputs).
    """
    return _splat_region_call_local(values, flow, off_out, loc_dy, loc_dx,
                                    cap_y, cap_x, interpret)


def _splat_region_local_fwd(loc_dy, loc_dx, cap_y, cap_x, interpret,
                            values, flow, off_out, off_src):
    out = _splat_region_call_local(values, flow, off_out, loc_dy, loc_dx,
                                   cap_y, cap_x, interpret)
    return out, (values, flow, off_src)


def _splat_region_local_bwd(loc_dy, loc_dx, cap_y, cap_x, interpret, res, g):
    """Same adjoint as :func:`_splat_region_bwd`, on the LOCAL gather
    kernel with the source-tile offsets (gather windows read taps at
    s + flow(s), so they recenter on the source tile's own mean flow)."""
    from sin_inn_tpu.ops.pallas.gather import _gather_region_call_local, _RAW

    values, flow, off_src = res
    d_values, d_ax, d_ay = _gather_region_call_local(
        g, flow, values, off_src, loc_dy, loc_dx, cap_y, cap_x, _RAW,
        True, interpret)
    return (d_values.astype(values.dtype),
            jnp.stack([d_ax, d_ay], axis=-1).astype(flow.dtype),
            jnp.zeros_like(off_src), jnp.zeros_like(off_src))


splat_region_local.defvjp(_splat_region_local_fwd, _splat_region_local_bwd)


def softsplat_region_local_with_coverage(inp: jnp.ndarray, flow: jnp.ndarray,
                                         metric: jnp.ndarray, loc_dy: int,
                                         loc_dx: int, cap_y: int, cap_x: int,
                                         off_out: jnp.ndarray,
                                         off_src: jnp.ndarray,
                                         interpret: bool = False):
    """softsplat_with_coverage on the LOCAL-window region kernel."""
    from sin_inn_tpu.ops.splat import softmax_coverage_via

    return softmax_coverage_via(
        lambda cat, fl: splat_region_local(loc_dy, loc_dx, cap_y, cap_x,
                                           interpret, cat, fl, off_out,
                                           off_src),
        inp, flow, metric)
