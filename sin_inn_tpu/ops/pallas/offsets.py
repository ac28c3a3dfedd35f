"""Per-tile flow window offsets for the LOCAL-window Pallas kernels.

The static region kernels (ops/pallas/splat.py, ops/pallas/gather.py) size
their source windows by the GLOBAL flow bound: every 128x128 tile DMAs a
(B + 2*max_dy, CB + 2*max_dx) window even though the flow within one tile
rarely deviates more than a few pixels from the tile's mean — the global
bound pays for camera motion that is locally just a constant shift. Both
kernels' dense-contraction FLOPs scale with the window AREA, so centering
each tile's window on its mean flow (a data-dependent DMA offset, resolved
per tile via scalar prefetch) lets the static half-widths shrink from the
global bound to a LOCAL-deviation bound: at Sintel defaults (dy 64 -> 32,
dx 128 -> 64) that is 2.0x fewer splat FLOPs and 2.8x fewer gather FLOPs
for identical in-contract results.

This module is the XLA side: given a flow field it computes, per image and
per 128x128 tile,

  * ``off_src`` — round(mean flow over the tile's SOURCE pixels); the
    gather kernels (resample forward, splat backward) read taps at
    p = s + f(s) for source pixels s in the tile, so their window shifts
    by the tile's own mean flow;
  * ``off_out`` — round(mean flow over the pixels whose taps LAND in the
    tile); the splat forward's window holds source pixels s with
    s + f(s) in the tile, so its window shifts by MINUS the contributors'
    mean flow (the kernel subtracts);
  * ``dev`` — the max per-axis deviation |f - off| under each criterion,
    the quantity the train loop monitors: taps with deviation beyond the
    local half-width are DROPPED (the same windowed-drop contract as the
    static bounds, now measured relative to the tile mean).

Everything is computed from ``stop_gradient(flow)`` — offsets parameterize
the kernels' tap coverage, they are not differentiated through. The
contributor means/binning ride one-hot matmuls over the (hb*wb)-bin tile
grid instead of scatters/gathers (TPU scatter at image scale is the exact
pathology the windowed ops exist to avoid — CLAUDE.md).

Replaces nothing in the reference (the CUDA scatter kernels,
/root/reference/video-interpolation/my_utils/softsplat.py:108-177, are
windowless); this is a TPU-side optimization with a documented drop
contract.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class TileOffsets(NamedTuple):
    """Per-tile window offsets, f32 (ox, oy) order matching flow channels.

    ``off_src``/``off_out``: (N, HB, WB, 2) rounded-integer-valued f32
    (f32 so the custom_vjp wrappers can hand back ordinary zero
    cotangents; the kernels cast to i32 at the SMEM read).
    ``dev_src``/``dev_out``: (2,) max |f - off| per axis under the
    source-tile / output-tile criterion, over live pixels.
    """

    off_src: jnp.ndarray
    off_out: jnp.ndarray
    dev_src: jnp.ndarray
    dev_out: jnp.ndarray


def _tile_counts(dim: int, tile: int, nblk: int) -> jnp.ndarray:
    """Valid (in-image) pixel count of each tile block along one axis."""
    full = jnp.full((nblk,), tile, jnp.float32)
    return full.at[nblk - 1].set(dim - (nblk - 1) * tile)


def _source_tile_stats(flow: jnp.ndarray, tile_b: int, tile_cb: int):
    """Shared source-tile machinery: pad ``flow`` to whole (tile_b,
    tile_cb) tiles and return ``(blocks, validb, mean, hb, wb)`` —
    blocks (N, HB, tile_b, WB, tile_cb, 2), the broadcastable in-image
    mask, and the per-tile mean over VALID pixels (partial last tiles
    divide by their true count). One implementation for both
    `tile_flow_offsets` (the runtime offsets) and `tile_deviation_fine`
    (the GT probe's estimate) so the probe's drop criterion cannot drift
    from the offsets actually used."""
    n, h, w, _ = flow.shape
    hb = -(-h // tile_b)
    wb = -(-w // tile_cb)
    fp = jnp.pad(flow, ((0, 0), (0, hb * tile_b - h),
                        (0, wb * tile_cb - w), (0, 0)))
    blocks = fp.reshape(n, hb, tile_b, wb, tile_cb, 2)
    cnt = (_tile_counts(h, tile_b, hb)[:, None]
           * _tile_counts(w, tile_cb, wb)[None, :])        # (hb, wb)
    valid = jnp.zeros((hb * tile_b, wb * tile_cb), jnp.float32)
    valid = valid.at[:h, :w].set(1.0)
    validb = valid.reshape(1, hb, tile_b, wb, tile_cb, 1)
    mean = blocks.sum(axis=(2, 4)) / cnt[None, :, :, None]
    return blocks, validb, mean, hb, wb


def _masked_max_dev(blocks, ref, validb) -> jnp.ndarray:
    """Max per-axis |blocks - ref(tile)| over valid pixels -> (2,)."""
    dev = jnp.abs(blocks - ref[:, :, None, :, None, :]) * validb
    return dev.max(axis=(0, 1, 2, 3, 4))


def tile_flow_offsets(flow: jnp.ndarray, tile_b: int, tile_cb: int,
                      cap_y: int, cap_x: int,
                      quant_y: int = 8, quant_x: int = 128) -> TileOffsets:
    """Compute per-tile window offsets + deviation monitors for ``flow``.

    flow: (N, H, W, 2) pixel displacements (dx, dy). tile_b/tile_cb: the
    kernels' output-tile rows/cols. cap_y/cap_x: offset clip (the padding
    allowance — the resolved GLOBAL window bounds, so local windows can
    reach every tap the static kernels could, and farther when the local
    deviation is small). cap_x = 0 disables the x offsets entirely (the
    row-only mode that ships unless the GT probe engages x).

    Row offsets are quantized to ``quant_y`` (the sublane tiling; the
    kernels prove divisibility to Mosaic via ``pl.multiple_of``); column
    offsets to ``quant_x`` = 128 (the LANE tiling — the only column
    starts Mosaic accepts for HBM DMA, so up to quant_x/2 = 64 px of
    quantization error eats the x deviation budget; x-local windows only
    pay for fast scenes whose global dx is >= 192). The returned
    deviations are measured against the QUANTIZED offsets actually used,
    so the train-loop monitor stays honest.
    """
    assert cap_x % quant_x == 0, "cap_x must be a multiple of the lane tiling"
    flow = jax.lax.stop_gradient(flow).astype(jnp.float32)
    n, h, w, _ = flow.shape
    blocks, validb, mean_src, hb, wb = _source_tile_stats(flow, tile_b,
                                                          tile_cb)

    def _round_clip(mean):
        # x quantized to the lane tiling, y to the sublane tiling, both
        # axes clipped to the caps
        return jnp.stack([
            jnp.clip(jnp.rint(mean[..., 0] / quant_x) * quant_x,
                     -float(cap_x), float(cap_x)),
            jnp.clip(jnp.rint(mean[..., 1] / quant_y) * quant_y,
                     -float(cap_y), float(cap_y))], axis=-1)

    off_src = _round_clip(mean_src)
    # measure deviation against the ROUNDED offset actually used
    dev_src = _masked_max_dev(blocks, off_src, validb)     # (2,)

    # ---- output-tile (contributor) means: bin every pixel by the tile
    # its (rounded) target lands in, via one-hot contractions ----
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    oy = ys + flow[..., 1]
    ox = xs + flow[..., 0]
    # a pixel is live if any of its bilinear taps can land in-image
    live = ((oy > -1.0) & (oy < jnp.float32(h)) &
            (ox > -1.0) & (ox < jnp.float32(w))).astype(jnp.float32)
    ty = jnp.clip(jnp.floor((oy + 0.5) / tile_b), 0, hb - 1)
    tx = jnp.clip(jnp.floor((ox + 0.5) / tile_cb), 0, wb - 1)
    ohy = (ty[..., None] ==
           jnp.arange(hb, dtype=jnp.float32)).astype(jnp.float32)
    ohx = (tx[..., None] ==
           jnp.arange(wb, dtype=jnp.float32)).astype(jnp.float32)
    ohy = ohy * live[..., None]
    payload = jnp.concatenate(
        [flow, jnp.ones((n, h, w, 1), jnp.float32)], axis=-1)
    # sums[n, i, j, c] = sum over pixels binned to tile (i, j)
    sums = jnp.einsum("nhwi,nhwj,nhwc->nijc", ohy, ohx, payload)
    count = sums[..., 2:3]
    mean_out = jnp.where(count > 0.0, sums[..., :2] / jnp.maximum(count, 1.0),
                         0.0)
    off_out = _round_clip(mean_out)

    # dev_out: per-pixel |f - off_out(binned tile)|. Taps can straddle two
    # tiles per axis near tile borders (the hat spans floor(o) and
    # floor(o)+1); check the offset of BOTH candidate tiles so a straddle
    # into a differently-offset neighbor is monitored too.
    devs = []
    for dy_tap in (0.0, 1.0):
        tyc = jnp.clip(jnp.floor((jnp.floor(oy) + dy_tap) / tile_b),
                       0, hb - 1)
        oh_y = (tyc[..., None] ==
                jnp.arange(hb, dtype=jnp.float32)).astype(jnp.float32)
        for dx_tap in (0.0, 1.0):
            txc = jnp.clip(jnp.floor((jnp.floor(ox) + dx_tap) / tile_cb),
                           0, wb - 1)
            oh_x = (txc[..., None] ==
                    jnp.arange(wb, dtype=jnp.float32)).astype(jnp.float32)
            per_px = jnp.einsum("nhwi,nijc,nhwj->nhwc", oh_y, off_out, oh_x)
            devs.append((jnp.abs(flow - per_px)
                         * live[..., None]).max(axis=(0, 1, 2)))
    dev_out = jnp.stack(devs).max(axis=0)                  # (2,)

    return TileOffsets(off_src=off_src, off_out=off_out,
                       dev_src=dev_src, dev_out=dev_out)


def tile_deviation_fine(flow: jnp.ndarray, tile_b: int,
                        tile_cb: int) -> jnp.ndarray:
    """Max per-axis |flow - per-tile FINE mean| (source-tile criterion, no
    offset quantization): the GT probe's estimate of the per-tile
    deviation training flows will show. The quantization error of the
    offsets actually used (<= quant/2 per axis) is a separate, exact
    budget the caller adds on top — unlike the deviation it does not
    drift with training, so it must not ride the probe's safety factor.
    Returns (2,) [dev_x, dev_y]."""
    flow = jax.lax.stop_gradient(flow).astype(jnp.float32)
    blocks, validb, mean, _, _ = _source_tile_stats(flow, tile_b, tile_cb)
    return _masked_max_dev(blocks, mean, validb)
