"""Progressive frequency-encoding controllers as explicit state pytrees.

Re-design of /root/reference/video-interpolation/progressive_controller.py
(14-710) for jit: the reference mutates Python attributes and torch buffers
per step (``iteration``, ``cur_block``, lru-cached masks, scatter into
``log_buffer`` — :28-31, :476-484, :544-552); here every controller is an
immutable NamedTuple state threaded through the jitted train step, updated by
pure functions with static shapes (SURVEY §7 hard-part 3).

Implemented controllers (matching main.py:136-143 wiring):
  * ``LinearState`` — global coarse-to-fine ramp (LinearController, :95-132)
  * early-stop variant (LinearControllerEarly, :135-157): freezes progress
    once the best loss drops under epsilon
  * ``SpatialState`` — spatially adaptive (StashedSpatialController,
    :461-710): per-cell loss accumulated on a res^d grid by bilinear scatter,
    per-cell progress gating, mask looked up by multilinear interpolation.

Divergences from the reference, by design (documented per SURVEY quirks):
  * the reference never actually calls ``update_progress`` for the stashed
    controller (no call site exists in the tree) and its scalar-loss stash
    indexing crashes on 0-d tensors; we implement the *intended* behavior:
    per-point losses are scattered into cells every step, and the per-cell
    progress gate + block advance runs every ``block_iterations`` steps.
  * checkpointing stores the dense mask state directly (an explicit pytree)
    instead of re-deriving it from per-cell channel counts on load
    (:55-81) — same information, no load-time reconstruction quirk.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from sin_inn_tpu.models.inr import INRSpec


# ===========================================================================
# Linear controller (global ramp, optional early freeze)
# ===========================================================================

@dataclass(frozen=True)
class LinearConfig:
    encoding_dim: int
    block_size: int
    num_blocks: int
    block_iterations: int
    progress_iterations: int
    epsilon: float = 0.0          # 0 => plain LinearController (no freeze)

    @classmethod
    def create(cls, spec: INRSpec, max_iteration: int,
               epsilon: float = 0.0,
               num_blocks: Optional[int] = None) -> "LinearConfig":
        """Mirrors LinearController.__init__ (:121-132)."""
        e = spec.encoding_dim
        if num_blocks is None:
            block_size = spec.domain_dim * 2
            num_blocks = (e - block_size) // block_size
        else:
            block_size = e // num_blocks
        block_iterations = max(3 * max_iteration // (4 * num_blocks), 1)
        return cls(encoding_dim=e, block_size=block_size,
                   num_blocks=num_blocks, block_iterations=block_iterations,
                   progress_iterations=block_iterations * num_blocks,
                   epsilon=epsilon)


class LinearState(NamedTuple):
    mask: jnp.ndarray          # (encoding_dim,)
    iteration: jnp.ndarray     # i32 scalar
    cur_block: jnp.ndarray     # i32 scalar
    next_block: jnp.ndarray    # i32 scalar
    best_score: jnp.ndarray    # f32 scalar


def linear_init(cfg: LinearConfig) -> LinearState:
    mask = jnp.concatenate([jnp.ones((cfg.block_size,)),
                            jnp.zeros((cfg.encoding_dim - cfg.block_size,))])
    return LinearState(
        mask=mask,
        iteration=jnp.zeros((), jnp.int32),
        cur_block=jnp.asarray(cfg.block_size, jnp.int32),
        next_block=jnp.asarray(2 * cfg.block_size, jnp.int32),
        best_score=jnp.asarray(1e4, jnp.float32),
    )


def linear_update(cfg: LinearConfig, state: LinearState,
                  loss: jnp.ndarray) -> LinearState:
    """One ``stash_iteration`` (:28-31,112-119,141-151), pure."""
    best = jnp.minimum(state.best_score, loss)
    it = state.iteration + 1
    idx = jnp.arange(cfg.encoding_dim)
    in_window = (idx >= state.cur_block) & (idx < state.next_block)

    boundary = (it % cfg.block_iterations) == 0
    alpha = jnp.minimum(
        1.0, 2.0 * (it % cfg.block_iterations) / cfg.block_iterations
    ).astype(state.mask.dtype)

    mask_ramp = jnp.where(in_window, alpha, state.mask)
    mask_block = jnp.where(in_window, 1.0, state.mask)

    # advance the block pointers on a boundary (:105-110)
    nb = state.next_block + cfg.block_size
    nb = jnp.where(cfg.encoding_dim - nb < cfg.block_size,
                   cfg.encoding_dim, nb)
    cur_new = jnp.where(boundary, state.next_block, state.cur_block)
    next_new = jnp.where(boundary, nb, state.next_block)
    mask_new = jnp.where(boundary, mask_block, mask_ramp)

    # freeze conditions: past schedule (:113) or early-stopped (:148-151)
    frozen = (it > cfg.progress_iterations)
    if cfg.epsilon > 0:
        frozen = frozen | (best < cfg.epsilon)

    return LinearState(
        mask=jnp.where(frozen, state.mask, mask_new),
        iteration=it,
        cur_block=jnp.where(frozen, state.cur_block, cur_new).astype(jnp.int32),
        next_block=jnp.where(frozen, state.next_block, next_new).astype(jnp.int32),
        best_score=best,
    )


def linear_mask(state: LinearState) -> jnp.ndarray:
    return state.mask


# ===========================================================================
# Stashed spatial controller (per-cell progress on a res^d grid)
# ===========================================================================

@dataclass(frozen=True)
class SpatialConfig:
    encoding_dim: int
    domain_dim: int            # of the input coords
    mask_dim: int              # dims of the cell grid (== domain_dim usually)
    res: int
    cells: int
    block_size: int
    num_blocks: int
    block_iterations: int
    epsilon: float
    k: int                     # box-blur width (:701)

    @classmethod
    def create(cls, spec: INRSpec, res: int, block_iterations: int = 20,
               epsilon: float = 1e-3,
               mask_dim: Optional[int] = None) -> "SpatialConfig":
        """Mirrors StashedSpatialController.__init__ (:682-710)."""
        res = max(res, 3)
        mask_dim = spec.domain_dim if mask_dim is None else mask_dim
        cells = res ** mask_dim
        block_size = spec.domain_dim * 2
        num_blocks = (spec.encoding_dim - block_size) // block_size
        return cls(encoding_dim=spec.encoding_dim, domain_dim=spec.domain_dim,
                   mask_dim=mask_dim, res=res, cells=cells,
                   block_size=block_size, num_blocks=num_blocks,
                   block_iterations=max(block_iterations, 1),
                   epsilon=epsilon, k=5 if cells > 100 else 3)


class SpatialState(NamedTuple):
    mask: jnp.ndarray          # (cells, encoding_dim)
    in_progress: jnp.ndarray   # (cells,) bool
    log_buffer: jnp.ndarray    # (cells,) f32 accumulated loss
    log_counter: jnp.ndarray   # (cells,) f32 accumulated weights
    iteration: jnp.ndarray     # i32, resets each block cycle (:486-489)
    cur_block: jnp.ndarray     # i32
    next_block: jnp.ndarray    # i32


def spatial_init(cfg: SpatialConfig) -> SpatialState:
    mask = jnp.concatenate(
        [jnp.ones((cfg.cells, cfg.block_size)),
         jnp.zeros((cfg.cells, cfg.encoding_dim - cfg.block_size))], axis=1)
    return SpatialState(
        mask=mask,
        in_progress=jnp.ones((cfg.cells,), bool),
        log_buffer=jnp.zeros((cfg.cells,)),
        log_counter=jnp.zeros((cfg.cells,)),
        iteration=jnp.zeros((), jnp.int32),
        cur_block=jnp.asarray(cfg.block_size, jnp.int32),
        next_block=jnp.asarray(2 * cfg.block_size, jnp.int32),
    )


def _cell_interp(cfg: SpatialConfig, x: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Multilinear cell indices + weights for coords in [-1, 1]^d.

    Mirrors interpolate_ + flat_inds (:613-628, :655-664). x: (n, d).
    Returns inds (n, 2^d) int32, alphas (n, 2^d).
    """
    d = cfg.mask_dim
    xs = ((x[:, :d] + 1.0) / 2.0) * max(cfg.res - 2, 1) + 0.5
    lo = jnp.floor(xs)
    hi = jnp.ceil(xs + 1e-6)
    a_lo = hi - xs
    a_hi = xs - lo
    inds_list, alphas_list = [], []
    for corner in range(2 ** d):
        idx = jnp.zeros(xs.shape[:1], xs.dtype)
        alpha = jnp.ones(xs.shape[:1], xs.dtype)
        for j in range(d):
            # bit order matches the reference's format-string walk (:615-623):
            # bit (d-1-j) of `corner` selects lo/hi for coordinate j
            sel = (corner >> (d - 1 - j)) & 1
            comp = jnp.where(sel, hi[:, j], lo[:, j])
            awgt = jnp.where(sel, a_hi[:, j], a_lo[:, j])
            idx = idx + jnp.clip(comp, 0, cfg.res - 1) * (cfg.res ** j)
            alpha = alpha * awgt
        inds_list.append(idx.astype(jnp.int32))
        alphas_list.append(alpha)
    return jnp.stack(inds_list, 1), jnp.stack(alphas_list, 1)


def _box_blur_cells(cfg: SpatialConfig, v: jnp.ndarray) -> jnp.ndarray:
    """Box-blur a per-cell field over the res^d grid, replicate padding.

    v: (cells, E) or (cells,). Mirrors the conv smoothing (:586-601) with a
    k^d box kernel; implemented as separable shifted sums on the VPU.
    """
    squeeze = v.ndim == 1
    if squeeze:
        v = v[:, None]
    e = v.shape[1]
    grid = v.reshape(*( [cfg.res] * cfg.mask_dim ), e)
    half = cfg.k // 2
    for axis in range(cfg.mask_dim):
        pad = [(0, 0)] * grid.ndim
        pad[axis] = (half, half)
        padded = jnp.pad(grid, pad, mode="edge")
        acc = jnp.zeros_like(grid)
        for s in range(cfg.k):
            acc = acc + lax_slice_axis(padded, axis, s, grid.shape[axis])
        grid = acc / cfg.k
    out = grid.reshape(cfg.cells, e)
    return out[:, 0] if squeeze else out


def lax_slice_axis(x: jnp.ndarray, axis: int, start: int, size: int) -> jnp.ndarray:
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(start, start + size)
    return x[tuple(idx)]


def spatial_point_mask(cfg: SpatialConfig, state: SpatialState,
                       x: jnp.ndarray
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-point mask by multilinear interpolation of the blurred cell mask
    (:655-664). Returns (mask (n, E), inds, alphas) — inds/alphas are the
    'stash' reused by the loss scatter (:661)."""
    inds, alphas = _cell_interp(cfg, x)
    blurred = _box_blur_cells(cfg, state.mask)            # (cells, E)
    # accumulate corner-by-corner inside a fori_loop: a single
    # blurred[inds] gather would materialize (n, 2^d, E) — 22 GB at Sintel
    # scale (3x436x1024 points, E=515) — and an unrolled sum still lets XLA
    # schedule all 2^d (n, E) gather temps concurrently (8 x 3.2 GB live).
    # The loop carries one (n, E) accumulator and one gather at a time.
    def corner_add(c, mask):
        idx = jax.lax.dynamic_index_in_dim(inds, c, 1, keepdims=False)
        al = jax.lax.dynamic_index_in_dim(alphas, c, 1, keepdims=True)
        return mask + blurred[idx] * al

    mask = jax.lax.fori_loop(
        0, inds.shape[1], corner_add,
        jnp.zeros((x.shape[0], cfg.encoding_dim), blurred.dtype))
    return mask, inds, alphas


def _stash_ramp(cfg: SpatialConfig, state: SpatialState,
                log_buffer: jnp.ndarray, log_counter: jnp.ndarray
                ) -> SpatialState:
    """Shared tail of the stash: store the accumulated buffers and ramp the
    current block (update_mask :577-581)."""
    it = state.iteration + 1
    alpha = jnp.minimum(
        1.0, 2.0 * (it % cfg.block_iterations) / cfg.block_iterations
    ).astype(state.mask.dtype)
    idx = jnp.arange(cfg.encoding_dim)[None, :]
    in_window = (idx >= state.cur_block) & (idx < state.next_block)
    can_ramp = (it < cfg.block_iterations * (cfg.num_blocks + 1))
    ramp = in_window & state.in_progress[:, None] & can_ramp
    mask = jnp.where(ramp, jnp.maximum(state.mask, alpha), state.mask)
    return state._replace(mask=mask, log_buffer=log_buffer,
                          log_counter=log_counter, iteration=it)


def spatial_stash(cfg: SpatialConfig, state: SpatialState,
                  point_loss: jnp.ndarray, inds: jnp.ndarray,
                  alphas: jnp.ndarray) -> SpatialState:
    """Accumulate per-point losses into cells + ramp the current block
    (stash_iteration :476-484 + update_mask :577-581), pure."""
    w = (point_loss[:, None] * alphas).reshape(-1)
    log_buffer = state.log_buffer.at[inds.reshape(-1)].add(w)
    log_counter = state.log_counter.at[inds.reshape(-1)].add(alphas.reshape(-1))
    return _stash_ramp(cfg, state, log_buffer, log_counter)


# --------------------------------------------------------------------------
# Regular-grid fast paths (the flow trainer's points are always the dense
# (t, y, x) pose grid, so the multilinear weights factor per axis: per-point
# gathers/scatters become three small separable contractions)
# --------------------------------------------------------------------------

def grid_axis_weights(cfg: SpatialConfig, coords: jnp.ndarray) -> jnp.ndarray:
    """(n, res) dense multilinear weights for one axis — the separable
    factor of :func:`_cell_interp`'s corner alphas (same lo/hi/clip math)."""
    xs = ((coords + 1.0) / 2.0) * max(cfg.res - 2, 1) + 0.5
    lo = jnp.floor(xs)
    hi = jnp.ceil(xs + 1e-6)
    r = jnp.arange(cfg.res, dtype=xs.dtype)[None, :]
    return (jnp.where(r == jnp.clip(lo, 0, cfg.res - 1)[:, None],
                      (hi - xs)[:, None], 0.0)
            + jnp.where(r == jnp.clip(hi, 0, cfg.res - 1)[:, None],
                        (xs - lo)[:, None], 0.0))


def _blur_axis_matrix(cfg: SpatialConfig) -> jnp.ndarray:
    """(res, res) linear operator of ONE axis of :func:`_box_blur_cells`
    (k-box, replicate padding). The box blur is separable per grid axis
    and each mask producer contracts the grid per axis, so blur and
    contraction commute: folding B into the tiny (n, res) hat weights
    (``w @ B``) gives bit-identical math without ever materializing the
    blurred (cells, E) grid (~257 MB + 3k slice passes at res=50,
    E=515)."""
    import numpy as np
    res, k = cfg.res, cfg.k
    half = k // 2
    b = np.zeros((res, res), np.float32)
    for i in range(res):
        for s in range(k):
            b[i, min(max(i + s - half, 0), res - 1)] += 1.0 / k
    return jnp.asarray(b)


def _grid_mask_operands(cfg: SpatialConfig, state: SpatialState,
                        times: jnp.ndarray, h: int, w: int, what: str):
    """Shared preamble of the three grid mask producers: the (res,res,res,E)
    cell grid plus the blur-folded per-axis hat weights (wt, wy, wx)."""
    if cfg.mask_dim != 3:
        raise ValueError(f"{what} expects a (t, y, x) cell grid")
    res, e = cfg.res, cfg.encoding_dim
    cells = state.mask.reshape(res, res, res, e)
    bm = _blur_axis_matrix(cfg)
    wt = grid_axis_weights(cfg, times) @ bm
    wy = grid_axis_weights(cfg, jnp.linspace(-1.0, 1.0, h)) @ bm
    wx = grid_axis_weights(cfg, jnp.linspace(-1.0, 1.0, w)) @ bm
    return cells, wt, wy, wx


def spatial_grid_mask(cfg: SpatialConfig, state: SpatialState,
                      times: jnp.ndarray, h: int, w: int,
                      dtype=None) -> jnp.ndarray:
    """:func:`spatial_point_mask` for the dense pose grid, gather-free.

    The generic per-point path materializes 2^d (n, E) gather terms —
    at Sintel scale (3x436x1024 points, E=515) that is 353 ms/step and
    OOM-prone; here the same multilinear interpolation runs as three
    separable contractions of the (res^3, E) blurred cell mask (~10 ms).
    Returns the (B*H*W, E) mask in pose-grid row-major order.

    ``dtype`` (e.g. bfloat16 when the INR chain runs bf16) applies to the
    LAST contraction only, so the (n, E) output — the one Sintel-scale
    (2.8 GB in f32) tensor this builds — is written once at half width;
    the small per-axis weights and intermediates stay f32. Measured
    NEUTRAL on the full spatial step (143.0 ms both ways at Sintel scale,
    round 3): XLA already fuses ``inr_apply``'s downstream cast into this
    einsum. Kept as the explicit dtype contract rather than relying on
    that fusion.
    """
    # cell flat index = t + y*res + x*res^2  =>  grid dims [x, y, t];
    # the box blur rides the hat weights (see _blur_axis_matrix)
    blurred, wt, wy, wx = _grid_mask_operands(cfg, state, times, h, w,
                                              "spatial_grid_mask")
    e = cfg.encoding_dim
    g = jnp.einsum("bt,xytE->bxyE", wt, blurred)
    g = jnp.einsum("hy,bxyE->bxhE", wy, g)
    if dtype is not None:
        g = g.astype(dtype)
        wx = wx.astype(dtype)
    m = jnp.einsum("wx,bxhE->bhwE", wx, g)
    return m.reshape(-1, e)


def spatial_grid_mask_split(cfg: SpatialConfig, state: SpatialState,
                            times: jnp.ndarray, h: int, w: int,
                            enc_perm=None, dtype=None
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """:func:`spatial_grid_mask` split into its (coords, encoding) halves
    for the fused Pallas INR kernel (ops/pallas/inr.py).

    Returns ``(mc, me)`` with ``mc`` the coordinate-channel mask
    TRANSPOSED to (d, B*H*W) — the (n, d) layout lane-pads d->128 in
    tiled HBM — and ``me`` the (B*H*W, E-d) encoding-channel mask, its
    columns optionally permuted by ``enc_perm`` into the kernel's blocked
    sin||cos layout. Both the split and the permutation are applied at
    the (res^3, E) blurred cell grid, where they cost nothing; the three
    separable contractions are identical to :func:`spatial_grid_mask`
    (same ``dtype`` contract: the big last contraction emits ``dtype``).
    """
    blurred, wt, wy, wx = _grid_mask_operands(cfg, state, times, h, w,
                                              "spatial_grid_mask_split")
    e, d = cfg.encoding_dim, cfg.mask_dim
    if enc_perm is not None:
        b_enc = blurred[..., jnp.asarray(enc_perm) + d]
    else:
        b_enc = blurred[..., d:]
    g = jnp.einsum("bt,xytE->bxyE", wt, b_enc)
    g = jnp.einsum("hy,bxyE->bxhE", wy, g)
    wx_e = wx
    if dtype is not None:
        g = g.astype(dtype)
        wx_e = wx.astype(dtype)
    me = jnp.einsum("wx,bxhE->bhwE", wx_e, g).reshape(-1, e - d)
    gc = jnp.einsum("bt,xytE->bxyE", wt, blurred[..., :d])
    gc = jnp.einsum("hy,bxyE->bxhE", wy, gc)
    mc = jnp.einsum("wx,bxhE->Ebhw", wx, gc).reshape(d, -1)
    if dtype is not None:
        mc = mc.astype(dtype)
    return mc, me


class SpatialSlabMask(NamedTuple):
    """Row-slab factorization of the per-point spatial mask for the fused
    Pallas INR kernel (ops/pallas/inr.py, slab mode).

    The dense pose grid is regular, so the multilinear mask factors per
    axis; contracting the (res^3, E) blurred cell grid over t and y leaves
    one tiny (res, E) slab PER IMAGE ROW — the kernel streams that
    (~100 KB vs the ~1 MB-per-tile materialized (n, E) mask) and rebuilds
    the per-point mask in VMEM with one (W, res) x (res, E) matmul against
    the constant x-axis hat weights. Mask HBM traffic drops ~20x and the
    (n, E) production einsum disappears entirely.
    """
    enc: jnp.ndarray     # (B*H, res, E-d) t/y-contracted encoding channels
    coord: jnp.ndarray   # (B*H, res, d) t/y-contracted coordinate channels
    wx: jnp.ndarray      # (W, res) x-axis multilinear hat weights, f32


def spatial_grid_mask_slabs(cfg: SpatialConfig, state: SpatialState,
                            times: jnp.ndarray, h: int, w: int,
                            enc_perm=None, dtype=None) -> SpatialSlabMask:
    """:func:`spatial_grid_mask` factored into per-row slabs (see
    :class:`SpatialSlabMask`). ``enc_perm`` permutes the encoding channels
    into the fused kernel's blocked sin||cos layout at the cell grid,
    where it costs nothing; ``dtype`` casts the slabs (the only streamed
    operands) — the x contraction happens in-kernel."""
    blurred, wt, wy, wx = _grid_mask_operands(cfg, state, times, h, w,
                                              "spatial_grid_mask_slabs")
    res, e, d = cfg.res, cfg.encoding_dim, cfg.mask_dim
    g = jnp.einsum("bt,xytE->bxyE", wt, blurred)    # tiny (B, res, res, E)
    # channel permutation + enc/coord split on the t-contracted
    # intermediate (B*res^2*E elements) — doing either on the (B, H,
    # res, E) output would re-stream ~140 MB at Sintel scale
    ge = g[..., jnp.asarray(enc_perm) + d] if enc_perm is not None \
        else g[..., d:]
    gc = g[..., :d]
    enc = jnp.einsum("hy,bxyE->bhxE", wy, ge)       # (B, H, res, E-d)
    coord = jnp.einsum("hy,bxyE->bhxE", wy, gc)
    if dtype is not None:
        enc = enc.astype(dtype)
        coord = coord.astype(dtype)
    return SpatialSlabMask(enc=enc.reshape(-1, res, e - d),
                           coord=coord.reshape(-1, res, d), wx=wx)


def spatial_grid_update(cfg: SpatialConfig, state: SpatialState,
                        point_loss: jnp.ndarray, times: jnp.ndarray,
                        h: int, w: int) -> SpatialState:
    """:func:`spatial_update` for the dense pose grid, scatter-free.

    The cell accumulation of per-point losses is the ADJOINT of the
    separable interpolation — three small matmuls instead of a 2^d * n
    scatter-add (146 ms at Sintel scale); the visit-counter accumulation is
    fully separable (outer product of the per-axis weight column sums).
    """
    b = times.shape[0]
    loss = point_loss.reshape(b, h, w)
    wt = grid_axis_weights(cfg, times).astype(loss.dtype)
    wy = grid_axis_weights(cfg, jnp.linspace(-1.0, 1.0, h)).astype(loss.dtype)
    wx = grid_axis_weights(cfg, jnp.linspace(-1.0, 1.0, w)).astype(loss.dtype)
    l1 = jnp.einsum("bhw,hy->bwy", loss, wy)
    l2 = jnp.einsum("bwy,wx->bxy", l1, wx)
    buf_add = jnp.einsum("bxy,bt->xyt", l2, wt).reshape(-1)
    cnt_add = jnp.einsum("x,y,t->xyt", wx.sum(0), wy.sum(0),
                         wt.sum(0)).reshape(-1)
    state = _stash_ramp(cfg, state, state.log_buffer + buf_add,
                        state.log_counter + cnt_add)
    do_progress = (state.iteration % cfg.block_iterations) == 0
    return jax.lax.cond(do_progress,
                        lambda s: spatial_progress(cfg, s),
                        lambda s: s, state)


def spatial_progress(cfg: SpatialConfig, state: SpatialState) -> SpatialState:
    """Per-cell gate + block advance + buffer reset (update_progress
    :551-563), pure. Call every ``block_iterations`` steps."""
    empty = state.log_counter == 0
    counter = jnp.where(empty, 1.0, state.log_counter)
    cell_loss = state.log_buffer / counter
    # neighbor-fill for unvisited cells, then box blur (:504-518)
    neigh = _box_blur_cells(cfg, jnp.where(empty, 0.0, cell_loss))
    neigh_cnt = _box_blur_cells(cfg, jnp.where(empty, 0.0, 1.0))
    filled = jnp.where(empty, neigh / jnp.maximum(neigh_cnt, 1e-12), cell_loss)
    smoothed = _box_blur_cells(cfg, filled)
    in_progress = state.in_progress & (smoothed > cfg.epsilon)

    # increase_block (:569-575)
    idx = jnp.arange(cfg.encoding_dim)[None, :]
    in_window = (idx >= state.cur_block) & (idx < state.next_block)
    mask = jnp.where(in_window & in_progress[:, None], 1.0, state.mask)
    nb = state.next_block + cfg.block_size
    nb = jnp.where(cfg.encoding_dim - nb < cfg.block_size,
                   cfg.encoding_dim, nb)

    return SpatialState(
        mask=mask, in_progress=in_progress,
        log_buffer=jnp.zeros_like(state.log_buffer),
        log_counter=jnp.zeros_like(state.log_counter),
        iteration=jnp.zeros((), jnp.int32),        # reset_buffer_ (:486-489)
        cur_block=state.next_block,
        next_block=nb.astype(jnp.int32),
    )


def spatial_update(cfg: SpatialConfig, state: SpatialState,
                   point_loss: jnp.ndarray, inds: jnp.ndarray,
                   alphas: jnp.ndarray) -> SpatialState:
    """stash + conditional progress, in one pure update for the train step."""
    state = spatial_stash(cfg, state, point_loss, inds, alphas)
    do_progress = (state.iteration % cfg.block_iterations) == 0
    return jax.lax.cond(do_progress,
                        lambda s: spatial_progress(cfg, s),
                        lambda s: s, state)


# ===========================================================================
# Adaptive controller (loss-gradient-triggered block unlock)
# ===========================================================================

@dataclass(frozen=True)
class AdaptiveConfig:
    encoding_dim: int
    block_size: int
    num_blocks: int
    block_iterations: int
    max_iteration: int
    epsilon: float = 1e-5
    grad_epsilon: float = 5e-4

    # status codes (AdaptiveController.Status, :400-403)
    WAITING = 0
    STABILIZING = 1
    INCREASING = 2

    @classmethod
    def create(cls, spec: INRSpec, max_iteration: int = 1000) -> "AdaptiveConfig":
        e = spec.encoding_dim
        block_size = spec.domain_dim * 2
        num_blocks = (e - block_size) // block_size
        return cls(encoding_dim=e, block_size=block_size,
                   num_blocks=num_blocks,
                   block_iterations=max(3 * max_iteration // (4 * num_blocks), 2),
                   max_iteration=max_iteration)


class AdaptiveState(NamedTuple):
    mask: jnp.ndarray          # (encoding_dim,)
    iteration: jnp.ndarray     # i32
    cur_block: jnp.ndarray     # i32
    next_block: jnp.ndarray    # i32
    status: jnp.ndarray        # i32 (Waiting/Stabilizing/Increasing)
    in_iteration: jnp.ndarray  # i32
    log: jnp.ndarray           # (max_iteration,) loss history
    best_score: jnp.ndarray    # f32


def adaptive_init(cfg: AdaptiveConfig) -> AdaptiveState:
    mask = jnp.concatenate([jnp.ones((cfg.block_size,)),
                            jnp.zeros((cfg.encoding_dim - cfg.block_size,))])
    return AdaptiveState(
        mask=mask,
        iteration=jnp.zeros((), jnp.int32),
        cur_block=jnp.asarray(cfg.block_size, jnp.int32),
        next_block=jnp.asarray(2 * cfg.block_size, jnp.int32),
        status=jnp.asarray(cfg.STABILIZING, jnp.int32),
        in_iteration=jnp.zeros((), jnp.int32),
        log=jnp.zeros((cfg.max_iteration,)),
        best_score=jnp.asarray(1e4, jnp.float32),
    )


def _loss_slope(cfg: AdaptiveConfig, log: jnp.ndarray,
                end: jnp.ndarray) -> jnp.ndarray:
    """Least-squares slope of log(loss) over the trailing half-block window
    (estimate_gradient, :405-411), via the closed-form regression formula
    over a static-size dynamic slice."""
    win = cfg.block_iterations // 2
    start = jnp.maximum(end - win, 0)
    y = jax.lax.dynamic_slice(log, (start,), (win,))
    y = jnp.log(jnp.maximum(y, 1e-12))
    y = y - y[0]
    t = jnp.arange(win, dtype=jnp.float32)
    # slope through the origin (torch.lstsq with a single domain column)
    return jnp.sum(t * y) / jnp.maximum(jnp.sum(t * t), 1e-12)


def adaptive_update(cfg: AdaptiveConfig, state: AdaptiveState,
                    loss: jnp.ndarray) -> AdaptiveState:
    """stash_iteration + update_status + update_mask (:413-448), pure."""
    best = jnp.minimum(state.best_score, loss)
    log = state.log.at[jnp.clip(state.iteration, 0,
                                cfg.max_iteration - 1)].set(loss)
    it = state.iteration + 1
    done = state.cur_block >= cfg.encoding_dim
    bi = cfg.block_iterations

    # ---- update_status (:413-434) ----
    inc_full = (state.status == cfg.INCREASING) & (state.in_iteration == bi)
    stab_full = (state.status == cfg.STABILIZING) & (state.in_iteration == bi)
    stab_cont = (state.status == cfg.STABILIZING) & (state.in_iteration < bi)
    low_loss = log[jnp.clip(it - 1, 0, cfg.max_iteration - 1)] < cfg.epsilon
    slope = _loss_slope(cfg, log, it)
    trigger = (state.status == cfg.WAITING) & ~low_loss & \
        (slope > -cfg.grad_epsilon)

    status = state.status
    status = jnp.where(inc_full, cfg.STABILIZING, status)
    status = jnp.where(stab_full, cfg.WAITING, status)
    status = jnp.where(trigger, cfg.INCREASING, status)

    in_it = state.in_iteration
    in_it = jnp.where(inc_full | stab_full, 0, in_it)
    in_it = jnp.where(stab_cont & ~stab_full, state.in_iteration + 1, in_it)

    # block advance happens when an Increasing phase completes (:414-417)
    idx = jnp.arange(cfg.encoding_dim)
    in_window = (idx >= state.cur_block) & (idx < state.next_block)
    mask = jnp.where(inc_full & ~done & in_window, 1.0, state.mask)
    nb = state.next_block + cfg.block_size
    nb = jnp.where(cfg.encoding_dim - nb < cfg.block_size,
                   cfg.encoding_dim, nb)
    cur = jnp.where(inc_full & ~done, state.next_block, state.cur_block)
    nxt = jnp.where(inc_full & ~done, nb, state.next_block)

    # ---- update_mask ramp while Increasing (:436-443) ----
    ramping = (status == cfg.INCREASING) & ~done
    alpha = (in_it % bi).astype(mask.dtype) / bi
    in_window_new = (idx >= cur) & (idx < nxt)
    mask = jnp.where(ramping & in_window_new,
                     jnp.maximum(mask, alpha), mask)
    in_it = jnp.where(ramping, in_it + 1, in_it)

    return AdaptiveState(mask=mask, iteration=it,
                         cur_block=cur.astype(jnp.int32),
                         next_block=nxt.astype(jnp.int32),
                         status=status.astype(jnp.int32),
                         in_iteration=in_it.astype(jnp.int32),
                         log=log, best_score=best)


# ===========================================================================
# Fixed spatial controller (per-sample mask over a fixed input grid)
# ===========================================================================

@dataclass(frozen=True)
class FixedSpatialConfig:
    encoding_dim: int
    domain_dim: int            # 1 or 2 supported (reference :161-177)
    num_samples: int           # fixed training grid size
    block_size: int
    num_blocks: int
    block_iterations: int
    progress_iterations: int
    buffer_size: int
    epsilon: float

    @classmethod
    def create(cls, spec: INRSpec, num_samples: int, max_iteration: int = 1000,
               epsilon: float = 1e-3,
               num_blocks: Optional[int] = None) -> "FixedSpatialConfig":
        e = spec.encoding_dim
        if num_blocks is None:
            block_size = spec.domain_dim * 2
            num_blocks = (e - block_size) // block_size
        else:
            block_size = e // num_blocks
        bi = max(3 * max_iteration // (4 * num_blocks), 2)
        return cls(encoding_dim=e, domain_dim=spec.domain_dim,
                   num_samples=num_samples, block_size=block_size,
                   num_blocks=num_blocks, block_iterations=bi,
                   progress_iterations=bi * num_blocks,
                   buffer_size=max(bi // 2, 1), epsilon=epsilon)


class FixedSpatialState(NamedTuple):
    mask: jnp.ndarray          # (num_samples, encoding_dim)
    in_progress: jnp.ndarray   # (num_samples,) bool
    log_buffer: jnp.ndarray    # (buffer_size, num_samples) bool ring
    iteration: jnp.ndarray
    cur_block: jnp.ndarray
    next_block: jnp.ndarray


def fixed_spatial_init(cfg: FixedSpatialConfig) -> FixedSpatialState:
    mask = jnp.concatenate(
        [jnp.ones((cfg.num_samples, cfg.block_size)),
         jnp.zeros((cfg.num_samples, cfg.encoding_dim - cfg.block_size))], 1)
    return FixedSpatialState(
        mask=mask,
        in_progress=jnp.ones((cfg.num_samples,), bool),
        log_buffer=jnp.ones((cfg.buffer_size, cfg.num_samples), bool),
        iteration=jnp.zeros((), jnp.int32),
        cur_block=jnp.asarray(cfg.block_size, jnp.int32),
        next_block=jnp.asarray(2 * cfg.block_size, jnp.int32),
    )


def _blur_1d2d(cfg: FixedSpatialConfig, v: jnp.ndarray) -> jnp.ndarray:
    """3-tap box blur over the fixed sample grid, replicate padding
    (blur_loss / get_base_mask, :167-186, :255-272). v: (num_samples, ...)."""
    if cfg.domain_dim == 1:
        pad = jnp.concatenate([v[:1], v, v[-1:]], 0)
        return (pad[:-2] + pad[1:-1] + pad[2:]) / 3.0
    if cfg.domain_dim == 2:
        side = int(math.isqrt(cfg.num_samples))
        g = v.reshape(side, side, *v.shape[1:])
        for ax in (0, 1):
            padder = [(0, 0)] * g.ndim
            padder[ax] = (1, 1)
            p = jnp.pad(g, padder, mode="edge")
            g = (lax_slice_axis(p, ax, 0, side)
                 + lax_slice_axis(p, ax, 1, side)
                 + lax_slice_axis(p, ax, 2, side)) / 3.0
        return g.reshape(v.shape)
    return v


def fixed_spatial_mask(cfg: FixedSpatialConfig,
                       state: FixedSpatialState) -> jnp.ndarray:
    """Blurred per-sample mask for the full fixed grid (__call__ :349-365)."""
    return _blur_1d2d(cfg, state.mask)


def fixed_spatial_update(cfg: FixedSpatialConfig, state: FixedSpatialState,
                         sample_loss: jnp.ndarray) -> FixedSpatialState:
    """stash_iteration (:197-205) + update_mask (:207-221), pure.
    sample_loss: (num_samples,) per-grid-point loss."""
    blurred = _blur_1d2d(cfg, sample_loss)
    slot = state.iteration % cfg.buffer_size
    log_buffer = state.log_buffer.at[slot].set(blurred > cfg.epsilon)
    # a sample leaves progress when no recent iteration exceeded epsilon
    in_progress = state.in_progress & log_buffer.any(axis=0)
    it = state.iteration + 1

    idx = jnp.arange(cfg.encoding_dim)[None, :]
    in_window = (idx >= state.cur_block) & (idx < state.next_block)
    boundary = (it % cfg.block_iterations) == 0
    alpha = jnp.minimum(
        1.0, 2.0 * (it % cfg.block_iterations) / cfg.block_iterations
    ).astype(state.mask.dtype)
    active = in_progress[:, None] & in_window
    frozen = (it > cfg.progress_iterations) | ~in_progress.any()

    mask_ramp = jnp.where(active, jnp.maximum(state.mask, alpha), state.mask)
    mask_block = jnp.where(active, 1.0, state.mask)
    nb = state.next_block + cfg.block_size
    nb = jnp.where(cfg.encoding_dim - nb < cfg.block_size,
                   cfg.encoding_dim, nb)

    mask = jnp.where(frozen, state.mask,
                     jnp.where(boundary, mask_block, mask_ramp))
    cur = jnp.where(frozen | ~boundary, state.cur_block, state.next_block)
    nxt = jnp.where(frozen | ~boundary, state.next_block, nb)

    return FixedSpatialState(mask=mask, in_progress=in_progress,
                             log_buffer=log_buffer, iteration=it,
                             cur_block=cur.astype(jnp.int32),
                             next_block=nxt.astype(jnp.int32))
