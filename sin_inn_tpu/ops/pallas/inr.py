"""Fused Pallas TPU kernel for the encoded coordinate-MLP (INR) train path.

Reimplements the hot path of the reference flow INR
(/root/reference/video-interpolation/model.py:95-99 — encode -> mask ->
MLP) as ONE forward kernel and ONE hand-derived backward kernel. In the
const-mask modes (no controller / linear controllers) the PRIMAL runs as
plain XLA instead (``_xla_forward`` — measured faster than the fwd
kernel, 7.9 vs 11.0 ms at Sintel scale) while the backward keeps the
recompute-in-VMEM kernel; the fwd kernel remains the primal for the
spatial slab/point mask modes, whose masks must never materialize.

Why a kernel at all: the XLA INR forward is near MXU-bound (6.6 ms at
Sintel scale, CLAUDE.md), but the *backward* pays ~3x the forward —
autodiff stashes the (N, E) encoding plus every (N, H) hidden activation
to HBM between the forward and backward passes (~3.4 GB at N = 1.34M,
E = 512, H = 256, i.e. ~8 ms of pure stash write+read traffic at Sintel
scale). Three structural facts remove that entirely:

  1. The coordinate grid is a CONSTANT (the dense pose grid,
     trainer.py:37-45) — no input gradient is ever needed.
  2. The progressive mask is ``stop_gradient``'d by the controller
     contract — no mask gradient either.
  3. The default encodings (gaussian/uniform Fourier features, RBF) have
     NO trainable parameters (model.py:252-260,343-366).

So the backward needs exactly the WEIGHT gradients, and each point tile
can recompute its encoding + activations in VMEM from the tiny (TN, d)
coordinate slab (recompute = one extra forward's FLOPs on the MXU,
~2.5x cheaper than the HBM stash it replaces — and it overlaps the
grid's DMA anyway). The kernels:

  * grid = 1-D over point tiles of TN rows; weights/masks/encoding
    constants ride constant-index-map VMEM blocks (fetched once);
  * encoding built in VMEM: RBF as the matmul distance form
    |x|^2 + |c|^2 - 2 x.c (ops/encodings.py:127-136) with the K=d
    contraction in f32; Fourier features as phase = 2*pi*x @ F with
    sin||cos in BLOCKED layout — the wrapper permutes W1's rows (and the
    mask) from the reference's interleaved [sin f0, cos f0, ...] layout
    so the kernel never does a lane interleave;
  * MLP matmuls run with bf16 operands + f32 accumulation (matching the
    TPU's default f32-as-bf16-pass semantics; ``precise=True`` keeps f32
    operands for parity tests);
  * the backward recomputes the forward chain, then accumulates
    dW_l += a_l^T g_l and db_l += sum(g_l) into revisited VMEM blocks
    across the sequential TPU grid (zero-initialized at program 0), with
    the transposed matmuls expressed as dot_general contractions so every
    operand stays tile-aligned.

Spatial-controller (per-point) masks run in **slab mode**: with one tile
per image row (tn = W) the kernel streams the t/y-contracted
(res, E) row slab of the blurred cell grid and rebuilds the per-point
mask in VMEM with one (W, res) x (res, E) matmul against the constant
x-axis hat weights (controllers.SpatialSlabMask) — the (n, E) mask never
exists in HBM. Measured at Sintel scale (PFF bf16 spatial step):
143.3 -> 116.8 ms (25.7 f/s). The naive alternative — materializing the
mask and streaming it per tile ('point' mode, kept for forced-'on'
non-row-aligned widths) — measured SLOWER than XLA end-to-end (169.6 vs
142.4 ms): the kernel wins 37 vs 75 ms on fwd+grad, but turning the mask
into a custom-call operand costs ~65 ms of production+materialization
that XLA avoids by fusing the mask einsum into its consumer.

Excluded (falls back to the XLA path, models/inr.py): trainable-encoding
models (RFF/PRFF), ``float32_highest`` parity runs, and non-128-multiple
encoding/hidden widths.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

try:  # Pallas is TPU/Mosaic-only; CPU tests run in interpret mode
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

_TN = 1024   # points per grid step (N=1.34M @ Sintel -> 1308 steps)


def fused_inr_available() -> bool:
    if not _HAS_PALLAS:
        return False
    return jax.default_backend() not in ("cpu",)


def _mm(a, b, precise):
    """Matmul with bf16 operands + f32 accumulation (TPU default-precision
    semantics) unless ``precise``."""
    if not precise:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dg(a, b, dims, precise):
    if not precise:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _encode(kind, xt, enc_refs, mev, precise):
    """TRANSPOSED (R, TN) coord slab -> masked (TN, E) code in VMEM.

    The coords ride as (d, N) (plus an |x|^2 row for RBF): an (N, d) f32
    array is lane-padded d->128 by the TPU's tiled HBM layout, so reading
    it costs 685 MB at Sintel scale vs 21 MB transposed (sublane-padded
    d+1->8). The RBF distance then needs no in-kernel transpose: with
    ct = [-2 c^T; 1] the augmented contraction gives |x|^2 - 2 x.c in one
    dot_general over the row axis.

    The ENCODING contraction always runs with f32 operands, regardless of
    ``precise``: XLA lowers the K=d x@c contraction to f32 VPU fma (no
    MXU), while a bf16 operand cast quantizes the coordinates to ~8-bit
    mantissa — coarser than the pose-grid pixel spacing at Sintel widths
    (2/1023 vs bf16's 1/128 near |x|=1), so adjacent pixels collide BEFORE
    the nonlinearity and training diverges (RBF EPE 106 vs 0.41 at 300
    iters, measured). K = d+1 <= 4, so the multi-pass f32 Mosaic matmul
    costs nothing. The MLP matmuls keep bf16 operands (= XLA's default
    f32-as-one-bf16-pass semantics); ``precise`` keeps those f32 too for
    parity tests."""
    if kind == "rbf":
        ct_ref, cc_ref = enc_refs            # ct: (d+1, E) = [-2 c^T; 1]
        cc = cc_ref[...]                     # (2, E): |c|^2 row, sigma^2 row
        d2 = _dg(xt, ct_ref[...], ((0,), (0,)), True) + cc[0:1, :]
        code = jnp.exp(-jnp.maximum(d2, 0.0) * cc[1:2, :])
    else:                                    # 'ff': blocked sin||cos layout
        (f_ref,) = enc_refs                  # (d, F) 2*pi*frequencies
        ph = _dg(xt, f_ref[...], ((0,), (0,)), True)
        code = jnp.concatenate([jnp.sin(ph), jnp.cos(ph)], axis=1)
    return code * mev                        # (1|TN, E) channel mask


def _mask_values(mode, me_ref, mc_ref, wx_ref, precise):
    """Resolve the mask refs into per-tile (mev (1|TN, E), mcv (d, 1|TN))
    f32 VALUES. 'slab' rebuilds the per-point mask in VMEM from the
    t/y-contracted row slab (controllers.SpatialSlabMask): one
    (TN, res) x (res, E) matmul against the constant x-axis hat weights —
    the (n, E) mask never exists in HBM."""
    if mode == "slab":
        wxv = wx_ref[...]                              # (TN, res)
        mev = _mm(wxv, me_ref[0], precise)             # (TN, E) f32
        mcv = _dg(mc_ref[0], wxv, ((0,), (1,)), precise)  # (d, TN)
        return mev, mcv
    mev = me_ref[...].astype(jnp.float32)              # (1|TN, E)
    mcv = mc_ref[...].astype(jnp.float32) if mc_ref is not None else None
    return mev, mcv


def _fwd_kernel(*refs, kind, prog, n_lin, precise, mode):
    n_enc = 2 if kind == "rbf" else 1
    it = iter(refs)
    x_ref = next(it)
    enc_refs = tuple(next(it) for _ in range(n_enc))
    me_ref = next(it)
    mc_ref = next(it) if prog else None
    wc_ref = next(it) if prog else None
    wx_ref = next(it) if mode == "slab" else None
    wb = [(next(it), next(it)) for _ in range(n_lin)]
    out_ref = next(it)

    mev, mcv = _mask_values(mode, me_ref, mc_ref, wx_ref, precise)
    xt = x_ref[...].astype(jnp.float32)      # (R, TN) transposed coords
    h = _encode(kind, xt, enc_refs, mev, precise)
    for l, (w_ref, b_ref) in enumerate(wb):
        z = _mm(h, w_ref[...], precise)
        if l == 0 and prog:
            xm = xt[:mcv.shape[0]] * mcv                 # (d, TN) masked
            z = z + _dg(xm, wc_ref[...], ((0,), (0,)), precise)
        z = z + b_ref[...]
        h = jnp.maximum(z, 0.0) if l < n_lin - 1 else z
    out_ref[...] = h


def _bwd_kernel(*refs, kind, prog, n_lin, precise, mode):
    n_enc = 2 if kind == "rbf" else 1
    it = iter(refs)
    x_ref = next(it)
    enc_refs = tuple(next(it) for _ in range(n_enc))
    me_ref = next(it)
    mc_ref = next(it) if prog else None
    wc_ref = next(it) if prog else None
    wx_ref = next(it) if mode == "slab" else None
    wb = [(next(it), next(it)) for _ in range(n_lin)]
    g_ref = next(it)
    dwc_ref = next(it) if prog else None
    dwb = [(next(it), next(it)) for _ in range(n_lin)]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        if prog:
            dwc_ref[...] = jnp.zeros(dwc_ref.shape, dwc_ref.dtype)
        for dw_ref, db_ref in dwb:
            dw_ref[...] = jnp.zeros(dw_ref.shape, dw_ref.dtype)
            db_ref[...] = jnp.zeros(db_ref.shape, db_ref.dtype)

    # recompute the forward chain in VMEM
    mev, mcv = _mask_values(mode, me_ref, mc_ref, wx_ref, precise)
    xt = x_ref[...].astype(jnp.float32)      # (R, TN) transposed coords
    acts = [_encode(kind, xt, enc_refs, mev, precise)]
    xm = xt[:mcv.shape[0]] * mcv if prog else None
    for l, (w_ref, b_ref) in enumerate(wb[:-1]):
        z = _mm(acts[-1], w_ref[...], precise)
        if l == 0 and prog:
            z = z + _dg(xm, wc_ref[...], ((0,), (0,)), precise)
        acts.append(jnp.maximum(z + b_ref[...], 0.0))

    g = g_ref[...].astype(jnp.float32)       # (TN, O) output cotangent
    for l in range(n_lin - 1, -1, -1):
        dw_ref, db_ref = dwb[l]
        # dW_l = a_l^T g_l : contract over the point rows
        dw_ref[...] += _dg(acts[l], g, ((0,), (0,)), precise)
        db_ref[...] += jnp.sum(g, axis=0, keepdims=True)
        if l == 0:
            if prog:
                dwc_ref[...] += _dg(xm, g, ((1,), (0,)), precise)
        else:
            # g_{l-1} = (g_l W_l^T) * relu'(z_{l-1}); relu output > 0
            # iff pre-activation > 0, so the recomputed act carries the mask
            g = _dg(g, wb[l][0][...], ((1,), (1,)), precise)
            g = g * (acts[l] > 0.0).astype(jnp.float32)


def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)


def _common_specs(kind, prog, d, r, enc_shapes, ws, tn, mode, res=None):
    specs = [pl.BlockSpec((r, tn), lambda i: (0, i),
                          memory_space=pltpu.VMEM)]
    specs += [_const_spec(s) for s in enc_shapes]
    e_enc = ws[0][0].shape[0]
    if mode == "slab":                  # (B*H, res, E-d) per-row slab
        specs.append(pl.BlockSpec((1, res, e_enc), lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM))
    elif mode == "point":               # spatial controller: (n, E) mask
        specs.append(pl.BlockSpec((tn, e_enc), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM))
    else:
        specs.append(_const_spec((1, e_enc)))              # mask_enc
    if prog:
        if mode == "slab":              # (B*H, res, d) coord slab
            specs.append(pl.BlockSpec((1, res, d), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM))
        elif mode == "point":           # transposed (d, n) coord mask
            specs.append(pl.BlockSpec((d, tn), lambda i: (0, i),
                                      memory_space=pltpu.VMEM))
        else:
            specs.append(_const_spec((d, 1)))              # mask_coord
        specs.append(_const_spec((d, ws[0][0].shape[1])))  # W1_coord
    if mode == "slab":
        specs.append(_const_spec((tn, res)))               # x hat weights
    for w, b in ws:
        specs.append(_const_spec(w.shape))
        specs.append(_const_spec((1, b.shape[0])))
    return specs


def _pad_rows(a, tn):
    n = a.shape[0]
    nt = -(-n // tn)
    return jnp.pad(a, ((0, nt * tn - n), (0, 0))), nt


def _prep_x(kind, x, tn):
    """(N, d) -> zero-padded transposed (R, NT*TN) slab; RBF appends the
    |x|^2 row for the augmented distance contraction."""
    n = x.shape[0]
    nt = -(-n // tn)
    xt = x.astype(jnp.float32).T
    if kind == "rbf":
        xt = jnp.concatenate([xt, jnp.sum(xt * xt, axis=0, keepdims=True)],
                             axis=0)
    return jnp.pad(xt, ((0, 0), (0, nt * tn - n))), nt


def _mask_mode(me, n):
    if me.ndim == 3:
        return "slab"
    if me.ndim == 2 and me.shape[0] == n:
        return "point"
    return "const"


def _mask_args(mode, prog, me, mc, tn, n, nt):
    """Shared mask-operand assembly for the fwd/bwd pallas calls."""
    args = []
    if mode == "slab":
        if n != nt * tn or me.shape[0] * tn != n:
            raise ValueError("slab mask requires n == rows * tn (tn = W)")
        args.append(me)
    elif mode == "point":
        args.append(_pad_rows(me, tn)[0])
    else:
        args.append(me.reshape(1, -1))
    if prog:
        if mode == "slab":
            args.append(mc)
        elif mode == "point":
            args.append(jnp.pad(mc, ((0, 0), (0, nt * tn - n))))
        else:
            args.append(mc.reshape(-1, 1))
    return args


def _xla_forward(kind, prog, precise, enc_ops, ws, wc, x, me, mc):
    """Plain-XLA forward on the kernel's prepared operands — the PRIMAL
    of the const-mask fused path. MEASURED faster than the fwd kernel at
    Sintel scale (7.9 vs 11.0 ms fwd, B=3; fwd+grad 26.4 -> ~23 ms): XLA
    fuses encode+mask+MLP as well as the kernel does, without the
    kernel's lane-padded K=d+1 encode contraction or per-tile grid
    overhead — while the BACKWARD keeps the recompute-in-VMEM kernel
    (the actual win: no activation stash). The slab/point spatial-mask
    modes keep the kernel forward: their masks must never materialize
    (the measured ~65 ms operand-materialization trap, module
    docstring). Same contracts as ``_fwd_kernel``: the encode
    contraction stays f32 (bf16 coords quantize below the pose-grid
    pixel spacing and diverge — see ``_encode``), the MLP matmuls cast
    per ``precise``, FF columns ride the BLOCKED sin||cos layout that
    the wrapper's W1 row permutation expects."""
    x = x.astype(jnp.float32)
    if kind == "rbf":
        ct, cc = enc_ops                     # (d+1, E) aug centres, (2, E)
        aug = jnp.concatenate(
            [x, jnp.sum(x * x, axis=1, keepdims=True)], axis=1)
        d2 = jnp.dot(aug, ct, preferred_element_type=jnp.float32) + cc[0:1]
        code = jnp.exp(-jnp.maximum(d2, 0.0) * cc[1:2])
    else:
        (f,) = enc_ops                       # (d, F) 2*pi*frequencies
        ph = jnp.dot(x, f, preferred_element_type=jnp.float32)
        code = jnp.concatenate([jnp.sin(ph), jnp.cos(ph)], axis=1)
    h = code * me.reshape(1, -1).astype(jnp.float32)
    for l, (w, b) in enumerate(ws):
        z = _mm(h, w, precise)
        if l == 0 and prog:
            xm = x * mc.reshape(1, -1).astype(jnp.float32)
            z = z + _mm(xm, wc, precise)
        z = z + b.reshape(1, -1)
        h = jnp.maximum(z, 0.0) if l < len(ws) - 1 else z
    return h


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _fused_fwd_call(kind, prog, precise, tn, interpret,
                    enc_ops, ws, wc, x, me, mc, wx):
    n, d = x.shape
    out_ch = ws[-1][1].shape[0]
    mode = _mask_mode(me, n)
    if mode == "const":
        return _xla_forward(kind, prog, precise, enc_ops, ws, wc, x, me, mc)
    x_pad, nt = _prep_x(kind, x, tn)
    args = [x_pad, *enc_ops]
    args += _mask_args(mode, prog, me, mc, tn, n, nt)
    if prog:
        args.append(wc)
    if mode == "slab":
        args.append(wx)
    for w, b in ws:
        args += [w, b.reshape(1, -1)]
    kern = functools.partial(_fwd_kernel, kind=kind, prog=prog,
                             n_lin=len(ws), precise=precise, mode=mode)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((nt * tn, out_ch), jnp.float32),
        grid=(nt,),
        in_specs=_common_specs(kind, prog, d, x_pad.shape[0],
                               [e.shape for e in enc_ops], ws, tn,
                               mode, res=me.shape[1] if mode == "slab"
                               else None),
        out_specs=pl.BlockSpec((tn, out_ch), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)
    return out[:n]


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _fused_bwd_call(kind, prog, precise, tn, interpret,
                    enc_ops, ws, wc, x, me, mc, wx, g):
    n, d = x.shape
    x_pad, nt = _prep_x(kind, x, tn)
    g_pad, _ = _pad_rows(g.astype(jnp.float32), tn)
    mode = _mask_mode(me, n)
    args = [x_pad, *enc_ops]
    args += _mask_args(mode, prog, me, mc, tn, n, nt)
    if prog:
        args.append(wc)
    if mode == "slab":
        args.append(wx)
    for w, b in ws:
        args += [w, b.reshape(1, -1)]
    args.append(g_pad)
    in_specs = _common_specs(kind, prog, d, x_pad.shape[0],
                             [e.shape for e in enc_ops], ws, tn, mode,
                             res=me.shape[1] if mode == "slab" else None)
    in_specs.append(pl.BlockSpec((tn, g.shape[1]), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM))
    out_shapes = []
    out_specs = []
    if prog:
        out_shapes.append(jax.ShapeDtypeStruct(wc.shape, jnp.float32))
        out_specs.append(_const_spec(wc.shape))
    for w, b in ws:
        out_shapes.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
        out_specs.append(_const_spec(w.shape))
        out_shapes.append(jax.ShapeDtypeStruct((1, b.shape[0]), jnp.float32))
        out_specs.append(_const_spec((1, b.shape[0])))
    kern = functools.partial(_bwd_kernel, kind=kind, prog=prog,
                             n_lin=len(ws), precise=precise, mode=mode)
    outs = pl.pallas_call(
        kern,
        out_shape=tuple(out_shapes),
        grid=(nt,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        interpret=interpret,
    )(*args)
    outs = list(outs)
    dwc = outs.pop(0) if prog else None
    dws = [(outs[2 * i], outs[2 * i + 1].reshape(-1))
           for i in range(len(ws))]
    return dws, dwc


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def fused_encoded_mlp(kind: str, prog: bool, precise: bool, tn: int,
                      interpret: bool, enc_ops: Tuple[jnp.ndarray, ...],
                      ws: Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...],
                      wc: Optional[jnp.ndarray], x: jnp.ndarray,
                      me: jnp.ndarray, mc: Optional[jnp.ndarray],
                      wx: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Fused encode->mask->MLP forward.

    kind: 'rbf' | 'ff'. enc_ops: rbf -> (centres^T (d,E), [|c|^2; sigma^2]
    (2,E)); ff -> (2*pi*frequencies (d,F),) with the BLOCKED sin||cos
    column convention (wrapper permutes). ws: ((W,b), ...) linear layers
    with W1 covering only the encoding rows; wc/mc: coord-row weight slab
    and coord mask for progressive models (None otherwise). x: (N, d)
    points; me: (E,) channel mask (ones when unmasked), (N, E-d)
    per-point mask stream, or (rows, res, E-d) row slabs with wx the
    (W=tn, res) constant x-axis hat weights (slab mode — see
    :func:`_mask_values`; wx is None otherwise).

    Backward returns gradients for ws/wc ONLY (x, masks and encoding
    constants are structurally gradient-free in the flow step — see
    module docstring); their cotangents are symbolic zeros.
    """
    return _fused_fwd_call(kind, prog, precise, tn, interpret,
                           enc_ops, ws, wc, x, me, mc, wx)


def _fused_vjp_fwd(kind, prog, precise, tn, interpret,
                   enc_ops, ws, wc, x, me, mc, wx=None):
    out = _fused_fwd_call(kind, prog, precise, tn, interpret,
                          enc_ops, ws, wc, x, me, mc, wx)
    return out, (enc_ops, ws, wc, x, me, mc, wx)


def _fused_vjp_bwd(kind, prog, precise, tn, interpret, res, g):
    enc_ops, ws, wc, x, me, mc, wx = res
    dws, dwc = _fused_bwd_call(kind, prog, precise, tn, interpret,
                               enc_ops, ws, wc, x, me, mc, wx, g)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, (enc_ops, x, me, mc, wx))
    dws = tuple((dw.astype(w.dtype), db.astype(b.dtype))
                for (dw, db), (w, b) in zip(dws, ws))
    if wc is not None:
        dwc = dwc.astype(wc.dtype)
    return (zeros[0], dws, dwc, zeros[1], zeros[2], zeros[3], zeros[4])


fused_encoded_mlp.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)


# ---------------------------------------------------------------------------
# INR-level adapter (called from models.inr.inr_apply)
# ---------------------------------------------------------------------------

_FF_ENCODINGS = ("gaussian_ff", "uniform_ff")


def fused_inr_supported(spec, params, consts, x,
                        mask: Optional[jnp.ndarray]) -> bool:
    """Static eligibility check — see module docstring for the exclusions."""
    if spec.kind != "encoded":
        return False
    if spec.encoding not in _FF_ENCODINGS + ("rbf",):
        return False
    if spec.compute_dtype in ("highest", "float32_highest"):
        return False
    if params.get("enc"):                    # trainable encodings: XLA path
        return False
    if x.ndim != 2:
        return False
    if isinstance(mask, tuple) and len(mask) == 3:
        # row-slab spatial mask (controllers.SpatialSlabMask): requires
        # row-aligned tiles (tn = W) with a lane-clean width
        if not spec.is_progressive:
            return False
        enc, coord, wx = mask
        if enc.ndim != 3 or coord.ndim != 3 or wx.ndim != 2:
            return False
        if wx.shape[0] % 128 != 0:
            return False
        if enc.shape[0] * wx.shape[0] != x.shape[0]:
            return False
    elif isinstance(mask, tuple):
        # pre-split per-point mask (mc (d, n), me (n, E-d)) from
        # controllers.spatial_grid_mask_split, me already in the kernel's
        # blocked channel order
        if not spec.is_progressive:
            return False
        mc, me = mask
        if mc.ndim != 2 or me.ndim != 2 or me.shape[0] != x.shape[0]:
            return False
    elif mask is not None and mask.ndim != 1:
        return False                          # unsplit per-point mask
    enc_ch = spec.encoding_dim - (spec.domain_dim if spec.is_progressive
                                  else 0)
    if enc_ch % 128 != 0 or spec.hidden_dim % 128 != 0:
        return False
    return True


def fused_inr_eligible(spec, params, consts, x,
                       mask: Optional[jnp.ndarray]) -> bool:
    """The ONE gate combining the ``use_pallas`` knob with the static
    support check. Both altitudes that decide the fused path — the mask
    FORMAT choice in ``train.flow.flow_forward`` and the kernel dispatch in
    ``models.inr.inr_apply`` — must call this (directly or via
    :func:`fused_spatial_mask_format`) so they cannot drift apart: a
    divergence makes flow_forward build a factored mask that inr_apply
    then reassembles into the dense (n, E) form the slab path exists to
    avoid — a silent per-step perf cliff, not an error."""
    if spec.use_pallas == "on":
        return fused_inr_supported(spec, params, consts, x, mask)
    return (spec.use_pallas == "auto" and fused_inr_available()
            and fused_inr_supported(spec, params, consts, x, mask))


def fused_spatial_mask_format(spec, params, consts, x, w: int) -> str:
    """Which spatial-mask format ``flow_forward`` should emit for the dense
    pose grid: ``'slabs'`` (row-aligned fused path, the fast one),
    ``'split'`` (forced-pallas fallback on non-row-aligned widths) or
    ``'dense'`` (XLA path). Single source of truth for the format/dispatch
    agreement — see :func:`fused_inr_eligible`."""
    if fused_inr_eligible(spec, params, consts, x, None):
        if w % 128 == 0:
            return "slabs"
        if spec.use_pallas == "on":
            return "split"
    return "dense"


def _ff_perm(nf: int):
    """interleaved [sin f0, cos f0, ...] row index for each blocked
    [sin...| cos...] position."""
    import numpy as np
    return np.concatenate([np.arange(nf) * 2, np.arange(nf) * 2 + 1])


def inr_mask_perm(spec):
    """Column permutation a pre-split per-point mask's encoding half must
    carry for :func:`fused_inr_apply` (None = natural order). Pass to
    ``controllers.spatial_grid_mask_split(enc_perm=...)`` so it is applied
    at the cell grid, where it is free."""
    if spec.encoding in _FF_ENCODINGS:
        enc_ch = spec.encoding_dim - (spec.domain_dim
                                      if spec.is_progressive else 0)
        return _ff_perm(enc_ch // 2)
    return None


def fused_inr_apply(spec, params, consts, x,
                    mask: Optional[jnp.ndarray],
                    precise: bool = False, tn: int = _TN,
                    interpret: bool = False) -> jnp.ndarray:
    """Run an eligible INR through the fused kernel (caller must have
    checked :func:`fused_inr_supported`)."""
    d = spec.domain_dim
    prog = spec.is_progressive
    mlp = params["mlp"]
    enc = consts["enc"]

    if spec.encoding == "rbf":
        kind = "rbf"
        c = enc["centres"].astype(jnp.float32)                # (E, d)
        sig = enc["sigma"].astype(jnp.float32)
        cc = jnp.stack([jnp.sum(c * c, axis=1), sig * sig])   # (2, E)
        ct_aug = jnp.concatenate([-2.0 * c.T,
                                  jnp.ones((1, c.shape[0]))], axis=0)
        enc_ops = (ct_aug, cc)
        perm = None
    else:
        kind = "ff"
        freqs = consts["enc"]["frequencies"].astype(jnp.float32)  # (d, F)
        nf = freqs.shape[1]
        perm = _ff_perm(nf)
        enc_ops = (freqs * (2.0 * jnp.pi),)

    w1 = mlp[0]["w"].astype(jnp.float32)
    pre_split = isinstance(mask, tuple)   # split or slab: channel order
    slab = pre_split and len(mask) == 3   # already blocked-permuted
    wx = None
    if prog:
        wc = w1[:d]
        w1e = w1[d:]
        if mask is None:
            me = jnp.ones((w1e.shape[0],), jnp.float32)
            mc = jnp.ones((d,), jnp.float32)
        elif slab:
            me, mc, wx = mask             # (rows,res,E-d),(rows,res,d),(W,res)
            tn = wx.shape[0]              # one kernel tile per image row
        elif pre_split:
            mc, me = mask
        else:
            mc = mask[:d].astype(jnp.float32)
            me = mask[d:].astype(jnp.float32)
    else:
        wc = None
        mc = None
        w1e = w1
        me = (jnp.ones((w1e.shape[0],), jnp.float32) if mask is None
              else mask.astype(jnp.float32))
    if perm is not None:
        w1e = w1e[perm]
        if not pre_split:
            me = me[perm]

    ws = tuple([(w1e, mlp[0]["b"].astype(jnp.float32))]
               + [(l["w"].astype(jnp.float32), l["b"].astype(jnp.float32))
                  for l in mlp[1:]])
    out = fused_encoded_mlp(kind, prog, precise, tn, interpret,
                            enc_ops, ws, wc, x.astype(jnp.float32), me, mc,
                            wx)
    return out.astype(x.dtype)
