"""Fused Pallas TPU kernel for GLOW couplings with 1x1-conv subnets.

The BASELINE.json north-star asks for the INN's bijective forward/inverse as
fused TPU kernels. For the alternating 1x1-conv couplings of the SRFlow graph
(/root/reference/archs.py:15-17,56-59), the whole coupling is a per-pixel
chain of matmuls + elementwise ops:

    r2 = W2b @ relu(W2a @ x2 + b2a) + b2b          # subnet s2
    y1 = exp(log_e(s2)) * x1 + t2
    r1 = W1b @ relu(W1a @ y1 + b1a) + b1b          # subnet s1
    y2 = exp(log_e(s1)) * x2 + t1

Unfused, XLA round-trips every intermediate (h2, r2, y1, h1, r1 — each up to
(M, 256)) through HBM; the fused kernel holds one row-tile of activations and
ALL subnet weights in VMEM, so HBM traffic is exactly one read of x and one
write of y. The inverse kernel is the mirrored chain, so forward and inverse
stay exact inverses (identical subnet evaluations in both directions).

Training integrates via jax.custom_vjp: the backward pass re-runs the fused
forward math in XLA (rematerialization — trading FLOPs for memory exactly as
jax.checkpoint would) and lets XLA differentiate it; the fused kernels serve
the fwd/inv evaluations, which dominate inference and the non-grad passes.

Layout notes: the row-tile M_TILE=256 is a multiple of the 8-sublane f32
tile; channel counts (up to 2*192=384) are padded to 128 lanes by Mosaic
automatically. Weights total < 1 MB — VMEM-resident.
"""

from __future__ import annotations

import functools
import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

try:  # Pallas is TPU/Mosaic-only; the XLA fallback covers CPU tests
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

_M_TILE = 256

# Mosaic has no atan lowering; use the Abramowitz & Stegun 4.4.49 minimax
# polynomial (|err| <= 2e-8 on [0,1], argument-reduced via atan(x) =
# pi/2 - atan(1/x) for |x|>1). Both the forward and inverse kernels use this
# SAME approximation, so the coupling stays exactly invertible; only the
# cross-check against XLA's atan differs at ~1e-7.
_ATAN_COEFFS = (0.9999993329, -0.3332985605, 0.1994653599, -0.1390853351,
                0.0964200441, -0.0559098861, 0.0218612288, -0.0040540580)


def _atan_poly(x: jnp.ndarray) -> jnp.ndarray:
    ax = jnp.abs(x)
    big = ax > 1.0
    t = jnp.where(big, 1.0 / jnp.maximum(ax, 1e-30), ax)
    t2 = t * t
    p = jnp.full_like(t, _ATAN_COEFFS[-1])
    for c in _ATAN_COEFFS[-2::-1]:
        p = p * t2 + c
    r = t * p
    r = jnp.where(big, (math.pi / 2) - r, r)
    return jnp.where(x < 0, -r, r)


def _log_e(s: jnp.ndarray, clamp: float) -> jnp.ndarray:
    return clamp * (2.0 / math.pi) * _atan_poly(s / clamp)


def _subnet_mats(sub: Dict) -> Tuple[jnp.ndarray, ...]:
    """1x1 conv params (1, 1, cin, cout) -> (W (cin, cout), b)."""
    w1 = sub["conv1"]["w"][0, 0]
    b1 = sub["conv1"]["b"]
    w2 = sub["conv2"]["w"][0, 0]
    b2 = sub["conv2"]["b"]
    return w1, b1, w2, b2


def _coupling_fwd_kernel(x_ref, w2a_ref, b2a_ref, w2b_ref, b2b_ref,
                         w1a_ref, b1a_ref, w1b_ref, b1b_ref, y_ref,
                         *, len1: int, clamp: float):
    x = x_ref[:]
    x1 = x[:, :len1]
    x2 = x[:, len1:]
    len2 = x.shape[1] - len1

    h2 = jnp.maximum(
        jnp.dot(x2, w2a_ref[:], preferred_element_type=jnp.float32)
        + b2a_ref[:], 0.0)
    r2 = jnp.dot(h2, w2b_ref[:], preferred_element_type=jnp.float32) \
        + b2b_ref[:]
    s2 = r2[:, :len1]
    t2 = r2[:, len1:]
    y1 = jnp.exp(_log_e(s2, clamp)) * x1 + t2

    h1 = jnp.maximum(
        jnp.dot(y1, w1a_ref[:], preferred_element_type=jnp.float32)
        + b1a_ref[:], 0.0)
    r1 = jnp.dot(h1, w1b_ref[:], preferred_element_type=jnp.float32) \
        + b1b_ref[:]
    s1 = r1[:, :len2]
    t1 = r1[:, len2:]
    y2 = jnp.exp(_log_e(s1, clamp)) * x2 + t1

    y_ref[:] = jnp.concatenate([y1, y2], axis=1).astype(y_ref.dtype)


def _coupling_inv_kernel(y_ref, w2a_ref, b2a_ref, w2b_ref, b2b_ref,
                         w1a_ref, b1a_ref, w1b_ref, b1b_ref, x_ref,
                         *, len1: int, clamp: float):
    y = y_ref[:]
    y1 = y[:, :len1]
    y2 = y[:, len1:]
    len2 = y.shape[1] - len1

    h1 = jnp.maximum(
        jnp.dot(y1, w1a_ref[:], preferred_element_type=jnp.float32)
        + b1a_ref[:], 0.0)
    r1 = jnp.dot(h1, w1b_ref[:], preferred_element_type=jnp.float32) \
        + b1b_ref[:]
    s1 = r1[:, :len2]
    t1 = r1[:, len2:]
    x2 = (y2 - t1) * jnp.exp(-_log_e(s1, clamp))

    h2 = jnp.maximum(
        jnp.dot(x2, w2a_ref[:], preferred_element_type=jnp.float32)
        + b2a_ref[:], 0.0)
    r2 = jnp.dot(h2, w2b_ref[:], preferred_element_type=jnp.float32) \
        + b2b_ref[:]
    s2 = r2[:, :len1]
    t2 = r2[:, len1:]
    x1 = (y1 - t2) * jnp.exp(-_log_e(s2, clamp))

    x_ref[:] = jnp.concatenate([x1, x2], axis=1).astype(x_ref.dtype)


def _run_fused(kernel, x2d: jnp.ndarray, mats, len1: int, clamp: float,
               interpret: bool = False) -> jnp.ndarray:
    m, c = x2d.shape
    m_pad = (m + _M_TILE - 1) // _M_TILE * _M_TILE
    if m_pad != m:
        x2d = jnp.pad(x2d, ((0, m_pad - m), (0, 0)))
    grid = (m_pad // _M_TILE,)
    weight_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in mats]
    out = pl.pallas_call(
        functools.partial(kernel, len1=len1, clamp=clamp),
        out_shape=jax.ShapeDtypeStruct((m_pad, c), x2d.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((_M_TILE, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] + weight_specs,
        out_specs=pl.BlockSpec((_M_TILE, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2d, *mats)
    return out[:m]


def _prep(params: Dict):
    w2a, b2a, w2b, b2b = _subnet_mats(params["s2"])
    w1a, b1a, w1b, b1b = _subnet_mats(params["s1"])
    return (w2a, b2a[None, :], w2b, b2b[None, :],
            w1a, b1a[None, :], w1b, b1b[None, :])


def fused_glow_forward_1x1(params: Dict, x: jnp.ndarray, clamp: float,
                           len1: int, interpret: bool = False) -> jnp.ndarray:
    """Fused forward for a 1x1-subnet GLOW coupling. x: (N, H, W, C)."""
    n, h, w, c = x.shape
    out = _run_fused(_coupling_fwd_kernel, x.reshape(-1, c), _prep(params),
                     len1, clamp, interpret)
    return out.reshape(n, h, w, c)


def fused_glow_inverse_1x1(params: Dict, y: jnp.ndarray, clamp: float,
                           len1: int, interpret: bool = False) -> jnp.ndarray:
    """Fused inverse (exact inverse of the forward kernel)."""
    n, h, w, c = y.shape
    out = _run_fused(_coupling_inv_kernel, y.reshape(-1, c), _prep(params),
                     len1, clamp, interpret)
    return out.reshape(n, h, w, c)


def pallas_available() -> bool:
    if not _HAS_PALLAS:
        return False
    return jax.default_backend() not in ("cpu",)


# ---------------------------------------------------------------------------
# Training integration: fused kernels forward, XLA-rematerialized backward
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def make_fused_coupling(clamp: float, len1: int):
    """(forward, inverse) differentiable ops backed by the fused kernels.

    custom_vjp: the primal runs the Pallas kernel; the backward re-derives
    gradients by differentiating the XLA reference coupling (recompute —
    same trade as jax.checkpoint). The XLA path uses exact atan vs the
    kernel's 2e-8 polynomial: gradient mismatch is O(1e-7), well under the
    matmul rounding noise.
    """
    from sin_inn_tpu.ops import coupling as C
    from sin_inn_tpu.ops import subnet as S

    def xla_fwd(params, x):
        return C.glow_coupling_forward(params, x, S.conv_subnet_apply,
                                       clamp, len1)[0]

    def xla_inv(params, y):
        return C.glow_coupling_inverse(params, y, S.conv_subnet_apply,
                                       clamp, len1)

    @jax.custom_vjp
    def fwd(params, x):
        return fused_glow_forward_1x1(params, x, clamp, len1)

    def fwd_fwd(params, x):
        return fwd(params, x), (params, x)

    def fwd_bwd(res, g):
        params, x = res
        _, vjp = jax.vjp(xla_fwd, params, x)
        return vjp(g)

    fwd.defvjp(fwd_fwd, fwd_bwd)

    @jax.custom_vjp
    def inv(params, y):
        return fused_glow_inverse_1x1(params, y, clamp, len1)

    def inv_fwd(params, y):
        return inv(params, y), (params, y)

    def inv_bwd(res, g):
        params, y = res
        _, vjp = jax.vjp(xla_inv, params, y)
        return vjp(g)

    inv.defvjp(inv_fwd, inv_bwd)
    return fwd, inv


# ---------------------------------------------------------------------------
# Fully fused backward kernel: recompute-in-VMEM + gradient matmuls
# ---------------------------------------------------------------------------

def _le_prime(s: jnp.ndarray, clamp: float) -> jnp.ndarray:
    """d/ds of clamp*(2/pi)*atan(s/clamp) — analytic, exact."""
    return (2.0 / math.pi) / (1.0 + (s / clamp) ** 2)


def _coupling_bwd_kernel(x_ref, g_ref, w2a_ref, b2a_ref, w2b_ref, b2b_ref,
                         w1a_ref, b1a_ref, w1b_ref, b1b_ref,
                         dx_ref, dw2a_ref, db2a_ref, dw2b_ref, db2b_ref,
                         dw1a_ref, db1a_ref, dw1b_ref, db1b_ref,
                         *, len1: int, clamp: float):
    """VJP of the fused forward: one row-tile per grid step.

    Recomputes the forward intermediates in VMEM (residual = x only), then
    runs the reverse chain. Weight/bias grads accumulate across the
    sequential TPU grid into constant-indexed output blocks.
    """
    i = pl.program_id(0)

    x = x_ref[:]
    g = g_ref[:]
    x1 = x[:, :len1]
    x2 = x[:, len1:]
    gy1 = g[:, :len1]
    gy2 = g[:, len1:]

    dot = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)

    # ---- recompute forward ----
    z2 = dot(x2, w2a_ref[:]) + b2a_ref[:]
    h2 = jnp.maximum(z2, 0.0)
    r2 = dot(h2, w2b_ref[:]) + b2b_ref[:]
    s2 = r2[:, :len1]
    t2 = r2[:, len1:]
    e2 = jnp.exp(_log_e(s2, clamp))
    y1 = e2 * x1 + t2

    z1 = dot(y1, w1a_ref[:]) + b1a_ref[:]
    h1 = jnp.maximum(z1, 0.0)
    r1 = dot(h1, w1b_ref[:]) + b1b_ref[:]
    s1 = r1[:, :x2.shape[1]]
    e1 = jnp.exp(_log_e(s1, clamp))

    # ---- backward chain ----
    # y2 = e1 * x2 + t1
    gx2 = gy2 * e1
    gs1 = gy2 * x2 * e1 * _le_prime(s1, clamp)
    gr1 = jnp.concatenate([gs1, gy2], axis=1)          # [gs1 | gt1]
    gh1 = dot(gr1, w1b_ref[:].T)
    gz1 = jnp.where(z1 > 0.0, gh1, 0.0)
    gy1_tot = gy1 + dot(gz1, w1a_ref[:].T)

    # y1 = e2 * x1 + t2
    gx1 = gy1_tot * e2
    gs2 = gy1_tot * x1 * e2 * _le_prime(s2, clamp)
    gr2 = jnp.concatenate([gs2, gy1_tot], axis=1)      # [gs2 | gt2]
    gh2 = dot(gr2, w2b_ref[:].T)
    gz2 = jnp.where(z2 > 0.0, gh2, 0.0)
    gx2 = gx2 + dot(gz2, w2a_ref[:].T)

    dx_ref[:] = jnp.concatenate([gx1, gx2], axis=1).astype(dx_ref.dtype)

    # ---- weight/bias grads (accumulated over the sequential grid) ----
    @pl.when(i == 0)
    def _():
        dw2a_ref[:] = jnp.zeros_like(dw2a_ref)
        db2a_ref[:] = jnp.zeros_like(db2a_ref)
        dw2b_ref[:] = jnp.zeros_like(dw2b_ref)
        db2b_ref[:] = jnp.zeros_like(db2b_ref)
        dw1a_ref[:] = jnp.zeros_like(dw1a_ref)
        db1a_ref[:] = jnp.zeros_like(db1a_ref)
        dw1b_ref[:] = jnp.zeros_like(dw1b_ref)
        db1b_ref[:] = jnp.zeros_like(db1b_ref)

    dw2a_ref[:] += dot(x2.T, gz2)
    db2a_ref[:] += jnp.sum(gz2, axis=0, keepdims=True)
    dw2b_ref[:] += dot(h2.T, gr2)
    db2b_ref[:] += jnp.sum(gr2, axis=0, keepdims=True)
    dw1a_ref[:] += dot(y1.T, gz1)
    db1a_ref[:] += jnp.sum(gz1, axis=0, keepdims=True)
    dw1b_ref[:] += dot(h1.T, gr1)
    db1b_ref[:] += jnp.sum(gr1, axis=0, keepdims=True)


def fused_glow_backward_1x1(params: Dict, x: jnp.ndarray, g: jnp.ndarray,
                            clamp: float, len1: int,
                            interpret: bool = False):
    """Run the fused backward kernel. Returns (dparams, dx)."""
    n, hh, ww, c = x.shape
    m = n * hh * ww
    x2d = x.reshape(-1, c)
    g2d = g.reshape(-1, c)
    m_pad = (m + _M_TILE - 1) // _M_TILE * _M_TILE
    if m_pad != m:
        pad = ((0, m_pad - m), (0, 0))
        x2d = jnp.pad(x2d, pad)
        g2d = jnp.pad(g2d, pad)   # zero grads for padded rows: no dW effect
    mats = _prep(params)
    len2 = c - len1
    hid = mats[0].shape[1]
    grid = (m_pad // _M_TILE,)

    row_spec = pl.BlockSpec((_M_TILE, c), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in mats]
    acc = lambda shape: (jax.ShapeDtypeStruct(shape, jnp.float32),
                         pl.BlockSpec(shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))
    outs = [
        (jax.ShapeDtypeStruct((m_pad, c), x2d.dtype), row_spec),
        acc((len2, hid)), acc((1, hid)),
        acc((hid, 2 * len1)), acc((1, 2 * len1)),
        acc((len1, hid)), acc((1, hid)),
        acc((hid, 2 * len2)), acc((1, 2 * len2)),
    ]
    out_shapes = tuple(o[0] for o in outs)
    out_specs = tuple(o[1] for o in outs)

    res = pl.pallas_call(
        functools.partial(_coupling_bwd_kernel, len1=len1, clamp=clamp),
        out_shape=out_shapes,
        grid=grid,
        in_specs=[row_spec, row_spec] + w_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(x2d, g2d, *mats)

    dx = res[0][:m].reshape(n, hh, ww, c)
    (dw2a, db2a, dw2b, db2b, dw1a, db1a, dw1b, db1b) = res[1:]
    dparams = {
        "s2": {"conv1": {"w": dw2a[None, None], "b": db2a[0]},
               "conv2": {"w": dw2b[None, None], "b": db2b[0]}},
        "s1": {"conv1": {"w": dw1a[None, None], "b": db1a[0]},
               "conv2": {"w": dw1b[None, None], "b": db1b[0]}},
    }
    return dparams, dx


@functools.lru_cache(maxsize=None)
def make_fused_coupling_full(clamp: float, len1: int, interpret: bool = False):
    """Fused forward + fused backward (both Pallas) as one differentiable op.

    Unlike :func:`make_fused_coupling` (XLA-recompute backward), the VJP here
    is the hand-derived backward kernel — residual is just ``x``, and every
    intermediate lives in VMEM on both passes.
    """

    @jax.custom_vjp
    def fwd(params, x):
        return fused_glow_forward_1x1(params, x, clamp, len1, interpret)

    def fwd_fwd(params, x):
        return fwd(params, x), (params, x)

    def fwd_bwd(res, g):
        params, x = res
        return fused_glow_backward_1x1(params, x, g, clamp, len1, interpret)

    fwd.defvjp(fwd_fwd, fwd_bwd)
    return fwd


def _coupling_inv_bwd_kernel(y_ref, g_ref, w2a_ref, b2a_ref, w2b_ref,
                             b2b_ref, w1a_ref, b1a_ref, w1b_ref, b1b_ref,
                             dy_ref, dw2a_ref, db2a_ref, dw2b_ref, db2b_ref,
                             dw1a_ref, db1a_ref, dw1b_ref, db1b_ref,
                             *, len1: int, clamp: float):
    """VJP of the fused inverse: mirrors _coupling_bwd_kernel for
    x = inv(y) (recompute-in-VMEM; weight grads accumulate over the grid)."""
    i = pl.program_id(0)

    y = y_ref[:]
    g = g_ref[:]
    y1 = y[:, :len1]
    y2 = y[:, len1:]
    gx1 = g[:, :len1]
    gx2 = g[:, len1:]

    dot = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)

    # ---- recompute the inverse chain ----
    z1 = dot(y1, w1a_ref[:]) + b1a_ref[:]
    h1 = jnp.maximum(z1, 0.0)
    r1 = dot(h1, w1b_ref[:]) + b1b_ref[:]
    s1 = r1[:, :y2.shape[1]]
    t1 = r1[:, y2.shape[1]:]
    e1inv = jnp.exp(-_log_e(s1, clamp))
    x2 = (y2 - t1) * e1inv

    z2 = dot(x2, w2a_ref[:]) + b2a_ref[:]
    h2 = jnp.maximum(z2, 0.0)
    r2 = dot(h2, w2b_ref[:]) + b2b_ref[:]
    s2 = r2[:, :len1]
    t2 = r2[:, len1:]
    e2inv = jnp.exp(-_log_e(s2, clamp))
    x1 = (y1 - t2) * e2inv

    # ---- backward chain ----
    # x1 = (y1 - t2) * e2inv
    gy1 = gx1 * e2inv
    gs2 = -gx1 * x1 * _le_prime(s2, clamp)
    gt2 = -gx1 * e2inv
    gr2 = jnp.concatenate([gs2, gt2], axis=1)
    gh2 = dot(gr2, w2b_ref[:].T)
    gz2 = jnp.where(z2 > 0.0, gh2, 0.0)
    gx2_tot = gx2 + dot(gz2, w2a_ref[:].T)

    # x2 = (y2 - t1) * e1inv
    gy2 = gx2_tot * e1inv
    gs1 = -gx2_tot * x2 * _le_prime(s1, clamp)
    gt1 = -gx2_tot * e1inv
    gr1 = jnp.concatenate([gs1, gt1], axis=1)
    gh1 = dot(gr1, w1b_ref[:].T)
    gz1 = jnp.where(z1 > 0.0, gh1, 0.0)
    gy1 = gy1 + dot(gz1, w1a_ref[:].T)

    dy_ref[:] = jnp.concatenate([gy1, gy2], axis=1).astype(dy_ref.dtype)

    @pl.when(i == 0)
    def _():
        dw2a_ref[:] = jnp.zeros_like(dw2a_ref)
        db2a_ref[:] = jnp.zeros_like(db2a_ref)
        dw2b_ref[:] = jnp.zeros_like(dw2b_ref)
        db2b_ref[:] = jnp.zeros_like(db2b_ref)
        dw1a_ref[:] = jnp.zeros_like(dw1a_ref)
        db1a_ref[:] = jnp.zeros_like(db1a_ref)
        dw1b_ref[:] = jnp.zeros_like(dw1b_ref)
        db1b_ref[:] = jnp.zeros_like(db1b_ref)

    dw2a_ref[:] += dot(x2.T, gz2)
    db2a_ref[:] += jnp.sum(gz2, axis=0, keepdims=True)
    dw2b_ref[:] += dot(h2.T, gr2)
    db2b_ref[:] += jnp.sum(gr2, axis=0, keepdims=True)
    dw1a_ref[:] += dot(y1.T, gz1)
    db1a_ref[:] += jnp.sum(gz1, axis=0, keepdims=True)
    dw1b_ref[:] += dot(h1.T, gr1)
    db1b_ref[:] += jnp.sum(gr1, axis=0, keepdims=True)


def fused_glow_inverse_backward_1x1(params: Dict, y: jnp.ndarray,
                                    g: jnp.ndarray, clamp: float, len1: int,
                                    interpret: bool = False):
    """Run the fused inverse-direction backward kernel.
    Returns (dparams, dy)."""
    n, hh, ww, c = y.shape
    m = n * hh * ww
    y2d = y.reshape(-1, c)
    g2d = g.reshape(-1, c)
    m_pad = (m + _M_TILE - 1) // _M_TILE * _M_TILE
    if m_pad != m:
        pad = ((0, m_pad - m), (0, 0))
        y2d = jnp.pad(y2d, pad)
        g2d = jnp.pad(g2d, pad)
    mats = _prep(params)
    len2 = c - len1
    hid = mats[0].shape[1]
    grid = (m_pad // _M_TILE,)

    row_spec = pl.BlockSpec((_M_TILE, c), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in mats]
    acc = lambda shape: (jax.ShapeDtypeStruct(shape, jnp.float32),
                         pl.BlockSpec(shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))
    outs = [
        (jax.ShapeDtypeStruct((m_pad, c), y2d.dtype), row_spec),
        acc((len2, hid)), acc((1, hid)),
        acc((hid, 2 * len1)), acc((1, 2 * len1)),
        acc((len1, hid)), acc((1, hid)),
        acc((hid, 2 * len2)), acc((1, 2 * len2)),
    ]
    res = pl.pallas_call(
        functools.partial(_coupling_inv_bwd_kernel, len1=len1, clamp=clamp),
        out_shape=tuple(o[0] for o in outs),
        grid=grid,
        in_specs=[row_spec, row_spec] + w_specs,
        out_specs=tuple(o[1] for o in outs),
        interpret=interpret,
    )(y2d, g2d, *mats)

    dy = res[0][:m].reshape(n, hh, ww, c)
    (dw2a, db2a, dw2b, db2b, dw1a, db1a, dw1b, db1b) = res[1:]
    dparams = {
        "s2": {"conv1": {"w": dw2a[None, None], "b": db2a[0]},
               "conv2": {"w": dw2b[None, None], "b": db2b[0]}},
        "s1": {"conv1": {"w": dw1a[None, None], "b": db1a[0]},
               "conv2": {"w": dw1b[None, None], "b": db1b[0]}},
    }
    return dparams, dy


@functools.lru_cache(maxsize=None)
def make_fused_coupling_full_inv(clamp: float, len1: int,
                                 interpret: bool = False):
    """Fused inverse with the hand-derived fused backward kernel."""

    @jax.custom_vjp
    def inv(params, y):
        return fused_glow_inverse_1x1(params, y, clamp, len1, interpret)

    def inv_fwd(params, y):
        return inv(params, y), (params, y)

    def inv_bwd(res, g):
        params, y = res
        return fused_glow_inverse_backward_1x1(params, y, g, clamp, len1,
                                               interpret)

    inv.defvjp(inv_fwd, inv_bwd)
    return inv
