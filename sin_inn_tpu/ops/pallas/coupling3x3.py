"""Fused Pallas TPU kernel for GLOW couplings with 3x3-conv subnets.

Companion to :mod:`sin_inn_tpu.ops.pallas.coupling` (the 1x1 case): the SRF
graph alternates 3x3 and 1x1 subnets (/root/reference/archs.py:54-59). At the
flagship shapes one batch item's activations fit VMEM comfortably
(45x80x192 f32 = 2.8 MB; subnet weights ~2.7 MB), so the kernel processes one
image per grid step with every intermediate VMEM-resident.

The 3x3 SAME conv is realized as 9 shifted matmuls over a zero-padded VMEM
buffer: acc += x_pad[dy:dy+H, dx:dx+W] @ W[dy, dx] — each a (H*W, Cin) x
(Cin, Cout) MXU contraction; no im2col materialization, no HBM traffic
between the two convs, the ReLU, or the affine coupling math.

Backward integrates via custom_vjp with XLA-recomputed gradients (same remat
trade as jax.checkpoint); a hand-derived fused backward (as done for the 1x1
case) is a future step.

Status: correctness-validated (interpret-mode tests) but NOT wired into the
model. At the flagship 8x45x80x192 shape both the whole-coupling and the
half-coupling layouts exceed the 16 MB VMEM scoped limit (Mosaic's stack
allocator keeps every live intermediate resident; ~51 MB / ~18 MB resp.);
enabling them requires row-band tiling with 2-px halos via manual HBM->VMEM
DMA, or bf16 in-kernel activations. Profiling also shows XLA's native 3x3
coupling path is already fast (~1.2 ms/coupling vs ~1.8 for the unfused
1x1s), so the headroom is small — see CLAUDE.md. The 1x1 kernels
(coupling.py), which DO fit and ship enabled, carry the fused-coupling
north star.
"""

from __future__ import annotations

import functools
import math
from typing import Dict

import jax
import jax.numpy as jnp

from sin_inn_tpu.ops.pallas.coupling import _log_e

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _conv3x3(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
             h: int, wdt: int) -> jnp.ndarray:
    """SAME 3x3 conv on a (H, W, Cin) VMEM tensor via 9 shifted matmuls.

    w: (3, 3, Cin, Cout); returns (H, W, Cout) float32.
    """
    cin = x.shape[-1]
    cout = w.shape[-1]
    xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((h * wdt, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            window = xp[dy:dy + h, dx:dx + wdt].reshape(h * wdt, cin)
            acc = acc + jnp.dot(window, w[dy, dx],
                                preferred_element_type=jnp.float32)
    return acc.reshape(h, wdt, cout) + b


def _coupling3_fwd_kernel(x_ref, w2a_ref, b2a_ref, w2b_ref, b2b_ref,
                          w1a_ref, b1a_ref, w1b_ref, b1b_ref, y_ref,
                          *, len1: int, clamp: float, h: int, w: int):
    x = x_ref[0]                                  # (H, W, C)
    x1 = x[..., :len1]
    x2 = x[..., len1:]
    len2 = x.shape[-1] - len1

    h2 = jnp.maximum(_conv3x3(x2, w2a_ref[:], b2a_ref[:], h, w), 0.0)
    r2 = _conv3x3(h2, w2b_ref[:], b2b_ref[:], h, w)
    s2 = r2[..., :len1]
    t2 = r2[..., len1:]
    y1 = jnp.exp(_log_e(s2, clamp)) * x1 + t2

    h1 = jnp.maximum(_conv3x3(y1, w1a_ref[:], b1a_ref[:], h, w), 0.0)
    r1 = _conv3x3(h1, w1b_ref[:], b1b_ref[:], h, w)
    s1 = r1[..., :len2]
    t1 = r1[..., len2:]
    y2 = jnp.exp(_log_e(s1, clamp)) * x2 + t1

    y_ref[0] = jnp.concatenate([y1, y2], axis=-1)


def _coupling3_inv_kernel(y_ref, w2a_ref, b2a_ref, w2b_ref, b2b_ref,
                          w1a_ref, b1a_ref, w1b_ref, b1b_ref, x_ref,
                          *, len1: int, clamp: float, h: int, w: int):
    y = y_ref[0]
    y1 = y[..., :len1]
    y2 = y[..., len1:]
    len2 = y.shape[-1] - len1

    h1 = jnp.maximum(_conv3x3(y1, w1a_ref[:], b1a_ref[:], h, w), 0.0)
    r1 = _conv3x3(h1, w1b_ref[:], b1b_ref[:], h, w)
    s1 = r1[..., :len2]
    t1 = r1[..., len2:]
    x2 = (y2 - t1) * jnp.exp(-_log_e(s1, clamp))

    h2 = jnp.maximum(_conv3x3(x2, w2a_ref[:], b2a_ref[:], h, w), 0.0)
    r2 = _conv3x3(h2, w2b_ref[:], b2b_ref[:], h, w)
    s2 = r2[..., :len1]
    t2 = r2[..., len1:]
    x1 = (y1 - t2) * jnp.exp(-_log_e(s2, clamp))

    x_ref[0] = jnp.concatenate([x1, x2], axis=-1)


def _prep3(params: Dict):
    s2 = params["s2"]
    s1 = params["s1"]
    return (s2["conv1"]["w"], s2["conv1"]["b"],
            s2["conv2"]["w"], s2["conv2"]["b"],
            s1["conv1"]["w"], s1["conv1"]["b"],
            s1["conv2"]["w"], s1["conv2"]["b"])


def _run3(kernel, x: jnp.ndarray, mats, len1: int, clamp: float,
          interpret: bool) -> jnp.ndarray:
    n, h, w, c = x.shape
    img_spec = pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in mats]
    return pl.pallas_call(
        functools.partial(kernel, len1=len1, clamp=clamp, h=h, w=w),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), x.dtype),
        grid=(n,),
        in_specs=[img_spec] + w_specs,
        out_specs=img_spec,
        interpret=interpret,
    )(x, *mats)


def fused_glow3_forward(params: Dict, x: jnp.ndarray, clamp: float,
                        len1: int, interpret: bool = False) -> jnp.ndarray:
    return _run3(_coupling3_fwd_kernel, x, _prep3(params), len1, clamp,
                 interpret)


def fused_glow3_inverse(params: Dict, y: jnp.ndarray, clamp: float,
                        len1: int, interpret: bool = False) -> jnp.ndarray:
    return _run3(_coupling3_inv_kernel, y, _prep3(params), len1, clamp,
                 interpret)


@functools.lru_cache(maxsize=None)
def make_fused_coupling3(clamp: float, len1: int, interpret: bool = False):
    """(forward, inverse) differentiable ops for the 3x3-subnet coupling.

    Pallas primal; XLA-recompute vjp (jax.checkpoint-style trade).
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
        return fused_glow3_forward(params, x, clamp, len1, interpret)

    def fwd_fwd(params, x):
        return fwd(params, x), (params, x)

    def fwd_bwd(res, g):
        params, x = res
        _, vjp = jax.vjp(xla_fwd, params, x)
        return vjp(g)

    fwd.defvjp(fwd_fwd, fwd_bwd)

    @jax.custom_vjp
    def inv(params, y):
        return fused_glow3_inverse(params, y, clamp, len1, interpret)

    def inv_fwd(params, y):
        return inv(params, y), (params, y)

    def inv_bwd(res, g):
        params, y = res
        _, vjp = jax.vjp(xla_inv, params, y)
        return vjp(g)

    inv.defvjp(inv_fwd, inv_bwd)
    return fwd, inv


# ---------------------------------------------------------------------------
# Half-coupling kernels: one subnet (conv3x3 -> relu -> conv3x3) + affine.
# Two calls make a full coupling; each call's working set fits VMEM at the
# flagship second-octave shape (45x80x192), unlike the whole-coupling kernel
# above. Forward half: y = exp(log_e(s)) * x_aff + t, (s, t) = subnet(x_in).
# Inverse half: x_aff = (y - t) * exp(-log_e(s)).
# ---------------------------------------------------------------------------

def _half_fwd_kernel(xin_ref, xaff_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                     y_ref, *, clamp: float, h: int, w: int, inverse: bool):
    xin = xin_ref[0]
    xaff = xaff_ref[0]
    hmid = jnp.maximum(_conv3x3(xin, w1_ref[:], b1_ref[:], h, w), 0.0)
    r = _conv3x3(hmid, w2_ref[:], b2_ref[:], h, w)
    caff = xaff.shape[-1]
    s = r[..., :caff]
    t = r[..., caff:]
    if inverse:
        y_ref[0] = (xaff - t) * jnp.exp(-_log_e(s, clamp))
    else:
        y_ref[0] = jnp.exp(_log_e(s, clamp)) * xaff + t


def half_coupling_3x3(sub_params: Dict, x_in: jnp.ndarray,
                      x_aff: jnp.ndarray, clamp: float,
                      inverse: bool = False,
                      interpret: bool = False) -> jnp.ndarray:
    """One fused half-coupling: subnet(x_in) -> affine on x_aff (NHWC)."""
    n, h, w, _ = x_in.shape
    mats = (sub_params["conv1"]["w"], sub_params["conv1"]["b"],
            sub_params["conv2"]["w"], sub_params["conv2"]["b"])
    spec_in = pl.BlockSpec((1, h, w, x_in.shape[-1]),
                           lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    spec_aff = pl.BlockSpec((1, h, w, x_aff.shape[-1]),
                            lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in mats]
    return pl.pallas_call(
        functools.partial(_half_fwd_kernel, clamp=clamp, h=h, w=w,
                          inverse=inverse),
        out_shape=jax.ShapeDtypeStruct(x_aff.shape, x_aff.dtype),
        grid=(n,),
        in_specs=[spec_in, spec_aff] + w_specs,
        out_specs=spec_aff,
        interpret=interpret,
    )(x_in, x_aff, *mats)


def glow3_forward_halves(params: Dict, x: jnp.ndarray, clamp: float,
                         len1: int, interpret: bool = False) -> jnp.ndarray:
    """Full 3x3 coupling as two fused half-kernels (VMEM-friendly)."""
    x1 = x[..., :len1]
    x2 = x[..., len1:]
    y1 = half_coupling_3x3(params["s2"], x2, x1, clamp, False, interpret)
    y2 = half_coupling_3x3(params["s1"], y1, x2, clamp, False, interpret)
    return jnp.concatenate([y1, y2], axis=-1)


def glow3_inverse_halves(params: Dict, y: jnp.ndarray, clamp: float,
                         len1: int, interpret: bool = False) -> jnp.ndarray:
    y1 = y[..., :len1]
    y2 = y[..., len1:]
    x2 = half_coupling_3x3(params["s1"], y1, y2, clamp, True, interpret)
    x1 = half_coupling_3x3(params["s2"], x2, y1, clamp, True, interpret)
    return jnp.concatenate([x1, x2], axis=-1)
