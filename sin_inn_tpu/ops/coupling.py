"""Invertible coupling transforms (pure-XLA reference implementations).

Two coupling families, matching the reference architectures:

* GLOW affine coupling with FrEIA-style soft clamping, as instantiated by the
  SRFlow graph (/root/reference/archs.py:52-68 via ``Fm.GLOWCouplingBlock``
  with ``clamp=1.2``). Scale activation: ``e(s) = exp(clamp * 2/pi * atan(s /
  clamp))``, bounding log-scales to (-clamp, clamp) smoothly.

* ``InvBlockExp`` additive+affine coupling (/root/reference/archs.py:135-160):
  ``y1 = x1 + F(x2)``; ``s = clamp * (2*sigmoid(H(y1)) - 1)``;
  ``y2 = x2 * exp(s) + G(y1)``.

Both are expressed over NHWC tensors with channel splits on the last axis.
XLA fuses the elementwise affine math into the subnet convolutions' epilogues;
a fused Pallas fast path for the full coupling lives in
``sin_inn_tpu.ops.pallas.coupling`` (same math, validated against these).
"""

from __future__ import annotations

import math
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

Subnet = Callable[[Dict, jnp.ndarray], jnp.ndarray]

_TWO_OVER_PI = 2.0 / math.pi


def glow_log_e(s: jnp.ndarray, clamp: float) -> jnp.ndarray:
    """Soft-clamped log-scale: ``clamp * (2/pi) * atan(s / clamp)``."""
    return clamp * _TWO_OVER_PI * jnp.arctan(s / clamp)


def glow_coupling_forward(params: Dict, x: jnp.ndarray, subnet: Subnet,
                          clamp: float, len1: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """GLOW coupling forward. Returns (y, log_det per-sample).

    ``params`` holds two subnets: ``s2`` maps x2 -> 2*len1 (scale+shift for
    x1) and ``s1`` maps y1 -> 2*len2 (scale+shift for x2). ``len1`` is the
    static channel split (kept out of the params pytree so jit does not trace
    it).
    """
    x1, x2 = x[..., :len1], x[..., len1:]
    len2 = x.shape[-1] - len1

    r2 = subnet(params["s2"], x2)
    s2, t2 = r2[..., :len1], r2[..., len1:]
    log_e2 = glow_log_e(s2, clamp)
    y1 = jnp.exp(log_e2) * x1 + t2

    r1 = subnet(params["s1"], y1)
    s1, t1 = r1[..., :len2], r1[..., len2:]
    log_e1 = glow_log_e(s1, clamp)
    y2 = jnp.exp(log_e1) * x2 + t1

    log_det = (jnp.sum(log_e2, axis=(1, 2, 3)) + jnp.sum(log_e1, axis=(1, 2, 3)))
    return jnp.concatenate([y1, y2], axis=-1), log_det


def glow_coupling_inverse(params: Dict, y: jnp.ndarray, subnet: Subnet,
                          clamp: float, len1: int) -> jnp.ndarray:
    return glow_coupling_inverse_ld(params, y, subnet, clamp, len1)[0]


def glow_coupling_inverse_ld(params: Dict, y: jnp.ndarray, subnet: Subnet,
                             clamp: float, len1: int
                             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inverse + its per-sample log|det J| (= -forward log-det)."""
    y1, y2 = y[..., :len1], y[..., len1:]
    len2 = y.shape[-1] - len1

    r1 = subnet(params["s1"], y1)
    s1, t1 = r1[..., :len2], r1[..., len2:]
    log_e1 = glow_log_e(s1, clamp)
    x2 = (y2 - t1) * jnp.exp(-log_e1)

    r2 = subnet(params["s2"], x2)
    s2, t2 = r2[..., :len1], r2[..., len1:]
    log_e2 = glow_log_e(s2, clamp)
    x1 = (y1 - t2) * jnp.exp(-log_e2)

    log_det = -(jnp.sum(log_e1, axis=(1, 2, 3))
                + jnp.sum(log_e2, axis=(1, 2, 3)))
    return jnp.concatenate([x1, x2], axis=-1), log_det


def inv_block_forward(params: Dict, x: jnp.ndarray, subnet: Subnet,
                      clamp: float, len1: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """InvBlockExp forward (reference archs.py:148-154). Returns (y, log_det)."""
    x1, x2 = x[..., :len1], x[..., len1:]

    y1 = x1 + subnet(params["F"], x2)
    s = clamp * (jax.nn.sigmoid(subnet(params["H"], y1)) * 2.0 - 1.0)
    y2 = x2 * jnp.exp(s) + subnet(params["G"], y1)

    log_det = jnp.sum(s, axis=(1, 2, 3))
    return jnp.concatenate([y1, y2], axis=-1), log_det


def inv_block_inverse(params: Dict, y: jnp.ndarray, subnet: Subnet,
                      clamp: float, len1: int) -> jnp.ndarray:
    """InvBlockExp inverse (reference archs.py:155-158)."""
    return inv_block_inverse_ld(params, y, subnet, clamp, len1)[0]


def inv_block_inverse_ld(params: Dict, y: jnp.ndarray, subnet: Subnet,
                         clamp: float, len1: int
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """InvBlockExp inverse + per-sample log|det J| (= -forward log-det)."""
    y1, y2 = y[..., :len1], y[..., len1:]

    s = clamp * (jax.nn.sigmoid(subnet(params["H"], y1)) * 2.0 - 1.0)
    x2 = (y2 - subnet(params["G"], y1)) * jnp.exp(-s)
    x1 = y1 - subnet(params["F"], x2)

    return (jnp.concatenate([x1, x2], axis=-1),
            -jnp.sum(s, axis=(1, 2, 3)))
