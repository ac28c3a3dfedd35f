"""SR training losses: reconstruction, MMD, latent NLL.

Equivalents of /root/reference/loss.py. Differences by design:
  * device-agnostic (the reference hardcodes ``.to('cuda')``, loss.py:27-29 —
    a quirk documented in SURVEY.md, not replicated);
  * NHWC layout;
  * the MMD gram matrices are batched matmuls that XLA maps straight onto the
    MXU (batch x batch x (chw) contraction).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

# Inverse-multiquadratic kernel sets (reference loss.py:10-13): forward-pass
# MMD uses wide kernels, reverse-pass uses narrow ones.
MMD_KERNELS_FWD: Tuple[Tuple[float, float], ...] = ((0.2, 2), (1.5, 2), (3.0, 2))
MMD_KERNELS_REV: Tuple[Tuple[float, float], ...] = ((0.2, 0.1), (0.2, 0.5), (0.2, 2))


def reconstruction(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """MSE (reference loss.py:3-5; Charbonnier variant intentionally absent)."""
    return jnp.mean((x - y) ** 2)


def mmd(x: jnp.ndarray, y: jnp.ndarray, rev: bool = False) -> jnp.ndarray:
    """Inverse-multiquadratic maximum mean discrepancy over flattened samples.

    Reference loss.py:9-36. ``x``/``y`` are (N, ...) batches; all trailing
    dims are flattened.
    """
    kernels = MMD_KERNELS_REV if rev else MMD_KERNELS_FWD
    n = x.shape[0]
    xf = x.reshape(n, -1)
    yf = y.reshape(n, -1)

    xx = xf @ xf.T
    yy = yf @ yf.T
    xy = xf @ yf.T

    rx = jnp.broadcast_to(jnp.diag(xx)[None, :], xx.shape)
    ry = jnp.broadcast_to(jnp.diag(yy)[None, :], yy.shape)

    dxx = jnp.clip(rx.T + rx - 2.0 * xx, 0.0, None)
    dyy = jnp.clip(ry.T + ry - 2.0 * yy, 0.0, None)
    dxy = jnp.clip(rx.T + ry - 2.0 * xy, 0.0, None)

    XX = jnp.zeros_like(xx)
    YY = jnp.zeros_like(xx)
    XY = jnp.zeros_like(xx)
    for Ck, a in kernels:
        XX = XX + Ck ** a * ((Ck + dxx) / a) ** -a
        YY = YY + Ck ** a * ((Ck + dyy) / a) ** -a
        XY = XY + Ck ** a * ((Ck + dxy) / a) ** -a

    return jnp.mean(XX + YY - 2.0 * XY)


def latent_nll(z: jnp.ndarray) -> jnp.ndarray:
    """Gaussian latent negative log-likelihood surrogate: mean(z^2) (loss.py:38-39)."""
    return jnp.mean(z ** 2)


def psnr(x: jnp.ndarray, y: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    mse = jnp.mean((x - y) ** 2)
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))
