"""Haar wavelet squeeze with exact inverse, NHWC layout.

TPU-native re-design of the reference's grouped-conv HaarDownsampling
(/root/reference/archs.py:162-199). On GPU the reference realizes the 2x2 Haar
transform as a stride-2 grouped convolution plus a transpose-conv inverse; on
TPU that wastes the MXU on a rank-4 kernel. Here the transform is a reshape +
explicit +-adds on the VPU. Explicit adds (instead of a 4x4 matmul) matter for
exactness: TPU matmuls run at bf16-pass precision by default, while float32
adds are exact — and the Haar butterfly is pure +-1 arithmetic, so
``inverse(forward(x)) == x`` holds to float32 rounding on every backend.

Channel ordering matches the reference's reshape/transpose trick
(archs.py:188-190): output channels are component-major, i.e.
``[LL * C, LH * C, HL * C, HH * C]`` where LL is the 2x2 average.

Forward normalization is 1/4 (archs.py:187); the inverse applies the adjoint
without extra scaling (archs.py:199), so ``inverse(forward(x)) == x`` exactly
in float arithmetic up to rounding.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Haar filters over the 2x2 block [a, b; c, d]:
#   h0 = average, h1 = horizontal detail, h2 = vertical detail, h3 = diagonal.
# Signs mirror the reference's weight construction (archs.py:167-176):
#   h0 = a+b+c+d, h1 = a-b+c-d, h2 = a+b-c-d, h3 = a-b-c+d, all / 4.


def haar_squeeze(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) -> (N, H/2, W/2, 4C), component-major channel order."""
    n, h, w, c = x.shape
    if h % 2 or w % 2:
        raise ValueError(f"spatial dims must be even, got {(h, w)}")
    blk = x.reshape(n, h // 2, 2, w // 2, 2, c)
    a = blk[:, :, 0, :, 0]
    b = blk[:, :, 0, :, 1]
    cc = blk[:, :, 1, :, 0]
    d = blk[:, :, 1, :, 1]
    ll = (a + b + cc + d) * 0.25
    lh = (a - b + cc - d) * 0.25
    hl = (a + b - cc - d) * 0.25
    hh = (a - b - cc + d) * 0.25
    # component-major: channel index = k * C + c
    return jnp.concatenate([ll, lh, hl, hh], axis=-1)


def haar_unsqueeze(y: jnp.ndarray) -> jnp.ndarray:
    """Exact inverse of :func:`haar_squeeze`: (N, H, W, 4C) -> (N, 2H, 2W, C)."""
    n, h, w, c4 = y.shape
    if c4 % 4:
        raise ValueError(f"channel dim must be divisible by 4, got {c4}")
    c = c4 // 4
    ll = y[..., 0 * c:1 * c]
    lh = y[..., 1 * c:2 * c]
    hl = y[..., 2 * c:3 * c]
    hh = y[..., 3 * c:4 * c]
    # adjoint of the (1/4-scaled) orthogonal transform: x = H^T y
    a = ll + lh + hl + hh
    b = ll - lh + hl - hh
    cc = ll + lh - hl - hh
    d = ll - lh - hl + hh
    blk = jnp.stack([jnp.stack([a, b], axis=3), jnp.stack([cc, d], axis=3)],
                    axis=3)                                # (N,H,W,2,2,C)
    blk = blk.reshape(n, h, w, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return blk.reshape(n, 2 * h, 2 * w, c)


def haar_log_det(h: int, w: int, c: int) -> float:
    """Per-sample forward log|det J| (reference archs.py:184-185)."""
    elements = h * w * c
    return elements / 4.0 * float(np.log(1.0 / 16.0))
