"""Transformation-consistency regularization (TCR) augmentation.

Equivalent of /root/reference/tcr.py:14-45: a random rotation (+-angle deg)
plus translation (+-trans px, divided by ``scale`` for LR-resolution inputs),
applied as one affine warp. The three uniform random numbers per sample are
passed in (threaded from the step's RNG key) exactly as the reference passes
its ``torch.rand(b, 3)``, so LR and HR get the *same* transform.

Unlike the reference (kornia on GPU), the warp is pure XLA and differentiable;
``stop_grad=True`` reproduces the reference's no-gradient-through-warp
behavior (tcr.py uses kornia inside the loss graph but the reference TODO at
lit_wrapper.py:61 documents the intent of a gradient-free transform).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sin_inn_tpu.ops.warp import rotation_matrix_2d, warp_affine


def tcr_transform(img: jnp.ndarray, random: jnp.ndarray, angle: float,
                  trans: float, scale: float = 1.0,
                  stop_grad: bool = False) -> jnp.ndarray:
    """Apply the TCR affine transform.

    img: (N, H, W, C); random: (N, 3) uniforms in [0, 1);
    angle: max rotation in degrees; trans: max translation in pixels;
    scale: translation divisor (1/scale of the SR factor for LR inputs,
    reference lit_wrapper.py:68 calls with ``scale=1/opt.scale``);
    stop_grad: when True, block gradient flow through the warped branch —
    the reference's transform is gradient-free (the TODO at
    lit_wrapper.py:61 records that intent), so parity runs set this.
    """
    n, h, w, _ = img.shape
    dtype = img.dtype
    center = jnp.broadcast_to(
        jnp.array([w / 2.0, h / 2.0], dtype=dtype)[None, :], (n, 2))
    ang = (2.0 * angle) * random[:, 0] - angle              # tcr.py:33
    zoom = jnp.ones((n,), dtype=dtype)
    mat = rotation_matrix_2d(center, ang, zoom)
    tx = ((2.0 * trans) * random[:, 1] - trans) / scale     # tcr.py:38
    ty = ((2.0 * trans) * random[:, 2] - trans) / scale
    mat = mat.at[:, 0, 2].add(tx)
    mat = mat.at[:, 1, 2].add(ty)
    out = warp_affine(img, mat)
    return jax.lax.stop_gradient(out) if stop_grad else out
