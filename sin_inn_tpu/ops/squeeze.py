"""i-RevNet style space-to-depth squeeze with exact inverse, NHWC layout.

Equivalent of FrEIA's ``IRevNetDownsampling`` used by the reference SRFlow
graph (/root/reference/archs.py:28-38). The exact intra-block channel ordering
of FrEIA is an internal permutation choice; since every squeeze in the SRF
graph is followed by GLOW couplings + seeded random channel permutations, any
fixed bijective ordering yields the same model family. We use component-major
ordering (all channels of block-position (0,0), then (0,1), (1,0), (1,1)) to
stay consistent with :mod:`sin_inn_tpu.ops.haar`. The choice is documented
here and locked by tests.
"""

from __future__ import annotations

import jax.numpy as jnp


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) -> (N, H/2, W/2, 4C), volume-preserving bijection."""
    n, h, w, c = x.shape
    if h % 2 or w % 2:
        raise ValueError(f"spatial dims must be even, got {(h, w)}")
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    # component-major: out channel = (2*dy + dx) * C + c
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // 2, w // 2, 4 * c)


def depth_to_space(y: jnp.ndarray) -> jnp.ndarray:
    """Exact inverse of :func:`space_to_depth`."""
    n, h, w, c4 = y.shape
    if c4 % 4:
        raise ValueError(f"channel dim must be divisible by 4, got {c4}")
    c = c4 // 4
    y = y.reshape(n, h, w, 2, 2, c)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(n, 2 * h, 2 * w, c)
