"""Occlusion estimation: Wang range-map, Brox fwd-bwd consistency, unity.

Equivalents of /root/reference/video-interpolation/my_utils/occlusions.py.
The Wang range map is a bilinear scatter of coverage weights — it shares the
deterministic scatter-add machinery of :mod:`sin_inn_tpu.ops.splat` (the
reference used ``scatter_add_`` at occlusions.py:78).
"""

from __future__ import annotations

import jax.numpy as jnp

from sin_inn_tpu.ops.splat import splat_scatter
from sin_inn_tpu.ops.warp import resample2d


def occlusion_wang(flow12: jnp.ndarray, flow21: jnp.ndarray,
                   thresh: float) -> jnp.ndarray:
    """Range-map occlusion (occlusions.py:29-104): splat ones along flow21;
    pixels whose coverage <= thresh are occluded. Returns float mask
    (N, H, W, 1), 1 = visible.

    Matches ``get_corresponding_map``: bilinear weights scattered to the 4
    neighbors, out-of-range taps dropped. ``flow12`` participates only via
    the API (the reference signature keeps it for symmetry).
    """
    del flow12
    n, h, w, _ = flow21.shape
    ones = jnp.ones((n, h, w, 1), flow21.dtype)
    corr = splat_scatter(ones, flow21)
    return (corr > thresh).astype(flow21.dtype)


def occlusion_brox(flow_fw: jnp.ndarray, flow_bw: jnp.ndarray,
                   thresh: float = None) -> jnp.ndarray:
    """Forward-backward consistency (occlusions.py:112-118).

    Returns the reference's raw boolean map as float: True where
    |fw + bw o fw|^2 >= 0.01 (|fw|^2 + |bw o fw|^2) + 0.5. (The reference
    multiplies this mask in directly — trainer.py:51-64 — so we reproduce the
    same polarity; ``thresh`` is unused, kept for signature parity.)
    """
    del thresh
    warped_bw = resample2d(flow_bw, flow_fw)
    sq_sum = jnp.sum((flow_fw + warped_bw) ** 2, axis=-1, keepdims=True)
    sum_sq = jnp.sum(flow_fw ** 2 + warped_bw ** 2, axis=-1, keepdims=True)
    return (sq_sum >= 0.01 * sum_sq + 0.5).astype(flow_fw.dtype)


def occlusion_unity(flow: jnp.ndarray, *args) -> jnp.ndarray:
    """All-visible placeholder (occlusions.py:107-109)."""
    return jnp.ones(flow.shape[:3] + (1,), flow.dtype)


OCCLUSIONS = {"wang": occlusion_wang, "brox": occlusion_brox,
              "unity": occlusion_unity, None: None}
