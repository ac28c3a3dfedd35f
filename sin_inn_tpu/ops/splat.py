"""Forward (softmax) splatting — bilinear scatter-add with gradients.

TPU-native replacement for the reference's runtime-compiled CUDA kernels
(/root/reference/video-interpolation/my_utils/softsplat.py:8-177: three raw
kernels — updateOutput scatter with atomicAdd, updateGradInput, updateGradFlow
— JIT-built through CuPy at :234-236 and wrapped in an autograd Function at
:239-332).

Here the forward is a single ``jnp.zeros(...).at[...].add(...)`` scatter-add,
which XLA lowers to a deterministic sorted scatter on TPU — unlike CUDA
``atomicAdd``, summation order is reproducible run-to-run (the determinism
story SURVEY §5 asks for). Gradients come from JAX autodiff of the scatter:
the VJP of scatter-add w.r.t. values is exactly the 4-tap gather the
reference's ``updateGradInput`` kernel hand-implements, and the flow gradient
(product rule through the bilinear weights) matches ``updateGradFlow``. A
Pallas fast path lives in ``sin_inn_tpu.ops.pallas.splat``.

Modes reproduce ``FunctionSoftsplat`` (softsplat.py:334-359):
  summation | average | linear | softmax.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def splat_scatter(values: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Bilinear scatter-add of ``values`` along ``flow``.

    values: (N, H, W, C); flow: (N, H, W, 2) pixel displacements (dx, dy).
    Returns (N, H, W, C). Out-of-range taps are dropped (matching the CUDA
    kernel's bounds checks, softsplat.py:33-50).
    """
    n, h, w, c = values.shape
    dtype = values.dtype

    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=dtype),
                          jnp.arange(w, dtype=dtype), indexing="ij")
    ox = xs[None] + flow[..., 0]                     # (N, H, W)
    oy = ys[None] + flow[..., 1]

    x0 = jnp.floor(ox)
    y0 = jnp.floor(oy)

    out = jnp.zeros((n, h, w, c), dtype)
    batch_idx = jnp.broadcast_to(jnp.arange(n)[:, None, None], (n, h, w))

    for dx, dy in ((0, 0), (1, 0), (0, 1), (1, 1)):
        xi = x0 + dx
        yi = y0 + dy
        wgt = (1.0 - jnp.abs(ox - xi)) * (1.0 - jnp.abs(oy - yi))
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        wgt = jnp.where(valid, wgt, 0.0)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        out = out.at[batch_idx, yi_c, xi_c].add(
            values * wgt[..., None], mode="drop")
    return out


def softsplat(inp: jnp.ndarray, flow: jnp.ndarray,
              metric: Optional[jnp.ndarray], mode: str = "softmax"
              ) -> jnp.ndarray:
    """FunctionSoftsplat equivalent (softsplat.py:334-359), NHWC.

    inp: (N, H, W, C); flow: (N, H, W, 2); metric: (N, H, W, 1) or None.
    """
    if mode not in ("summation", "average", "linear", "softmax"):
        raise ValueError(mode)
    if mode == "summation":
        return splat_scatter(inp, flow)

    if mode == "average":
        ones = jnp.ones(inp.shape[:3] + (1,), inp.dtype)
        cat = jnp.concatenate([inp, ones], axis=-1)
    elif mode == "linear":
        cat = jnp.concatenate([inp * metric, metric], axis=-1)
    else:  # softmax
        e = jnp.exp(metric)
        cat = jnp.concatenate([inp * e, e], axis=-1)

    out = splat_scatter(cat, flow)
    num, den = out[..., :-1], out[..., -1:]
    # softsplat.py:352-357: normalize where the denominator is nonzero
    return jnp.where(den != 0.0, num / jnp.where(den == 0.0, 1.0, den), 0.0)


def softsplat_with_coverage(inp: jnp.ndarray, flow: jnp.ndarray,
                            metric: jnp.ndarray):
    """Softmax splat + plain coverage map in ONE scatter.

    The flow train step needs both the softmax-splatted frame and the Wang
    range map (splat of ones) along the SAME flow (trainer.py:51-68): the
    scatter indices/weights are identical, and the scatter's index sort is
    the dominant cost on TPU — so both payloads ride one scatter-add.
    Returns (softmax_out (N,H,W,C), coverage (N,H,W,1)).
    """
    e = jnp.exp(metric)
    ones = jnp.ones(inp.shape[:3] + (1,), inp.dtype)
    cat = jnp.concatenate([inp * e, e, ones], axis=-1)
    out = splat_scatter(cat, flow)
    num = out[..., :-2]
    den = out[..., -2:-1]
    coverage = out[..., -1:]
    soft = jnp.where(den != 0.0, num / jnp.where(den == 0.0, 1.0, den), 0.0)
    return soft, jax.lax.stop_gradient(coverage)
