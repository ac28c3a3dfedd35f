"""Coordinate encoding zoo for implicit neural representations.

Functional equivalents of /root/reference/video-interpolation/model.py:
  * GaussianRandomFourierFeatures (model.py:252-260)
  * RotatedFourierFeatures + Gaussian magnitudes (model.py:263-307) —
    directions are *trainable*, magnitudes fixed
  * UniformFourierFeatures (model.py:309-318)
  * PositionalEncoding (model.py:321-340)
  * RadialBasisEncoding (model.py:343-366)
  * RadialBasisGridEncoding, random/uniform (model.py:369-415)
  * PieceWiseEncoding, gaussian/uniform (model.py:628-678)
  * PolynomialEncoding (model.py:174-221)

Each encoding is (init, apply): ``init`` returns (params, consts) pytrees —
``params`` holds trainable leaves (only RotatedFourierFeatures has any),
``consts`` holds fixed buffers. ``apply`` maps (..., d) coords to (..., E)
features. Frequencies are sorted low->high at init so progressive masking
unlocks coarse-to-fine (the property the controllers rely on).

All feature maps are matmul + elementwise — MXU work under jit; on TPU a
(t*h*w, d) x (d, F) matmul followed by sin/cos fuses into one kernel.

Note: the reference's PositionalEncoding.forward reshape
(model.py:332) is shape-inconsistent for general batch sizes (research-code
bug, SURVEY §"quirks"); we implement the intended (n, 2*F*d) [cos||sin]
layout.
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

EPSILON = 1e-4  # reference model.py:8


def _l2_normalize(v: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    return v / jnp.maximum(jnp.linalg.norm(v, axis=axis, keepdims=True), 1e-12)


def _interleave_sin_cos(phase: jnp.ndarray) -> jnp.ndarray:
    """stack((sin, cos), dim=2).view(n, 2F): [sin_f0, cos_f0, sin_f1, ...]."""
    out = jnp.stack([jnp.sin(phase), jnp.cos(phase)], axis=-1)
    return out.reshape(*phase.shape[:-1], phase.shape[-1] * 2)


# --------------------------------------------------------------------------
# Fourier features
# --------------------------------------------------------------------------

def gaussian_ff_init(key, domain_dim: int, num_frequencies: int, std: float):
    """model.py:252-260: magnitudes ~ N(0, std) sorted by |.|, random dirs."""
    k1, k2 = jax.random.split(key)
    mag = jax.random.normal(k1, (num_frequencies,)) * std
    mag = mag[jnp.argsort(jnp.abs(mag))]
    dirs = jax.random.normal(k2, (domain_dim, num_frequencies))
    freqs = _l2_normalize(dirs, axis=0) * mag[None, :]
    return {}, {"frequencies": freqs}


def uniform_ff_init(key, domain_dim: int, num_frequencies: int, std: float):
    """model.py:309-318."""
    s = std / math.sqrt(3.0)
    mag = jnp.linspace(-s, s, num_frequencies) + EPSILON
    mag = mag[jnp.argsort(jnp.abs(mag))]
    dirs = jax.random.normal(key, (domain_dim, num_frequencies))
    freqs = _l2_normalize(dirs, axis=0) * mag[None, :]
    return {}, {"frequencies": freqs}


def ff_apply(params: Dict, consts: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """model.py:230-237: phase = 2*pi*x @ F; interleaved sin/cos."""
    phase = (x * (2.0 * math.pi)) @ consts["frequencies"]
    return _interleave_sin_cos(phase)


def rotated_ff_init(key, domain_dim: int, num_frequencies: int, std: float):
    """model.py:263-307: trainable directions, fixed gaussian magnitudes."""
    k1, k2 = jax.random.split(key)
    mag = jax.random.normal(k1, (num_frequencies,)) * std
    mag = mag[jnp.argsort(jnp.abs(mag))]
    dirs = _l2_normalize(jax.random.normal(k2, (domain_dim, num_frequencies)), 0)
    return {"frequencies": dirs}, {"magnitudes": mag}


def rotated_ff_apply(params: Dict, consts: Dict, x: jnp.ndarray) -> jnp.ndarray:
    freqs = _l2_normalize(params["frequencies"], 0) * consts["magnitudes"][None, :]
    phase = (x * (2.0 * math.pi)) @ freqs
    return _interleave_sin_cos(phase)


# --------------------------------------------------------------------------
# NeRF-style positional encoding
# --------------------------------------------------------------------------

def positional_init(key, domain_dim: int, num_frequencies: int):
    del key
    freqs = jnp.asarray([2.0 ** i * math.pi for i in range(num_frequencies)])
    return {}, {"freqs": freqs}


def positional_apply(params: Dict, consts: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """(n, d) -> (n, 2*F*d) as [cos(f x d block) || sin(f x d block)]."""
    phase = consts["freqs"][None, :, None] * x[..., None, :]   # (n, F, d)
    n = phase.shape[:-2]
    flat = phase.reshape(*n, -1)
    return jnp.concatenate([jnp.cos(flat), jnp.sin(flat)], axis=-1)


# --------------------------------------------------------------------------
# Radial basis encodings
# --------------------------------------------------------------------------

def rbf_init(key, domain_dim: int, num_frequencies: int, std: float):
    """model.py:343-366 (note: the reference doubles num_frequencies)."""
    nf = num_frequencies * 2
    k1, k2 = jax.random.split(key)
    centres = jax.random.uniform(k1, (nf, domain_dim)) * 2.0 - 1.0
    sigma = jnp.abs(jax.random.normal(k2, (nf,))) * std + 1.0
    sigma = jnp.sort(sigma)
    return {}, {"centres": centres, "sigma": sigma}


def rbf_apply(params: Dict, consts: Dict, x: jnp.ndarray) -> jnp.ndarray:
    # |x - c|^2 = |x|^2 + |c|^2 - 2 x.c — the matmul form keeps the (N, F)
    # contraction on the MXU instead of materializing an (N, F, d) broadcast
    # (at Sintel scale that broadcast is ~25 GB).
    c = consts["centres"]
    d2 = (jnp.sum(x ** 2, -1, keepdims=True)
          + jnp.sum(c ** 2, -1)[None, :]
          - 2.0 * (x @ c.T))
    d2 = jnp.maximum(d2, 0.0)
    return jnp.exp(-d2 * consts["sigma"][None, :] ** 2)


def rbf_grid_random_init(key, domain_dim: int, num_frequencies: int, std: float):
    """RandomRadialBasisGridEncoding (model.py:404-407)."""
    k1, k2 = jax.random.split(key)
    sigma = jnp.abs(jax.random.normal(k1, (num_frequencies,))) * std + 1.0
    offsets = (jax.random.uniform(k2, (num_frequencies, domain_dim)) * 2 - 1
               ) % (2.0 / sigma[:, None])
    return {}, {"offsets": offsets, "sigma": jnp.sort(sigma)}


def rbf_grid_uniform_init(key, domain_dim: int, num_frequencies: int, std: float):
    """UniformRadialBasisGridEncoding (model.py:410-415)."""
    freqs = jnp.linspace(0.0, std * math.sqrt(3.0), num_frequencies)
    freqs = freqs + freqs[1] / 2.0
    offsets = (jax.random.uniform(key, (num_frequencies, domain_dim)) * 2 - 1
               ) % (2.0 / freqs[:, None])
    return {}, {"offsets": offsets, "sigma": jnp.sort(freqs)}


def rbf_grid_apply(params: Dict, consts: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """model.py:375-387: periodic RBF bumps, two phase-shifted copies."""
    sigma = consts["sigma"]
    x_a = x[..., None, :] + consts["offsets"][None, :, :]      # (n, F, d)
    x_b = x_a + 1.0 / sigma[None, :, None]
    out = jnp.stack([x_a, x_b], axis=-2)                       # (n, F, 2, d)
    period = 2.0 / sigma[None, :, None, None]
    out = (out % period) * 2.0 - period
    out = jnp.sum(out ** 2, axis=-1)                           # (n, F, 2)
    out = out * sigma[None, :, None] ** 2
    out = out.reshape(*x.shape[:-1], -1)
    return jnp.exp(-out) * 2.0 - 1.0


# --------------------------------------------------------------------------
# Piecewise (triangle-wave) encodings
# --------------------------------------------------------------------------

def piecewise_gaussian_init(key, domain_dim: int, num_frequencies: int, std: float):
    """GaussianRandomPieceWiseEncoding (model.py:660-667)."""
    freqs = jnp.abs(jax.random.normal(key, (domain_dim, num_frequencies))
                    * std / (2.0 * math.pi))
    order = jnp.argsort(jnp.linalg.norm(freqs, axis=0))
    return {}, {"frequencies": freqs[:, order]}


def piecewise_uniform_init(key, domain_dim: int, num_frequencies: int, std: float):
    """UniformPieceWiseEncoding (model.py:670-678)."""
    b = std * math.sqrt(12.0) / (2.0 * math.pi)
    mag = jnp.linspace(0.0, b, num_frequencies)
    mag = mag + mag[1] / 2.0
    dirs = jnp.abs(jax.random.normal(key, (domain_dim, num_frequencies)))
    freqs = _l2_normalize(dirs, 0) * mag[None, :]
    return {}, {"frequencies": freqs}


def piecewise_apply(params: Dict, consts: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """model.py:634-646: triangle wave of (x+1) @ F at two phases."""
    out = (x + 1.0) @ consts["frequencies"]                     # (n, F)
    out = jnp.stack([out, out + 1.0], axis=-1)                  # (n, F, 2)
    out = out.reshape(*out.shape[:-2], -1)                      # interleaved
    out = jnp.fmod(out, 2.0) - 1.0
    return jnp.where(out < 0, 2.0 * out + 1.0, 1.0 - 2.0 * out)


# --------------------------------------------------------------------------
# Polynomial encoding
# --------------------------------------------------------------------------

def polynomial_kernel(domain_dim: int, power: int) -> List[Tuple[int, ...]]:
    """Multi-index set of monomials up to ``power`` (model.py:194-208)."""
    last_added = kernel = {(i,) for i in range(domain_dim)}
    for _ in range(power - 1):
        added = set()
        for item in last_added:
            for i in range(domain_dim):
                added.add(tuple(sorted(list(item) + [i])))
        kernel = kernel | added
        last_added = added
    out = sorted(kernel, key=len)
    return out[domain_dim:]          # drop the raw linear terms


def polynomial_init(key, domain_dim: int, power: int):
    del key
    return {}, {"kernel": tuple(polynomial_kernel(domain_dim, power))}


def polynomial_apply(params: Dict, consts: Dict, x: jnp.ndarray) -> jnp.ndarray:
    cols = []
    for multipliers in consts["kernel"]:
        v = jnp.ones(x.shape[:-1], x.dtype)
        for i in multipliers:
            v = v * x[..., i]
        cols.append(v)
    return jnp.stack(cols, axis=-1)


# --------------------------------------------------------------------------
# Registry
# --------------------------------------------------------------------------

def encoding_output_channels(kind: str, num_frequencies: int,
                             domain_dim: int) -> int:
    if kind in ("gaussian_ff", "uniform_ff", "rotated_ff", "rbf",
                "rbf_grid_random", "rbf_grid_uniform",
                "piecewise_gaussian", "piecewise_uniform"):
        return 2 * num_frequencies
    if kind == "positional":
        return 2 * num_frequencies * domain_dim
    raise ValueError(kind)


ENCODINGS = {
    "gaussian_ff": (gaussian_ff_init, ff_apply),
    "uniform_ff": (uniform_ff_init, ff_apply),
    "rotated_ff": (rotated_ff_init, rotated_ff_apply),
    "positional": (positional_init, positional_apply),
    "rbf": (rbf_init, rbf_apply),
    "rbf_grid_random": (rbf_grid_random_init, rbf_grid_apply),
    "rbf_grid_uniform": (rbf_grid_uniform_init, rbf_grid_apply),
    "piecewise_gaussian": (piecewise_gaussian_init, piecewise_apply),
    "piecewise_uniform": (piecewise_uniform_init, piecewise_apply),
}
