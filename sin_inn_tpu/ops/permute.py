"""Seeded random channel permutation with exact inverse.

Equivalent of FrEIA's ``PermuteRandom`` as used by the reference SRFlow graph
(/root/reference/archs.py:65-68, seeded with the coupling index ``kk``).
Permutations are fixed at model-build time (host-side numpy RNG), applied as a
static ``take`` along the channel axis — free for XLA to fuse into adjacent
ops; no gather kernel is materialized for a static permutation.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def make_permutation(channels: int, seed: int) -> np.ndarray:
    """Deterministic permutation of ``channels`` indices from ``seed``."""
    return np.random.RandomState(seed).permutation(channels)


def invert_permutation(perm: np.ndarray) -> np.ndarray:
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size)
    return inv


def permute_channels(x: jnp.ndarray, perm: np.ndarray) -> jnp.ndarray:
    """Apply a static channel permutation on the last (channel) axis."""
    return jnp.take(x, jnp.asarray(perm), axis=-1)
