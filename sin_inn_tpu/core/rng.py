"""Explicit RNG key threading.

Replaces the reference's global ``torch.manual_seed`` (/root/reference/
main.py:77) with `jax.random` key streams. Every stochastic subsystem takes a
named fold of one root key, so runs are reproducible and streams are
independent regardless of execution order.
"""

from __future__ import annotations

import hashlib

import jax


def root_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def named_fold(key: jax.Array, name: str) -> jax.Array:
    """Fold a stable 32-bit hash of ``name`` into ``key``."""
    h = int.from_bytes(hashlib.blake2s(name.encode(), digest_size=4).digest(), "little")
    return jax.random.fold_in(key, h)


def step_key(key: jax.Array, step) -> jax.Array:
    return jax.random.fold_in(key, step)
