"""Persistent XLA compilation cache.

On the axon-relayed TPU a fresh process pays ~60-70 s to compile the flagship
train step (remote compile service); with the persistent cache enabled the
same program loads in ~7 s. Enabled by every entry point (train loops, bench,
CLI); override the location with SININN_COMPILE_CACHE, disable with
SININN_COMPILE_CACHE=0.
"""

from __future__ import annotations

import os

_enabled = False


def enable(cache_dir: str | None = None) -> bool:
    """Idempotently enable the persistent compilation cache."""
    global _enabled
    if _enabled:
        return True
    env = os.environ.get("SININN_COMPILE_CACHE")
    if env == "0":
        return False
    # CPU-only runs (tests, the driver's virtual-device dryrun) skip the
    # persistent cache: XLA:CPU entries are AOT-compiled against the HOST
    # machine's features, so a cache shared across machines can SIGILL on
    # load ("Machine type used for XLA:CPU compilation doesn't match..."),
    # and CPU compiles don't pay the TPU relay's 60-70 s anyway.
    if (os.environ.get("JAX_PLATFORMS", "") == "cpu"
            or "xla_force_host_platform_device_count"
            in os.environ.get("XLA_FLAGS", "")):
        return False
    try:
        import jax

        if jax.config.jax_platforms == "cpu":
            return False
    except Exception:
        pass
    cache_dir = cache_dir or env or os.path.join(
        os.path.expanduser("~"), ".cache", "sin_inn_tpu", "xla")
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _enabled = True
        return True
    except Exception:
        return False
