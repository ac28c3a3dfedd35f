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
    # CPU-only runs (tests, the driver's virtual-device dryrun) get a
    # MACHINE-SCOPED cache subdirectory: XLA:CPU entries are AOT-compiled
    # against the host's CPU features, so a dir shared across machines can
    # SIGILL on load ("Machine type used for XLA:CPU compilation doesn't
    # match..."); keying by the cpuinfo flags keeps same-machine reuse
    # (the full test suite is ~2.5x faster warm) without that risk.
    cpu_backend = (os.environ.get("JAX_PLATFORMS", "") == "cpu"
                   or "xla_force_host_platform_device_count"
                   in os.environ.get("XLA_FLAGS", ""))
    if not cpu_backend:
        try:
            import jax

            cpu_backend = jax.config.jax_platforms == "cpu"
        except Exception:
            pass
    machine_sub = None
    if cpu_backend:
        import hashlib

        try:
            flags = "".join(sorted(
                line for line in open("/proc/cpuinfo")
                if line.startswith(("flags", "Features"))))
        except OSError:
            import platform

            flags = platform.processor() or platform.machine()
        machine_sub = "cpu-" + hashlib.sha1(flags.encode()).hexdigest()[:10]
    cache_dir = cache_dir or env or os.path.join(
        os.path.expanduser("~"), ".cache", "sin_inn_tpu", "xla")
    if machine_sub:
        cache_dir = os.path.join(cache_dir, machine_sub)
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _enabled = True
        return True
    except Exception:
        return False
