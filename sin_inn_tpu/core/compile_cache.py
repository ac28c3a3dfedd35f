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
_disabled = False    # process-local hard-off (disable()); NOT the env var


def enable(cache_dir: str | None = None) -> bool:
    """Idempotently enable the persistent compilation cache."""
    global _enabled
    if _enabled:
        return True
    if _disabled:
        return False
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
            # include the MODEL lines, not just the feature flags: XLA adds
            # LLVM tuning features derived from the CPU model (e.g.
            # +prefer-no-gather on slow-gather parts) that two machines with
            # identical flag lists can disagree on — loading such an entry
            # emits "could lead to SIGILL" warnings (round-4 MULTICHIP tail)
            flags = "".join(sorted(
                line for line in open("/proc/cpuinfo")
                if line.startswith(("flags", "Features", "model name",
                                    "vendor_id", "cpu family", "model\t",
                                    "stepping"))))
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


def disable() -> None:
    """Hard-disable the persistent cache for this process.

    The driver's multichip dryrun calls this: its CPU AOT entries may be
    read on a machine whose XLA target features differ at the LLVM tuning
    level, and even with the model-scoped key a stale pre-key cache dir can
    emit SIGILL-risk load warnings. The dryrun is a one-shot compile check —
    a persistent cache buys it nothing.

    Process-local: sets a module flag rather than mutating
    SININN_COMPILE_CACHE in os.environ — an env mutation would leak the
    opt-out to subprocesses (and later enable() calls) of a driver that
    runs the dryrun as a preflight before real training (round-5 review).
    """
    global _enabled, _disabled
    _disabled = True
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", None)
    except Exception:
        pass
    _enabled = False
