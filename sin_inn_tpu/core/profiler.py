"""Profiling and step-timing hooks.

The reference has no tracing/profiling (SURVEY §5); here: a context manager
around ``jax.profiler`` traces plus a lightweight step timer that uses the
value-fetch synchronization that actually works on relayed TPU backends (see
CLAUDE.md: ``block_until_ready`` alone can return before remote execution).
"""

from __future__ import annotations

import contextlib
import time
import jax


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace scope; view with TensorBoard or xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling step timer. ``sync`` fetches a scalar from the step output to
    force execution before reading the clock."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times = []
        self._last = None

    def start(self):
        self._last = time.perf_counter()

    def stop(self, sync_value=None) -> float:
        if sync_value is not None:
            float(sync_value)          # value fetch == real synchronization
        now = time.perf_counter()
        dt = now - (self._last or now)
        self._times.append(dt)
        if len(self._times) > self.window:
            self._times.pop(0)
        self._last = now
        return dt

    @property
    def mean(self) -> float:
        return sum(self._times) / max(len(self._times), 1)

    def throughput(self, items_per_step: int) -> float:
        return items_per_step / self.mean if self._times else 0.0


class TraceWindow:
    """Capture ONE ``jax.profiler`` trace of ``steps`` train steps.

    Skips ``warmup`` steps first (compile + cache warmup would dominate the
    trace), synchronizes via value fetch at the window edges, then writes a
    TensorBoard/xprof-compatible trace under ``logdir``. Call :meth:`tick`
    once per dispatched step with a scalar from the step's outputs.
    """

    def __init__(self, logdir: str, steps: int, warmup: int = 2):
        self.logdir = logdir
        self.steps = steps
        self.warmup = warmup
        self.done = steps <= 0
        self._i = 0
        self._active = False
        self._start = 0

    def tick(self, sync_value=None) -> None:
        if self.done:
            return
        self._i += 1
        if not self._active:
            if self._i > self.warmup:
                if sync_value is not None:
                    float(sync_value)
                jax.profiler.start_trace(self.logdir)
                self._active = True
                self._start = self._i
        elif self._i - self._start >= self.steps:
            if sync_value is not None:
                float(sync_value)
            jax.profiler.stop_trace()
            self._active = False
            self.done = True

    def close(self) -> None:
        """Stop a still-open trace (run ended inside the window)."""
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
            self.done = True
