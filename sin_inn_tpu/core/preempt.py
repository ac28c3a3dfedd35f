"""Graceful-preemption support for the train loops.

The reference's whole fault-tolerance story is SLURM requeue plus
mtime-glob checkpoint resume (video-interpolation/main.py:64,75 — losing up
to ``save_iter`` epochs of work on every preemption). Here SIGTERM/SIGINT
(the signals SLURM/Borg/k8s send before killing a job) flip a flag the
epoch loop checks: the loop finishes the in-flight epoch, writes a
checkpoint, and returns cleanly — so a preempted run resumes exactly where
it stopped instead of at the last cadence save.
"""

from __future__ import annotations

import signal
import threading


class GracefulStop:
    """Flag that flips on SIGTERM/SIGINT; restores prior handlers on exit.

    Usage::

        with GracefulStop() as stop:
            for epoch in range(epochs):
                ...
                if stop:
                    store.save(epoch + 1, state)
                    break

    Safe off the main thread (signal handlers can only be installed from
    the main thread): it degrades to a never-set flag there.
    """

    def __init__(self):
        self.requested = False
        self._prev = {}

    def _handler(self, signum, frame):
        self.requested = True

    def __enter__(self) -> "GracefulStop":
        if threading.current_thread() is threading.main_thread():
            for sig in (signal.SIGTERM, signal.SIGINT):
                try:
                    self._prev[sig] = signal.signal(sig, self._handler)
                except (ValueError, OSError):  # non-main thread / esoteric os
                    pass
        return self

    def __exit__(self, *exc):
        for sig, prev in self._prev.items():
            try:
                signal.signal(sig, prev)
            except (ValueError, OSError):
                pass
        self._prev.clear()
        # a caught SIGINT should still interrupt whatever follows the loop
        if self.requested and exc == (None, None, None):
            return False
        return False

    def __bool__(self) -> bool:
        return self.requested

    # non-context-manager form for loops with their own cleanup tails
    def install(self) -> "GracefulStop":
        return self.__enter__()

    def restore(self) -> None:
        self.__exit__(None, None, None)
