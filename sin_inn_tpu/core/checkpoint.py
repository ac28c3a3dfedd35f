"""Checkpoint store with latest-scan resume semantics.

Replaces Lightning ``ModelCheckpoint`` + mtime-glob resume
(/root/reference/main.py:115-116, video-interpolation/main.py:62-64,75).
The whole training state — params, optimizer state, controller state, step —
is one pytree saved via orbax; resume scans the checkpoint dir for the
highest step (the reference's entire fault-tolerance story, SURVEY §5, made
first-class). Controller state being an explicit pytree fixes the reference's
mask re-serialization quirk (progressive_controller.py:55-81) by construction.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional, Tuple

import jax

_STEP_RE = re.compile(r"^step_(\d+)$")


class CheckpointStore:
    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"step_{step:010d}")

    def save(self, step: int, state: Any) -> str:
        """Write one checkpoint. In multi-process runs EVERY process must
        call this: orbax synchronizes internally and only the primary host
        writes the data — a process-0-only call deadlocks in orbax's global
        barrier (measured: the round-4 two-process test hung exactly there).
        State must be fully addressable per host (replicated params — true
        for every run mode this framework ships; ``jax.device_get`` raises
        loudly otherwise)."""
        import orbax.checkpoint as ocp

        path = self._path(step)
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(path, jax.device_get(state), force=True)
        return path

    def latest_step(self) -> Optional[int]:
        steps = []
        for name in os.listdir(self.directory):
            m = _STEP_RE.match(name)
            if m and os.path.isdir(os.path.join(self.directory, name)):
                steps.append(int(m.group(1)))
        return max(steps) if steps else None

    def restore(self, target: Any, step: Optional[int] = None
                ) -> Tuple[Optional[Any], Optional[int]]:
        """Restore into the structure of ``target``. Returns (state, step) or
        (None, None) when no checkpoint exists.

        Multi-process: like save(), EVERY process must call orbax's restore —
        it synchronizes globally exactly as save does (probe-measured on the
        2-process gloo cluster: a process-0-only ``ckptr.restore`` hangs in
        the barrier while the other ranks wait downstream). Orbax therefore
        requires the checkpoint directory to be SHARED across hosts — its own
        multi-process contract; this store inherits it. Process 0's step
        index is broadcast first so a directory-listing race with an
        in-flight writer cannot make ranks pick different steps (divergent
        steps would deadlock the training collectives)."""
        import orbax.checkpoint as ocp

        if step is None:
            step = self.latest_step()

        if jax.process_count() > 1:
            import numpy as np
            from jax.experimental import multihost_utils

            step_arr = multihost_utils.broadcast_one_to_all(
                np.int64(step if step is not None else -1))
            step = int(step_arr)
            if step < 0:
                return None, None

        if step is None:
            return None, None
        with ocp.PyTreeCheckpointer() as ckptr:
            restored = ckptr.restore(
                self._path(step),
                args=ocp.args.PyTreeRestore(item=jax.device_get(target)))
        return restored, step
