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

        Multi-process: save() writes from process 0 only, so on hosts
        without a shared filesystem the other processes would see no
        checkpoint and resume from scratch — divergent step counts deadlock
        the collectives. Process 0's (step, state) is therefore broadcast to
        every process, making resume consistent regardless of where the
        files live."""
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
            if jax.process_index() == 0:
                with ocp.PyTreeCheckpointer() as ckptr:
                    restored = ckptr.restore(
                        self._path(step),
                        args=ocp.args.PyTreeRestore(
                            item=jax.device_get(target)))
            else:
                restored = jax.device_get(target)   # placeholder structure
            restored = multihost_utils.broadcast_one_to_all(restored)
            return restored, step

        if step is None:
            return None, None
        with ocp.PyTreeCheckpointer() as ckptr:
            restored = ckptr.restore(
                self._path(step),
                args=ocp.args.PyTreeRestore(item=jax.device_get(target)))
        return restored, step
