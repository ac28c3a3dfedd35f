"""Thin metrics interface: local CSV/JSONL always, wandb when available.

Replaces the reference's wandb-only observability (/root/reference/
main.py:105-107, lit_wrapper.py:77,87-89, video-interpolation/trainer.py:77-85)
with a writer that (a) never makes wandb a hard dependency, (b) writes
machine-readable local logs, and (c) attaches metadata to artifacts instead of
encoding metrics into filenames (the reference parses EPE back out of GIF
filenames — trainer.py:127, main.py:103).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


def _to_py(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return v


def _is_primary_process() -> bool:
    """True unless this is a non-zero process of a multi-host run."""
    try:
        import jax
        return jax.process_index() == 0
    except Exception:
        return True


class MetricsWriter:
    def __init__(self, directory: str, run_name: str = "run",
                 use_wandb: bool = False, wandb_project: Optional[str] = None,
                 hyperparams: Optional[Dict[str, Any]] = None,
                 primary: Optional[bool] = None):
        """``primary=False`` turns the writer into a no-op — in multi-process
        runs only process 0 writes logs/wandb (None = auto-detect)."""
        if primary is None:
            primary = _is_primary_process()
        self.primary = primary
        self.directory = directory
        self._t0 = time.time()
        self._wandb = None
        self._jsonl = None
        if not primary:
            self.jsonl_path = None
            return
        os.makedirs(directory, exist_ok=True)
        self.jsonl_path = os.path.join(directory, f"{run_name}.metrics.jsonl")
        self._jsonl = open(self.jsonl_path, "a")
        if use_wandb:
            try:
                import wandb
                self._wandb = wandb.init(project=wandb_project or "sin-inn-tpu",
                                         name=run_name, config=hyperparams or {})
            except Exception:
                self._wandb = None
        if hyperparams is not None:
            with open(os.path.join(directory, f"{run_name}.config.json"), "w") as f:
                json.dump({k: _to_py(v) for k, v in hyperparams.items()},
                          f, indent=2, default=str)

    def log(self, step: int, scalars: Dict[str, Any]):
        if not self.primary:
            return
        rec = {"step": int(step), "time": time.time() - self._t0}
        rec.update({k: _to_py(v) for k, v in scalars.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._wandb is not None:
            self._wandb.log(scalars, step=step)

    def log_artifact(self, path: str, metadata: Dict[str, Any]):
        """Write a sidecar metadata JSON next to an artifact file."""
        if not self.primary:
            return
        with open(path + ".json", "w") as f:
            json.dump({k: _to_py(v) for k, v in metadata.items()}, f, indent=2)

    @property
    def wants_media(self) -> bool:
        """True when media logging would actually reach wandb — callers can
        skip rendering sample frames otherwise."""
        return self.primary and self._wandb is not None

    def log_media(self, step: int, name: str, frames, fps: int = 4):
        """Log a video/GIF media artifact to wandb when enabled
        (reference trainer.py:114-131, main.py:60-69 log flow/occlusion
        videos and source media to wandb). ``frames``: (T, H, W, C) uint8.

        Local GIF artifacts are written by the callers via VideoWriter; this
        covers the wandb side that round 1 was missing.
        """
        if not self.primary or self._wandb is None:
            return
        import numpy as np
        import wandb

        arr = np.asarray(frames)
        if arr.ndim == 3:
            arr = arr[None]
        # wandb.Video wants (T, C, H, W)
        self._wandb.log({name: wandb.Video(
            arr.transpose(0, 3, 1, 2), fps=fps, format="gif")}, step=step)

    def log_image(self, step: int, name: str, image):
        """Log a single image to wandb when enabled (lit_wrapper-style media)."""
        if not self.primary or self._wandb is None:
            return
        import numpy as np
        import wandb

        self._wandb.log({name: wandb.Image(np.asarray(image))}, step=step)

    def close(self):
        if self._jsonl is not None:
            self._jsonl.close()
        if self._wandb is not None:
            self._wandb.finish()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
