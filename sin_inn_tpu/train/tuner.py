"""Auto-tuning: LR range test and batch-size scaling.

Equivalents of the Lightning ``auto_lr_find`` / ``auto_scale_batch_size``
flags the reference enables (/root/reference/main.py:108-109), as explicit
functions:

  * ``find_lr`` — short LR range test: train a few steps from the same init
    at each candidate LR, pick the largest LR whose loss still decreases
    robustly (steepest descent with a divergence guard);
  * ``find_batch_size`` — doubling probe until the compiled step fails to
    fit device memory, then back off one notch.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np

from sin_inn_tpu.core.config import SRConfig
from sin_inn_tpu.train import sr as SR


def find_lr(cfg: SRConfig, batch: Dict, key: jax.Array,
            lrs: Optional[Sequence[float]] = None, steps: int = 8) -> float:
    """LR range test on the SR pipeline. Returns the selected LR."""
    lrs = list(lrs) if lrs is not None else [1e-5, 3e-5, 1e-4, 3e-4, 1e-3]
    results = []
    for lr in lrs:
        c = cfg.replace(learning_rate=lr, donate_state=False)
        spec, state, tx = SR.create_train_state(key, c)
        step = SR.make_train_step(spec, c, tx)
        first = last = None
        diverged = False
        for i in range(steps):
            state, aux = step(state, batch, None, jax.random.fold_in(key, i))
            v = float(aux["loss"])
            if not np.isfinite(v):
                diverged = True
                break
            first = v if first is None else first
            last = v
        score = -np.inf if diverged or first is None else (first - last)
        results.append((score, lr))
    best = max(results)
    return best[1]


def find_batch_size(cfg: SRConfig, make_batch, key: jax.Array,
                    start: int = 1, limit: int = 512) -> int:
    """Double the batch until the step OOMs or hits ``limit``; return the
    largest batch that ran. ``make_batch(b)`` returns a batch dict."""
    good = 0
    b = start
    while b <= limit:
        try:
            c = cfg.replace(batch_size=b, donate_state=False)
            spec, state, tx = SR.create_train_state(key, c)
            step = SR.make_train_step(spec, c, tx)
            _, aux = step(state, make_batch(b), None, key)
            float(aux["loss"])
            good = b
            b *= 2
        except Exception:
            break
    return good if good else start
