"""Optimizers: torch-Adam-compatible adam(+L2) and LAMB.

* ``adam_l2`` replicates ``torch.optim.Adam(weight_decay=...)`` used by the SR
  pipeline (/root/reference/lit_wrapper.py:131-138): L2 decay is added to the
  *gradient* before the moment updates (coupled, not AdamW-decoupled).
* ``lamb`` replaces apex ``FusedLAMB`` (/root/reference/video-interpolation/
  trainer.py:4,135) with ``optax.lamb`` — XLA fuses the update chain on TPU,
  so no hand-fused kernel is needed.
"""

from __future__ import annotations

from typing import Tuple

import optax


def adam_l2(learning_rate: float, betas: Tuple[float, float] = (0.9, 0.99),
            eps: float = 1e-8, weight_decay: float = 0.0) -> optax.GradientTransformation:
    steps = []
    if weight_decay:
        steps.append(optax.add_decayed_weights(weight_decay))
    steps.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
    steps.append(optax.scale(-learning_rate))
    return optax.chain(*steps)


def lamb(learning_rate: float, betas: Tuple[float, float] = (0.9, 0.999),
         eps: float = 1e-6, weight_decay: float = 0.0) -> optax.GradientTransformation:
    return optax.lamb(learning_rate, b1=betas[0], b2=betas[1], eps=eps,
                      weight_decay=weight_decay)
