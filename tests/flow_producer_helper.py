"""Importable pseudo-GT flow producer used by the ``py:`` scheme tests."""

import numpy as np


def unit_flow(frame1, frame2):
    """Constant (dx=1, dy=0) flow at the frame resolution."""
    flow = np.zeros(frame1.shape[:2] + (2,), np.float32)
    flow[..., 0] = 1.0
    return flow
