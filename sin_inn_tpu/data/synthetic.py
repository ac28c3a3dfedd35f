"""Synthetic single-video fixtures for tests and benchmarks.

Generates a moving-texture HR video and derives the LR RGGB stream through
the same bayer-binning math as the offline prep pipeline, so SR tests train
against physically consistent (HR, LR) pairs without any files on disk.
"""

from __future__ import annotations

import numpy as np

from sin_inn_tpu.core.config import SRConfig
from sin_inn_tpu.data.prepare import binning, extract_bayer
from sin_inn_tpu.data.sr_video import SRVideo


def moving_texture_video(num_frames: int, h: int, w: int,
                         seed: int = 0) -> np.ndarray:
    """(N, H, W, 3) float32 in [0,1]: smooth texture drifting over time."""
    rng = np.random.RandomState(seed)
    pad = num_frames + 8
    base = rng.rand(h + pad, w + pad, 3).astype(np.float32)
    # blur for spatial coherence (box filter, twice)
    for _ in range(2):
        base = (base
                + np.roll(base, 1, 0) + np.roll(base, -1, 0)
                + np.roll(base, 1, 1) + np.roll(base, -1, 1)) / 5.0
    frames = np.stack([base[i:i + h, i:i + w] for i in range(num_frames)])
    return np.clip(frames, 0.0, 1.0)


def synthetic_sr_video(cfg: SRConfig, num_frames: int = None, h: int = 16,
                       w: int = 16, seed: int = 0) -> SRVideo:
    """SRVideo with LR derived by bayer binning of the HR frames."""
    if num_frames is None:
        # enough frames for at least two supervised samples
        num_frames = 2 * (120 // cfg.fps) + 2 * cfg.fps + 4
    hr = moving_texture_video(num_frames, h, w, seed)
    lr = []
    for f in hr:
        bayer, _ = extract_bayer(f)
        lr.append(binning(bayer, "mean", cfg.scale))
    lr = np.stack(lr)
    to_u8 = lambda x: (np.clip(x, 0, 1) * 255).astype(np.uint8)
    return SRVideo(lr=to_u8(lr), hr=to_u8(hr))
