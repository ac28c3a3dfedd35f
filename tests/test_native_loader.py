"""Native C++ loader parity tests (skipped when g++/make are unavailable)."""

import numpy as np
import pytest

from sin_inn_tpu.data import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native loader not built")


def test_gather_windows_matches_numpy(rng):
    lr = rng.randint(0, 255, (10, 4, 6, 4), dtype=np.uint8)
    win = np.asarray([[1, 2, 3], [5, 6, 7]], np.int64)
    out = native.gather_windows(lr, win)
    ref = np.moveaxis(lr[win], 1, 3).reshape(2, 4, 6, 12)
    np.testing.assert_array_equal(out, ref)


def test_gather_frames(rng):
    hr = rng.randint(0, 255, (6, 5, 7, 3), dtype=np.uint8)
    idx = np.asarray([4, 0, 2], np.int64)
    out = native.gather_frames(hr, idx)
    np.testing.assert_array_equal(out, hr[idx])


def test_prefetcher_covers_epoch(rng):
    n = 12
    lr = rng.randint(0, 255, (n, 4, 4, 4), dtype=np.uint8)
    hr = rng.randint(0, 255, (n, 8, 8, 3), dtype=np.uint8)
    samples = np.arange(2, 10)
    window = samples[:, None] + np.arange(-1, 2)[None, :]
    order = np.arange(len(samples))
    pf = native.Prefetcher(lr, hr, window, samples, order, batch=3)
    seen_hr = []
    total = 0
    for batch in pf:
        assert batch["lr"].shape[1:] == (4, 4, 12)
        assert batch["hr"].shape[1:] == (8, 8, 3)
        total += batch["hr"].shape[0]
        seen_hr.append(batch["hr"])
    assert total == len(samples)
    got = np.concatenate(seen_hr)
    np.testing.assert_array_equal(got, hr[samples])


def test_prefetcher_matches_dataset_gather(rng):
    from sin_inn_tpu.core.config import SRConfig
    from sin_inn_tpu.data.synthetic import synthetic_sr_video
    from sin_inn_tpu.data.sr_video import SRDataset, train_indices

    cfg = SRConfig(scale=2, num_coupling=1, lr_window=1, fps=30)
    video = synthetic_sr_video(cfg, h=16, w=16)
    ds = SRDataset(video, cfg, train_indices(cfg, video.num_lr))
    ref = ds.gather(np.arange(len(ds)))
    pf = ds.native_prefetch(len(ds), shuffle=False)
    batch = next(iter(pf))
    np.testing.assert_array_equal(batch["lr"], ref["lr"])
    np.testing.assert_array_equal(batch["hr"], ref["hr"])
