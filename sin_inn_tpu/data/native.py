"""ctypes binding for the native C++ loader (native/loader.cpp).

Builds the shared library on first use (g++ via the Makefile) and exposes:
  * ``gather_windows`` — single-pass channel-concat LR-window assembly,
  * ``gather_frames`` — contiguous frame batch copy,
  * ``Prefetcher`` — double-buffered background batch assembly.

Everything degrades gracefully to the numpy implementations in
``sin_inn_tpu.data.sr_video`` when the toolchain is unavailable
(``available()`` returns False).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsininn_loader.so")

_lib = None
_build_lock = threading.Lock()
_build_failed = False


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _build_lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.check_call(["make", "-s"], cwd=_NATIVE_DIR,
                                      stdout=subprocess.DEVNULL,
                                      stderr=subprocess.DEVNULL)
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None

        i64 = ctypes.c_int64
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64p = ctypes.POINTER(ctypes.c_int64)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.gather_windows.argtypes = [u8p, i64, i64, i64, i64, i64p, i64,
                                       i64, u8p]
        lib.gather_frames.argtypes = [u8p, i64, i64, i64, i64p, i64, u8p]
        lib.u8_to_f32.argtypes = [u8p, i64, f32p]
        lib.prefetcher_create.argtypes = [u8p, i64, i64, i64, i64, u8p, i64,
                                          i64, i64, i64p, i64p, i64, i64, i64]
        lib.prefetcher_create.restype = ctypes.c_void_p
        lib.prefetcher_next.argtypes = [ctypes.c_void_p, u8p, u8p]
        lib.prefetcher_next.restype = i64
        lib.prefetcher_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _i64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def gather_windows(lr: np.ndarray, window_idx: np.ndarray) -> np.ndarray:
    """lr: (N, h, w, c) uint8; window_idx: (B, T) int64
    -> (B, h, w, T*c) uint8."""
    lib = _load()
    n, h, w, c = lr.shape
    b, t = window_idx.shape
    out = np.empty((b, h, w, t * c), np.uint8)
    lr = np.ascontiguousarray(lr)
    idx = np.ascontiguousarray(window_idx, np.int64)
    lib.gather_windows(_u8p(lr), n, h, w, c, _i64p(idx), b, t, _u8p(out))
    return out


def gather_frames(frames: np.ndarray, idx: np.ndarray) -> np.ndarray:
    lib = _load()
    n, h, w, c = frames.shape
    idx = np.ascontiguousarray(idx, np.int64)
    out = np.empty((len(idx), h, w, c), np.uint8)
    lib.gather_frames(_u8p(np.ascontiguousarray(frames)), h, w, c,
                      _i64p(idx), len(idx), _u8p(out))
    return out


class Prefetcher:
    """Double-buffered background batch assembly over the frame caches."""

    def __init__(self, lr: np.ndarray, hr: np.ndarray,
                 window_idx: np.ndarray, hr_idx: np.ndarray,
                 order: np.ndarray, batch: int):
        lib = _load()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        # keep references so the buffers outlive the C++ thread
        self._lr = np.ascontiguousarray(lr)
        self._hr_all = np.ascontiguousarray(hr)
        # bake hr indices into the order: C++ uses order values for both the
        # window row and the hr gather, so pre-gather the hr rows per sample.
        self._win = np.ascontiguousarray(window_idx, np.int64)
        n_samples, t = self._win.shape
        # remap: order entries are sample ids; hr frame for sample s is
        # hr_idx[s]. Build an hr cache aligned with sample ids.
        self._hr = np.ascontiguousarray(self._hr_all[hr_idx])
        self._order = np.ascontiguousarray(order, np.int64)
        self.batch = int(batch)
        n, lh, lw, lc = self._lr.shape
        hn, hh, hw, hc = self._hr.shape
        self._shapes = (lh, lw, t * lc, hh, hw, hc)
        self._handle = lib.prefetcher_create(
            _u8p(self._lr), n, lh, lw, lc, _u8p(self._hr), hh, hw, hc,
            _i64p(self._win), _i64p(self._order), len(self._order), t,
            self.batch)

    def __iter__(self):
        return self

    def __next__(self):
        lh, lw, lcw, hh, hw, hc = self._shapes
        lr_out = np.empty((self.batch, lh, lw, lcw), np.uint8)
        hr_out = np.empty((self.batch, hh, hw, hc), np.uint8)
        n = self._lib.prefetcher_next(self._handle, _u8p(lr_out), _u8p(hr_out))
        if n <= 0:
            self.close()
            raise StopIteration
        return {"hr": hr_out[:n], "lr": lr_out[:n]}

    def close(self):
        if self._handle:
            self._lib.prefetcher_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
