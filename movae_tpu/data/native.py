"""ctypes bindings for the native batch-assembly library.

Loads ``native/libbatch_ops.so`` (built by ``native/build.sh``; auto-built on
first import if a compiler is available) and exposes
:func:`assemble_batch` — fused gather + float32 convert + random h-flip +
normalize — with a numpy fallback of identical semantics.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB = None
_TRIED = False


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native")


_EXPECTED_VERSION = 4


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    # version-suffixed artifact: an ABI bump gets a fresh filename, so we
    # never re-dlopen a path glibc has already deduped to a stale handle
    # (and never relink a .so that is currently mapped)
    name = f"libbatch_ops.v{_EXPECTED_VERSION}.so"
    so = os.path.join(_native_dir(), name)

    def build():
        try:
            subprocess.run(
                ["sh", os.path.join(_native_dir(), "build.sh"), name],
                check=True, capture_output=True, timeout=120)
            return True
        except Exception:
            return False

    if not os.path.exists(so) and not build():
        return None
    try:
        _LIB = _bind(ctypes.CDLL(so))
    except OSError:
        # a stale/corrupt artifact (e.g. from an interrupted build before
        # the atomic-rename fix) would otherwise disable the fast path
        # forever; rebuild once
        _LIB = None
        if build():
            try:
                _LIB = _bind(ctypes.CDLL(so))
            except OSError:
                _LIB = None
    except Exception:
        _LIB = None
    return _LIB


def _bind(lib):
    lib.batch_ops_version.restype = ctypes.c_int
    if lib.batch_ops_version() != _EXPECTED_VERSION:
        return None
    lib.assemble_batch_u8.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int]
    lib.assemble_batch_u8_raw.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64]
    lib.gather_codes_i32.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int64]
    lib.set_num_threads.argtypes = [ctypes.c_int]
    return lib


def available() -> bool:
    return _load() is not None


def set_num_threads(n: int) -> bool:
    """Cap the assembly worker-thread count (0 = hardware concurrency) —
    the analog of the reference DataLoader's num_workers knob, swept by
    benchmark_workers.py. Also settable via MOVAE_BATCH_THREADS before the
    first batch. Returns False when the native library is unavailable (the
    numpy fallback is single-threaded regardless)."""
    lib = _load()
    if lib is None:
        return False
    lib.set_num_threads(int(n))
    return True


def assemble_batch(images: np.ndarray, idx: np.ndarray,
                   flip_mask: Optional[np.ndarray], normalize: bool
                   ) -> np.ndarray:
    """(N,H,W,C) uint8 archive + (B,) indices -> (B,H,W,C) float32 batch."""
    lib = _load()
    idx = np.ascontiguousarray(idx, np.int64)
    b = len(idx)
    h, w, c = images.shape[1:]
    if lib is not None and images.flags.c_contiguous:
        out = np.empty((b, h, w, c), np.float32)
        fm = (np.ascontiguousarray(flip_mask, np.uint8)
              if flip_mask is not None else None)
        lib.assemble_batch_u8(
            images.ctypes.data, idx.ctypes.data,
            fm.ctypes.data if fm is not None else None,
            out.ctypes.data, b, h, w, c, int(normalize))
        return out
    # numpy fallback (identical semantics)
    out = images[idx].astype(np.float32) / 255.0
    if flip_mask is not None:
        m = flip_mask.astype(bool)
        out[m] = out[m, :, ::-1, :]
    if normalize:
        out = (out - 0.5) / 0.5
    return out


def assemble_batch_raw(images: np.ndarray, idx: np.ndarray,
                       flip_mask: Optional[np.ndarray]) -> np.ndarray:
    """(N,H,W,C) uint8 archive + (B,) indices -> (B,H,W,C) uint8 batch
    (gather + flip only; cast/normalize happens on-device in the jitted
    step — see movae_tpu.train.step)."""
    lib = _load()
    idx = np.ascontiguousarray(idx, np.int64)
    b = len(idx)
    h, w, c = images.shape[1:]
    if lib is not None and images.flags.c_contiguous:
        out = np.empty((b, h, w, c), np.uint8)
        fm = (np.ascontiguousarray(flip_mask, np.uint8)
              if flip_mask is not None else None)
        lib.assemble_batch_u8_raw(
            images.ctypes.data, idx.ctypes.data,
            fm.ctypes.data if fm is not None else None,
            out.ctypes.data, b, h, w, c)
        return out
    out = images[idx].copy()
    if flip_mask is not None:
        m = flip_mask.astype(bool)
        out[m] = out[m, :, ::-1, :]
    return out


def gather_codes(codes: np.ndarray, idx: np.ndarray) -> np.ndarray:
    lib = _load()
    idx = np.ascontiguousarray(idx, np.int64)
    if lib is not None and codes.flags.c_contiguous and codes.dtype == np.int32:
        b = len(idx)
        out = np.empty((b,) + codes.shape[1:], np.int32)
        lib.gather_codes_i32(codes.ctypes.data, idx.ctypes.data,
                             out.ctypes.data, b,
                             int(np.prod(codes.shape[1:])))
        return out
    return np.ascontiguousarray(codes[idx])
