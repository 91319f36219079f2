"""ctypes bindings for the native C++ slice loader (native/fastloader.cc).

Provides a drop-in fast path for .npy slice decoding and an async prefetch
pool (the native analogue of the reference's torch DataLoader worker
processes, src/DADiff.py:1582-1588).  Falls back to numpy when the shared
library hasn't been built (``make -C native``).
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Sequence

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "native",
                 "libfastloader.so"),
    os.path.join(os.path.dirname(__file__), "libfastloader.so"),
]

_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    for p in _LIB_PATHS:
        p = os.path.abspath(p)
        if os.path.exists(p):
            lib = ctypes.CDLL(p)
            lib.fl_read_npy.restype = ctypes.c_int
            lib.fl_read_npy.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.fl_pool_create.restype = ctypes.c_void_p
            lib.fl_pool_create.argtypes = [ctypes.c_int]
            lib.fl_pool_destroy.argtypes = [ctypes.c_void_p]
            lib.fl_pool_submit.restype = ctypes.c_int
            lib.fl_pool_submit.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
            lib.fl_pool_wait.restype = ctypes.c_int
            lib.fl_pool_wait.argtypes = [
                ctypes.c_void_p,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
            ]
            _lib = lib
            return lib
    return None


def available() -> bool:
    return _load_lib() is not None


_MAX_ELEMS = 8 * 1024 * 1024  # 8M floats = 32MB per slice cap


def read_npy(path: str) -> np.ndarray:
    """Decode an .npy file to float32 via the native reader (numpy fallback)."""
    lib = _load_lib()
    if lib is None:
        return np.load(path).astype(np.float32)
    buf = np.empty(_MAX_ELEMS, np.float32)
    shape = (ctypes.c_int64 * 4)()
    ndim = lib.fl_read_npy(
        path.encode(),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        _MAX_ELEMS,
        shape,
    )
    if ndim < 0:
        return np.load(path).astype(np.float32)
    dims = tuple(int(shape[i]) for i in range(ndim))
    n = int(np.prod(dims)) if dims else 1
    return buf[:n].reshape(dims).copy()


class PrefetchPool:
    """Async decode pool over the native thread pool."""

    def __init__(self, num_threads: int = 4):
        self._lib = _load_lib()
        if self._lib is None:
            raise RuntimeError("native fastloader not built (make -C native)")
        self._pool = self._lib.fl_pool_create(num_threads)

    def submit(self, path: str) -> int:
        return self._lib.fl_pool_submit(self._pool, path.encode())

    def wait(self, ticket: int) -> np.ndarray:
        buf = np.empty(_MAX_ELEMS, np.float32)
        shape = (ctypes.c_int64 * 4)()
        ndim = self._lib.fl_pool_wait(
            self._pool,
            ticket,
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            _MAX_ELEMS,
            shape,
        )
        if ndim < 0:
            raise IOError(f"native decode failed (ticket {ticket})")
        dims = tuple(int(shape[i]) for i in range(ndim))
        n = int(np.prod(dims)) if dims else 1
        return buf[:n].reshape(dims).copy()

    def load_many(self, paths: Sequence[str]) -> List[np.ndarray]:
        tickets = [self.submit(p) for p in paths]
        return [self.wait(t) for t in tickets]

    def close(self):
        if self._pool is not None:
            self._lib.fl_pool_destroy(self._pool)
            self._pool = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
