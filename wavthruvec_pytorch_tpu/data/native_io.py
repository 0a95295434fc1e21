"""ctypes bindings for the native C++ .npy loader / prefetcher
(native/npy_loader.cc).  Compiled on first use with g++; falls back to
numpy if the toolchain is unavailable.

Usage:
    from wavthruvec_pytorch_tpu.data import native_io
    feats = native_io.read_npy(path)              # one file
    with native_io.Prefetcher(paths) as pf:       # overlapped I/O
        for i in range(len(paths)):
            arr = pf.get(i)
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "native", "npy_loader.cc")
_BUILD_DIR = os.path.join(os.path.dirname(__file__), "..", "native", "build")
_SO = os.path.join(_BUILD_DIR, "libwtv_io.so")

_lib = None
_lib_lock = threading.Lock()


def _compile() -> Optional[str]:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        os.path.abspath(_SRC), "-o", os.path.abspath(_SO),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO
    except Exception:
        return None


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib if _lib != "unavailable" else None
        so = _SO if os.path.exists(_SO) else _compile()
        if so is None:
            _lib = "unavailable"
            return None
        lib = ctypes.CDLL(so)
        lib.wtv_read_npy.restype = ctypes.c_int
        lib.wtv_read_npy.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.wtv_prefetch_create.restype = ctypes.c_void_p
        lib.wtv_prefetch_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.wtv_prefetch_get.restype = ctypes.c_int
        lib.wtv_prefetch_get.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.wtv_prefetch_destroy.restype = None
        lib.wtv_prefetch_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib


_DEFAULT_CAP = 64 * 1024 * 1024  # floats; 256 MB scratch


def read_npy(path: str, capacity: int = _DEFAULT_CAP) -> np.ndarray:
    """Native .npy read -> float32 ndarray; numpy fallback."""
    lib = get_lib()
    if lib is None:
        return np.load(path).astype(np.float32)
    buf = np.empty(capacity, np.float32)
    shape = (ctypes.c_int64 * 4)()
    ndim = lib.wtv_read_npy(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        capacity, shape,
    )
    if ndim == -2:
        return read_npy(path, capacity * 4)
    if ndim <= 0:
        return np.load(path).astype(np.float32)
    shp = tuple(shape[i] for i in range(ndim))
    n = int(np.prod(shp))
    return buf[:n].reshape(shp).copy()


class Prefetcher:
    """Background-threaded, in-order .npy prefetch over a fixed file list."""

    def __init__(self, paths: Sequence[str], n_threads: int = 4, window: int = 64,
                 capacity: int = _DEFAULT_CAP):
        self.paths: List[str] = list(paths)
        self.capacity = capacity
        self._lib = get_lib()
        self._handle = None
        if self._lib is not None and self.paths:
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths]
            )
            self._paths_keepalive = arr
            self._handle = self._lib.wtv_prefetch_create(
                arr, len(self.paths), n_threads, window
            )

    def __len__(self):
        return len(self.paths)

    def get(self, index: int) -> np.ndarray:
        if self._handle is None:
            return np.load(self.paths[index]).astype(np.float32)
        buf = np.empty(self.capacity, np.float32)
        shape = (ctypes.c_int64 * 4)()
        ndim = self._lib.wtv_prefetch_get(
            self._handle, index,
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.capacity, shape,
        )
        if ndim <= 0:
            return np.load(self.paths[index]).astype(np.float32)
        shp = tuple(shape[i] for i in range(ndim))
        n = int(np.prod(shp))
        return buf[:n].reshape(shp).copy()

    def close(self):
        if self._handle is not None:
            self._lib.wtv_prefetch_destroy(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
