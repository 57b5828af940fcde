"""ctypes bindings for the native batch loader (builds libmaa3io.so on first use)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_HERE, "libmaa3io.so")
_LOCK = threading.Lock()
_LIB = None
_BUILD_FAILED = False


def _build() -> bool:
    src = os.path.join(_HERE, "loader.cpp")
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           src, "-o", _SO_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:
        print(f"maa3 native loader build failed ({e}); using numpy fallback")
        return False


def _load_lib():
    global _LIB, _BUILD_FAILED
    with _LOCK:
        if _LIB is not None or _BUILD_FAILED:
            return _LIB
        if not os.path.exists(_SO_PATH) or (
                os.path.getmtime(_SO_PATH)
                < os.path.getmtime(os.path.join(_HERE, "loader.cpp"))):
            if not _build():
                _BUILD_FAILED = True
                return None
        lib = ctypes.CDLL(_SO_PATH)
        lib.maa3_load_batch.restype = ctypes.c_int
        lib.maa3_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.c_float, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int)]
        lib.maa3_npy_shape.restype = ctypes.c_int
        lib.maa3_npy_shape.argtypes = [ctypes.c_char_p,
                                       ctypes.POINTER(ctypes.c_int64),
                                       ctypes.POINTER(ctypes.c_int64)]
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return _load_lib() is not None


class NativeLoader:
    """Parallel npy batch loader. Drop-in for the hot path of the datasets:
    given paths -> (B, rows, target_len) float32 with crop/tile/pad collate."""

    def __init__(self, rows: int = 80, num_threads: int = 0):
        self.rows = rows
        self.num_threads = num_threads
        self.lib = _load_lib()

    def load_batch(self, paths: Sequence[str], target_len: int,
                   mode: str = "pad", pad_value: float = -5.0) -> np.ndarray:
        n = len(paths)
        batch = np.empty((n, self.rows, target_len), np.float32)
        if self.lib is None:
            return self._numpy_fallback(paths, batch, target_len, mode, pad_value)
        c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        statuses = (ctypes.c_int * n)()
        self.lib.maa3_load_batch(
            c_paths, n, batch.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.rows, target_len, 1 if mode == "tile" else 0,
            pad_value, self.num_threads, statuses)
        return batch

    def npy_shape(self, path: str):
        if self.lib is None:
            with open(path, "rb") as f:
                version = np.lib.format.read_magic(f)
                shape, _, _ = np.lib.format._read_array_header(f, version)
            return shape
        r, c = ctypes.c_int64(), ctypes.c_int64()
        rc = self.lib.maa3_npy_shape(path.encode(), ctypes.byref(r),
                                     ctypes.byref(c))
        if rc != 0:
            raise IOError(f"bad npy: {path} ({rc})")
        return (int(r.value), int(c.value))

    def _numpy_fallback(self, paths, batch, target_len, mode, pad_value):
        import math
        for i, p in enumerate(paths):
            try:
                a = np.load(p).astype(np.float32)
                if a.ndim == 1:
                    a = a[None]
                if a.shape[1] < target_len and mode == "tile":
                    a = np.tile(a, math.ceil(target_len / a.shape[1]))
                a = a[:, :target_len]
                batch[i, :, : a.shape[1]] = a
                if a.shape[1] < target_len:
                    batch[i, :, a.shape[1]:] = pad_value
            except Exception:
                batch[i] = pad_value
        return batch
