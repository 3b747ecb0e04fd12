"""ctypes wrapper over the native threaded .npy batch loader.

Falls back cleanly: ``native_available()`` is False when the library can't
be built (no compiler) — callers then use the numpy thread-pool path.
"""
from __future__ import annotations

import ctypes
from typing import Optional, Sequence

import numpy as np

_lib = None
_lib_error: Optional[str] = None


def _load():
    global _lib, _lib_error
    if _lib is not None or _lib_error is not None:
        return _lib
    try:
        from bmnas_tpu.native.build import build
        path = build()
        lib = ctypes.CDLL(path)
        lib.npy_load_batch.restype = ctypes.c_int
        lib.npy_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        lib.npy_load_batch_var.restype = ctypes.c_int
        lib.npy_load_batch_var.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        _lib = lib
    except Exception as e:  # pragma: no cover - depends on toolchain
        _lib_error = str(e)
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


class NativeNpyLoader:
    """Batch loader: reads N same-shape float32 .npy files into one array."""

    def __init__(self, num_threads: int = 8):
        self.num_threads = max(1, int(num_threads))
        if _load() is None:
            raise RuntimeError(f"native loader unavailable: {_lib_error}")

    def load_batch(self, paths: Sequence[str], sample_shape) -> np.ndarray:
        """Read ``len(paths)`` files, each a float32 C-order array of
        ``sample_shape``, into a (N, *sample_shape) array."""
        n = len(paths)
        elems = int(np.prod(sample_shape))
        out = np.empty((n,) + tuple(sample_shape), np.float32)
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        failures = _lib.npy_load_batch(
            arr, n, elems, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.num_threads)
        if failures:
            raise IOError(f"native loader: {failures}/{n} reads failed")
        return out


class NativeSkeletonParser:
    """NTU .skeleton text parser (C++, GIL-released) — exact semantics of
    data/ntu.py get_3d_skeleton (reference datasets/ntu.py:38-78)."""

    MAX_T = 1000  # no NTU clip approaches this; fallback kicks in if exceeded

    def __init__(self):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native parser unavailable: {_lib_error}")
        if not hasattr(lib, "ske_parse"):
            raise RuntimeError("stale libnpy_loader.so: rebuild required")
        lib.ske_parse.restype = ctypes.c_int
        lib.ske_parse.argtypes = [ctypes.c_char_p,
                                  ctypes.POINTER(ctypes.c_float),
                                  ctypes.c_int]
        self._lib = lib

    def parse(self, path: str) -> np.ndarray:
        """Returns (3, T, 25, 2) float32; raises IOError on malformed input
        or if the clip exceeds MAX_T frames (caller falls back to Python)."""
        out = np.zeros((3, self.MAX_T, 25, 2), np.float32)
        t = self._lib.ske_parse(
            path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.MAX_T)
        if t < 0:
            raise IOError(f"ske_parse({path}) failed with code {t}")
        if t > self.MAX_T:
            raise IOError(f"ske_parse({path}): {t} frames > MAX_T")
        return out[:, :t]
