"""On-demand build of the native loader shared library.

Compiles npy_loader.cpp with the system C++ compiler into the package dir
(cached by source mtime). No pybind11 — the ABI is three C functions loaded
via ctypes (see loader.py).
"""
from __future__ import annotations

import os
import shutil
import subprocess
import tempfile

_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_DIR, "npy_loader.cpp")
LIB = os.path.join(_DIR, "libnpy_loader.so")


def build(force: bool = False) -> str:
    """Build (if stale) and return the .so path. Raises on failure."""
    if (not force and os.path.exists(LIB)
            and os.path.getmtime(LIB) >= os.path.getmtime(SRC)):
        return LIB
    cxx = shutil.which("c++") or shutil.which("g++")
    if cxx is None:
        raise RuntimeError("no C++ compiler found")
    # build to a temp file then atomically move into place (parallel-safe)
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_DIR)
    os.close(fd)
    try:
        subprocess.run(
            [cxx, "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
             SRC, "-o", tmp],
            check=True, capture_output=True, text=True)
        os.replace(tmp, LIB)
    except Exception:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    return LIB
