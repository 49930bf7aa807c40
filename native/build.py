"""Build the native host rasterizer shared library.

Replaces the reference's Cython/distutils build (utils/cython/setup.py)
with a direct g++ invocation + ctypes loading (pybind11 is not available
in this image).  ``ensure_built()`` compiles on first use and caches the
.so next to the source.
"""

from __future__ import annotations

import hashlib
import os
import subprocess

_THIS_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_THIS_DIR, "vp_raster.cpp")
LIB = os.path.join(_THIS_DIR, "libvp_raster.so")
STAMP = LIB + ".srchash"


def _src_hash() -> str:
    with open(SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def ensure_built(force: bool = False) -> str:
    """Build if missing or the source content changed (content hash, not
    mtime — git checkouts reset mtimes).  No -march=native: the .so may be
    copied between hosts; -O3 generic keeps it portable."""
    h = _src_hash()
    stale = True
    if not force and os.path.exists(LIB) and os.path.exists(STAMP):
        with open(STAMP) as f:
            stale = f.read().strip() != h
    if stale or force or not os.path.exists(LIB):
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", SRC,
               "-o", LIB]
        subprocess.run(cmd, check=True)
        with open(STAMP, "w") as f:
            f.write(h)
    return LIB


if __name__ == "__main__":
    print(ensure_built(force=True))
