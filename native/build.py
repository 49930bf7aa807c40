"""Build the native host rasterizer shared library.

Replaces the reference's Cython/distutils build (utils/cython/setup.py)
with a direct g++ invocation + ctypes loading (pybind11 is not available
in this image).  ``ensure_built()`` compiles on first use and caches the
.so next to the source.
"""

from __future__ import annotations

import os
import subprocess

_THIS_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_THIS_DIR, "vp_raster.cpp")
LIB = os.path.join(_THIS_DIR, "libvp_raster.so")


def ensure_built(force: bool = False) -> str:
    if force or not os.path.exists(LIB) or (
            os.path.getmtime(SRC) > os.path.getmtime(LIB)):
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               "-std=c++17", SRC, "-o", LIB]
        subprocess.run(cmd, check=True)
    return LIB


if __name__ == "__main__":
    print(ensure_built(force=True))
