"""ctypes bindings for the native host rasterizer (native/vp_raster.cpp).

Mirrors the TPU rasterizer API (face3d/raster.py) on the host CPU: used by
the dataset-prep toolchain, as a no-JAX fallback, and in tests as a second
oracle next to the pure-NumPy spec (face3d/raster_ref.py).  The reference
equivalent is the mesh_core_cython extension (utils/cython/
mesh_core_cython.pyx:40-99).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

DEPTH_INIT = -99999.0

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    import sys
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    sys.path.insert(0, os.path.join(repo_root, "native"))
    try:
        import build as native_build  # native/build.py
    finally:
        sys.path.pop(0)
    lib = ctypes.CDLL(native_build.ensure_built())

    f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    c_int = ctypes.c_int

    lib.vp_render_colors.argtypes = [f32, i32, f32, c_int, c_int, c_int,
                                     c_int, u8, u8, f32]
    lib.vp_rasterize_triangles.argtypes = [f32, i32, c_int, c_int, c_int,
                                           f32, i32, f32]
    lib.vp_vertex_normals.argtypes = [f32, i32, c_int, f32]
    lib.vp_render_texture.argtypes = [f32, i32, f32, f32, i32, c_int,
                                      c_int, c_int, c_int, c_int, c_int,
                                      c_int, f32, f32]
    _lib = lib
    return lib


def render_colors_native(vertices: np.ndarray, triangles: np.ndarray,
                         colors: np.ndarray, h: int, w: int
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """vertices [V,3], triangles [F,3] 0-based int32, colors [V,C] ->
    (image [h,w,C] u8, mask [h,w] u8)."""
    lib = _load()
    v = np.ascontiguousarray(vertices, np.float32)
    t = np.ascontiguousarray(triangles, np.int32)
    col = np.ascontiguousarray(colors, np.float32)
    c = col.shape[1]
    image = np.zeros((h, w, c), np.uint8)
    mask = np.zeros((h, w), np.uint8)
    depth = np.full((h, w), DEPTH_INIT, np.float32)
    lib.vp_render_colors(v.reshape(-1), t.reshape(-1), col.reshape(-1),
                         t.shape[0], h, w, c, image.reshape(-1),
                         mask.reshape(-1), depth.reshape(-1))
    return image, mask


def rasterize_triangles_native(vertices: np.ndarray, triangles: np.ndarray,
                               h: int, w: int):
    lib = _load()
    v = np.ascontiguousarray(vertices, np.float32)
    t = np.ascontiguousarray(triangles, np.int32)
    depth = np.full((h, w), DEPTH_INIT, np.float32)
    tri_buf = np.full((h, w), -1, np.int32)
    weights = np.zeros((h, w, 3), np.float32)
    lib.vp_rasterize_triangles(v.reshape(-1), t.reshape(-1), t.shape[0],
                               h, w, depth.reshape(-1),
                               tri_buf.reshape(-1), weights.reshape(-1))
    return depth, tri_buf, weights


def vertex_normals_native(tri_normal: np.ndarray, triangles: np.ndarray,
                          num_vertices: int) -> np.ndarray:
    lib = _load()
    tn = np.ascontiguousarray(tri_normal, np.float32)
    t = np.ascontiguousarray(triangles, np.int32)
    out = np.zeros((num_vertices, 3), np.float32)
    lib.vp_vertex_normals(tn.reshape(-1), t.reshape(-1), t.shape[0],
                          out.reshape(-1))
    return out


def render_texture_native(vertices: np.ndarray, triangles: np.ndarray,
                          texture: np.ndarray, tex_coords: np.ndarray,
                          tex_triangles: np.ndarray, h: int, w: int,
                          bilinear: bool = True):
    lib = _load()
    v = np.ascontiguousarray(vertices, np.float32)
    t = np.ascontiguousarray(triangles, np.int32)
    tex = np.ascontiguousarray(texture, np.float32)
    tc = np.ascontiguousarray(tex_coords[:, :2], np.float32)
    tt = np.ascontiguousarray(tex_triangles, np.int32)
    c = tex.shape[2]
    image = np.zeros((h, w, c), np.float32)
    depth = np.full((h, w), DEPTH_INIT, np.float32)
    lib.vp_render_texture(v.reshape(-1), t.reshape(-1), tex.reshape(-1),
                          tc.reshape(-1), tt.reshape(-1), t.shape[0], h, w,
                          c, tex.shape[0], tex.shape[1],
                          1 if bilinear else 0, image.reshape(-1),
                          depth.reshape(-1))
    return image, depth
