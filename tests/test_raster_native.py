"""Native C++ rasterizer parity vs the sequential NumPy spec (and hence vs
the TPU kernel, which test_raster.py ties to the same spec)."""

import shutil

import numpy as np
import pytest

from voicepuppet_tpu.face3d import raster_ref

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ toolchain")

from tests.test_raster import project_synthetic, H, W


@pytest.fixture(scope="module")
def mesh():
    return project_synthetic(seed=5)


def test_native_render_colors_matches_spec(mesh):
    from voicepuppet_tpu.face3d.raster_native import render_colors_native
    verts, tris, colors = mesh
    want_img, want_mask = raster_ref.render_colors_ref(verts, tris, colors,
                                                       H, W)
    got_img, got_mask = render_colors_native(verts, tris, colors, H, W)
    np.testing.assert_array_equal(got_mask, want_mask)
    np.testing.assert_array_equal(got_img, want_img)


def test_native_rasterize_matches_spec(mesh):
    from voicepuppet_tpu.face3d.raster_native import (
        rasterize_triangles_native)
    verts, tris, _ = mesh
    want_d, want_t, want_w = raster_ref.rasterize_triangles_ref(
        verts, tris, H, W)
    got_d, got_t, got_w = rasterize_triangles_native(verts, tris, H, W)
    np.testing.assert_allclose(got_d, want_d, atol=1e-5)
    np.testing.assert_array_equal(got_t, want_t)
    np.testing.assert_allclose(got_w, want_w, atol=1e-5)


def test_native_vertex_normals_matches_spec(rng):
    from voicepuppet_tpu.face3d.raster_native import vertex_normals_native
    tris = rng.randint(0, 40, size=(100, 3)).astype(np.int32)
    tn = rng.randn(100, 3).astype(np.float32)
    want = raster_ref.vertex_normals_ref(tn, tris, 40)
    got = vertex_normals_native(tn, tris, 40)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_native_render_texture_runs(mesh):
    from voicepuppet_tpu.face3d.raster_native import render_texture_native
    verts, tris, _ = mesh
    tex = np.random.RandomState(0).rand(32, 32, 3).astype(np.float32)
    tc = np.random.RandomState(1).rand(verts.shape[0], 2).astype(
        np.float32) * 31
    img, depth = render_texture_native(verts, tris, tex, tc, tris, H, W)
    assert img.shape == (H, W, 3)
    assert (depth > raster_ref.DEPTH_INIT).sum() > 0
    assert img.max() <= 1.0 and img.min() >= 0.0
