"""Rasterizer parity: vectorized TPU formulation (face3d/raster.py) vs the
sequential NumPy spec (face3d/raster_ref.py, a re-statement of
utils/cython/mesh_core.cpp)."""

import numpy as np
import pytest

from voicepuppet_tpu.face3d import bfm as bfm_mod
from voicepuppet_tpu.face3d import morph, raster, raster_ref


H = W = 96


def project_synthetic(seed=0, n=14, scale=40.0):
    """A small sphere-patch mesh projected to screen space."""
    model = bfm_mod.synthetic_bfm(num_theta=n, num_phi=n, seed=seed)
    fm = morph.device_bfm(model)
    coeff = bfm_mod.demo_coeff(model, batch=1, seed=seed + 1)
    rec = morph.reconstruct(coeff, fm, image_size=float(H))
    proj = np.asarray(rec.face_projection[0])
    # recentre/scale into the canvas
    proj = (proj - proj.mean(0)) * (scale / np.abs(
        proj - proj.mean(0)).max()) + np.array([W / 2, H / 2])
    z = np.asarray(rec.z_buffer[0])
    verts = np.concatenate([proj, z], axis=1).astype(np.float32)
    tris = np.asarray(fm.tri)
    colors = np.asarray(rec.face_color[0])
    colors = np.clip(colors, 0, 255).astype(np.int32).astype(np.float32)
    return verts, tris, colors


@pytest.fixture(scope="module")
def mesh():
    return project_synthetic()


def test_render_colors_matches_sequential_spec(mesh):
    verts, tris, colors = mesh
    want_img, want_mask = raster_ref.render_colors_ref(verts, tris, colors,
                                                       H, W)
    got_img, got_mask = raster.render_colors(verts[None], colors[None],
                                             tris, h=H, w=W, bb=16)
    got_img, got_mask = np.asarray(got_img[0]), np.asarray(got_mask[0])
    assert want_mask.sum() > 0  # mesh actually on screen
    np.testing.assert_array_equal(got_mask, want_mask)
    mismatch = np.mean(got_img[want_mask > 0] != want_img[want_mask > 0])
    assert mismatch == 0.0, f"color mismatch fraction {mismatch}"


def test_rasterize_triangles_matches_sequential_spec(mesh):
    verts, tris, colors = mesh
    want_d, want_t, want_w = raster_ref.rasterize_triangles_ref(
        verts, tris, H, W)
    out = raster.rasterize_triangles(verts[None], tris, h=H, w=W, bb=16)
    got_d = np.asarray(out.depth_buffer[0])
    got_t = np.asarray(out.triangle_buffer[0])
    got_w = np.asarray(out.barycentric_weight[0])
    np.testing.assert_allclose(got_d, want_d, atol=1e-4)
    cov = want_t >= 0
    # triangle ids must agree except where two triangles tie in depth
    disagree = (got_t != want_t) & cov
    assert disagree.mean() < 0.01
    agree = (got_t == want_t) & cov
    np.testing.assert_allclose(got_w[agree], want_w[agree], atol=1e-3)


def test_degenerate_triangle_quirk():
    # a zero-area triangle passes the inside test across its bbox
    # (mesh_core.cpp:40-49) — both impls must agree.
    verts = np.array([[10.0, 10.0, 1.0], [14.0, 10.0, 1.0],
                      [12.0, 10.0, 1.0]], np.float32)
    tris = np.array([[0, 1, 2]], np.int32)
    colors = np.full((3, 3), 90.0, np.float32)
    want_img, want_mask = raster_ref.render_colors_ref(verts, tris, colors,
                                                       32, 32)
    got_img, got_mask = raster.render_colors(verts[None], colors[None], tris,
                                             h=32, w=32, bb=8)
    np.testing.assert_array_equal(np.asarray(got_mask[0]), want_mask)
    assert want_mask.sum() > 0


def test_color_integer_truncation():
    # (int)(c0+c1+c2)/3 semantics (mesh_core.cpp:219): colors 9,9,10 -> 9
    verts = np.array([[2.0, 2.0, 1.0], [20.0, 2.0, 1.0],
                      [2.0, 20.0, 1.0]], np.float32)
    tris = np.array([[0, 1, 2]], np.int32)
    colors = np.array([[9.0], [9.0], [10.0]], np.float32)
    img, mask = raster.render_colors(verts[None], colors[None], tris,
                                     h=32, w=32, bb=32)
    assert np.asarray(img[0])[mask[0] > 0].max() == 9


def test_occlusion_order_independence(mesh):
    # Far triangle drawn before near one must lose regardless of index order.
    verts = np.array([
        [2.0, 2.0, 5.0], [28.0, 2.0, 5.0], [2.0, 28.0, 5.0],   # near
        [2.0, 2.0, 1.0], [28.0, 2.0, 1.0], [2.0, 28.0, 1.0],   # far
    ], np.float32)
    colors = np.array([[200.0]] * 3 + [[50.0]] * 3, np.float32)
    for order in ([[0, 1, 2], [3, 4, 5]], [[3, 4, 5], [0, 1, 2]]):
        tris = np.array(order, np.int32)
        img, mask = raster.render_colors(verts[None], colors[None], tris,
                                         h=32, w=32, bb=32)
        img = np.asarray(img[0])
        assert img[10, 10, 0] == 200  # near triangle color wins


def test_batched_render_is_per_frame(mesh):
    verts, tris, colors = mesh
    v2 = np.stack([verts, verts + np.array([5.0, 0.0, 0.0], np.float32)])
    c2 = np.stack([colors, colors])
    img, mask = raster.render_colors(v2, c2, tris, h=H, w=W, bb=16)
    img0, mask0 = raster.render_colors(verts[None], colors[None], tris,
                                       h=H, w=W, bb=16)
    np.testing.assert_array_equal(np.asarray(img[0]), np.asarray(img0[0]))
    assert not np.array_equal(np.asarray(mask[0]), np.asarray(mask[1]))


def test_vertex_normals_scatter_matches_ref(rng):
    tris = rng.randint(0, 50, size=(120, 3)).astype(np.int32)
    tn = rng.randn(120, 3).astype(np.float32)
    want = raster_ref.vertex_normals_ref(tn, tris, 50)
    got = np.asarray(raster.vertex_normals(tn, tris, 50))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_render_texture_samples_texture():
    verts = np.array([[2.0, 2.0, 1.0], [28.0, 2.0, 1.0],
                      [2.0, 28.0, 1.0]], np.float32)
    tris = np.array([[0, 1, 2]], np.int32)
    tex = np.zeros((16, 16, 3), np.float32)
    tex[:, :8] = 1.0
    tex_coords = np.array([[0.0, 0.0], [15.0, 0.0], [0.0, 15.0]], np.float32)
    img, depth = raster.render_texture(verts[None], tris, tex, tex_coords,
                                       tris, h=32, w=32, bb=32,
                                       bilinear=False)
    img = np.asarray(img[0])
    # left part of the triangle samples the bright half of the texture
    assert img[4, 4, 0] == 1.0
    assert img[4, 24, 0] == 0.0


def test_pallas_kernel_matches_sequential_spec(mesh):
    """The Mosaic kernel (interpret mode on CPU) must match the sequential
    spec exactly — including in-order first-wins tie-breaking."""
    from voicepuppet_tpu.ops.raster_pallas import render_colors_pallas
    verts, tris, colors = mesh
    want_img, want_mask = raster_ref.render_colors_ref(verts, tris, colors,
                                                       H, W)
    got_img, got_mask = render_colors_pallas(verts[None], colors[None],
                                             tris, h=H, w=W,
                                             interpret=True)
    np.testing.assert_array_equal(np.asarray(got_mask[0]), want_mask)
    np.testing.assert_array_equal(np.asarray(got_img[0]), want_img)


def test_pallas_rasterize_triangles_matches_spec(mesh):
    """The interp-depth Mosaic kernel (interpret mode) matches the
    sequential spec: depth exactly-interpolated, winner in-order
    first-wins, border-override included (mesh_core.cpp:108-166)."""
    from voicepuppet_tpu.ops.raster_pallas import rasterize_triangles_pallas
    verts, tris, colors = mesh
    want_d, want_t, want_w = raster_ref.rasterize_triangles_ref(
        verts, tris, H, W)
    out = rasterize_triangles_pallas(verts[None], tris, h=H, w=W,
                                     interpret=True)
    got_d = np.asarray(out.depth_buffer[0])
    got_t = np.asarray(out.triangle_buffer[0])
    got_w = np.asarray(out.barycentric_weight[0])
    np.testing.assert_allclose(got_d, want_d, atol=1e-4)
    cov = want_t >= 0
    np.testing.assert_array_equal(got_t, want_t)
    np.testing.assert_allclose(got_w[cov], want_w[cov], atol=1e-3)


def test_pallas_render_texture_matches_xla():
    from voicepuppet_tpu.ops.raster_pallas import render_texture_pallas
    verts = np.array([[2.0, 2.0, 1.0], [28.0, 2.0, 1.0],
                      [2.0, 28.0, 1.0]], np.float32)
    tris = np.array([[0, 1, 2]], np.int32)
    tex = np.zeros((16, 16, 3), np.float32)
    tex[:, :8] = 1.0
    tex_coords = np.array([[0.0, 0.0], [15.0, 0.0], [0.0, 15.0]],
                          np.float32)
    # bilinear: nearest sampling is discontinuous exactly on texel-center
    # boundaries (round(7.5)) where cross-program fusion differences flip
    # the texel; bilinear is continuous so backend parity is meaningful
    img_x, d_x = raster.render_texture(verts[None], tris, tex, tex_coords,
                                       tris, h=32, w=32, bb=32,
                                       bilinear=True)
    img_p, d_p = render_texture_pallas(verts[None], tris, tex, tex_coords,
                                       tris, h=32, w=32, win=32,
                                       bilinear=True, interpret=True)
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_x),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_x), atol=1e-5)
    # the raster buffers themselves are bit-identical across backends
    out_x = raster.rasterize_triangles(verts[None], tris, h=32, w=32,
                                       bb=32)
    from voicepuppet_tpu.ops.raster_pallas import rasterize_triangles_pallas
    out_p = rasterize_triangles_pallas(verts[None], tris, h=32, w=32,
                                       win=32, interpret=True)
    np.testing.assert_array_equal(np.asarray(out_p.triangle_buffer),
                                  np.asarray(out_x.triangle_buffer))
    np.testing.assert_array_equal(np.asarray(out_p.depth_buffer),
                                  np.asarray(out_x.depth_buffer))


def test_grouped_kernel_matches_sequential_spec(mesh):
    """The grouped-RMW Mosaic kernel (one window read-modify-write per 4
    consecutive triangles, merged with the order-free max-depth/min-id
    rule) must match the sequential spec bit-exactly on a mesh-local
    triangle order — and the mesh must actually take the grouped path
    (fits=True), not the fallback."""
    from voicepuppet_tpu.ops.raster_pallas import (
        _grouped_table, render_colors_grouped_pallas)
    import jax.numpy as jnp
    verts, tris, colors = mesh
    _, fits = _grouped_table(jnp.asarray(verts[None]), jnp.asarray(tris),
                             H, W, 32, 4, pad_to=64)
    assert bool(fits), "test mesh must exercise the grouped path"
    want_img, want_mask = raster_ref.render_colors_ref(verts, tris, colors,
                                                       H, W)
    # fallback=False: the grouped kernel itself, no cond
    got_img, got_mask = render_colors_grouped_pallas(
        verts[None], colors[None], tris, h=H, w=W, fallback=False,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(got_mask[0]), want_mask)
    np.testing.assert_array_equal(np.asarray(got_img[0]), want_img)
    # the production configuration: batch 16 -> fb=8 interleave, chunk 64
    # (multi-chunk grid), through the cond wrapper
    vb = np.broadcast_to(verts[None], (16,) + verts.shape)
    cb = np.broadcast_to(colors[None], (16,) + colors.shape)
    img_b, mask_b = render_colors_grouped_pallas(vb, cb, tris, h=H, w=W,
                                                 interpret=True)
    for i in (0, 7, 15):
        np.testing.assert_array_equal(np.asarray(mask_b[i]), want_mask)
        np.testing.assert_array_equal(np.asarray(img_b[i]), want_img)


def test_grouped_kernel_falls_back_on_scattered_mesh():
    """A triangle order with NO screen locality (group row spread larger
    than the window) must take the lax.cond fallback to the per-triangle
    kernel and stay exact."""
    from voicepuppet_tpu.ops.raster_pallas import (
        _grouped_table, render_colors_grouped_pallas)
    import jax.numpy as jnp
    # two triangles in one group, 60 rows apart: cannot share a 32-row
    # window
    verts = np.array([[4.0, 2.0, 1.0], [28.0, 2.0, 1.0], [4.0, 10.0, 1.0],
                      [4.0, 62.0, 2.0], [28.0, 62.0, 2.0],
                      [4.0, 70.0, 2.0]], np.float32)
    tris = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    colors = np.array([[200.0]] * 3 + [[50.0]] * 3, np.float32)
    _, fits = _grouped_table(jnp.asarray(verts[None]), jnp.asarray(tris),
                             96, 96, 32, 4, pad_to=64)
    assert not bool(fits)
    want_img, want_mask = raster_ref.render_colors_ref(verts, tris, colors,
                                                       96, 96)
    got_img, got_mask = render_colors_grouped_pallas(
        verts[None], colors[None], tris, h=96, w=96, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_mask[0]), want_mask)
    np.testing.assert_array_equal(np.asarray(got_img[0]), want_img)


def test_grouped_kernel_in_group_depth_tie_first_wins():
    """Two same-depth overlapping triangles inside ONE group: the
    register merge must keep the lower id (the sequential first-wins
    rule), and a LATER group at equal depth must lose to the buffer."""
    from voicepuppet_tpu.ops.raster_pallas import (
        render_colors_grouped_pallas)
    # 6 overlapping same-depth triangles spanning two groups of 4
    base = np.array([[4.0, 4.0, 1.0], [28.0, 4.0, 1.0], [4.0, 28.0, 1.0]],
                    np.float32)
    verts = np.concatenate([base + np.array([i * 0.25, 0.0, 0.0],
                                            np.float32)
                            for i in range(6)], axis=0)
    tris = np.arange(18, dtype=np.int32).reshape(6, 3)
    colors = np.concatenate([np.full((3, 1), 40.0 + 10 * i, np.float32)
                             for i in range(6)], axis=0)
    # compare against the per-triangle kernel (same f32 barycentric
    # precision): this mesh puts diagonal edges exactly on pixel centers,
    # where BOTH kernels legitimately diverge from the float64 sequential
    # ref by one boundary pixel — the claim under test is that the
    # grouped register merge preserves the per-triangle kernel's in-order
    # tie semantics bit-exactly
    from voicepuppet_tpu.ops.raster_pallas import render_colors_pallas
    want_img, want_mask = render_colors_pallas(
        verts[None], colors[None], tris, h=64, w=64, win=32,
        interpret=True)
    got_img, got_mask = render_colors_grouped_pallas(
        verts[None], colors[None], tris, h=64, w=64, fallback=False,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(got_mask), np.asarray(want_mask))
    np.testing.assert_array_equal(np.asarray(got_img), np.asarray(want_img))
    # triangle 0's color (40) must own the overlap region
    assert np.asarray(got_img[0])[10, 10, 0] == 40


def test_grouped_kernel_degenerate_and_occlusion():
    """Degenerate (zero-area) triangle quirk + cross-group occlusion both
    survive the grouped merge."""
    from voicepuppet_tpu.ops.raster_pallas import (
        render_colors_grouped_pallas)
    verts = np.array([
        [10.0, 10.0, 1.0], [14.0, 10.0, 1.0], [12.0, 10.0, 1.0],  # degen
        [2.0, 2.0, 5.0], [28.0, 2.0, 5.0], [2.0, 28.0, 5.0],      # near
        [2.0, 2.0, 1.0], [28.0, 2.0, 1.0], [2.0, 28.0, 1.0],      # far
    ], np.float32)
    tris = np.array([[0, 1, 2], [3, 4, 5], [6, 7, 8]], np.int32)
    colors = np.array([[90.0]] * 3 + [[200.0]] * 3 + [[50.0]] * 3,
                      np.float32)
    want_img, want_mask = raster_ref.render_colors_ref(verts, tris, colors,
                                                       32, 32)
    got_img, got_mask = render_colors_grouped_pallas(
        verts[None], colors[None], tris, h=32, w=32, fallback=False,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(got_mask[0]), want_mask)
    np.testing.assert_array_equal(np.asarray(got_img[0]), want_img)


def test_grouped_interp_kernel_matches_spec(mesh):
    """The grouped interp-depth kernel (grouped register merge under
    interpolated depth + 2px border override) must match the sequential
    spec via the grouped path, and fall back exactly on non-local
    orders."""
    from voicepuppet_tpu.ops.raster_pallas import (
        _grouped_table, rasterize_triangles_pallas)
    import jax.numpy as jnp
    verts, tris, colors = mesh
    _, fits = _grouped_table(jnp.asarray(verts[None]), jnp.asarray(tris),
                             H, W, 32, 4, pad_to=48)
    assert bool(fits), "test mesh must exercise the grouped path"
    want_d, want_t, want_w = raster_ref.rasterize_triangles_ref(
        verts, tris, H, W)
    out = rasterize_triangles_pallas(verts[None], tris, h=H, w=W, win=32,
                                     group=4, interpret=True)
    np.testing.assert_allclose(np.asarray(out.depth_buffer[0]), want_d,
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out.triangle_buffer[0]),
                                  want_t)
    cov = want_t >= 0
    np.testing.assert_allclose(
        np.asarray(out.barycentric_weight[0])[cov], want_w[cov],
        atol=1e-3)


def test_pallas_nonpow2_fb_unroll_tail(mesh):
    """Regression: with an explicit non-power-of-two fb (allowed — fb
    must only divide B) the SMEM chunk is 512//fb, not a multiple of the
    triangle-unroll 4; the unrolled loop used to silently skip the
    trailing chunk%4 triangles of every chunk.  fb=6 -> chunk=85 must
    still match the sequential spec exactly."""
    from voicepuppet_tpu.ops.raster_pallas import render_colors_pallas
    verts, tris, colors = mesh
    want_img, want_mask = raster_ref.render_colors_ref(verts, tris, colors,
                                                       H, W)
    vb = np.broadcast_to(verts[None], (6,) + verts.shape)
    cb = np.broadcast_to(colors[None], (6,) + colors.shape)
    got_img, got_mask = render_colors_pallas(vb, cb, tris, h=H, w=W,
                                             fb=6, interpret=True)
    for i in range(6):
        np.testing.assert_array_equal(np.asarray(got_mask[i]), want_mask)
        np.testing.assert_array_equal(np.asarray(got_img[i]), want_img)


def test_pallas_tall_triangle_guard_renders_exactly(mesh):
    """A triangle taller than win-7 rows used to be silently cropped by
    the aligned window (round-3 VERDICT weak #2).  The production path's
    device-side fits preflight must now fall back to a full-canvas window
    and match the sequential spec exactly; guard=False reproduces the old
    cropped (wrong) output, proving the test actually trips the guard."""
    from voicepuppet_tpu.ops.raster_pallas import render_colors_pallas
    verts, tris, colors = mesh
    verts = verts.copy()
    # stretch one triangle to span most of the canvas vertically
    t0 = tris[0]
    # fractional .3 offsets keep every edge off the float-boundary
    # pixels where the vectorized inside-test and the sequential ref can
    # legitimately disagree by one borderline pixel
    verts[t0[0], :2] = [W * 0.5, 2.3]
    verts[t0[1], :2] = [W * 0.25, H - 3.3]
    verts[t0[2], :2] = [W * 0.75, H - 5.3]
    verts[t0, 2] = 50.0  # in front: the tall triangle must win its pixels
    want_img, want_mask = raster_ref.render_colors_ref(verts, tris, colors,
                                                       H, W)
    got_img, got_mask = render_colors_pallas(verts[None], colors[None],
                                             tris, h=H, w=W, win=16,
                                             interpret=True)
    np.testing.assert_array_equal(np.asarray(got_mask[0]), want_mask)
    np.testing.assert_array_equal(np.asarray(got_img[0]), want_img)

    cropped_img, _ = render_colors_pallas(verts[None], colors[None], tris,
                                          h=H, w=W, win=16, guard=False,
                                          interpret=True)
    assert (np.asarray(cropped_img[0]) != want_img).any(), \
        "guard=False should crop (otherwise this test guards nothing)"


def test_pallas_interp_tall_triangle_guard(mesh):
    """Same preflight on the interp-depth kernel path."""
    from voicepuppet_tpu.ops.raster_pallas import \
        rasterize_winner_interp_pallas
    verts, tris, _ = mesh
    verts = verts.copy()
    t0 = tris[0]
    # fractional .3 offsets keep every edge off the float-boundary
    # pixels where the vectorized inside-test and the sequential ref can
    # legitimately disagree by one borderline pixel
    verts[t0[0], :2] = [W * 0.5, 2.3]
    verts[t0[1], :2] = [W * 0.25, H - 3.3]
    verts[t0[2], :2] = [W * 0.75, H - 5.3]
    verts[t0, 2] = 50.0
    want_d, want_t, _ = raster_ref.rasterize_triangles_ref(verts, tris,
                                                           H, W)
    winner, depth = rasterize_winner_interp_pallas(verts[None], tris,
                                                   h=H, w=W, win=16,
                                                   interpret=True)
    got_t = np.asarray(winner[0])
    got_t = np.where(got_t == tris.shape[0], -1, got_t)
    cov = want_t >= 0
    disagree = (got_t != want_t) & cov
    assert disagree.mean() < 0.01  # depth ties only, as elsewhere
    sel = (got_t == want_t) & cov
    # the tall triangle's pixels must be present (guard active, not crop)
    assert ((got_t == 0) & cov).sum() > 500
    # barycentric depth interpolation over a ~90-px-tall triangle carries
    # O(1e-3) float32 rounding vs the float64 ref; small-mesh parity at
    # 1e-4 is pinned by test_pallas_rasterize_triangles_matches_spec
    np.testing.assert_allclose(np.asarray(depth[0])[sel], want_d[sel],
                               atol=2e-3)


def test_xband_kernel_matches_sequential_spec(mesh):
    """The x-banded Mosaic kernel (128-lane windows, triangles shifted
    into 96-strided bands, order-free band merge) must match the
    sequential spec bit-exactly on a wide canvas where triangles land in
    BOTH bands — including across the 32-px band overlap."""
    from voicepuppet_tpu.ops.raster_pallas import (_num_xbands,
                                                   render_colors_xband_pallas)
    verts, tris, colors = mesh
    wide_w = 224
    assert _num_xbands(wide_w) == 2
    verts = verts.copy()
    # spread the mesh across the full 224-px width so both bands and the
    # [96, 128) overlap are exercised
    verts[:, 0] = (verts[:, 0] - verts[:, 0].mean()) * 2.2 + wide_w / 2
    want_img, want_mask = raster_ref.render_colors_ref(verts, tris, colors,
                                                       H, wide_w)
    assert want_mask[:, :96].sum() > 0 and want_mask[:, 128:].sum() > 0
    for guard in (True, False):   # False forces the banded path: proves
        got_img, got_mask = render_colors_xband_pallas(   # the guard cond
            verts[None], colors[None], tris, h=H, w=wide_w,  # took it too
            guard=guard, interpret=True)
        np.testing.assert_array_equal(np.asarray(got_mask[0]), want_mask)
        np.testing.assert_array_equal(np.asarray(got_img[0]), want_img)


def test_xband_depth_and_tie_across_band_seam():
    """Triangles assigned to DIFFERENT bands overlapping in the [96, 128)
    seam region: the band merge must reproduce the sequential semantics —
    strictly nearer wins regardless of band/order, and on an exact depth
    tie the lower triangle id wins (mesh_core.cpp:205: strict >)."""
    from voicepuppet_tpu.ops.raster_pallas import render_colors_xband_pallas
    w = 224
    # band-0 triangle (x_min < 96) and band-1 triangle (x_min >= 96),
    # both covering pixels around x ~ 105
    tri_a = [[90.0, 10.0], [120.0, 10.0], [105.0, 40.0]]
    tri_b = [[100.0, 5.0], [126.0, 20.0], [96.5, 35.0]]
    for za, zb, first_wins_color in [(5.0, 1.0, 200), (1.0, 5.0, 50),
                                     (3.0, 3.0, 200)]:
        verts = np.array([p + [za] for p in tri_a]
                         + [p + [zb] for p in tri_b], np.float32)
        colors = np.array([[200.0]] * 3 + [[50.0]] * 3, np.float32)
        tris = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
        want_img, want_mask = raster_ref.render_colors_ref(
            verts, tris, colors, 48, w)
        # win=48 = full-height windows: the y dimension is not under
        # test here (triangles are ~30 px tall), only the x-band merge
        got_img, got_mask = render_colors_xband_pallas(
            verts[None], colors[None], tris, h=48, w=w, win=48,
            guard=False, interpret=True)
        np.testing.assert_array_equal(np.asarray(got_mask[0]), want_mask)
        np.testing.assert_array_equal(np.asarray(got_img[0]), want_img)
        assert np.asarray(got_img[0])[15, 107, 0] == first_wins_color


def test_xband_guard_falls_back_on_wide_triangle(mesh):
    """A triangle wider than the 33-px band slack straddling a band seam
    must trip the x-fits preflight: guard=True renders exactly via the
    full-width fallback; guard=False provably crops (so the test actually
    guards something)."""
    from voicepuppet_tpu.ops.raster_pallas import render_colors_xband_pallas
    verts, tris, colors = mesh
    wide_w = 224
    verts = verts.copy()
    verts[:, 0] += (wide_w - W) / 2
    t0 = tris[0]
    # x-span ~120 px starting at x=60: band 0, x_max' = 180 > 127
    verts[t0[0], :2] = [60.3, H * 0.4]
    verts[t0[1], :2] = [180.3, H * 0.3]
    verts[t0[2], :2] = [120.3, H * 0.6]
    verts[t0, 2] = 50.0  # in front: its pixels must be visible
    want_img, want_mask = raster_ref.render_colors_ref(verts, tris, colors,
                                                       H, wide_w)
    got_img, got_mask = render_colors_xband_pallas(
        verts[None], colors[None], tris, h=H, w=wide_w, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_mask[0]), want_mask)
    np.testing.assert_array_equal(np.asarray(got_img[0]), want_img)
    cropped_img, _ = render_colors_xband_pallas(
        verts[None], colors[None], tris, h=H, w=wide_w, guard=False,
        interpret=True)
    assert (np.asarray(cropped_img[0]) != want_img).any(), \
        "guard=False should crop (otherwise this test guards nothing)"


def test_xband_low_bit_y_coords_stay_bit_exact():
    """Regression for the round-4 on-device find: shifting p0y by
    +h·band rounded away its low float32 bits (coarser ulp grid at the
    larger magnitude), flipping borderline inside tests — 5/114k winner
    flips on the real mesh.  Band-1 triangles whose y coordinates carry
    2^-17-grade low bits (finer than ulp at y+224) must still match the
    plain kernel bit-exactly; the fix shifts only the integer window
    origin and rebases rows via y0w % h in-kernel."""
    from voicepuppet_tpu.ops.raster_pallas import (
        render_colors_pallas, render_colors_xband_pallas)
    rng = np.random.default_rng(7)
    n_tri = 96
    # all triangles inside band 1 (x in [100, 214]); y spans <= 8 px so
    # the win=16 aligned window never crops (the guarded plain path
    # would otherwise fall back to full render while guard=False crops,
    # a difference that is not under test here); y low bits on the
    # 2^-17 grid (dropped by fl(y + 224))
    anchor = rng.uniform([100.0, 8.0], [200.0, 200.0], (n_tri, 2))
    offs = rng.uniform(2.0, 14.0, (n_tri, 2, 2))
    offs[..., 1] = np.clip(offs[..., 1], 2.0, 8.0)
    pts = np.concatenate([anchor[:, None], anchor[:, None] + offs], 1)
    pts = np.float32(np.floor(pts * 4) / 4)
    pts[..., 1] += np.float32(2.0 ** -17) * rng.integers(
        0, 8, (n_tri, 3)).astype(np.float32)
    # exact depth ties so winner identity is decided by the inside test
    verts = np.concatenate(
        [pts.reshape(-1, 2), np.full((3 * n_tri, 1), 5.0, np.float32)],
        axis=1).astype(np.float32)
    tris = np.arange(3 * n_tri, dtype=np.int32).reshape(n_tri, 3)
    colors = np.repeat(rng.uniform(0, 255, (n_tri, 1, 3)), 3, axis=1
                       ).reshape(-1, 3).astype(np.float32)
    want_img, want_mask = render_colors_pallas(
        verts[None], colors[None], tris, h=224, w=224, interpret=True)
    got_img, got_mask = render_colors_xband_pallas(
        verts[None], colors[None], tris, h=224, w=224, guard=False,
        interpret=True)
    assert np.asarray(want_mask).sum() > 0
    np.testing.assert_array_equal(np.asarray(got_mask), np.asarray(want_mask))
    np.testing.assert_array_equal(np.asarray(got_img), np.asarray(want_img))


def test_xband_edge_through_pixel_centers_minus_ulp():
    """Deterministic form of the p0y-rounding regression: a band-1
    triangle whose p0-p1 edge (slope 3/4) passes 2^-17 BELOW the pixel
    centers (108,43), (112,46), (116,49) -- exactly outside (the f32
    cancellation leaves u a clean negative multiple of 2^-8/deno).  The
    broken +h*band table shift rounded p0y onto the lattice
    (fl(40 - 2^-17 + 224) = 264 -- the low bit is under half an ulp at
    264), turning u = 0 -> inside at those pixels.  The fixed path
    (integer-only y0w shift, rows rebased via y0w % h in-kernel) must
    match the sequential spec bit-exactly."""
    from voicepuppet_tpu.ops.raster_pallas import render_colors_xband_pallas
    eps = np.float32(2.0 ** -17)
    # the premise of the regression: the +224 shift drops the low bit
    assert np.float32(np.float32(np.float32(40.0) - eps)
                      + np.float32(224.0)) == 264.0
    verts = np.array([[104.0, 40.0 - eps, 5.0],
                      [120.0, 52.0 - eps, 5.0],
                      [118.0, 42.0, 5.0]], np.float32)
    tris = np.array([[0, 1, 2]], np.int32)
    colors = np.full((3, 3), 90.0, np.float32)
    want_img, want_mask = raster_ref.render_colors_ref(verts, tris, colors,
                                                       224, 224)
    # the on-edge pixels are OUTSIDE in exact semantics; the triangle
    # interior is live right next to them
    assert want_mask[46, 112] == 0 and want_mask[43, 108] == 0
    assert want_mask[49, 116] == 0 and want_mask[44, 112] > 0
    got_img, got_mask = render_colors_xband_pallas(
        verts[None], colors[None], tris, h=224, w=224, guard=False,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(got_mask[0]), want_mask)
    np.testing.assert_array_equal(np.asarray(got_img[0]), want_img)


def test_xband_narrow_canvas_dispatches_to_plain():
    """Canvases <= 128 px wide take the single-band (plain) path and stay
    exact."""
    from voicepuppet_tpu.ops.raster_pallas import (_num_xbands,
                                                   render_colors_xband_pallas)
    assert _num_xbands(96) == 1
    verts = np.array([[2.0, 2.0, 1.0], [28.0, 2.0, 1.0],
                      [2.0, 28.0, 1.0]], np.float32)
    tris = np.array([[0, 1, 2]], np.int32)
    colors = np.full((3, 3), 90.0, np.float32)
    want_img, want_mask = raster_ref.render_colors_ref(verts, tris, colors,
                                                       32, 96)
    got_img, got_mask = render_colors_xband_pallas(
        verts[None], colors[None], tris, h=32, w=96, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_mask[0]), want_mask)
    np.testing.assert_array_equal(np.asarray(got_img[0]), want_img)
