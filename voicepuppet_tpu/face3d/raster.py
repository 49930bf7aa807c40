"""Z-buffer triangle rasterization on TPU.

Replaces the reference's C++ kernels (utils/cython/mesh_core.cpp):
``_render_colors_core`` (:169-231), ``_rasterize_triangles_core`` (:108-166),
``_render_texture_core`` (:234-333) and ``_get_normal_core`` (:85-105).

TPU-first formulation
---------------------
The C++ kernel is a serial loop over ~70k triangles with a read-modify-write
depth test per covered pixel — a data-dependent scatter that is hostile to a
vector machine.  Here rasterization is re-cast as three data-parallel phases
with *no* sequential dependency:

1. **Fragment expansion**: every triangle emits a static ``bb x bb`` window
   of candidate fragments anchored at its clipped bbox origin (BFM triangles
   are ~1-4 px at the 224² canvas, so a small static window covers the mesh;
   the window size is a compile-time knob per canvas scale).
2. **Depth resolve**: a single scatter-max of fragment depths into the pixel
   grid, followed by a scatter-min of triangle ids among depth-winners — this
   reproduces the C++ sequential semantics exactly (strict ``>`` test means
   the *first* triangle at a given depth wins; min-index = first).
3. **Attribute gather**: per-pixel winner ids gather colors / barycentrics /
   texture samples — pure gathers, trivially vectorized.

Everything is batched over a leading frame axis via ``vmap``, so a whole
clip rasterizes in one XLA program (the reference renders one frame per
host call; infer_bfmvid.py:231-243).

Semantics preserved from the C++ (validated by tests/test_raster.py against
a sequential NumPy port of mesh_core.cpp):
  * flat shading: per-triangle depth & color are the vertex means, with the
    C++ integer truncation ``(int)(c0+c1+c2)/3`` (mesh_core.cpp:219).
  * the degenerate-triangle quirk: zero-area triangles pass the inside test
    over their whole bbox (``inverDeno = 0`` -> u = v = 0; mesh_core.cpp:40).
  * ``rasterize_triangles``/``render_texture`` treat a 2px canvas border as
    unconditionally inside (mesh_core.cpp:148, 292).
  * depth-buffer init -99999 with a strict ``>`` test.

Known divergence (deliberate): ``render_texture`` reads the texture V
coordinate through the *texture* triangle index; the C++ mixes mesh and
texture indices (mesh_core.cpp:270-272, ``tex_coords[3*tri_p0_ind + 1]``) —
a bug we do not replicate.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DEPTH_INIT = -99999.0


def _triangle_setup(vertices: jax.Array, triangles: jax.Array):
    """Gather per-triangle corner positions/depths and barycentric constants.

    vertices: [V, 3] (x, y, depth); triangles: [F, 3] int32 (0-based).
    Returns dict of [F, ...] arrays.
    """
    tri_xy = vertices[triangles, :2]       # [F, 3, 2]
    tri_z = vertices[triangles, 2]         # [F, 3]
    p0, p1, p2 = tri_xy[:, 0], tri_xy[:, 1], tri_xy[:, 2]
    v0 = p2 - p0
    v1 = p1 - p0
    dot00 = jnp.sum(v0 * v0, -1)
    dot01 = jnp.sum(v0 * v1, -1)
    dot11 = jnp.sum(v1 * v1, -1)
    deno = dot00 * dot11 - dot01 * dot01
    inv_deno = jnp.where(deno == 0, 0.0, 1.0 / jnp.where(deno == 0, 1.0,
                                                         deno))
    return dict(p0=p0, v0=v0, v1=v1, tri_z=tri_z,
                dot00=dot00, dot01=dot01, dot11=dot11, inv_deno=inv_deno,
                xs=tri_xy[..., 0], ys=tri_xy[..., 1])


def _bbox(setup, h: int, w: int):
    """Clipped integer bbox per triangle (mesh_core.cpp:132-141)."""
    x_min = jnp.maximum(jnp.ceil(jnp.min(setup["xs"], -1)), 0.0)
    x_max = jnp.minimum(jnp.floor(jnp.max(setup["xs"], -1)), w - 1.0)
    y_min = jnp.maximum(jnp.ceil(jnp.min(setup["ys"], -1)), 0.0)
    y_max = jnp.minimum(jnp.floor(jnp.max(setup["ys"], -1)), h - 1.0)
    empty = (x_max < x_min) | (y_max < y_min)
    return (x_min.astype(jnp.int32), x_max.astype(jnp.int32),
            y_min.astype(jnp.int32), y_max.astype(jnp.int32), empty)


def _fragment_grid(x_min, y_min, bb: int):
    """[F, bb*bb] fragment pixel coordinates anchored at each bbox origin."""
    dy, dx = jnp.meshgrid(jnp.arange(bb, dtype=jnp.int32),
                          jnp.arange(bb, dtype=jnp.int32), indexing="ij")
    dx = dx.reshape(-1)
    dy = dy.reshape(-1)
    fx = x_min[:, None] + dx[None, :]
    fy = y_min[:, None] + dy[None, :]
    return fx, fy


def _barycentric(setup, fx, fy):
    """u, v at fragment centers (mesh_core.cpp:23-50).  fx/fy: [F, K]."""
    px = fx.astype(jnp.float32) - setup["p0"][:, 0:1]
    py = fy.astype(jnp.float32) - setup["p0"][:, 1:2]
    dot02 = setup["v0"][:, 0:1] * px + setup["v0"][:, 1:2] * py
    dot12 = setup["v1"][:, 0:1] * px + setup["v1"][:, 1:2] * py
    u = (setup["dot11"][:, None] * dot02
         - setup["dot01"][:, None] * dot12) * setup["inv_deno"][:, None]
    v = (setup["dot00"][:, None] * dot12
         - setup["dot01"][:, None] * dot02) * setup["inv_deno"][:, None]
    return u, v


def _resolve(pix: jax.Array, depth: jax.Array, valid: jax.Array,
             num_tri: int, num_pix: int):
    """Scatter-max depth resolve + first-triangle-wins tie-break.

    pix: [F, K] flattened pixel ids (invalid -> num_pix dump slot);
    depth: [F, K]; valid: [F, K] bool.
    Returns (winner [num_pix] int32 in [0, F], depth_buf [num_pix]).
    """
    pix = jnp.where(valid, pix, num_pix)
    depth = jnp.where(valid, depth, DEPTH_INIT)
    flat_pix = pix.reshape(-1)
    flat_depth = depth.reshape(-1)

    depth_buf = jnp.full((num_pix + 1,), DEPTH_INIT, jnp.float32)
    depth_buf = depth_buf.at[flat_pix].max(flat_depth,
                                           mode="drop",
                                           indices_are_sorted=False)

    tri_ids = jnp.broadcast_to(
        jnp.arange(num_tri, dtype=jnp.int32)[:, None], pix.shape).reshape(-1)
    is_winner = (flat_depth == depth_buf[flat_pix]) & (flat_depth >
                                                       DEPTH_INIT)
    winner_buf = jnp.full((num_pix + 1,), num_tri, jnp.int32)
    winner_buf = winner_buf.at[jnp.where(is_winner, flat_pix,
                                         num_pix)].min(tri_ids, mode="drop")
    return winner_buf[:num_pix], depth_buf[:num_pix]


def _render_colors_single(vertices: jax.Array, colors: jax.Array,
                          triangles: jax.Array, h: int, w: int, bb: int):
    setup = _triangle_setup(vertices, triangles)
    x_min, x_max, y_min, y_max, empty = _bbox(setup, h, w)
    fx, fy = _fragment_grid(x_min, y_min, bb)
    u, v = _barycentric(setup, fx, fy)
    inside = (u >= 0) & (v >= 0) & (u + v < 1)
    in_box = (fx <= x_max[:, None]) & (fy <= y_max[:, None])
    valid = inside & in_box & (~empty)[:, None]

    flat_depth = jnp.mean(setup["tri_z"], axis=-1)  # mesh_core.cpp:204
    depth = jnp.broadcast_to(flat_depth[:, None], fx.shape)
    pix = fy * w + fx
    winner, _ = _resolve(pix, depth, valid, triangles.shape[0], h * w)

    # Flat color with the C++ integer truncation (mesh_core.cpp:219):
    # colors arrive pre-quantized by the caller (np.clip(...).astype(int32),
    # infer_bfmvid.py:98), so the sum is integral and (int)sum/3 == sum//3.
    tri_colors = colors[triangles, :]              # [F, 3, C]
    color_sum = jnp.sum(jnp.floor(tri_colors), axis=1)
    flat_color = jnp.floor(color_sum / 3.0)        # [F, C]
    flat_color = jnp.concatenate(
        [flat_color, jnp.zeros((1, flat_color.shape[1]),
                               flat_color.dtype)], axis=0)

    covered = winner < triangles.shape[0]
    image = flat_color[winner].reshape(h, w, -1)
    image = jnp.where(covered.reshape(h, w, 1), image, 0.0)
    mask = jnp.where(covered, jnp.uint8(255), jnp.uint8(0)).reshape(h, w)
    return image.astype(jnp.uint8), mask


@functools.partial(jax.jit, static_argnames=("h", "w", "bb"))
def render_colors(vertices: jax.Array, colors: jax.Array,
                  triangles: jax.Array, h: int = 224, w: int = 224,
                  bb: int = 12) -> Tuple[jax.Array, jax.Array]:
    """Flat-shaded z-buffer render (ref: mesh_core.cpp:169-231).

    vertices: [B, V, 3] (x, y, depth in pixel coords); colors: [B, V, C]
    (0-255, pre-truncated); triangles: [F, 3] int32 0-based.
    Returns (image [B, h, w, C] uint8, face_mask [B, h, w] uint8).

    ``bb`` caps the per-triangle bbox window; triangles larger than ``bb``
    px are only partially filled (BFM triangles at 224² are 1-4 px).
    """
    fn = functools.partial(_render_colors_single, h=h, w=w, bb=bb)
    return jax.vmap(fn, in_axes=(0, 0, None))(vertices, colors, triangles)


class RasterOut(NamedTuple):
    depth_buffer: jax.Array        # [B, h, w]
    triangle_buffer: jax.Array     # [B, h, w] int32, -1 where empty
    barycentric_weight: jax.Array  # [B, h, w, 3]


def _rasterize_single(vertices: jax.Array, triangles: jax.Array,
                      h: int, w: int, bb: int):
    setup = _triangle_setup(vertices, triangles)
    x_min, x_max, y_min, y_max, empty = _bbox(setup, h, w)
    fx, fy = _fragment_grid(x_min, y_min, bb)
    u, v = _barycentric(setup, fx, fy)
    inside = (u >= 0) & (v >= 0) & (u + v < 1)
    border = ((fx < 2) | (fx > w - 3) | (fy < 2) |
              (fy > h - 3))  # mesh_core.cpp:148
    in_box = (fx <= x_max[:, None]) & (fy <= y_max[:, None])
    valid = (inside | border) & in_box & (~empty)[:, None]

    w0 = 1.0 - u - v
    tz = setup["tri_z"]
    depth = (w0 * tz[:, 0:1] + v * tz[:, 1:2] + u * tz[:, 2:3])
    pix = fy * w + fx
    winner, depth_buf = _resolve(pix, depth, valid, triangles.shape[0],
                                 h * w)

    # Recompute barycentrics at each winning pixel (gather, not store).
    covered = winner < triangles.shape[0]
    safe_winner = jnp.where(covered, winner, 0)
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.int32),
                          jnp.arange(w, dtype=jnp.int32), indexing="ij")
    sub = {k: setup[k][safe_winner.reshape(h, w)]
           for k in ("p0", "v0", "v1", "dot00", "dot01", "dot11",
                     "inv_deno")}
    px = xs.astype(jnp.float32) - sub["p0"][..., 0]
    py = ys.astype(jnp.float32) - sub["p0"][..., 1]
    dot02 = sub["v0"][..., 0] * px + sub["v0"][..., 1] * py
    dot12 = sub["v1"][..., 0] * px + sub["v1"][..., 1] * py
    uu = (sub["dot11"] * dot02 - sub["dot01"] * dot12) * sub["inv_deno"]
    vv = (sub["dot00"] * dot12 - sub["dot01"] * dot02) * sub["inv_deno"]
    weights = jnp.stack([1.0 - uu - vv, vv, uu], axis=-1)
    weights = jnp.where(covered.reshape(h, w, 1), weights, 0.0)

    tri_out = jnp.where(covered, winner, -1).reshape(h, w)
    return depth_buf.reshape(h, w), tri_out, weights


@functools.partial(jax.jit, static_argnames=("h", "w", "bb"))
def rasterize_triangles(vertices: jax.Array, triangles: jax.Array,
                        h: int = 224, w: int = 224,
                        bb: int = 12) -> RasterOut:
    """Triangle-id + barycentric rasterization
    (ref: mesh_core.cpp:108-166).  vertices: [B, V, 3]."""
    fn = functools.partial(_rasterize_single, h=h, w=w, bb=bb)
    d, t, wgt = jax.vmap(fn, in_axes=(0, None))(vertices, triangles)
    return RasterOut(d, t, wgt)


def _render_texture_single(vertices, triangles, texture, tex_coords,
                           tex_triangles, h, w, bb, bilinear):
    depth_buf, tri_buf, weights = _rasterize_single(vertices, triangles,
                                                    h, w, bb)
    covered = tri_buf >= 0
    safe_tri = jnp.where(covered, tri_buf, 0)
    tex_tri = tex_triangles[safe_tri]               # [h, w, 3]
    corners = tex_coords[tex_tri, :2]               # [h, w, 3, 2]
    tp = jnp.einsum("hwk,hwkc->hwc", weights, corners)
    tex_h, tex_w = texture.shape[0], texture.shape[1]
    tx = jnp.clip(tp[..., 0], 0.0, tex_w - 1.0)
    ty = jnp.clip(tp[..., 1], 0.0, tex_h - 1.0)
    if bilinear:
        x0 = jnp.floor(tx).astype(jnp.int32)
        y0 = jnp.floor(ty).astype(jnp.int32)
        x1 = jnp.ceil(tx).astype(jnp.int32)
        y1 = jnp.ceil(ty).astype(jnp.int32)
        xd = (tx - x0)[..., None]
        yd = (ty - y0)[..., None]
        ul = texture[y0, x0]
        ur = texture[y0, x1]
        dl = texture[y1, x0]
        dr = texture[y1, x1]
        sample = (ul * (1 - xd) * (1 - yd) + ur * xd * (1 - yd)
                  + dl * (1 - xd) * yd + dr * xd * yd)
    else:
        xi = jnp.round(tx).astype(jnp.int32)
        yi = jnp.round(ty).astype(jnp.int32)
        sample = texture[yi, xi]
    return jnp.where(covered[..., None], sample, 0.0), depth_buf


@functools.partial(jax.jit, static_argnames=("h", "w", "bb", "bilinear"))
def render_texture(vertices: jax.Array, triangles: jax.Array,
                   texture: jax.Array, tex_coords: jax.Array,
                   tex_triangles: jax.Array, h: int = 224, w: int = 224,
                   bb: int = 12, bilinear: bool = True):
    """UV-textured rasterization (ref: mesh_core.cpp:234-333).
    vertices: [B, V, 3]; texture: [th, tw, C]; tex_coords: [Vt, 2+]."""
    fn = functools.partial(_render_texture_single, h=h, w=w, bb=bb,
                           bilinear=bilinear)
    return jax.vmap(fn, in_axes=(0, None, None, None, None))(
        vertices, triangles, texture, tex_coords, tex_triangles)


@functools.partial(jax.jit, static_argnames=("num_vertices",))
def vertex_normals(tri_normal: jax.Array, triangles: jax.Array,
                   num_vertices: int) -> jax.Array:
    """One-ring scatter-add of per-triangle normals onto vertices
    (ref: mesh_core.cpp:85-105).  tri_normal: [..., F, 3]."""
    out = jnp.zeros(tri_normal.shape[:-2] + (num_vertices, 3),
                    tri_normal.dtype)
    for k in range(3):
        out = out.at[..., triangles[:, k], :].add(tri_normal)
    return out
