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
    """Scatter-max depth resolve + first-triangle-wins tie-break, batched.

    pix: [B, F, K] per-frame pixel ids; depth: [B, F, K]; valid bool.
    Returns (winner [B, num_pix] int32 in [0, F], depth_buf [B, num_pix]).

    TPU note: the batch axis is folded into the scatter index (frame b
    writes pixel range [b*stride, (b+1)*stride)) so XLA sees ONE flat 1-D
    scatter — a batched scatter under vmap lowers to a serialized loop and
    is ~3 orders of magnitude slower (measured 600ms vs 0.6ms for
    16x70k-triangle frames).
    """
    b = pix.shape[0]
    stride = num_pix + 1
    offsets = (jnp.arange(b, dtype=jnp.int32) * stride)[:, None, None]
    dump = b * stride
    flat_pix = jnp.where(valid, pix + offsets, dump).reshape(-1)
    flat_depth = jnp.where(valid, depth, DEPTH_INIT).reshape(-1)
    tri_ids = jnp.broadcast_to(
        jnp.arange(num_tri, dtype=jnp.int32)[None, :, None],
        pix.shape).reshape(-1)

    # XLA's TPU scatter/gather drop to a serialized path (~9ns/element)
    # above a size threshold; chunking keeps every op on the vectorized
    # emitter.  Pad to a multiple of the chunk (padding goes to the dump
    # slot, value DEPTH_INIT — a no-op for the max).
    chunk = 4_000_000
    n = flat_pix.shape[0]
    c = max(1, -(-n // chunk))
    pad = c * chunk - n
    if pad:
        flat_pix = jnp.concatenate(
            [flat_pix, jnp.full((pad,), dump, jnp.int32)])
        flat_depth = jnp.concatenate(
            [flat_depth, jnp.full((pad,), DEPTH_INIT, jnp.float32)])
        tri_ids = jnp.concatenate(
            [tri_ids, jnp.full((pad,), num_tri, jnp.int32)])
    cpix = flat_pix.reshape(c, chunk)
    cdepth = flat_depth.reshape(c, chunk)
    ctri = tri_ids.reshape(c, chunk)

    depth_buf = jnp.full((b * stride + 1,), DEPTH_INIT, jnp.float32)
    depth_buf = jax.lax.fori_loop(
        0, c, lambda i, buf: buf.at[cpix[i]].max(cdepth[i], mode="drop"),
        depth_buf)

    def winner_chunk(i, wbuf):
        d = depth_buf[cpix[i]]
        is_winner = (cdepth[i] == d) & (cdepth[i] > DEPTH_INIT)
        return wbuf.at[jnp.where(is_winner, cpix[i],
                                 dump)].min(ctri[i], mode="drop")

    winner_buf = jnp.full((b * stride + 1,), num_tri, jnp.int32)
    winner_buf = jax.lax.fori_loop(0, c, winner_chunk, winner_buf)

    winner = winner_buf[:b * stride].reshape(b, stride)[:, :num_pix]
    dbuf = depth_buf[:b * stride].reshape(b, stride)[:, :num_pix]
    return winner, dbuf


def _flat_fragments(vertices: jax.Array, triangles: jax.Array, h: int,
                    w: int, bb: int):
    """Per-frame fragment generation for the flat-shaded path:
    [V,3] -> (pix [F,K], depth [F,K], valid [F,K])."""
    setup = _triangle_setup(vertices, triangles)
    x_min, x_max, y_min, y_max, empty = _bbox(setup, h, w)
    fx, fy = _fragment_grid(x_min, y_min, bb)
    u, v = _barycentric(setup, fx, fy)
    inside = (u >= 0) & (v >= 0) & (u + v < 1)
    in_box = (fx <= x_max[:, None]) & (fy <= y_max[:, None])
    valid = inside & in_box & (~empty)[:, None]
    flat_depth = jnp.mean(setup["tri_z"], axis=-1)  # mesh_core.cpp:204
    depth = jnp.broadcast_to(flat_depth[:, None], fx.shape)
    return fy * w + fx, depth, valid


@functools.partial(jax.jit, static_argnames=("h", "w", "bb"))
def render_colors(vertices: jax.Array, colors: jax.Array,
                  triangles: jax.Array, h: int = 224, w: int = 224,
                  bb: int = 6) -> Tuple[jax.Array, jax.Array]:
    """Flat-shaded z-buffer render (ref: mesh_core.cpp:169-231).

    vertices: [B, V, 3] (x, y, depth in pixel coords); colors: [B, V, C]
    (0-255, pre-truncated); triangles: [F, 3] int32 0-based.
    Returns (image [B, h, w, C] uint8, face_mask [B, h, w] uint8).

    ``bb`` caps the per-triangle bbox window; triangles larger than ``bb``
    px are only partially filled (BFM triangles at 224² are 1-4 px).
    """
    b = vertices.shape[0]
    f = triangles.shape[0]
    pix, depth, valid = jax.vmap(
        functools.partial(_flat_fragments, triangles=triangles, h=h, w=w,
                          bb=bb))(vertices)
    winner, _ = _resolve(pix, depth, valid, f, h * w)

    # Flat color with the C++ integer truncation (mesh_core.cpp:219):
    # colors arrive pre-quantized by the caller (np.clip(...).astype(int32),
    # infer_bfmvid.py:98), so the sum is integral and (int)sum/3 == sum//3.
    tri_colors = colors[:, triangles, :]           # [B, F, 3, C]
    color_sum = jnp.sum(jnp.floor(tri_colors), axis=2)
    flat_color = jnp.floor(color_sum / 3.0)        # [B, F, C]
    c = flat_color.shape[-1]
    flat_color = jnp.concatenate(
        [flat_color, jnp.zeros((b, 1, c), flat_color.dtype)], axis=1)
    # fold batch into the gather index (single axis-0 gather; see _resolve)
    gidx = (winner + (jnp.arange(b, dtype=jnp.int32) * (f + 1))[:, None]
            ).reshape(-1)
    image = flat_color.reshape(b * (f + 1), c)[gidx].reshape(b, h, w, c)
    covered = (winner < f).reshape(b, h, w)
    image = jnp.where(covered[..., None], image, 0.0)
    mask = jnp.where(covered, jnp.uint8(255), jnp.uint8(0))
    return image.astype(jnp.uint8), mask


class RasterOut(NamedTuple):
    depth_buffer: jax.Array        # [B, h, w]
    triangle_buffer: jax.Array     # [B, h, w] int32, -1 where empty
    barycentric_weight: jax.Array  # [B, h, w, 3]


def _interp_fragments(vertices: jax.Array, triangles: jax.Array, h: int,
                      w: int, bb: int):
    """Per-frame fragments with interpolated depth + border rule."""
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
    return fy * w + fx, depth, valid, setup


def winner_weights(vertices: jax.Array, triangles: jax.Array,
                   winner: jax.Array, depth_buf: jax.Array, h: int, w: int,
                   setup=None) -> RasterOut:
    """Winner ids [B, h*w] (F = uncovered) + depth buffer -> RasterOut
    with barycentrics recomputed at each winning pixel (gather, not
    store); shared by the XLA and Mosaic backends.  ``setup``: the
    per-triangle constants if the caller already computed them (avoids
    relying on XLA CSE to dedupe the vmapped setup)."""
    b = vertices.shape[0]
    f = triangles.shape[0]
    if setup is None:
        setup = jax.vmap(functools.partial(_triangle_setup,
                                           triangles=triangles))(vertices)
    winner = winner.reshape(b, h * w)
    covered = winner < f
    safe = jnp.where(covered, winner, 0)
    gidx = (safe + (jnp.arange(b, dtype=jnp.int32) * f)[:, None]
            ).reshape(-1)
    sub = {k: setup[k].reshape((b * f,) + setup[k].shape[2:])[gidx]
           .reshape((b, h, w) + setup[k].shape[2:])
           for k in ("p0", "v0", "v1", "dot00", "dot01", "dot11",
                     "inv_deno")}
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.int32),
                          jnp.arange(w, dtype=jnp.int32), indexing="ij")
    px = xs[None].astype(jnp.float32) - sub["p0"][..., 0]
    py = ys[None].astype(jnp.float32) - sub["p0"][..., 1]
    dot02 = sub["v0"][..., 0] * px + sub["v0"][..., 1] * py
    dot12 = sub["v1"][..., 0] * px + sub["v1"][..., 1] * py
    uu = (sub["dot11"] * dot02 - sub["dot01"] * dot12) * sub["inv_deno"]
    vv = (sub["dot00"] * dot12 - sub["dot01"] * dot02) * sub["inv_deno"]
    weights = jnp.stack([1.0 - uu - vv, vv, uu], axis=-1)
    covered_hw = covered.reshape(b, h, w)
    weights = jnp.where(covered_hw[..., None], weights, 0.0)
    tri_out = jnp.where(covered_hw, winner.reshape(b, h, w), -1)
    return RasterOut(depth_buf.reshape(b, h, w), tri_out, weights)


@functools.partial(jax.jit, static_argnames=("h", "w", "bb"))
def rasterize_triangles(vertices: jax.Array, triangles: jax.Array,
                        h: int = 224, w: int = 224,
                        bb: int = 6) -> RasterOut:
    """Triangle-id + barycentric rasterization
    (ref: mesh_core.cpp:108-166).  vertices: [B, V, 3]."""
    f = triangles.shape[0]
    pix, depth, valid, setup = jax.vmap(
        functools.partial(_interp_fragments, triangles=triangles, h=h,
                          w=w, bb=bb))(vertices)
    winner, depth_buf = _resolve(pix, depth, valid, f, h * w)
    return winner_weights(vertices, triangles, winner, depth_buf, h, w,
                          setup=setup)


def sample_texture(out: RasterOut, texture: jax.Array,
                   tex_coords: jax.Array, tex_triangles: jax.Array,
                   bilinear: bool = True):
    """UV sampling at winning pixels (mesh_core.cpp:262-323); shared by
    backends."""
    covered = out.triangle_buffer >= 0
    safe_tri = jnp.where(covered, out.triangle_buffer, 0)
    tex_tri = tex_triangles[safe_tri]               # [B, h, w, 3]
    corners = tex_coords[tex_tri, :2]               # [B, h, w, 3, 2]
    tp = jnp.einsum("bhwk,bhwkc->bhwc", out.barycentric_weight, corners)
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
    image = jnp.where(covered[..., None], sample, 0.0)
    return image, out.depth_buffer


@functools.partial(jax.jit, static_argnames=("h", "w", "bb", "bilinear"))
def render_texture(vertices: jax.Array, triangles: jax.Array,
                   texture: jax.Array, tex_coords: jax.Array,
                   tex_triangles: jax.Array, h: int = 224, w: int = 224,
                   bb: int = 6, bilinear: bool = True):
    """UV-textured rasterization (ref: mesh_core.cpp:234-333).
    vertices: [B, V, 3]; texture: [th, tw, C]; tex_coords: [Vt, 2+]."""
    out = rasterize_triangles(vertices, triangles, h=h, w=w, bb=bb)
    return sample_texture(out, texture, tex_coords, tex_triangles,
                          bilinear)


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
