"""Prototype: interval-table raster kernel vs production kernel.

Idea: XLA evaluates the exact same f32 barycentric inside-test on a
[F, win, win] bbox-anchored grid (cheap, vectorized), reduces each row to
its covered x-interval [xs, xe), and the Pallas kernel per triangle only
does: 2 scalar reads + interval compares + depth test.  Replaces ~16
scalar reads + ~25 vector ops per triangle with 2 scalar reads + ~10
vector ops.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from voicepuppet_tpu.ops.raster_pallas import (DEPTH_INIT, T_CHUNK,
                                               rasterize_winner_pallas)

BIG = 1e9


def _interval_tables(vertices, triangles, h, w, win):
    """[B,V,3] + [F,3] -> (vec [B,F_pad,win,2] f32 row intervals,
    scal [B,F_pad,2] f32 (flat_depth, y0w))."""
    tri_xy = vertices[:, triangles, :2]
    tri_z = vertices[:, triangles, 2]
    p0 = tri_xy[:, :, 0]
    v0 = tri_xy[:, :, 2] - p0
    v1 = tri_xy[:, :, 1] - p0
    dot00 = jnp.sum(v0 * v0, -1)
    dot01 = jnp.sum(v0 * v1, -1)
    dot11 = jnp.sum(v1 * v1, -1)
    deno = dot00 * dot11 - dot01 * dot01
    inv_deno = jnp.where(deno == 0, 0.0,
                         1.0 / jnp.where(deno == 0, 1.0, deno))
    flat_depth = jnp.mean(tri_z, axis=-1)
    xs_v = tri_xy[..., 0]
    ys_v = tri_xy[..., 1]
    x_min = jnp.maximum(jnp.ceil(jnp.min(xs_v, -1)), 0.0)
    x_max = jnp.minimum(jnp.floor(jnp.max(xs_v, -1)), w - 1.0)
    y_min = jnp.maximum(jnp.ceil(jnp.min(ys_v, -1)), 0.0)
    y_max = jnp.minimum(jnp.floor(jnp.max(ys_v, -1)), h - 1.0)
    y0w = jnp.clip(jnp.floor(y_min / 8.0) * 8.0, 0.0, float(h - win))

    # bbox-anchored [win rows, win cols] grid; px/py arithmetic identical
    # to the full-width kernel (integer-valued f32 coords, exact adds)
    r = jnp.arange(win, dtype=jnp.float32)
    j = jnp.arange(win, dtype=jnp.float32)
    rows = y0w[..., None] + r                      # [B,F,win]
    cols = x_min[..., None] + j                    # [B,F,win]
    px = cols[:, :, None, :] - p0[..., 0][..., None, None]   # [B,F,1,win]->[B,F,win?]: broadcast rows
    py = rows[:, :, :, None] - p0[..., 1][..., None, None]   # [B,F,win,1]
    dot02 = v0[..., 0][..., None, None] * px + v0[..., 1][..., None, None] * py
    dot12 = v1[..., 0][..., None, None] * px + v1[..., 1][..., None, None] * py
    u = (dot11[..., None, None] * dot02
         - dot01[..., None, None] * dot12) * inv_deno[..., None, None]
    v = (dot00[..., None, None] * dot12
         - dot01[..., None, None] * dot02) * inv_deno[..., None, None]
    inside = (u >= 0.0) & (v >= 0.0) & (u + v < 1.0)
    in_box = ((cols[:, :, None, :] >= x_min[..., None, None])
              & (cols[:, :, None, :] <= x_max[..., None, None])
              & (rows[:, :, :, None] >= y_min[..., None, None])
              & (rows[:, :, :, None] <= y_max[..., None, None]))
    upd = inside & in_box                          # [B,F,win,win]

    any_row = jnp.any(upd, -1)
    first = jnp.argmax(upd, -1).astype(jnp.float32)
    last = (win - 1) - jnp.argmax(upd[..., ::-1], -1).astype(jnp.float32)
    xs = jnp.where(any_row, x_min[..., None] + first, BIG)
    xe = jnp.where(any_row, x_min[..., None] + last + 1.0, -BIG)
    vec = jnp.stack([xs, xe], -1)                  # [B,F,win,2]
    scal = jnp.stack([flat_depth, y0w], -1)        # [B,F,2]

    b, f = flat_depth.shape
    f_pad = -(-f // T_CHUNK) * T_CHUNK
    if f_pad != f:
        vec_pad = jnp.full((b, f_pad - f, win, 2), BIG, jnp.float32)
        vec_pad = vec_pad.at[..., 1].set(-BIG)
        vec = jnp.concatenate([vec, vec_pad], 1)
        scal = jnp.concatenate(
            [scal, jnp.zeros((b, f_pad - f, 2), jnp.float32)], 1)
    return vec, scal


def _interval_kernel(scal_ref, vec_ref, depth_ref, winner_ref, *,
                     h, w, num_tri, win):
    chunk_id = pl.program_id(1)

    @pl.when(chunk_id == 0)
    def _():
        depth_ref[...] = jnp.full((h, w), DEPTH_INIT, jnp.float32)
        winner_ref[...] = jnp.full((h, w), num_tri, jnp.int32)

    col = jax.lax.broadcasted_iota(jnp.int32, (win, w), 1).astype(
        jnp.float32)

    def body(i, _):
        fd = scal_ref[i, 0]
        y0w = pl.multiple_of(scal_ref[i, 1].astype(jnp.int32), 8)
        tri_id = chunk_id * T_CHUNK + i
        iv = vec_ref[i]                     # [win, 2]
        xs = iv[:, 0:1]                     # [win, 1]
        xe = iv[:, 1:2]
        d_win = depth_ref[pl.ds(y0w, win), :]
        update = (col >= xs) & (col < xe) & (fd > d_win)
        depth_ref[pl.ds(y0w, win), :] = jnp.where(update, fd, d_win)
        w_win = winner_ref[pl.ds(y0w, win), :]
        winner_ref[pl.ds(y0w, win), :] = jnp.where(
            update, jnp.int32(tri_id), w_win)
        return 0

    jax.lax.fori_loop(0, T_CHUNK, body, 0)


@functools.partial(jax.jit, static_argnames=("h", "w", "win", "interpret"))
def rasterize_winner_interval(vertices, triangles, h=224, w=224, win=16,
                              interpret=False):
    b = vertices.shape[0]
    f = triangles.shape[0]
    vec, scal = _interval_tables(vertices.astype(jnp.float32), triangles,
                                 h, w, win)
    nc = vec.shape[1] // T_CHUNK
    kernel = functools.partial(_interval_kernel, h=h, w=w, num_tri=f,
                               win=win)
    depth, winner = pl.pallas_call(
        kernel,
        grid=(b, nc),
        in_specs=[pl.BlockSpec((None, T_CHUNK, 2), lambda bi, ci: (bi, ci, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((None, T_CHUNK, win, 2),
                               lambda bi, ci: (bi, ci, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((None, h, w), lambda bi, ci: (bi, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((None, h, w), lambda bi, ci: (bi, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((b, h, w), jnp.float32),
                   jax.ShapeDtypeStruct((b, h, w), jnp.int32)),
        interpret=interpret,
    )(scal, vec)
    return winner, depth


def main():
    from voicepuppet_tpu.face3d import bfm as bfm_mod, morph
    rng = np.random.RandomState(0)
    model = bfm_mod.synthetic_bfm(num_theta=189, num_phi=189, seed=0)
    coeff = bfm_mod.demo_coeff(model, batch=16)
    fm = morph.device_bfm(model)
    rec = morph.reconstruct(jnp.asarray(coeff), fm)
    verts = jnp.concatenate([rec.face_projection, rec.z_buffer], -1)
    tri = fm.tri
    print(f"tris={tri.shape[0]}, verts={verts.shape}")

    w_old, d_old = rasterize_winner_pallas(verts, tri, 224, 224, win=16)
    w_new, d_new = rasterize_winner_interval(verts, tri, 224, 224, win=16)
    w_old, w_new = np.asarray(w_old), np.asarray(w_new)
    diff = (w_old != w_new).sum()
    print(f"winner parity: {diff} mismatched px of {w_old.size}")

    for name, fn in (("old", rasterize_winner_pallas),
                     ("new", rasterize_winner_interval)):
        fn(verts, tri, 224, 224, win=16)[0].block_until_ready()
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn(verts, tri, 224, 224, win=16)[0]
        val = float(np.asarray(out.sum()))  # fetch-verified
        dt = (time.perf_counter() - t0) / 3
        print(f"{name}: {dt*1000:.1f} ms/16 frames (checksum {val:.0f})")


if __name__ == "__main__":
    main()
