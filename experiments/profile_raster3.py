"""Third raster profile: is the ~32 ns/tri-frame floor loop overhead?

Variants:
  A   production fb8 kernel
  U2  fori body unrolled 2 triangles (16 RMW chains per iteration)
  U4  unrolled 4
  F2U4  fb=2 frames x 4-triangle unroll (8 chains, fewer frames in VMEM)
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from experiments import _timing as timing
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from voicepuppet_tpu.face3d import bfm as bfm_mod
from voicepuppet_tpu.face3d import morph
from voicepuppet_tpu.ops.raster_pallas import (DEPTH_INIT, _triangle_table,
                                               rasterize_winner_pallas)

B, K, H, W, WIN = 16, 8, 224, 224, 16
model = bfm_mod.synthetic_bfm(num_theta=189, num_phi=189, seed=0)
fm = morph.device_bfm(model)
coeff = jnp.asarray(bfm_mod.demo_coeff(model, batch=B, seed=1))
rec = morph.reconstruct(coeff, fm)
verts = jax.device_put(np.asarray(jnp.concatenate(
    [rec.face_projection, rec.z_buffer], axis=-1)))
tri = fm.tri
F = tri.shape[0]


def _kernel_unroll(tri_ref, depth_ref, winner_ref, *, h, w, num_tri, win,
                   fb, chunk, unroll):
    chunk_id = pl.program_id(1)

    @pl.when(chunk_id == 0)
    def _():
        depth_ref[...] = jnp.full((fb, h, w), DEPTH_INIT, jnp.float32)
        winner_ref[...] = jnp.full((fb, h, w), num_tri, jnp.int32)

    col = jax.lax.broadcasted_iota(jnp.int32, (win, w), 1).astype(
        jnp.float32)
    row_off = jax.lax.broadcasted_iota(jnp.int32, (win, w), 0).astype(
        jnp.float32)

    def one(i, fr):
        p0x = tri_ref[fr, i, 0]
        p0y = tri_ref[fr, i, 1]
        v0x = tri_ref[fr, i, 2]
        v0y = tri_ref[fr, i, 3]
        v1x = tri_ref[fr, i, 4]
        v1y = tri_ref[fr, i, 5]
        dot00 = tri_ref[fr, i, 6]
        dot01 = tri_ref[fr, i, 7]
        dot11 = tri_ref[fr, i, 8]
        inv_deno = tri_ref[fr, i, 9]
        flat_depth = tri_ref[fr, i, 10]
        x_min = tri_ref[fr, i, 11]
        x_max = tri_ref[fr, i, 12]
        y_min = tri_ref[fr, i, 13]
        y_max = tri_ref[fr, i, 14]
        y0w = pl.multiple_of(tri_ref[fr, i, 15].astype(jnp.int32), 8)

        rows = row_off + y0w.astype(jnp.float32)
        px = col - p0x
        py = rows - p0y
        dot02 = v0x * px + v0y * py
        dot12 = v1x * px + v1y * py
        u = (dot11 * dot02 - dot01 * dot12) * inv_deno
        v = (dot00 * dot12 - dot01 * dot02) * inv_deno
        inside = (u >= 0.0) & (v >= 0.0) & (u + v < 1.0)
        in_box = ((col >= x_min) & (col <= x_max)
                  & (rows >= y_min) & (rows <= y_max))

        d_win = depth_ref[fr, pl.ds(y0w, win), :]
        update = inside & in_box & (flat_depth > d_win)
        depth_ref[fr, pl.ds(y0w, win), :] = jnp.where(
            update, flat_depth, d_win)
        w_win = winner_ref[fr, pl.ds(y0w, win), :]
        winner_ref[fr, pl.ds(y0w, win), :] = jnp.where(
            update, jnp.int32(chunk_id * chunk + i), w_win)

    def body(j, _):
        for u_ in range(unroll):
            i = j * unroll + u_
            for fr in range(fb):
                one(i, fr)
        return 0

    jax.lax.fori_loop(0, chunk // unroll, body, 0)


@functools.partial(jax.jit, static_argnames=("fb", "unroll"))
def raster_u(vertices, fb=8, unroll=2):
    chunk = 512 // fb
    table = _triangle_table(vertices.astype(jnp.float32), tri, H, W, WIN,
                            pad_to=chunk)
    nc = table.shape[1] // chunk
    kernel = functools.partial(_kernel_unroll, h=H, w=W, num_tri=F,
                               win=WIN, fb=fb, chunk=chunk, unroll=unroll)
    depth, win_buf = pl.pallas_call(
        kernel, grid=(B // fb, nc),
        in_specs=[pl.BlockSpec((fb, chunk, 16), lambda bi, ci: (bi, ci, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec((fb, H, W), lambda bi, ci: (bi, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((fb, H, W), lambda bi, ci: (bi, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((B, H, W), jnp.float32),
                   jax.ShapeDtypeStruct((B, H, W), jnp.int32)),
    )(table)
    return win_buf, depth



cases = {
    "A_production": lambda v: rasterize_winner_pallas(v, tri, fb=8),
    "U2_fb8":  lambda v: raster_u(v, fb=8, unroll=2),
    "U4_fb8":  lambda v: raster_u(v, fb=8, unroll=4),
    "U4_fb2":  lambda v: raster_u(v, fb=2, unroll=4),
    "U8_fb4":  lambda v: raster_u(v, fb=4, unroll=8),
}

progs = timing.build_progs({n: (f, verts) for n, f in cases.items()}, K)

# exact-parity check for the unrolled kernel
wa, da = jax.jit(lambda v: rasterize_winner_pallas(v, tri, fb=8))(verts)
wu, du = raster_u(verts, fb=8, unroll=4)
print("U4 winner exact:", bool((np.asarray(wa) == np.asarray(wu)).all()),
      "depth exact:", bool((np.asarray(da) == np.asarray(du)).all()),
      flush=True)

mins1, minsK = timing.interleaved_minima(progs, rounds=6)
per_s = timing.per_iter(mins1, minsK, K)

print(f"\nFINAL per-iteration (ms, {B} frames, {F} tris, K={K}):")
for name in progs:
    per = per_s[name]
    ns = per / (B * F) * 1e9
    print(f"  {name:14s} {per*1e3:8.2f} ms  ({ns:5.1f} ns/tri-frame)")
