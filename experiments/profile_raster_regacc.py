"""Phase A of the tile-binned raster investigation (round-3 VERDICT next
#8, optional): measure the KERNEL-SIDE ceiling of a banded formulation
before building any binning machinery.

The production kernel's ~30 ns/(tri,frame) floor is tied to the
per-triangle depth/winner window RMW (dynamic-slice load + store, round-3
study).  A band-binned kernel would visit each band once and accumulate
the (depth, winner) state in a LOOP CARRY — no per-triangle memory ops,
one flush per band.  This experiment times exactly that data path with a
synthetic band assignment (each 256-triangle chunk pretends its first
triangle's aligned window is the band for the whole chunk): the OUTPUT IS
WRONG for an unsorted table — only Phase B's y0w-sorted table makes it
exact — but the per-entry instruction stream is identical to the real
banded kernel, so the timing is the decision number.

Decision rule: if regacc does not beat the production per-triangle kernel
by >=1.3x per entry, tile-binning cannot win (its sort/bin overhead and
win>=16 conservative windows only ADD cost) and #8 is rejected with data.

MEASURED (round 4, real chip, 72,962 tris x 16 frames): production 31.3
ns/entry; regacc win16 fb8 32.1 (NOT faster — the RMW is not the floor,
the win x W barycentric vector work is); regacc win8 23.0, but 8-row-band
entry duplication on this mesh is 1.387x => 31.9 ns per original entry,
parity-at-best before any sort/bin overhead.  REJECTED — see docs/PERF.md
"Tile-binned raster Phase A".
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from experiments import _timing as timing
from voicepuppet_tpu.face3d import bfm as bfm_mod
from voicepuppet_tpu.face3d import morph
from voicepuppet_tpu.ops.raster_pallas import (DEPTH_INIT, _fb_for_batch,
                                               _triangle_table,
                                               _unroll_for,
                                               _winner_pallas_call,
                                               rasterize_winner_pallas)

H = W = 224
B = 16
K = 8


def _regacc_kernel(tri_ref, depth_ref, winner_ref, *, h, w, num_tri, win,
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

    # synthetic band origin per frame: the chunk's first triangle's window
    y0c = [pl.multiple_of(tri_ref[fr, 0, 15].astype(jnp.int32), 8)
           for fr in range(fb)]
    rows_c = [row_off + y0c[fr].astype(jnp.float32) for fr in range(fb)]

    def one(i, fr, d_acc, w_acc):
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

        rows = rows_c[fr]
        px = col - p0x
        py = rows - p0y
        dot02 = v0x * px + v0y * py
        dot12 = v1x * px + v1y * py
        u = (dot11 * dot02 - dot01 * dot12) * inv_deno
        v = (dot00 * dot12 - dot01 * dot02) * inv_deno
        inside = (u >= 0.0) & (v >= 0.0) & (u + v < 1.0)
        in_box = ((col >= x_min) & (col <= x_max)
                  & (rows >= y_min) & (rows <= y_max))
        update = inside & in_box & (flat_depth > d_acc)
        return (jnp.where(update, flat_depth, d_acc),
                jnp.where(update, jnp.int32(chunk_id * chunk + i), w_acc))

    def body(j, carry):
        ds, ws = carry
        ds, ws = list(ds), list(ws)
        for u_ in range(unroll):
            i = j * unroll + u_
            for fr in range(fb):
                ds[fr], ws[fr] = one(i, fr, ds[fr], ws[fr])
        return tuple(ds), tuple(ws)

    init_d = tuple(jnp.full((win, w), DEPTH_INIT, jnp.float32)
                   for _ in range(fb))
    init_w = tuple(jnp.full((win, w), num_tri, jnp.int32)
                   for _ in range(fb))
    ds, ws = jax.lax.fori_loop(0, chunk // unroll, body, (init_d, init_w))

    # one order-free flush per (frame, chunk): (max depth, min id)
    for fr in range(fb):
        d_buf = depth_ref[fr, pl.ds(y0c[fr], win), :]
        w_buf = winner_ref[fr, pl.ds(y0c[fr], win), :]
        better = (ds[fr] > d_buf) | ((ds[fr] == d_buf)
                                     & (ws[fr] < w_buf))
        depth_ref[fr, pl.ds(y0c[fr], win), :] = jnp.where(
            better, ds[fr], d_buf)
        winner_ref[fr, pl.ds(y0c[fr], win), :] = jnp.where(
            better, ws[fr], w_buf)


@functools.partial(jax.jit, static_argnames=("h", "w", "win", "fb"))
def rasterize_regacc(vertices, triangles, h=H, w=W, win=16, fb=None):
    b = vertices.shape[0]
    f = triangles.shape[0]
    if fb is None:
        fb = _fb_for_batch(b)
    chunk = 512 // fb
    table = _triangle_table(vertices.astype(jnp.float32), triangles, h, w,
                            win, pad_to=chunk)
    nc = table.shape[1] // chunk
    kernel = functools.partial(_regacc_kernel, h=h, w=w, num_tri=f,
                               win=win, fb=fb, chunk=chunk,
                               unroll=_unroll_for(chunk))
    depth, winner = _winner_pallas_call(kernel, table, b=b, h=h, w=w,
                                        fb=fb, nc=nc, slots=16,
                                        interpret=False)
    return winner, depth


# ---- production-scale mesh (same construction as bench.py) ----
model = bfm_mod.synthetic_bfm(num_theta=192, num_phi=192, seed=7)
fm = morph.device_bfm(model)
coeff = bfm_mod.demo_coeff(model, batch=B, seed=11)
rec = morph.reconstruct(coeff, fm)
verts = jnp.concatenate([rec.face_projection, rec.z_buffer], 2)
tri = jnp.asarray(fm.tri, jnp.int32)
print(f"mesh: {tri.shape[0]} triangles x {B} frames", flush=True)

cases = {
    "production win16": (lambda v: rasterize_winner_pallas(v, tri, fb=8),
                         verts),
    "regacc win16 fb8": (lambda v: rasterize_regacc(v, tri, win=16, fb=8),
                         verts),
    "regacc win16 fb4": (lambda v: rasterize_regacc(v, tri, win=16, fb=4),
                         verts),
    "regacc win8 fb8": (lambda v: rasterize_regacc(v, tri, win=8, fb=8),
                        verts),
}

progs = timing.build_progs(cases, K)
mins1, minsK = timing.interleaved_minima(progs, rounds=6)
per_s = timing.per_iter(mins1, minsK, K)

nf = tri.shape[0] * B
print(f"\nREGACC A/B ({tri.shape[0]} tris x {B} frames, K={K}):")
for name in progs:
    per = per_s[name]
    print(f"  {name:22s} {per*1e3:7.1f} ms   {per/nf*1e9:5.1f} ns/entry   "
          f"(t1={mins1[name]*1e3:.0f} tK={minsK[name]*1e3:.0f})")
