"""Second raster profile: scalar-trim candidates.

Variants (perf signal; B/C are quirk-incorrect for degenerate triangles):
  A  production fb8 kernel (baseline)
  B  no in_box test: 12 scalar loads, no bbox vector ops.  Relies on
     inside ⊆ bbox for non-degenerate triangles.
  D  depth-only (no winner buffer): lower-bound signal for store cost.
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

B, K, H, W, WIN, FB = 16, 8, 224, 224, 16, 8
model = bfm_mod.synthetic_bfm(num_theta=189, num_phi=189, seed=0)
fm = morph.device_bfm(model)
coeff = jnp.asarray(bfm_mod.demo_coeff(model, batch=B, seed=1))
rec = morph.reconstruct(coeff, fm)
verts = jax.device_put(np.asarray(jnp.concatenate(
    [rec.face_projection, rec.z_buffer], axis=-1)))
tri = fm.tri
F = tri.shape[0]


def _trim_table(vertices, triangles, h, w, win, pad_to):
    """12-wide rows: p0x,p0y,v0x,v0y,v1x,v1y,dot00,dot01,dot11,inv_deno,
    flat_depth,y0w.  Degenerate tris (deno==0) disabled via depth=-1e10.
    Padding rows likewise."""
    t16 = _triangle_table(vertices, triangles, h, w, win, pad_to)
    deg = t16[..., 9] == 0.0
    depth = jnp.where(deg, -1e10, t16[..., 10])
    npad = t16.shape[1] - triangles.shape[0]
    if npad:
        depth = depth.at[:, triangles.shape[0]:].set(-1e10)
    cols = [t16[..., i] for i in range(10)] + [depth, t16[..., 15]]
    return jnp.stack(cols, axis=-1)


def _kernel_b(tri_ref, depth_ref, winner_ref, *, h, w, num_tri, win, fb,
              chunk, winner: bool):
    chunk_id = pl.program_id(1)

    @pl.when(chunk_id == 0)
    def _():
        depth_ref[...] = jnp.full((fb, h, w), DEPTH_INIT, jnp.float32)
        if winner:
            winner_ref[...] = jnp.full((fb, h, w), num_tri, jnp.int32)

    col = jax.lax.broadcasted_iota(jnp.int32, (win, w), 1).astype(
        jnp.float32)
    row_off = jax.lax.broadcasted_iota(jnp.int32, (win, w), 0).astype(
        jnp.float32)

    def body(i, _):
        tri_id = chunk_id * chunk + i
        for fr in range(fb):
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
            y0w = pl.multiple_of(tri_ref[fr, i, 11].astype(jnp.int32), 8)

            rows = row_off + y0w.astype(jnp.float32)
            px = col - p0x
            py = rows - p0y
            dot02 = v0x * px + v0y * py
            dot12 = v1x * px + v1y * py
            u = (dot11 * dot02 - dot01 * dot12) * inv_deno
            v = (dot00 * dot12 - dot01 * dot02) * inv_deno
            inside = (u >= 0.0) & (v >= 0.0) & (u + v < 1.0)

            d_win = depth_ref[fr, pl.ds(y0w, win), :]
            update = inside & (flat_depth > d_win)
            depth_ref[fr, pl.ds(y0w, win), :] = jnp.where(
                update, flat_depth, d_win)
            if winner:
                w_win = winner_ref[fr, pl.ds(y0w, win), :]
                winner_ref[fr, pl.ds(y0w, win), :] = jnp.where(
                    update, jnp.int32(tri_id), w_win)
        return 0

    jax.lax.fori_loop(0, chunk, body, 0)


@functools.partial(jax.jit, static_argnames=("winner",))
def raster_b(vertices, winner=True):
    fb = FB
    chunk = 512 // fb
    table = _trim_table(vertices.astype(jnp.float32), tri, H, W, WIN,
                        chunk)
    nc = table.shape[1] // chunk
    kernel = functools.partial(_kernel_b, h=H, w=W, num_tri=F, win=WIN,
                               fb=fb, chunk=chunk, winner=winner)
    out_shape = [jax.ShapeDtypeStruct((B, H, W), jnp.float32),
                 jax.ShapeDtypeStruct((B, H, W), jnp.int32)]
    specs = [pl.BlockSpec((fb, H, W), lambda bi, ci: (bi, 0, 0),
                          memory_space=pltpu.VMEM)] * 2
    depth, win_buf = pl.pallas_call(
        kernel, grid=(B // fb, nc),
        in_specs=[pl.BlockSpec((fb, chunk, 12), lambda bi, ci: (bi, ci, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=tuple(specs), out_shape=tuple(out_shape),
    )(table)
    return win_buf, depth



cases = {
    "A_production": lambda v: rasterize_winner_pallas(v, tri, fb=FB),
    "B_no_inbox":   lambda v: raster_b(v, winner=True),
    "D_depth_only": lambda v: raster_b(v, winner=False),
}

progs = timing.build_progs({n: (f, verts) for n, f in cases.items()}, K)

# sanity: B matches A on winners wherever A's winner is non-degenerate
wa, da = jax.jit(lambda v: rasterize_winner_pallas(v, tri, fb=FB))(verts)
wb, db = raster_b(verts)
wa, wb = np.asarray(wa), np.asarray(wb)
da, db = np.asarray(da), np.asarray(db)
diff = (wa != wb).mean()
print(f"winner mismatch fraction A vs B: {diff:.6f} "
      f"(expected >0 only from degenerate-quirk pixels)", flush=True)

mins1, minsK = timing.interleaved_minima(progs, rounds=6)
per_s = timing.per_iter(mins1, minsK, K)

print(f"\nFINAL per-iteration (ms, {B} frames, {F} tris, K={K}):")
for name in progs:
    per = per_s[name]
    ns = per / (B * F) * 1e9
    print(f"  {name:14s} {per*1e3:8.2f} ms  ({ns:5.1f} ns/tri-frame)")
