"""A/B the too-tall-triangle guard on the production raster path.

VERDICT r3 item 4 requires the guard's measured cost to be ~0.  The guard
adds (a) a device-side all-reduce ``fits`` preflight over the triangle
table and (b) a ``lax.cond`` selecting between the windowed kernel and a
full-canvas-window clone.  On the product path the preflight always
passes, so the only possible runtime cost is the preflight reduce + cond
dispatch overhead.  Interleaved minima per CLAUDE.md methodology.
"""
import jax
import jax.numpy as jnp
import numpy as np

from experiments import _timing as timing
from voicepuppet_tpu.face3d import bfm as bfm_mod
from voicepuppet_tpu.face3d import morph
from voicepuppet_tpu.ops.raster_pallas import (rasterize_winner_pallas,
                                               rasterize_winner_interp_pallas)

B = 16
K = 8
model = bfm_mod.synthetic_bfm(num_theta=189, num_phi=189, seed=0)
fm = morph.device_bfm(model)
coeff = jnp.asarray(bfm_mod.demo_coeff(model, batch=B, seed=1))
rec = morph.reconstruct(coeff, fm)
verts = jnp.concatenate([rec.face_projection, rec.z_buffer], axis=-1)
verts = jax.device_put(np.asarray(verts))
tri = fm.tri
print("tris:", tri.shape[0], "verts:", verts.shape, flush=True)

cases = {
    "winner_guard":      lambda v: rasterize_winner_pallas(v, tri, fb=8,
                                                           guard=True),
    "winner_noguard":    lambda v: rasterize_winner_pallas(v, tri, fb=8,
                                                           guard=False),
    "interp_guard":      lambda v: rasterize_winner_interp_pallas(
        v, tri, fb=8, guard=True),
    "interp_noguard":    lambda v: rasterize_winner_interp_pallas(
        v, tri, fb=8, guard=False),
}

progs = timing.build_progs({n: (f, verts) for n, f in cases.items()}, K)
mins1, minsK = timing.interleaved_minima(progs, rounds=6)
per = timing.per_iter(mins1, minsK, K)

print(f"\nFINAL per-iteration (ms, B={B} frames, {tri.shape[0]} tris, "
      f"K={K}):")
for name in progs:
    ns = per[name] / (B * tri.shape[0]) * 1e9
    print(f"  {name:20s} {per[name]*1e3:8.2f} ms  ({ns:5.1f} ns/tri-frame)"
          f"  (t1={mins1[name]*1e3:.1f} tK={minsK[name]*1e3:.1f})")
