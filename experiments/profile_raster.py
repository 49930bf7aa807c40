"""Amortized (in-jit repeat) profile of the Mosaic raster kernel.

Variants: fb=8 (production), fb=16, fb=4, win=8 (perf signal only — crops
tall triangles), and a w=128 canvas (lane-halving signal).  Each repeated
K times inside one jit with a carried perturbation.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from voicepuppet_tpu.face3d import bfm as bfm_mod
from voicepuppet_tpu.face3d import morph
from voicepuppet_tpu.ops.raster_pallas import rasterize_winner_pallas

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


def repeat(f, k):
    @jax.jit
    def run(v):
        def body(i, carry):
            v_i, acc = carry
            winner, depth = f(v_i)
            s = jnp.sum(depth) + jnp.sum(winner).astype(jnp.float32)
            return (v_i + 1e-30 * s, acc + s)
        _, acc = jax.lax.fori_loop(0, k, body, (v, 0.0))
        return acc
    return run


cases = {
    "fb8_win16":  lambda v: rasterize_winner_pallas(v, tri, fb=8),
    "fb16_win16": lambda v: rasterize_winner_pallas(v, tri, fb=16),
    "fb4_win16":  lambda v: rasterize_winner_pallas(v, tri, fb=4),
    "fb8_win8":   lambda v: rasterize_winner_pallas(v, tri, fb=8, win=8),
    "fb8_win16_w128": lambda v: rasterize_winner_pallas(v, tri, h=224,
                                                        w=128, fb=8),
    "fb8_win16_w256": lambda v: rasterize_winner_pallas(v, tri, h=224,
                                                        w=256, fb=8),
}

progs = {}
for name, f in cases.items():
    try:
        p1, pK = repeat(f, 1), repeat(f, K)
        float(np.asarray(p1(verts)))
        float(np.asarray(pK(verts)))
        progs[name] = (p1, pK)
        print(f"compiled {name}", flush=True)
    except Exception as e:
        print(f"FAILED {name}: {type(e).__name__}: {str(e)[:200]}",
              flush=True)

mins1 = {k: 1e9 for k in progs}
minsK = {k: 1e9 for k in progs}
for r in range(6):
    for name, (f1, fK) in progs.items():
        t0 = time.perf_counter()
        float(np.asarray(f1(verts)))
        mins1[name] = min(mins1[name], time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(np.asarray(fK(verts)))
        minsK[name] = min(minsK[name], time.perf_counter() - t0)
    print(f"round {r} done", flush=True)

print(f"\nFINAL per-iteration (ms, B={B} frames, {tri.shape[0]} tris, "
      f"K={K}):")
for name in progs:
    per = (minsK[name] - mins1[name]) / (K - 1)
    ns = per / (B * tri.shape[0]) * 1e9
    print(f"  {name:20s} {per*1e3:8.2f} ms  ({ns:5.1f} ns/tri-frame)  "
          f"(t1={mins1[name]*1e3:.1f} tK={minsK[name]*1e3:.1f})")
