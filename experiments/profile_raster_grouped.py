"""Grouped-RMW raster kernel A/B vs the production per-triangle kernel.

The round-3 kernel study (docs/PERF.md) measured a structural
~30 ns/(triangle, frame) floor tied to the per-triangle depth-window
store->load RMW chain.  The grouped kernel (ops/raster_pallas.py:
_raster_kernel_grouped) merges G consecutive triangles in registers with
the order-free (max-depth, min-id) rule and does ONE window RMW per
group — chain links per frame drop G-fold.  On the production mesh the
group row spread fits a 16-row window up to G=8 and a 32-row window up
to G=16 (measured by _grouped_table's fits flag), so the merge costs no
extra window rows at G<=8.

Amortized in-jit K-repeat timing (CLAUDE.md: single-call timings under
~100 ms are tunnel latency), interleaved A/B in one process, per-variant
minima.  Run on the real TPU chip.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from voicepuppet_tpu.face3d import bfm as bfm_mod
from voicepuppet_tpu.face3d import morph
from voicepuppet_tpu.ops.raster_pallas import (
    _grouped_table, rasterize_winner_grouped_pallas,
    rasterize_winner_pallas)

B, K, H, W = 16, 8, 224, 224
model = bfm_mod.synthetic_bfm(num_theta=189, num_phi=189, seed=0)
fm = morph.device_bfm(model)
coeff = jnp.asarray(bfm_mod.demo_coeff(model, batch=B, seed=1))
rec = morph.reconstruct(coeff, fm)
verts = jax.device_put(np.asarray(jnp.concatenate(
    [rec.face_projection, rec.z_buffer], axis=-1)))
tri = fm.tri
F = tri.shape[0]

cases = {
    "pertri_w16":    lambda v: rasterize_winner_pallas(v, tri, fb=8),
    "g4_w16":  lambda v: rasterize_winner_grouped_pallas(
        v, tri, win=16, group=4, fb=8, fallback=False),
    "g8_w16":  lambda v: rasterize_winner_grouped_pallas(
        v, tri, win=16, group=8, fb=8, fallback=False),
    "g4_w16_cond":  lambda v: rasterize_winner_grouped_pallas(
        v, tri, win=16, group=4, fb=8, fallback=True),
    # w24: the robust middle — the production mesh's max group spread is
    # 15 rows, exactly the w16 budget, so 1px of mesh motion could flip
    # w16 groups to the fallback; w24 has 8 rows of slack at 1.5x the
    # per-triangle vector work
    "g4_w24":  lambda v: rasterize_winner_grouped_pallas(
        v, tri, win=24, group=4, fb=8, fallback=False),
    "g8_w24":  lambda v: rasterize_winner_grouped_pallas(
        v, tri, win=24, group=8, fb=8, fallback=False),
    "g8_w32":  lambda v: rasterize_winner_grouped_pallas(
        v, tri, win=32, group=8, fb=8, fallback=False),
    "g16_w32": lambda v: rasterize_winner_grouped_pallas(
        v, tri, win=32, group=16, fb=8, fallback=False),
    "g32_w32": lambda v: rasterize_winner_grouped_pallas(
        v, tri, win=32, group=32, fb=8, fallback=False),
}

# fits preflight: a variant whose groups do NOT fit would crop (silently
# wrong with fallback=False) — skip it
for win, grp in [(16, 4), (16, 8), (24, 4), (24, 8), (32, 8), (32, 16),
                 (32, 32)]:
    _, fits = _grouped_table(verts.astype(jnp.float32), tri, H, W, win,
                             grp, pad_to=512)
    print(f"fits win={win} group={grp}: {bool(fits)}", flush=True)
    if not bool(fits):
        cases.pop(f"g{grp}_w{win}", None)
        cases.pop(f"g{grp}_w{win}_cond", None)


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

# exact parity vs the production kernel (both flat-depth winner rasters)
wa, da = jax.jit(lambda v: rasterize_winner_pallas(v, tri, fb=8))(verts)
for name, f in cases.items():
    if name == "pertri_w16" or name not in progs:
        continue
    wg, dg = jax.jit(f)(verts)
    ok_w = bool((np.asarray(wa) == np.asarray(wg)).all())
    ok_d = bool((np.asarray(da) == np.asarray(dg)).all())
    print(f"parity {name}: winner {ok_w} depth {ok_d}", flush=True)

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

print(f"\nFINAL per-iteration (ms, {B} frames, {F} tris, K={K}):")
for name in progs:
    per = (minsK[name] - mins1[name]) / (K - 1)
    ns = per / (B * F) * 1e9
    print(f"  {name:14s} {per*1e3:8.2f} ms  ({ns:5.1f} ns/tri-frame)")
