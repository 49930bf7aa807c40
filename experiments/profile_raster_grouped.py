"""Grouped-RMW raster kernel A/B vs the production per-triangle kernel.

The round-3 kernel study (docs/PERF.md) measured a structural
~30 ns/(triangle, frame) floor tied to the per-triangle depth-window
store->load RMW chain.  The grouped kernel (ops/raster_pallas.py:
_raster_kernel_grouped) merges G consecutive triangles in registers with
the order-free (max-depth, min-id) rule and does ONE window RMW per
group — chain links per frame drop G-fold.  MEASURED OUTCOME (round 3,
recorded in docs/PERF.md "measured, REJECTED"): on the production mesh
every fits preflight below printed True (all groups up to G=32 fit
their windows), yet every grouped variant timed SLOWER than the
per-triangle kernel — the G-fold shorter RMW chain never paid for the
extra per-group vector work.  Production stays per-triangle
(raster_group=0); this script is the record of that completed A/B.

Amortized in-jit K-repeat timing (CLAUDE.md: single-call timings under
~100 ms are tunnel latency), interleaved A/B in one process, per-variant
minima — via the shared experiments/_timing.py harness.  Run on the real
TPU chip.
"""
import functools

import jax
import jax.numpy as jnp

from experiments import _timing as timing

from voicepuppet_tpu.face3d import bfm as bfm_mod
from voicepuppet_tpu.face3d import morph
from voicepuppet_tpu.ops.raster_pallas import (
    _grouped_table, rasterize_winner_grouped_pallas,
    rasterize_winner_pallas)

B, K, H, W = 16, 8, 224, 224
model = bfm_mod.synthetic_bfm(num_theta=189, num_phi=189, seed=0)
fm = morph.device_bfm(model)
coeff = jnp.asarray(bfm_mod.demo_coeff(model, batch=B, seed=1))


# one jit, no host round-trip: eager reconstruct pays ~27 ms tunnel
# latency PER OP and a d2h of the whole vertex buffer — both fragile
# through tunnel weather (a FailedPrecondition killed the first run here)
@jax.jit
def _make_verts(c):
    rec = morph.reconstruct(c, fm)
    return jnp.concatenate([rec.face_projection, rec.z_buffer], axis=-1)


verts = _make_verts(coeff)
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
# wrong with fallback=False) — skip it.  The `_cond` (fallback=True)
# variants STAY either way: when groups don't fit, the fallback path's
# real-world price is exactly the number the A/B decision needs
@functools.partial(jax.jit, static_argnums=(1, 2))
def _fits(v, win, grp):
    return _grouped_table(v.astype(jnp.float32), tri, H, W, win, grp,
                          pad_to=512)[1]


for win, grp in [(16, 4), (16, 8), (24, 4), (24, 8), (32, 8), (32, 16),
                 (32, 32)]:
    fits = bool(_fits(verts, win, grp))
    print(f"fits win={win} group={grp}: {fits}", flush=True)
    if not fits:
        cases.pop(f"g{grp}_w{win}", None)


progs = timing.build_progs({n: (f, verts) for n, f in cases.items()}, K)

# exact parity vs the production kernel (both flat-depth winner rasters).
# Reduce to TWO scalars on device — fetching the full [B,H,W] buffers is
# ~51 MB of d2h, minutes of tunnel time in bad weather.  The reference
# (wa, da) is computed ONCE and kept device-resident; each loop
# iteration compiles only its grouped variant (the 1-core host pays
# dearly for redundant recompiles of the production kernel).
_ref_wd = jax.jit(lambda v: rasterize_winner_pallas(v, tri, fb=8))(verts)

for name, f in cases.items():
    if name == "pertri_w16" or name not in progs:
        continue

    @jax.jit
    def _parity(v, wa, da, f=f):
        wg, dg = f(v)
        return (wa == wg).all(), (da == dg).all()

    ok_w, ok_d = _parity(verts, *_ref_wd)
    print(f"parity {name}: winner {bool(ok_w)} depth {bool(ok_d)}",
          flush=True)

mins1, minsK = timing.interleaved_minima(progs, rounds=6)
per = timing.per_iter(mins1, minsK, K)

print(f"\nFINAL per-iteration (ms, {B} frames, {F} tris, K={K}):")
for name in progs:
    ns = per[name] / (B * F) * 1e9
    print(f"  {name:14s} {per[name]*1e3:8.2f} ms  "
          f"({ns:5.1f} ns/tri-frame)")
