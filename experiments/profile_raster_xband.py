"""x-banded raster kernel A/B vs the production per-triangle kernel.

The round-3/4 studies (docs/PERF.md) localized the ~30 ns/(triangle,
frame) floor in the [win, W] window VECTOR work: fb sweeps, grouped-RMW,
and the carried-register Phase A all measured no gain from restructuring
the RMW chain, while the "w=128 canvas" study row (29.6 vs 36.6 ms)
showed ~19% from halving the window lanes.  The x-banded kernel
(ops/raster_pallas.py: rasterize_winner_xband_pallas) claims that win on
the REAL 224-px canvas: every triangle is shifted into a 96-strided
128-lane band (the shift folded into the per-triangle constants — kernel
unchanged), bands stack along buffer rows, and an order-free
(max-depth, min-id) XLA merge reassembles the canvas exactly.

Amortized in-jit K-repeat timing, interleaved A/B in one process,
per-variant minima (experiments/_timing.py).  Run on the real TPU chip.
"""
import functools

import jax
import jax.numpy as jnp

from experiments import _timing as timing

from voicepuppet_tpu.face3d import bfm as bfm_mod
from voicepuppet_tpu.face3d import morph
from voicepuppet_tpu.ops.raster_pallas import (rasterize_winner_pallas,
                                               rasterize_winner_xband_pallas)

B, K, H, W = 16, 8, 224, 224
model = bfm_mod.synthetic_bfm(num_theta=189, num_phi=189, seed=0)
fm = morph.device_bfm(model)
coeff = jnp.asarray(bfm_mod.demo_coeff(model, batch=B, seed=1))
tri = fm.tri
ntri = int(tri.shape[0])


@jax.jit
def make_verts(c):
    rec = morph.reconstruct(c, fm, image_size=float(H))
    return jnp.concatenate([rec.face_projection, rec.z_buffer], axis=-1)


verts = make_verts(coeff)
verts.block_until_ready()


def main():
    cases = {
        "pertri_guard": (
            lambda v: rasterize_winner_pallas(v, tri, h=H, w=W), verts),
        "xband_guard": (
            lambda v: rasterize_winner_xband_pallas(v, tri, h=H, w=W),
            verts),
        "xband_noguard": (
            lambda v: rasterize_winner_xband_pallas(v, tri, h=H, w=W,
                                                    guard=False), verts),
    }
    progs = timing.build_progs(cases, K)
    mins1, minsk = timing.interleaved_minima(progs, rounds=6)
    per = timing.per_iter(mins1, minsk, K)
    print(f"\n== amortized per 16-frame chunk (K={K}, {ntri} tris) ==")
    for name, sec in per.items():
        ns = sec * 1e9 / (ntri * B)
        print(f"{name:16s} {sec * 1e3:7.2f} ms   {ns:6.2f} ns/(tri,frame)")

    # exact parity on device
    wa, da = rasterize_winner_pallas(verts, tri, h=H, w=W)
    for name, g in (("guard", True), ("noguard", False)):
        wb, db = rasterize_winner_xband_pallas(verts, tri, h=H, w=W,
                                               guard=g)
        print(f"parity {name}: winner",
              bool(jnp.all(wa == wb)), "depth", bool(jnp.all(da == db)))


if __name__ == "__main__":
    main()
