"""In-PROGRAM A/B of the YUV pack forms inside the full frame program.

profile_pack.py measured the packs ISOLATED (chained 4.97 ms, einsum
1.51 — 3.3x).  This harness showed that ISOLATED result to be a fusion
artifact: inside the full frame program the chained elementwise form
fuses into the G-output/composite producers, while the einsum (a
matmul cannot fuse into its producer) forces a materialization.
Measured round 5 (per-variant minima over 3 interleaved rounds, k=8
in-jit repeats): chained **53.85 ms/chunk**, einsum **54.44** — the
einsum is +0.6 ms SLOWER in production, so `_pack_yuv420` stays
chained.  (The tell: bench compute_fps moved 357.3 -> 352.6 when the
einsum briefly shipped.)  Lesson pinned in CLAUDE.md: confirm isolated
op wins in-program before adopting.

Usage:  python experiments/profile_pack_inprogram.py [rounds]
"""

import sys

import voicepuppet_tpu.pipeline.synthesize as syn
from experiments.profile_pack import pack_matmul
from voicepuppet_tpu.config import Config
from voicepuppet_tpu.face3d import bfm as bfm_mod


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    cfg = Config()
    face_model = bfm_mod.synthetic_bfm(num_theta=189, num_phi=189, seed=0)

    production_pack = syn._pack_yuv420   # the chained form
    packs = {"chained": production_pack, "einsum": pack_matmul}
    # estimate_chunk_compute RE-TRACES the frame-program body on every
    # call (its run1/runk closures are fresh jits), so the module-level
    # pack must be swapped around EVERY call, not just construction;
    # the XLA compilation cache absorbs the repeated compiles
    s, ident = syn.SynthesisAssets.demo(cfg, face_model=face_model,
                                        chunk=16)
    try:
        for name, pack in packs.items():
            syn._pack_yuv420 = pack
            per = s.estimate_chunk_compute(ident, k=8, repeats=1)
            print(f"warm {name}: {per * 1e3:.2f} ms/chunk", flush=True)
    finally:
        syn._pack_yuv420 = production_pack

    best = {n: float("inf") for n in packs}
    try:
        for r in range(rounds):
            for name, pack in packs.items():
                syn._pack_yuv420 = pack
                per = s.estimate_chunk_compute(ident, k=8, repeats=2)
                best[name] = min(best[name], per)
                print(f"round {r} {name:8s}: {per * 1e3:7.2f} ms/chunk",
                      flush=True)
    finally:
        syn._pack_yuv420 = production_pack

    print("\nper-variant minima (16-frame chunk, full frame program):")
    for n, v in sorted(best.items(), key=lambda kv: kv[1]):
        print(f"  {n:8s}: {v * 1e3:7.2f} ms")
    print(f"  einsum - chained: "
          f"{(best['einsum'] - best['chained']) * 1e3:+.2f} ms")


if __name__ == "__main__":
    main()
