"""A/B reformulations of the on-device YUV 4:2:0 pack.

profile_frame_tail.py measured the pack at 5.06 ms per 16-frame chunk —
~60 MB of HBM traffic, so ~12 GB/s effective: 60x below v5e HBM
speed-of-light for what is an elementwise pass + a 2x2 box mean.  The
suspect is layout: the production kernel slices r/g/b out of NHWC
(minor dim 3), so every elementwise op runs on 3-wide tiles.

Measured ISOLATED (round 5, v5e): chained 4.97 ms, planar 4.98,
matmul 1.51.  **The isolated 3.3x is a fusion artifact**: inside the
full frame program the chained form fuses into the G/composite
producers and the einsum forces a materialization — the in-program A/B
(profile_pack_inprogram.py, the AUTHORITATIVE measurement) puts the
einsum at **+0.6 ms/chunk SLOWER** (53.85 vs 54.44 min, consistent all
rounds), so production stays chained.  Kept as the record of WHY
isolated op A/Bs must be confirmed in-program.

Variants (same [16,512,512,3] f32 input):
  v0_chained  production `_pack_yuv420` (NHWC channel slices, three
              chained elementwise passes)
  v1_planar   ONE moveaxis to [3,C,S,S], then scalar math identical to
              v0 op-for-op — bit-exact vs v0, lanes = S
  v2_matmul   one [.,3]@[3,3] MXU einsum (different float summation
              order: <=1 uint8 on round ties)

Methodology: experiments/_timing.py (amortized in-jit K-repeat,
interleaved per-variant minima — CLAUDE.md).

Usage:  python experiments/profile_pack.py [k] [rounds]
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from experiments._timing import (build_progs, interleaved_minima,
                                 per_iter)
from voicepuppet_tpu.pipeline.synthesize import _pack_yuv420

# BT.601 full-range RGB->YUV as one 3x3 matrix (columns y,u,v): the
# algebraic expansion of y=.299r+.587g+.114b, u=(b-y)*.564+128,
# v=(r-y)*.713+128
_RGB2YUV = np.array([
    [0.299, -0.299 * 0.564, (1 - 0.299) * 0.713],
    [0.587, -0.587 * 0.564, -0.587 * 0.713],
    [0.114, (1 - 0.114) * 0.564, -0.114 * 0.713],
], np.float32)


def pack_matmul(frames):
    """v2: the color transform as one MXU einsum — the isolated winner
    that LOSES in-program (see module docstring)."""
    c, s = frames.shape[0], frames.shape[1]
    f = jnp.clip(frames, 0.0, 1.0) * 255.0
    yuv = jnp.einsum("chwk,kj->jchw", f, jnp.asarray(_RGB2YUV),
                     precision=jax.lax.Precision.HIGHEST)
    y = yuv[0]
    u = yuv[1] + 128.0
    v = yuv[2] + 128.0
    u = u.reshape(c, s // 2, 2, s // 2, 2).mean(axis=(2, 4))
    v = v.reshape(c, s // 2, 2, s // 2, 2).mean(axis=(2, 4))
    packed = jnp.concatenate(
        [y.reshape(c, -1), u.reshape(c, -1), v.reshape(c, -1)], axis=1)
    return jnp.clip(jnp.round(packed), 0, 255).astype(jnp.uint8)


def pack_planar(frames):
    """v1: identical scalar ops to _pack_yuv420, but on planar [3,C,S,S]
    after a single relayout, so the elementwise math runs on full
    S-wide lanes instead of 3-wide NHWC tiles."""
    c, s = frames.shape[0], frames.shape[1]
    f = jnp.moveaxis(jnp.clip(frames, 0.0, 1.0) * 255.0, -1, 0)
    r, g, b = f[0], f[1], f[2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = (b - y) * 0.564 + 128.0
    v = (r - y) * 0.713 + 128.0
    u = u.reshape(c, s // 2, 2, s // 2, 2).mean(axis=(2, 4))
    v = v.reshape(c, s // 2, 2, s // 2, 2).mean(axis=(2, 4))
    packed = jnp.concatenate(
        [y.reshape(c, -1), u.reshape(c, -1), v.reshape(c, -1)], axis=1)
    return jnp.clip(jnp.round(packed), 0, 255).astype(jnp.uint8)


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.rand(16, 512, 512, 3), jnp.float32)

    # parity first: v1 must be bit-exact vs production, matmul within +-1
    ref = np.asarray(jax.jit(_pack_yuv420)(frames))
    got1 = np.asarray(jax.jit(pack_planar)(frames))
    got2 = np.asarray(jax.jit(pack_matmul)(frames))
    ex1 = int((ref != got1).sum())
    d2 = np.abs(ref.astype(int) - got2.astype(int))
    print(f"parity: v1 mismatches {ex1} (must be 0); "
          f"v2 |diff|<=1: {int((d2 > 1).sum())} >1-flips, "
          f"{int((d2 == 1).sum())} +-1 ties / {ref.size}", flush=True)
    assert ex1 == 0
    assert int((d2 > 1).sum()) == 0

    cases = {
        "v0_chained": (_pack_yuv420, frames),
        "v1_planar": (pack_planar, frames),
        "v2_matmul": (pack_matmul, frames),
    }
    progs = build_progs(cases, k)
    m1, mk = interleaved_minima(progs, rounds)
    res = per_iter(m1, mk, k)
    print("\nper-16-frame-chunk pack time (amortized in-jit):")
    for name, sec in sorted(res.items(), key=lambda kv: kv[1]):
        print(f"  {name:12s}: {sec * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
