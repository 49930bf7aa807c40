"""A/B the staged drain (fetch worker + unpack worker) against the
round-4 serialized drain (unpack inline on the fetch thread) at bench
scale on the real chip.

Motivation: the host-side YUV 4:2:0 unpack measures ~185 ms per
32-frame chunk on this one-core host; serialized behind a ~320-630 ms
tunnel fetch it is 20-35% of the e2e period.  The staged drain keeps
fetches strictly serial (concurrent fetches contend through the
globally throttled tunnel — docs/PERF.md) and only moves the CPU-bound
unpack to a second worker, so unpack(k) overlaps fetch(k+1).

Methodology per CLAUDE.md: interleaved A/B/A/B in the SAME process,
per-variant minima of the per-run period (tunnel weather swings run-to-
run numbers 2-5x).  Run with no other host load (the unpack stage is
CPU-timed).

Usage:  python experiments/profile_drain.py [pairs]
"""

import sys
import time
from concurrent.futures import Future

import numpy as np

from voicepuppet_tpu.config import Config
from voicepuppet_tpu.face3d import bfm as bfm_mod
from voicepuppet_tpu.pipeline.synthesize import (SynthesisAssets,
                                                 constant_background)


class _InlineExecutor:
    """Runs submit() on the calling thread — reproduces the round-4
    serialized drain exactly (unpack on the fetch worker)."""

    def submit(self, fn, *args):
        f = Future()
        f.set_result(fn(*args))
        return f

    def shutdown(self, wait=False):
        pass


def main():
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 4

    cfg = Config()
    face_model = bfm_mod.synthetic_bfm(num_theta=189, num_phi=189, seed=0)
    synth, identity = SynthesisAssets.demo(cfg, face_model=face_model,
                                           chunk=32)

    seconds = 8.0
    sr = cfg.mel.sample_rate
    pcm = (0.3 * np.sin(2 * np.pi * 220.0 * np.arange(int(seconds * sr))
                        / sr)).astype(np.float32)
    s = cfg.pixrefer.img_size
    panel = np.random.RandomState(0).rand(s, 3 * s, 3).astype(np.float32)
    bg = constant_background(np.zeros((s, s, 3), np.float32))

    def run():
        t0 = time.time()
        frames = synth.synthesize(panel, pcm, identity, backgrounds=bg)
        return frames.shape[0] / (time.time() - t0)

    print("compile/warmup...", flush=True)
    run()

    best = {"staged": 0.0, "inline": 0.0}
    runs = {"staged": [], "inline": []}
    inline = _InlineExecutor()
    for p in range(pairs):
        for variant in ("staged", "inline"):
            # swap ONLY the unpack stage executor; the fetch worker and
            # compiled programs are shared
            synth._unpack_pool = None if variant == "staged" else inline
            fps = run()
            runs[variant].append(fps)
            best[variant] = max(best[variant], fps)
            print(f"pair {p} {variant:7s}: {fps:6.1f} frames/s", flush=True)
    synth._unpack_pool = None

    print("\nper-variant best-of (period minima):")
    for v in ("staged", "inline"):
        print(f"  {v:7s}: best {best[v]:6.1f} frames/s   "
              f"runs {[round(x, 1) for x in runs[v]]}")
    if best["inline"] > 0:
        print(f"  staged/inline speedup: {best['staged']/best['inline']:.3f}x")


if __name__ == "__main__":
    main()
