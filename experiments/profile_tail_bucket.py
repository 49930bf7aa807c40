"""A/B the render_frames tail bucket at bench scale on the real chip.

fetch_frames must fetch the WHOLE device buffer (slicing on device would
discard the copy_to_host_async prefetch), so a 9-frame tail padded to a
32-frame chunk transfers 23 dead frames — ~7% of total d2h bytes on the
8-second bench clip (201 frames -> 7x32=224 padded vs 6x32+16=208
bucketed).  The e2e path is wire-bound through the dev tunnel, so bytes
saved convert ~1:1 into frames/s.

Methodology per CLAUDE.md: interleaved A/B/A/B in the SAME process,
per-variant best-of (tunnel weather swings run-to-run numbers 2-5x).

Usage:  python experiments/profile_tail_bucket.py [pairs]
"""

import sys
import time

import numpy as np

from voicepuppet_tpu.config import Config
from voicepuppet_tpu.face3d import bfm as bfm_mod
from voicepuppet_tpu.pipeline.synthesize import (SynthesisAssets,
                                                 constant_background)


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

    print("compile/warmup (both variants)...", flush=True)
    for tb in (True, False):
        synth._tail_bucket = tb
        run()

    best = {"bucket": 0.0, "pad_full": 0.0}
    runs = {"bucket": [], "pad_full": []}
    for p in range(pairs):
        for variant, tb in (("bucket", True), ("pad_full", False)):
            synth._tail_bucket = tb
            fps = run()
            runs[variant].append(fps)
            best[variant] = max(best[variant], fps)
            print(f"pair {p} {variant:8s}: {fps:6.1f} frames/s", flush=True)
    synth._tail_bucket = True

    print("\nper-variant best-of:")
    for v in ("bucket", "pad_full"):
        print(f"  {v:8s}: best {best[v]:6.1f} frames/s   "
              f"runs {[round(x, 1) for x in runs[v]]}")
    if best["pad_full"] > 0:
        print(f"  bucket/pad_full speedup: "
              f"{best['bucket']/best['pad_full']:.3f}x")


if __name__ == "__main__":
    main()
