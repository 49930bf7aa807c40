"""Generate the golden frame for the visual end-to-end regression test
(tests/test_pipeline.py::test_golden_frame_regression).

Runs the full fixed-seed demo synthesis (audio -> BFMNet -> 3DMM ->
raster -> PixRefer G -> composite) on CPU at the test scale and commits
frame 2 as a PNG.  Regenerate ONLY when an intentional change alters the
rendered output; the test compares with loose tolerances so benign
numeric drift does not trip it, while a black/blank/inverted frame does.

Run:  python tests/fixtures/gen_golden_frame.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses

import numpy as np
from PIL import Image

OUT = os.path.join(os.path.dirname(__file__), "golden_frame.png")
S = 256


def synthesize_fixed():
    from voicepuppet_tpu.config import Config
    from voicepuppet_tpu.face3d import bfm as bfm_mod
    from voicepuppet_tpu.pipeline.synthesize import (SynthesisAssets,
                                                     constant_background)

    base = Config()
    cfg = dataclasses.replace(
        base,
        bfmnet=dataclasses.replace(base.bfmnet, backbone_width_mult=0.25,
                                   thinresnet_output_channels=64,
                                   encode_embedding_size=64,
                                   rnn_hidden_size=64),
        pixrefer=dataclasses.replace(base.pixrefer, ngf=8, ndf=8,
                                     img_size=S))
    fmodel = bfm_mod.synthetic_bfm(num_theta=24, num_phi=24, seed=1)
    synth, identity = SynthesisAssets.demo(cfg, seed=0, face_model=fmodel)

    sr = cfg.mel.sample_rate
    pcm = (0.25 * np.sin(2 * np.pi * 330.0 * np.arange(sr // 2) / sr)
           ).astype(np.float32)
    rng = np.random.RandomState(7)
    panel = rng.rand(S, 3 * S, 3).astype(np.float32)
    bg = constant_background(
        np.tile(np.linspace(0, 1, S, dtype=np.float32)[None, :, None],
                (S, 1, 3)))
    frames = synth.synthesize(panel, pcm, identity, backgrounds=bg)
    return frames


if __name__ == "__main__":
    frames = synthesize_fixed()
    Image.fromarray(frames[2]).save(OUT)
    print(f"wrote {OUT}: frames {frames.shape}, "
          f"frame2 mean {frames[2].mean():.2f}")
