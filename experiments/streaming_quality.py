"""Quality-vs-latency curve for streaming synthesis (round-3 VERDICT
weak #6: the ~800 ms first-frame latency is ctx_right=12 frames of
algorithmic lookahead + a chunk=16 block wall, and no reduced-context
mode was characterized).

The GRU is exactly streamable; ONLY the conv trunk (MfccNet, receptive
field ~22 frames) sees truncated context, so shrinking ``ctx_right`` (and
``chunk``) trades coefficient fidelity for latency.  This script measures
that trade on the CPU backend (it is an EXACTNESS property — no TPU
timing involved): expression-coefficient error of the streamed run vs
the whole-clip batch program, for (chunk, ctx_right) presets from the
batch-faithful default down to fully causal, plus each preset's
algorithmic latency budget at 25 fps.

Scale note: coefficients come from an UNTRAINED reduced BFMNet on the
synthetic BFM (no released weights in this image) — absolute MAE is only
meaningful against the printed coefficient scale and as a RATIO between
presets; random weights AMPLIFY context truncation vs a trained model
(tests/test_streaming.py makes the same caveat).
"""
import dataclasses

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from voicepuppet_tpu.config import Config
from voicepuppet_tpu.face3d import bfm as bfm_mod
from voicepuppet_tpu.pipeline.streaming import StreamingCoeffPredictor
from voicepuppet_tpu.pipeline.synthesize import SynthesisAssets


class _ZeroRng:
    def rand(self, *shape):
        return np.zeros(shape)


base = Config()
cfg = dataclasses.replace(
    base,
    bfmnet=dataclasses.replace(base.bfmnet, backbone_width_mult=0.25,
                               thinresnet_output_channels=64,
                               encode_embedding_size=64,
                               rnn_hidden_size=64),
    pixrefer=dataclasses.replace(base.pixrefer, ngf=8, ndf=8,
                                 img_size=256))
fmodel = bfm_mod.synthetic_bfm(num_theta=12, num_phi=12, seed=3)
synth, identity = SynthesisAssets.demo(cfg, face_model=fmodel)

FRAMES = 96
rng = np.random.RandomState(0)
sr = cfg.mel.sample_rate
t = np.arange(FRAMES * cfg.frame_wav_scale) / sr
pcm = (0.3 * np.sin(2 * np.pi * 220 * t)
       + 0.05 * rng.randn(t.shape[0])).astype(np.float32)

# whole-clip reference (zero ears on both paths for comparability)
pcm_len = cfg.pcm_length_for_frames(FRAMES)
pcm_pad = np.pad(pcm, (0, max(0, pcm_len - pcm.shape[0])))[:pcm_len]
ears = np.zeros((1, FRAMES, 1), np.float32)
exp_ref = np.asarray(synth.bfmnet.apply(
    synth.bfm_vars, ears, synth.frontend(pcm_pad[None]),
    np.full((1,), FRAMES, np.int32), train=False))[0]

fps = cfg.frame_rate
scale = float(np.abs(exp_ref).mean())
print(f"clip: {FRAMES} frames @ {fps} fps; coeff scale "
      f"mean|exp_ref| = {scale:.4e}\n")
print(f"{'preset':26s} {'chunk':>5s} {'ctxR':>4s} {'MAE':>10s} "
      f"{'rel':>7s} {'interiorMAE':>11s} {'lookahead':>9s} "
      f"{'1st-block':>9s}")

for name, chunk, ctx_right in (
        ("batch-faithful (default)", 16, 12),
        ("low-latency", 8, 6),
        ("interactive", 4, 3),
        ("causal", 4, 0)):
    sp = StreamingCoeffPredictor(synth, chunk=chunk, ctx_right=ctx_right)
    sp._rng = _ZeroRng()
    blocks = []
    step = sr // 4            # 0.25 s pcm packets, as a live mic delivers
    for off in range(0, pcm.shape[0], step):
        blocks += sp.feed(pcm[off:off + step])
    blocks += sp.flush()
    exp_s = np.concatenate([np.asarray(b) for b in blocks], 0)
    assert exp_s.shape == exp_ref.shape, (exp_s.shape, exp_ref.shape)
    mae = float(np.abs(exp_s - exp_ref).mean())
    # interior = steady state (full ctx_left history exists): what a
    # long-running stream experiences after the first second
    mid = float(np.abs(exp_s[32:80] - exp_ref[32:80]).mean())
    look_ms = 1000.0 * ctx_right / fps
    first_ms = 1000.0 * (chunk + ctx_right) / fps
    print(f"{name:26s} {chunk:5d} {ctx_right:4d} {mae:10.3e} "
          f"{mae/scale:6.1%} {mid:11.3e} {look_ms:7.0f}ms "
          f"{first_ms:7.0f}ms")

print("\n(1st-block = frames that must arrive before the first block can "
      "compute; add the measured per-block device+tunnel wall from "
      "docs/PERF.md streaming section for wall-clock first frame)")
