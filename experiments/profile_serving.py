"""Serving-surface measurements on the real TPU (VERDICT r2 next #5, #7).

1. Streaming chunk latency: pcm-in -> frames-out wall time per block at
   chunk 8 and 16 (full-scale mesh, 512² frames, bf16 G, YUV420).
2. BFMNet whole-clip coefficient pass: f32 vs bf16 trunk, amortized
   in-jit repeats (T=256 bucket, reference width).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from voicepuppet_tpu.config import Config
from voicepuppet_tpu.face3d import bfm as bfm_mod
from voicepuppet_tpu.pipeline.synthesize import SynthesisAssets
from voicepuppet_tpu.pipeline.streaming import StreamingSynthesizer

cfg = Config()


def stream_latency(chunk):
    fm = bfm_mod.synthetic_bfm(num_theta=189, num_phi=189, seed=0)
    synth, identity = SynthesisAssets.demo(cfg, face_model=fm,
                                           chunk=chunk)
    s = cfg.pixrefer.img_size
    rng = np.random.RandomState(0)
    panel = rng.rand(s, 3 * s, 3).astype(np.float32)
    ss = StreamingSynthesizer(synth, identity, panel[:, s:2 * s, :],
                              panel[:, :s, :])
    sr = cfg.mel.sample_rate
    spf = cfg.frame_wav_scale                      # samples per frame
    pcm = (0.3 * np.sin(2 * np.pi * 220.0 * np.arange(sr * 30) / sr)
           ).astype(np.float32)
    pos = 0

    def feed(nframes):
        nonlocal pos
        block = pcm[pos:pos + nframes * spf]
        pos += nframes * spf
        return ss.feed(block)

    # prime lookahead + compile
    t0 = time.time()
    out = feed(chunk + ss.coeffs.ctx_right + 1)
    print(f"chunk={chunk}: first block (compile) {time.time()-t0:.1f}s, "
          f"{len(out)} blocks", flush=True)

    lats = []
    for _ in range(12):
        t0 = time.perf_counter()
        blocks = feed(chunk)
        dt = time.perf_counter() - t0
        assert sum(b.shape[0] for b in blocks) == chunk, blocks
        lats.append(dt)
    lats = np.asarray(lats) * 1e3
    lat_frames = 1000.0 * (ss.coeffs.ctx_right + chunk) / 25.0
    print(f"chunk={chunk:2d}: pcm->frames wall per block "
          f"min {lats.min():.0f} ms  median {np.median(lats):.0f} ms  "
          f"max {lats.max():.0f} ms  "
          f"(+ {lat_frames:.0f} ms algorithmic lookahead@25fps)",
          flush=True)


def bfmnet_ab():
    from voicepuppet_tpu.models.bfmnet import BFMNet
    from voicepuppet_tpu.audio.frontend import MelFrontend
    t = 256
    frontend = MelFrontend(cfg.mel)
    pcm_len = cfg.pcm_length_for_frames(t)
    rng = jax.random.PRNGKey(0)
    m32 = BFMNet(cfg.bfmnet)
    m16 = BFMNet(cfg.bfmnet, dtype=jnp.bfloat16)
    ears = jnp.zeros((1, t, 1), jnp.float32)
    pcm = jnp.asarray(np.random.RandomState(0).randn(1, pcm_len) * 0.1,
                      jnp.float32)
    seq = jnp.full((1,), t, jnp.int32)
    variables = m32.init({"params": rng, "dropout": rng}, ears,
                         jnp.zeros((1, t * 5, 80)), seq, train=False)

    def prog(model, k):
        @jax.jit
        def run(pcm):
            mfcc = frontend(pcm)

            def body(i, carry):
                m, acc = carry
                out = model.apply(variables, ears, m, seq, train=False)
                s = jnp.sum(out)
                return (m + 1e-30 * s, acc + s)
            _, acc = jax.lax.fori_loop(0, k, body, (mfcc, 0.0))
            return acc
        return run

    K = 8
    progs = {"f32": (prog(m32, 1), prog(m32, K)),
             "bf16": (prog(m16, 1), prog(m16, K))}
    for name, (p1, pK) in progs.items():
        float(np.asarray(p1(pcm)))
        float(np.asarray(pK(pcm)))
    # per-variant minima of w1 and wK SEPARATELY (CLAUDE.md timing
    # methodology): min over rounds of the same-round difference lets one
    # latency-spiked w1 produce an underestimated (even negative) per-step
    mins1, minsK = {}, {}
    for r in range(6):
        for name, (p1, pK) in progs.items():
            t0 = time.perf_counter()
            float(np.asarray(p1(pcm)))
            mins1[name] = min(mins1.get(name, 1e9),
                              time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(np.asarray(pK(pcm)))
            minsK[name] = min(minsK.get(name, 1e9),
                              time.perf_counter() - t0)
    for name in progs:
        per = (minsK[name] - mins1[name]) / (K - 1)
        print(f"bfmnet coeff pass T={t} {name}: {per*1e3:.1f} ms",
              flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "ab"):
        bfmnet_ab()
    if which in ("all", "stream"):
        stream_latency(16)
        stream_latency(8)
