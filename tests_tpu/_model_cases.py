"""Shared forward cases for the on-chip model gate.

Both sides (the CPU golden generator and the on-chip comparison) call
``compute_outputs`` with the SAME serialized parameters, so the check
isolates the *forward* computation: XLA:TPU lowering/layout/precision
drift shows up as output deltas, while platform-dependent init (e.g.
orthogonal init's QR) is excluded by construction.

Small-but-real shapes: every layer family of the two serving models is
exercised (conv trunk, sync-free BN, GRU scan, deconv decoder, RGBA
head) plus the windowed-DFT mel frontend (precision=HIGHEST path).
"""

import dataclasses

import numpy as np


def _cfg():
    from voicepuppet_tpu.config import Config
    base = Config()
    return dataclasses.replace(
        base,
        bfmnet=dataclasses.replace(base.bfmnet, backbone_width_mult=0.25,
                                   thinresnet_output_channels=64,
                                   encode_embedding_size=64,
                                   rnn_hidden_size=64),
        pixrefer=dataclasses.replace(base.pixrefer, ngf=8, ndf=8,
                                     img_size=256))


def init_params():
    """Run ONCE on the golden (CPU) side; returns serialized variables."""
    import jax
    import jax.numpy as jnp
    from flax import serialization
    from voicepuppet_tpu.models.bfmnet import BFMNet
    from voicepuppet_tpu.models import pixrefer as px

    cfg = _cfg()
    t = 16
    bfmnet = BFMNet(cfg.bfmnet)
    ear = jnp.zeros((1, t, 1), jnp.float32)
    mfcc = jnp.zeros((1, t * 5, cfg.mel.num_mel_bins), jnp.float32)
    seq = jnp.full((1,), t, jnp.int32)
    bfm_vars = bfmnet.init(jax.random.PRNGKey(0), ear, mfcc, seq,
                           train=False)

    gen = px.PixReferNet(cfg.pixrefer)
    s = cfg.pixrefer.img_size
    x = jnp.zeros((1, s, s, 6), jnp.float32)
    g_vars = gen.init(jax.random.PRNGKey(1), x, x, x[..., :3])
    return {"bfmnet": serialization.to_bytes(bfm_vars),
            "pixrefer": serialization.to_bytes(g_vars["params"])}


def compute_outputs(param_bytes):
    """Deterministic forwards from serialized params on the CURRENT
    jax backend.  Returns {name: np.ndarray}."""
    import jax
    import jax.numpy as jnp
    from flax import serialization
    from voicepuppet_tpu.audio.frontend import MelFrontend
    from voicepuppet_tpu.models.bfmnet import BFMNet
    from voicepuppet_tpu.models import pixrefer as px

    cfg = _cfg()
    t = 16
    rng = np.random.RandomState(7)

    bfmnet = BFMNet(cfg.bfmnet)
    ear = jnp.asarray(rng.rand(1, t, 1), jnp.float32) / 100.0
    mfcc = jnp.asarray(rng.randn(1, t * 5, cfg.mel.num_mel_bins),
                       jnp.float32)
    seq = jnp.full((1,), t, jnp.int32)
    tpl = bfmnet.init(jax.random.PRNGKey(0), ear, mfcc, seq, train=False)
    bfm_vars = serialization.from_bytes(tpl, param_bytes["bfmnet"])
    coeff = bfmnet.apply(bfm_vars, ear, mfcc, seq, train=False)

    gen = px.PixReferNet(cfg.pixrefer)
    s = cfg.pixrefer.img_size
    x = jnp.asarray(rng.rand(1, s, s, 6), jnp.float32) * 2.0 - 1.0
    xfg = jnp.asarray(rng.rand(1, s, s, 6), jnp.float32) * 2.0 - 1.0
    bg = jnp.asarray(rng.rand(1, s, s, 3), jnp.float32) * 2.0 - 1.0
    tpl_g = gen.init(jax.random.PRNGKey(1), x, xfg, bg)["params"]
    g_params = serialization.from_bytes(tpl_g, param_bytes["pixrefer"])
    outputs, alphas, outputs_fg = gen.apply({"params": g_params}, x, xfg,
                                            bg)

    frontend = MelFrontend(cfg.mel)
    # broadband noise, not a pure tone: log-mel of sub-noise-floor bins
    # is unbounded under f32 FFT roundoff (any two f32 FFTs differ by
    # ~1e-5 ABSOLUTE — PARITY.md "TF 2.21 as an EXECUTING oracle"), so
    # the comparison is only meaningful on bins with real energy; the
    # test additionally masks to golden log-mel > -6
    pcm = jnp.asarray(np.random.RandomState(11).randn(16000) * 0.1,
                      jnp.float32)[None]
    mel = frontend(pcm)

    return {"coeff": np.asarray(coeff, np.float32),
            "gan_out": np.asarray(outputs, np.float32),
            "gan_alpha": np.asarray(alphas, np.float32),
            "gan_fg": np.asarray(outputs_fg, np.float32),
            "mel": np.asarray(mel, np.float32)}
