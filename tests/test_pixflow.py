"""PixFlowNet shape/range + train-step tests (no reference tests existed
for this model; SURVEY.md §4)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voicepuppet_tpu.config import Config
from voicepuppet_tpu.models import pixflow as pf
from voicepuppet_tpu.train.pixflow_trainer import PixFlowTrainer

S = 128  # PixFlow has no U-Net skips, so smaller canvases work


@pytest.fixture(scope="module")
def cfg():
    base = Config()
    return dataclasses.replace(
        base, pixflow=dataclasses.replace(base.pixflow, ngf=8, ndf=8,
                                          img_size=S, batch_size=8))


@pytest.fixture(scope="module")
def batch(cfg):
    rng = np.random.RandomState(0)
    return (rng.rand(8, S, S, 6).astype(np.float32),
            rng.rand(8, S, S, 6).astype(np.float32),
            (rng.rand(8, S, S, 3) > 0.5).astype(np.float32))


def test_generator_black_background_composite(cfg, batch):
    inputs, fg, _ = batch
    model = pf.PixFlowNet(cfg.pixflow)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng},
                           inputs * 2 - 1, fg * 2 - 1, train=False)
    outputs, alphas = model.apply(variables, inputs * 2 - 1, fg * 2 - 1,
                                  train=False)
    assert outputs.shape == (8, S, S, 3)
    a = np.asarray(alphas)
    assert a.min() >= 0.0 and a.max() <= 1.0
    # out = rgb*α + α - 1: where α→0 the output must approach -1 (black)
    o = np.asarray(outputs)
    dark = o[a < 0.01]
    if dark.size:
        np.testing.assert_allclose(dark, -1.0, atol=0.05)


def test_identical_pair_gives_zero_motion_features(cfg, batch):
    """With ref==cur rendered faces the diffnet contribution cancels."""
    inputs, fg, _ = batch
    same = np.concatenate([inputs[..., :3], inputs[..., :3]], axis=-1)
    gen = pf.PixFlowGenerator(ngf=8)
    rng = jax.random.PRNGKey(1)
    variables = gen.init({"params": rng, "dropout": rng}, same * 2 - 1,
                         fg * 2 - 1, train=False)
    # feat1 - feat0 == 0 exactly when both streams see the same input;
    # perturbing only the current face must change the output
    out_same = gen.apply(variables, same * 2 - 1, fg * 2 - 1, train=False)
    moved = same.copy()
    moved[..., 3:] = np.roll(moved[..., 3:], 5, axis=2)
    out_moved = gen.apply(variables, moved * 2 - 1, fg * 2 - 1,
                          train=False)
    assert not np.allclose(np.asarray(out_same), np.asarray(out_moved))


def test_pixflow_losses_reference_form():
    pr = jnp.full((2, 4, 4, 1), 0.8)
    pfk = jnp.full((2, 4, 4, 1), 0.3)
    d = float(pf.pixflow_discriminator_loss(pr, pfk))
    np.testing.assert_allclose(
        d, -(np.log(0.8 + 1e-12) + np.log(0.7 + 1e-12)), rtol=1e-5)


@pytest.mark.slow
def test_pixflow_gan_train_step(cfg, batch):
    trainer = PixFlowTrainer(cfg, image_size=S)
    state = trainer.init_state()
    key = jax.random.PRNGKey(0)
    hist = []
    for _ in range(3):
        key, sub = jax.random.split(key)
        state, metrics = trainer.train_step(state, batch, sub)
        # gradient trees ride along for TB histograms
        # (train_pixflow.py:113-115); they are not scalar metrics
        grads = metrics.pop("_grads")
        assert set(grads) == {"discriminator", "generator"}
        assert all(np.isfinite(np.asarray(g)).all()
                   for g in jax.tree_util.tree_leaves(grads))
        hist.append({k: float(v) for k, v in metrics.items()})
    assert int(state.step) == 6
    for m in hist:
        assert np.isfinite(list(m.values())).all()
    assert hist[-1]["discrim_loss"] < hist[0]["discrim_loss"]


def test_pixflow_data_stream(cfg):
    import dataclasses as dc
    from voicepuppet_tpu.data import generators as gen
    from tests.test_data import make_panel_clip
    cfg2 = dc.replace(cfg, pixflow=dc.replace(cfg.pixflow, img_size=64,
                                              crop_ratio=1.0))
    rng = np.random.RandomState(3)
    clip = make_panel_clip(rng, frames=4, size=64)
    stream = iter(gen.PixFlowSampleStream(cfg2, gen.ArraySource([clip])))
    inputs, fg_inputs, masks = next(stream)
    assert inputs.shape == (64, 64, 6)
    assert fg_inputs.shape == (64, 64, 6)
    assert masks.shape == (64, 64, 3)


@pytest.mark.slow
def test_pixflow_bf16_mixed_precision_step_learns(cfg, batch):
    """Mixed-precision (train_dtype=bfloat16) PixFlow step: conv
    activations bf16, master params / losses float32.  Asserts the bf16
    gradient path trains (L1 drops over a fixed batch) and the float32
    master-weight invariant holds (same scheme as the PixRefer trainer;
    the reference trains f32-only, train_pixflow.py:107-133)."""
    from voicepuppet_tpu.config import TrainingConfig
    from voicepuppet_tpu.parallel.mesh import make_mesh

    cfg2 = dataclasses.replace(
        cfg, pixflow=dataclasses.replace(
            cfg.pixflow, batch_size=2,
            training=TrainingConfig(learning_rate=1e-3,
                                    decay_steps=1000, decay_rate=0.999,
                                    beta1=0.5)))
    mesh1 = make_mesh(jax.devices()[:1])
    trainer = PixFlowTrainer(cfg2, image_size=S, mesh=mesh1,
                             train_dtype=jnp.bfloat16)
    state = trainer.init_state()
    for leaf in jax.tree_util.tree_leaves(state.g_params):
        assert leaf.dtype == jnp.float32

    small = tuple(np.asarray(a[:2]) for a in batch)
    key = jax.random.PRNGKey(0)
    l1_hist = []
    for _ in range(25):
        key, sub = jax.random.split(key)
        state, metrics = trainer.train_step(state, small, sub)
        metrics.pop("_grads")
        l1_hist.append(float(metrics["gen_loss_L1"]))
    assert np.isfinite(l1_hist).all()
    # measured trajectory: 1.141 -> 0.942 over the 25 steps (17% drop,
    # monotone); certifies the bf16 gradient path trains at all
    assert min(l1_hist[-5:]) < 0.9 * l1_hist[0], l1_hist[::5]
    assert min(l1_hist[-5:]) == min(l1_hist), l1_hist[::5]  # still falling
    for leaf in jax.tree_util.tree_leaves(state.g_params):
        assert leaf.dtype == jnp.float32
