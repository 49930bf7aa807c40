"""Decompose the PixRefer D+G train step on the real TPU.

The measured 754 ms/step (batch 2, 512², f32) is ~25x the naive conv FLOP
estimate (~30 ms at the serving-measured conv rate), and nobody has looked
at where it goes.  Each component is repeated K times inside ONE jit via
lax.fori_loop with a carried data dependence (the only trustworthy timing
through the ~27 ms-floor axon tunnel; CLAUDE.md), per-iteration =
(t_K - t_1)/(K - 1).

Components: G forward; G fwd+bwd on the L1 term only; one D forward; the
full D step (3 D fwds + bwd); VGG perceptual forward; VGG backward to its
image input; the full G-loss grad; one Adam update per net; and the whole
fused D+G step as the trainer jits it.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from experiments import _timing as timing
import optax

from voicepuppet_tpu.config import Config
from voicepuppet_tpu.models import pixrefer as px
from voicepuppet_tpu.models import vgg as vgg_mod
from voicepuppet_tpu.train.optim import gan_optimizer

cfg = Config()
B = 2
S = cfg.pixrefer.img_size
K = 8

gen = px.PixReferNet(cfg.pixrefer, axis_name=None)
disc = px.Discriminator(cfg.pixrefer.ndf, axis_name=None)
rng = jax.random.PRNGKey(0)
g_vars = gen.init(rng, jnp.zeros((1, S, S, 6)), jnp.zeros((1, S, S, 6)),
                  jnp.zeros((1, S, S, 3)))
d_vars = disc.init(jax.random.fold_in(rng, 1), jnp.zeros((1, S, S, 3)),
                   jnp.zeros((1, S, S, 3)))
g_params = g_vars["params"]
d_params = d_vars["params"]
_, vgg_params = vgg_mod.init_vgg(jax.random.PRNGKey(17))

tx = gan_optimizer(cfg.pixrefer.training)
g_opt = tx.init(g_params)
d_opt = tx.init(d_params)

r = np.random.RandomState(0)
inputs = jnp.asarray(r.rand(B, S, S, 6).astype(np.float32) * 2 - 1)
fg = jnp.asarray(r.rand(B, S, S, 6).astype(np.float32) * 2 - 1)
targets = jnp.asarray(r.rand(B, S, S, 3).astype(np.float32) * 2 - 1)
masks = jnp.asarray((r.rand(B, S, S, 3) > 0.5).astype(np.float32))



def g_forward(x):
    return gen.apply({"params": g_params}, x, fg, targets)[0]


def g_l1_grad(x):
    def loss(p):
        outputs, alphas, _ = gen.apply({"params": p}, x, fg, targets)
        return (jnp.mean(jnp.abs(targets - outputs))
                + jnp.mean(jnp.abs(masks - alphas)))
    return jax.grad(loss)(g_params)


def d_forward(x):
    return disc.apply({"params": d_params}, x[..., 3:], targets)


def d_step_grad(x):
    fake = jax.lax.stop_gradient(
        gen.apply({"params": g_params}, x, fg, targets)[2])

    def loss(dp):
        pr1 = disc.apply({"params": dp}, x[..., 3:], fg[..., 3:])
        pr2 = disc.apply({"params": dp}, x[..., :3], fg[..., :3])
        pf = disc.apply({"params": dp}, x[..., 3:], fake)
        return px.discriminator_loss((pr1 + pr2) / 2.0, pf)
    return jax.grad(loss)(d_params)


def d_grad_only(x):
    """D loss grad with the fake PRECOMPUTED outside the timed body —
    isolates the 3 D fwds + D bwd from the G fwd."""
    def loss(dp):
        pr1 = disc.apply({"params": dp}, x[..., 3:], fg[..., 3:])
        pr2 = disc.apply({"params": dp}, x[..., :3], fg[..., :3])
        pf = disc.apply({"params": dp}, x[..., 3:], targets)
        return px.discriminator_loss((pr1 + pr2) / 2.0, pf)
    return jax.grad(loss)(d_params)


def vgg_forward(x):
    return vgg_mod.perceptual_loss(vgg_params, fg[..., 3:], x[..., :3])


def vgg_bwd(x):
    return jax.grad(
        lambda im: vgg_mod.perceptual_loss(vgg_params, fg[..., 3:],
                                           im))(x[..., :3])


def g_full_grad(x):
    def loss(p):
        outputs, alphas, outputs_fg = gen.apply({"params": p}, x, fg,
                                                targets)
        pf = disc.apply({"params": d_params}, x[..., 3:], outputs_fg)
        perc = vgg_mod.perceptual_loss(vgg_params, fg[..., 3:], outputs_fg)
        total, _, _ = px.generator_loss(pf, targets, outputs, alphas,
                                        masks, perc,
                                        cfg.pixrefer.gan_weight,
                                        cfg.pixrefer.l1_weight)
        return total
    return jax.grad(loss)(g_params)


def adam_update(x):
    g = jax.tree_util.tree_map(lambda p: p * x[0, 0, 0, 0], g_params)
    up, _ = tx.update(g, g_opt, g_params)
    return jax.tree_util.tree_leaves(up)[0]


def full_step(x):
    fake0 = jax.lax.stop_gradient(
        gen.apply({"params": g_params}, x, fg, targets)[2])

    def d_loss(dp):
        pr1 = disc.apply({"params": dp}, x[..., 3:], fg[..., 3:])
        pr2 = disc.apply({"params": dp}, x[..., :3], fg[..., :3])
        pf = disc.apply({"params": dp}, x[..., 3:], fake0)
        return px.discriminator_loss((pr1 + pr2) / 2.0, pf)

    d_grads = jax.grad(d_loss)(d_params)
    d_up, _ = tx.update(d_grads, d_opt, d_params)
    new_dp = optax.apply_updates(d_params, d_up)

    def g_loss(p):
        outputs, alphas, outputs_fg = gen.apply({"params": p}, x, fg,
                                                targets)
        pf = disc.apply({"params": new_dp}, x[..., 3:], outputs_fg)
        perc = vgg_mod.perceptual_loss(vgg_params, fg[..., 3:], outputs_fg)
        total, _, _ = px.generator_loss(pf, targets, outputs, alphas,
                                        masks, perc,
                                        cfg.pixrefer.gan_weight,
                                        cfg.pixrefer.l1_weight)
        return total

    g_grads = jax.grad(g_loss)(g_params)
    g_up, _ = tx.update(g_grads, g_opt, g_params)
    return optax.apply_updates(g_params, g_up)


cases = {
    "g_forward": g_forward,
    "g_l1_grad (G fwd+bwd, no D/VGG)": g_l1_grad,
    "d_forward (one D call)": d_forward,
    "d_grad_only (3 D fwd + bwd)": d_grad_only,
    "d_step_grad (+ G fwd)": d_step_grad,
    "vgg_forward": vgg_forward,
    "vgg_bwd (to image)": vgg_bwd,
    "g_full_grad (G+D+VGG bwd)": g_full_grad,
    "adam_update (G tree)": adam_update,
    "full_step (D+G, 2x adam)": full_step,
}

progs = timing.build_progs({n: (f, inputs) for n, f in cases.items()}, K)

mins1, minsK = timing.interleaved_minima(progs, rounds=6)
per_s = timing.per_iter(mins1, minsK, K)

print(f"\nFINAL per-iteration compute (ms, batch={B}, {S}², f32, K={K}):")
for name in progs:
    per = per_s[name]
    print(f"  {name:34s} {per*1e3:8.1f}   (t1={mins1[name]*1e3:.0f} "
          f"tK={minsK[name]*1e3:.0f})")
