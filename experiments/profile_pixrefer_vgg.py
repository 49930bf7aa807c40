"""Follow-up to profile_pixrefer_step.py: the VGG perceptual backward is
29.8 ms of the 46.7 ms true step compute (64%).  The VGG trunk has NO
batch-norm, so a bf16 trunk has none of the cast overhead that made
whole-step bf16 a loss — measure full-step f32 vs full-step with ONLY the
perceptual term in bf16, amortized in-jit (K repeats, carried dependence).

Also re-measures the step with the batch PRE-SHARDED on device: the
training-throughput table measured shard_batch's synchronous ~38 MB h2d
per step, which real training overlaps via prefetch_to_device.
"""
import time

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
g_params = gen.init(rng, jnp.zeros((1, S, S, 6)), jnp.zeros((1, S, S, 6)),
                    jnp.zeros((1, S, S, 3)))["params"]
d_params = disc.init(jax.random.fold_in(rng, 1), jnp.zeros((1, S, S, 3)),
                     jnp.zeros((1, S, S, 3)))["params"]
_, vgg_params = vgg_mod.init_vgg(jax.random.PRNGKey(17))
tx = gan_optimizer(cfg.pixrefer.training)
g_opt = tx.init(g_params)
d_opt = tx.init(d_params)

r = np.random.RandomState(0)
inputs = jnp.asarray(r.rand(B, S, S, 6).astype(np.float32) * 2 - 1)
fg = jnp.asarray(r.rand(B, S, S, 6).astype(np.float32) * 2 - 1)
targets = jnp.asarray(r.rand(B, S, S, 3).astype(np.float32) * 2 - 1)
masks = jnp.asarray((r.rand(B, S, S, 3) > 0.5).astype(np.float32))



def make_full_step(perc_dtype):
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
            perc = vgg_mod.perceptual_loss(vgg_params, fg[..., 3:],
                                           outputs_fg, dtype=perc_dtype)
            total, _, _ = px.generator_loss(pf, targets, outputs, alphas,
                                            masks, perc,
                                            cfg.pixrefer.gan_weight,
                                            cfg.pixrefer.l1_weight)
            return total

        g_grads = jax.grad(g_loss)(g_params)
        g_up, _ = tx.update(g_grads, g_opt, g_params)
        return optax.apply_updates(g_params, g_up)
    return full_step


def vgg_bwd(dtype):
    def f(x):
        return jax.grad(
            lambda im: vgg_mod.perceptual_loss(vgg_params, fg[..., 3:], im,
                                               dtype=dtype))(x[..., :3])
    return f


cases = {
    # perceptual_loss now splits the real branch out of the grad path
    # (models/vgg.py); the concat-formulation baseline measured
    # vgg_bwd 29.8 ms / full_step 46.7 ms (docs/PERF.md)
    "full_step f32 perceptual": make_full_step(jnp.float32),
    "full_step bf16 perceptual": make_full_step(jnp.bfloat16),
    "vgg_bwd f32 (split, to image)": vgg_bwd(jnp.float32),
    "vgg_bwd bf16 (split, to image)": vgg_bwd(jnp.bfloat16),
}

progs = timing.build_progs({n: (f, inputs) for n, f in cases.items()}, K)

mins1, minsK = timing.interleaved_minima(progs, rounds=6)
per_s = timing.per_iter(mins1, minsK, K)

print(f"\nFINAL per-iteration compute (ms, batch={B}, {S}², K={K}):")
for name in progs:
    per = per_s[name]
    print(f"  {name:30s} {per*1e3:8.1f}   (t1={mins1[name]*1e3:.0f} "
          f"tK={minsK[name]*1e3:.0f})")

# ---- device-resident steps/s via the actual trainer ----
print("\ndevice-resident trainer steps/s (batch pre-sharded once):",
      flush=True)
from voicepuppet_tpu.train.pixrefer_trainer import PixReferTrainer
from voicepuppet_tpu.parallel.mesh import shard_batch

trainer = PixReferTrainer(cfg)
state = trainer.init_state()
host_batch = (np.asarray(inputs) * 0.5 + 0.5, np.asarray(fg) * 0.5 + 0.5,
              np.asarray(targets) * 0.5 + 0.5, np.asarray(masks))
dev_batch = shard_batch(host_batch, trainer.mesh)
key = jax.random.PRNGKey(0)


def run_steps(state, n):
    t0 = time.perf_counter()
    for _ in range(n):
        state, metrics = trainer._train_step(state, dev_batch,
                                             trainer.vgg_params, key)
    float(np.asarray(jax.tree_util.tree_leaves(metrics)[0]).ravel()[0])
    return time.perf_counter() - t0, state


_, state = run_steps(state, 1)
_, state = run_steps(state, 2)
best = 1e9
for _ in range(4):
    w, state = run_steps(state, 12)
    best = min(best, w / 12)
print(f"  pixrefer batch={B} device-resident: {best*1e3:.1f} ms/step "
      f"({1.0/best:.2f} steps/s)", flush=True)
