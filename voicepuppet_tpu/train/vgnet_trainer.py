"""VGNet trainer — train_vgnet.py equivalent, data-parallel.

The reference alternates between D-only and G-only phases every
``alternative`` (1000) steps (train_vgnet.py:132-165); each phase is its
own jitted shard_map program over the data mesh.  Batch layout matches
VGNetDataGenerator (generator.py:356-374): (landmark_seq [B,T,136],
mask_seq [B,T,S,S,1], img_seq [B,T,S,S,3], example_landmark [B,136],
example_img [B,S,S,3], seq_len [B]).
"""

from __future__ import annotations

from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P

from voicepuppet_tpu.config import Config
from voicepuppet_tpu.models import vgnet as vg
from voicepuppet_tpu.parallel.mesh import (make_mesh, mesh_global_batch,
                                           shard_batch)
from voicepuppet_tpu.train.optim import reference_adam
from voicepuppet_tpu.train.state import GANTrainState


class VGNetTrainer:
    def __init__(self, cfg: Config, mesh=None, alternative: int = 1000):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh()
        # reference batch 4 (train_vgnet.py:41) rounded up to the mesh
        self.global_batch = mesh_global_batch(cfg.vgnet.batch_size,
                                              self.mesh)
        self.alternative = alternative
        self.gen = vg.VGNetGenerator(cfg.vgnet, bn_axis="data")
        self.disc = vg.VGNetDiscriminator(cfg.vgnet, bn_axis="data")
        self.gen_eval = vg.VGNetGenerator(cfg.vgnet, bn_axis=None)
        self.disc_eval = vg.VGNetDiscriminator(cfg.vgnet, bn_axis=None)
        t = cfg.vgnet.training
        self.g_tx = reference_adam(t.learning_rate, t.decay_steps,
                                   t.decay_rate,
                                   max_grad_norm=t.max_grad_norm)
        self.d_tx = reference_adam(t.learning_rate, t.decay_steps,
                                   t.decay_rate,
                                   max_grad_norm=t.max_grad_norm)
        self._d_step = self._build_step(train_d=True)
        self._g_step = self._build_step(train_d=False)

    def init_state(self, example_t: int = 4, seed: int = 0):
        s = self.cfg.vgnet.img_size
        b, t = 1, example_t
        rng = jax.random.PRNGKey(seed)
        g_vars = self.gen_eval.init(
            {"params": rng, "dropout": rng}, jnp.zeros((b, s, s, 3)),
            jnp.zeros((b, t, 136)), jnp.zeros((b, 136)),
            jnp.full((b,), t, jnp.int32), train=False)
        d_vars = self.disc_eval.init(
            {"params": jax.random.fold_in(rng, 1), "dropout": rng},
            jnp.zeros((b, t, s, s, 3)), jnp.zeros((b, 136)),
            jnp.full((b,), t, jnp.int32), train=False)
        state = GANTrainState.create(
            g_vars["params"], d_vars["params"],
            batch_stats={"g": g_vars.get("batch_stats", {}),
                         "d": d_vars.get("batch_stats", {})},
            g_tx=self.g_tx, d_tx=self.d_tx)
        return state

    def _build_step(self, train_d: bool):
        def step(state: GANTrainState, batch, rng):
            rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
            (lmk_seq, mask_seq, img_seq, ex_lmk, ex_img, seq_len) = batch
            g_stats = state.batch_stats["g"]
            d_stats = state.batch_stats["d"]

            def gen_fwd(g_params, rng):
                out, mut = self.gen.apply(
                    {"params": g_params, "batch_stats": g_stats},
                    ex_img, lmk_seq, ex_lmk, seq_len, train=True,
                    rngs={"dropout": rng}, mutable=["batch_stats"])
                return out, mut["batch_stats"]

            def disc_fwd(d_params, img, rng):
                out, mut = self.disc.apply(
                    {"params": d_params, "batch_stats": d_stats},
                    img, ex_lmk, seq_len, train=True,
                    rngs={"dropout": rng}, mutable=["batch_stats"])
                return out, mut["batch_stats"]

            if train_d:
                (fake_img, _, _), g_bs = gen_fwd(state.g_params, rng)
                fake_img = jax.lax.stop_gradient(fake_img)

                def d_loss_fn(d_params):
                    (rs, rl), d_bs = disc_fwd(d_params, img_seq,
                                              jax.random.fold_in(rng, 1))
                    (fs, fl), d_bs = disc_fwd(d_params, fake_img,
                                              jax.random.fold_in(rng, 2))
                    loss = vg.vgnet_discriminator_loss(
                        rs, rl, fs, fl, lmk_seq, seq_len)
                    return jax.lax.pmean(loss, "data"), d_bs

                (loss, d_bs), grads = jax.value_and_grad(
                    d_loss_fn, has_aux=True)(state.d_params)
                updates, opt = state.d_tx.update(grads, state.d_opt_state,
                                                 state.d_params)
                state = state.replace(
                    step=state.step + 1,
                    d_params=optax.apply_updates(state.d_params, updates),
                    d_opt_state=opt,
                    batch_stats={"g": g_bs, "d": d_bs})
                return state, {"discriminator_loss": loss}
            else:
                def g_loss_fn(g_params):
                    (fake_img, att, _), g_bs = gen_fwd(g_params, rng)
                    (fs, fl), _ = disc_fwd(state.d_params, fake_img,
                                           jax.random.fold_in(rng, 3))
                    loss, bce, lmk_l, pix = vg.vgnet_generator_loss(
                        fs, fl, fake_img, att, lmk_seq, mask_seq, img_seq,
                        seq_len)
                    return jax.lax.pmean(loss, "data"), (g_bs, bce, pix)

                (loss, (g_bs, bce, pix)), grads = jax.value_and_grad(
                    g_loss_fn, has_aux=True)(state.g_params)
                updates, opt = state.g_tx.update(grads, state.g_opt_state,
                                                 state.g_params)
                state = state.replace(
                    step=state.step + 1,
                    g_params=optax.apply_updates(state.g_params, updates),
                    g_opt_state=opt,
                    batch_stats={"g": g_bs,
                                 "d": state.batch_stats["d"]})
                return state, {"generator_loss": loss,
                               "bce_loss": jax.lax.pmean(bce, "data"),
                               "pix_loss": jax.lax.pmean(pix, "data")}

        mapped = jax.shard_map(step, mesh=self.mesh,
                               in_specs=(P(), P("data"), P()),
                               out_specs=(P(), P()), check_vma=True)
        return jax.jit(mapped, donate_argnums=(0,))

    def train_step(self, state, host_batch, rng):
        """Alternate phases every ``alternative`` steps
        (train_vgnet.py:133)."""
        phase_d = (int(state.step) // self.alternative) % 2 == 0
        fn = self._d_step if phase_d else self._g_step
        return fn(state, shard_batch(host_batch, self.mesh), rng)

    def fit(self, state, batches: Iterator, num_steps: int, logger=None,
            ckpt=None, seed: int = 0, profiler=None):
        rng = jax.random.PRNGKey(seed)
        for _ in range(num_steps):
            if profiler is not None:
                profiler.step(int(state.step))
            rng, sub = jax.random.split(rng)
            state, metrics = self.train_step(state, next(batches), sub)
            if logger is not None:
                logger.log(int(state.step), **metrics)
            if ckpt is not None:
                ckpt.maybe_save(int(state.step), state)
        if profiler is not None:
            profiler.close()
        return state


def main(argv=None):
    """CLI mirroring train_vgnet.py (voicepuppet/atvgnet/train_vgnet.py:
    131-193): alternating D/G phases every ``alternative`` steps.  PCA
    assets resolve like the ATNet trainer's (synthetic fallback)."""
    import argparse
    import os

    import numpy as np

    from voicepuppet_tpu.config import load_config
    from voicepuppet_tpu.data.generators import (FileSource, VGNetBatcher,
                                                 prefetch_to_device)
    from voicepuppet_tpu.models.atnet import synthetic_pca_component
    from voicepuppet_tpu.train.checkpoint import CheckpointManager
    from voicepuppet_tpu.train.metrics import (MetricsLogger,
                                                add_profiler_args,
                                                profiler_from_args)

    p = argparse.ArgumentParser()
    p.add_argument("--config_path", required=True)
    p.add_argument("--ckpt_dir", default="ckpt_vgnet")
    p.add_argument("--log_dir", default="log")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--alternative", type=int, default=1000,
                   help="D/G phase length (train_vgnet.py:133)")
    add_profiler_args(p)
    args = p.parse_args(argv)

    cfg = load_config(args.config_path)
    mean_path = os.path.join(cfg.model_dir, "lmk_mean.npy")
    comp_path = os.path.join(cfg.model_dir, "lmk_components.npy")
    pca_mean = (np.load(mean_path) if os.path.exists(mean_path)
                else np.zeros((cfg.vgnet.landmark_size,), np.float32))
    pca_component = (np.load(comp_path) if os.path.exists(comp_path)
                     else synthetic_pca_component(
                         6, cfg.vgnet.landmark_size))

    trainer = VGNetTrainer(cfg, alternative=args.alternative)
    state = trainer.init_state()
    tcfg = cfg.vgnet.training
    ckpt = CheckpointManager(args.ckpt_dir, tcfg.max_to_keep,
                             tcfg.save_interval)
    state = ckpt.restore(state)
    logger = MetricsLogger(args.log_dir, "vgnet")
    src = FileSource(cfg.dataset.train_dataset_path, cfg,
                     load_images=True)
    # streams/pca_renorm take the [136, K] transpose of the component
    batcher = VGNetBatcher(cfg, src, pca_mean, pca_component.T,
                           batch_size=trainer.global_batch)
    steps = args.steps if args.steps is not None else tcfg.epochs
    batches = prefetch_to_device(iter(batcher), trainer.mesh)
    trainer.fit(state, batches, steps, logger, ckpt,
                profiler=profiler_from_args(args))


if __name__ == "__main__":
    main()
