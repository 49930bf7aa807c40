"""PixFlowNet GAN trainer — train_pixflow.py equivalent, data-parallel.

Same step structure as the PixRefer trainer (D first, G against updated D,
global_step +2; ref: pixflow.py:314-362) but with PixFlow's loss wiring:
no perceptual term, single real term in the D loss, and the G's L1 target
is the current foreground (pixflow.py:293-312).  The batch layout matches
PixFlowDataGenerator (generator.py:805-921): (inputs [B,S,S,6] render
ref⊕cur, fg_inputs [B,S,S,6] fg ref⊕cur, masks [B,S,S,3]).
"""

from __future__ import annotations

from typing import Any, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P

from voicepuppet_tpu.config import Config
from voicepuppet_tpu.models import pixflow as pf
from voicepuppet_tpu.models import pixrefer as px
from voicepuppet_tpu.parallel.mesh import (make_mesh, mesh_global_batch,
                                           shard_batch)
from voicepuppet_tpu.train.optim import gan_optimizer
from voicepuppet_tpu.train.state import GANTrainState


class PixFlowTrainer:
    def __init__(self, cfg: Config, mesh=None,
                 image_size: Optional[int] = None,
                 train_dtype: Any = jnp.float32,
                 log_gradients: Optional[bool] = None):
        """``train_dtype=jnp.bfloat16`` = mixed-precision step: G/D conv
        activations in bf16 on the MXU, master params / Adam state / BN
        moments / losses float32 (same scheme as PixReferTrainer; no loss
        scaling needed — bf16 keeps float32's exponent range).  Measured
        a net LOSS on v5e for the sibling PixRefer step (casts around the
        f32 BN moments outweigh MXU savings; docs/PERF.md) — default f32.

        ``log_gradients``: True materializes the D/G gradient trees as
        step outputs for TB histograms (ref cadence,
        train_pixflow.py:113-115); False keeps them out of the jitted
        step entirely (a standing extra HBM gradient-tree copy per step
        otherwise).  Default ``None`` = decide per call: ``fit`` asks
        the logger (``MetricsLogger.wants_histograms``); direct
        ``train_step`` calls default to True."""
        self.cfg = cfg
        self.log_gradients = log_gradients
        self._steps = {}
        self.img_size = image_size or cfg.pixflow.img_size
        self.mesh = mesh if mesh is not None else make_mesh()
        self.train_dtype = train_dtype
        # reference batch 3 (train_pixflow.py:36) rounded up to the mesh
        self.global_batch = mesh_global_batch(cfg.pixflow.batch_size,
                                              self.mesh)
        self.gen = pf.PixFlowNet(cfg.pixflow, axis_name="data",
                                 dtype=train_dtype)
        self.gen_eval = pf.PixFlowNet(cfg.pixflow, axis_name=None)
        self.disc = px.Discriminator(cfg.pixflow.ndf, axis_name="data",
                                     dtype=train_dtype)
        self.g_tx = gan_optimizer(cfg.pixflow.training)
        self.d_tx = gan_optimizer(cfg.pixflow.training)
        self._infer_step = None

    def init_state(self, seed: int = 0) -> GANTrainState:
        s = self.img_size
        rng = jax.random.PRNGKey(seed)
        g_vars = self.gen_eval.init({"params": rng, "dropout": rng},
                                    jnp.zeros((1, s, s, 6)),
                                    jnp.zeros((1, s, s, 6)), train=False)
        d_vars = px.Discriminator(self.cfg.pixflow.ndf).init(
            jax.random.fold_in(rng, 1), jnp.zeros((1, s, s, 3)),
            jnp.zeros((1, s, s, 3)))
        return GANTrainState.create(g_vars["params"], d_vars["params"],
                                    batch_stats={}, g_tx=self.g_tx,
                                    d_tx=self.d_tx)

    def _step_for(self, log_gradients: bool):
        if log_gradients not in self._steps:
            self._steps[log_gradients] = self._build_step(log_gradients)
        return self._steps[log_gradients]

    def _build_step(self, log_gradients: bool):
        cfg = self.cfg.pixflow

        def step(state: GANTrainState, batch, rng):
            # per-shard dropout masks (mesh.py data_parallel_step does the
            # same; hand-rolled shard_maps must fold the axis index too)
            rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
            inputs, fg_inputs, masks = batch
            inputs_p = px.preprocess(inputs)
            fg_p = px.preprocess(fg_inputs)

            out0, _ = self.gen.apply({"params": state.g_params}, inputs_p,
                                     fg_p, train=True,
                                     rngs={"dropout": rng})
            out0 = jax.lax.stop_gradient(out0)

            def d_loss_fn(d_params):
                pr = self.disc.apply({"params": d_params},
                                     inputs_p[..., 3:], fg_p[..., 3:])
                pfake = self.disc.apply({"params": d_params},
                                        inputs_p[..., 3:], out0)
                return jax.lax.pmean(
                    pf.pixflow_discriminator_loss(pr, pfake), "data")

            d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.d_params)
            d_updates, d_opt_state = state.d_tx.update(
                d_grads, state.d_opt_state, state.d_params)
            new_d_params = optax.apply_updates(state.d_params, d_updates)

            def g_loss_fn(g_params):
                outputs, alphas = self.gen.apply(
                    {"params": g_params}, inputs_p, fg_p, train=True,
                    rngs={"dropout": jax.random.fold_in(rng, 1)})
                pfake = self.disc.apply({"params": new_d_params},
                                        inputs_p[..., 3:], outputs)
                total, gan, l1 = pf.pixflow_generator_loss(
                    pfake, fg_p[..., 3:], outputs, alphas, masks,
                    cfg.gan_weight, cfg.l1_weight)
                return jax.lax.pmean(total, "data"), (gan, l1)

            (g_loss, (gan_t, l1_t)), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True)(state.g_params)
            g_updates, g_opt_state = state.g_tx.update(
                g_grads, state.g_opt_state, state.g_params)
            new_g_params = optax.apply_updates(state.g_params, g_updates)

            state = state.replace(step=state.step + 2,
                                  g_params=new_g_params,
                                  d_params=new_d_params,
                                  g_opt_state=g_opt_state,
                                  d_opt_state=d_opt_state)
            metrics = {"discrim_loss": d_loss, "gen_loss": g_loss,
                       "gen_loss_GAN": jax.lax.pmean(gan_t, "data"),
                       "gen_loss_L1": jax.lax.pmean(l1_t, "data"),
                       }
            if log_gradients:
                # gradient trees for TB histograms (the reference logs
                # every grad var; train_pixflow.py:113-115) —
                # device-resident until the logger's cadence fetches
                # them; log_gradients=False keeps them out of the step's
                # outputs entirely (a standing HBM copy otherwise)
                metrics["_grads"] = {"discriminator": d_grads,
                                     "generator": g_grads}
            return state, metrics

        mapped = jax.shard_map(step, mesh=self.mesh,
                               in_specs=(P(), P("data"), P()),
                               out_specs=(P(), P()), check_vma=True)
        return jax.jit(mapped, donate_argnums=(0,))

    def train_step(self, state, host_batch, rng,
                   log_gradients: Optional[bool] = None):
        want = (log_gradients if log_gradients is not None
                else self.log_gradients if self.log_gradients is not None
                else True)
        return self._step_for(want)(
            state, shard_batch(host_batch, self.mesh), rng)

    def infer(self, state, inputs, fg_inputs):
        """[0,1] in -> deprocessed outputs (ref: pixflow.py:364-384)."""
        if self._infer_step is None:
            @jax.jit
            def run(g_params, inputs, fg_inputs):
                outputs, alphas = self.gen_eval.apply(
                    {"params": g_params}, px.preprocess(inputs),
                    px.preprocess(fg_inputs), train=False)
                return px.deprocess(outputs), alphas
            self._infer_step = run
        return self._infer_step(state.g_params, inputs, fg_inputs)

    def fit(self, state, batches: Iterator, num_steps: int, logger=None,
            ckpt=None, seed: int = 0, profiler=None):
        rng = jax.random.PRNGKey(seed)
        # materialize gradient trees only if the logger would actually
        # write histograms (constructor log_gradients overrides)
        want_grads = (self.log_gradients if self.log_gradients is not None
                      else logger is not None
                      and getattr(logger, "wants_histograms", False))
        for _ in range(num_steps):
            if profiler is not None:
                profiler.step(int(state.step))
            rng, sub = jax.random.split(rng)
            state, metrics = self.train_step(state, next(batches), sub,
                                             log_gradients=want_grads)
            grads = metrics.pop("_grads", None)
            if logger is not None:
                logger.log(int(state.step), **metrics)
                if hasattr(logger, "maybe_log_histograms"):
                    logger.maybe_log_histograms(int(state.step), grads)
            if ckpt is not None:
                ckpt.maybe_save(int(state.step), state)
        if profiler is not None:
            profiler.close()
        return state


def main(argv=None):
    import argparse
    from voicepuppet_tpu.config import load_config
    from voicepuppet_tpu.data.generators import (FileSource,
                                                 PixFlowBatcher)
    from voicepuppet_tpu.train.checkpoint import CheckpointManager
    from voicepuppet_tpu.train.metrics import (MetricsLogger,
                                                add_profiler_args,
                                                profiler_from_args)

    p = argparse.ArgumentParser()
    p.add_argument("--config_path", required=True)
    p.add_argument("--ckpt_dir", default="ckpt_pixflow")
    p.add_argument("--log_dir", default="log")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--dtype", choices=("float32", "bfloat16"),
                   default="float32",
                   help="bfloat16 = mixed-precision step (params/optimizer/"
                        "losses stay float32; measured SLOWER on v5e — "
                        "see docs/PERF.md)")
    add_profiler_args(p)
    args = p.parse_args(argv)

    cfg = load_config(args.config_path)
    trainer = PixFlowTrainer(cfg, train_dtype={
        "float32": jnp.float32, "bfloat16": jnp.bfloat16}[args.dtype])
    state = trainer.init_state()
    tcfg = cfg.pixflow.training
    ckpt = CheckpointManager(args.ckpt_dir, tcfg.max_to_keep,
                             tcfg.save_interval)
    state = ckpt.restore(state)
    logger = MetricsLogger(args.log_dir, "pixflow")
    src = FileSource(cfg.dataset.train_dataset_path, cfg, load_images=True)
    steps = args.steps if args.steps is not None else tcfg.epochs
    from voicepuppet_tpu.data.generators import (BackgroundBatches,
                                                 prefetch_to_device)
    # threaded decode pipeline (ref: tf.data num_parallel_calls=4)
    bg = BackgroundBatches(
        lambda i: iter(PixFlowBatcher(cfg, src, seed=i,
                                      batch_size=trainer.global_batch)),
        num_workers=4)
    batches = prefetch_to_device(bg, trainer.mesh)
    try:
        trainer.fit(state, batches, steps, logger, ckpt,
                    profiler=profiler_from_args(args))
    finally:
        bg.close()


if __name__ == "__main__":
    main()
