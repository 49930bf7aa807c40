"""PixReferNet GAN trainer — train_pixrefer.py equivalent, data-parallel.

Reference semantics mirrored (voicepuppet/pixrefer/pixrefer.py:356-412,
train_pixrefer.py:112-153):
  * one forward per step feeds BOTH optimizers; D's gradients treat the
    generator output as constant (var_list restriction -> stop_gradient)
  * D updates FIRST, and G's gradients are computed against the *updated*
    D (the reference nests G's backward in
    ``control_dependencies([discrim_train])``, so the gen backward reads
    post-update D variables)
  * global_step advances by 2 per iteration (both apply_gradients share it)
  * Adam β1=0.5, lr 3e-4 with staircase decay .999/1000; no grad clip
  * masks stay in [0,1]; images preprocessed to [-1,1]

TPU design: the whole D-step + G-step is ONE jitted shard_map program over
the ``data`` mesh axis — batch sharded, params replicated, both losses
pmean'd over ICI before differentiation (AD inserts the gradient psum).
The VGG trunk rides along as a frozen replicated pytree argument.
"""

from __future__ import annotations

import functools
from typing import Any, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P

from voicepuppet_tpu.config import Config
from voicepuppet_tpu.models import pixrefer as px
from voicepuppet_tpu.models import vgg as vgg_mod
from voicepuppet_tpu.parallel.mesh import (make_mesh, mesh_global_batch,
                                           shard_batch)
from voicepuppet_tpu.train.optim import gan_optimizer
from voicepuppet_tpu.train.state import GANTrainState


def _hit_interval(step: int, stride: int, kk: int, interval: int) -> bool:
    """True iff any of this dispatch's ``kk`` step values
    ``{step - stride*(kk-1), ..., step}`` is an exact multiple of
    ``interval`` — the K>1 generalization of the reference loop's
    ``global_step % interval == 0`` check (train_pixrefer.py:144-153,
    where global_step strides by 2).  Fires at most once per dispatch."""
    return any((step - stride * j) % interval == 0 for j in range(kk))


class PixReferTrainer:
    def __init__(self, cfg: Config, mesh=None,
                 vgg_weights_path: Optional[str] = None,
                 image_size: Optional[int] = None,
                 train_dtype: Any = jnp.float32,
                 perceptual_dtype: Any = None,
                 g_tx=None, d_tx=None):
        """``train_dtype=jnp.bfloat16`` enables mixed-precision training:
        G/D/VGG conv activations run bf16 on the MXU while the master
        params, Adam state, gradients, BN moments, losses, and the tanh /
        sigmoid heads all stay float32 (the per-layer casts transpose back
        to f32 grads under AD).  bf16 shares float32's exponent range, so
        no loss scaling is needed — unlike fp16 mixed precision.
        Checkpoints are dtype-agnostic (params are f32 either way).

        Measured on one v5e chip (interleaved A/B, per-variant minima):
        bf16 is ~13-15% SLOWER than f32 for this step (878 vs 779 ms at
        batch 2; 3041 vs 2656 ms at batch 8) — XLA's default-precision
        f32 convs already execute on the MXU via bf16 passes, so explicit
        bf16 saves no MXU time and the extra casts around the float32 BN
        moments cost bandwidth in the backward (docs/PERF.md).  The knob
        stays for hardware where the trade differs; f32 is the default
        and the parity configuration (the reference trains f32-only,
        train_pixrefer.py:112-153).

        ``perceptual_dtype`` controls ONLY the frozen VGG perceptual-loss
        trunk (defaults to ``train_dtype``).  The step decomposition
        (experiments/profile_pixrefer_step.py) measured the VGG backward
        at ~64% of true step compute, and the VGG trunk has no batch-norm
        — so ``perceptual_dtype=bfloat16`` captures the MXU/bandwidth win
        surgically without the BN cast overhead that makes whole-step
        bf16 slower.  The perceptual term is a *training signal* on a
        frozen net (ref: train_pixrefer.py:80, pixrefer.py:318-328);
        master params/grads/losses remain float32 either way."""
        self.cfg = cfg
        self.img_size = image_size or cfg.pixrefer.img_size
        self.mesh = mesh if mesh is not None else make_mesh()
        self.train_dtype = train_dtype
        self.perceptual_dtype = (perceptual_dtype if perceptual_dtype
                                 is not None else train_dtype)
        # reference batch 2 (train_pixrefer.py:36) rounded up to the mesh
        self.global_batch = mesh_global_batch(cfg.pixrefer.batch_size,
                                              self.mesh)
        self.gen = px.PixReferNet(cfg.pixrefer, axis_name="data",
                                  dtype=train_dtype)
        self.disc = px.Discriminator(cfg.pixrefer.ndf, axis_name="data",
                                     dtype=train_dtype)
        self.gen_eval = px.PixReferNet(cfg.pixrefer, axis_name=None)
        # injectable optimizers (tests swap Adam for SGD: Adam's
        # per-element normalization chaotically amplifies float noise,
        # masking semantics checks — see test_multi_step_matches_sequential)
        self.g_tx = g_tx if g_tx is not None else gan_optimizer(
            cfg.pixrefer.training)
        self.d_tx = d_tx if d_tx is not None else gan_optimizer(
            cfg.pixrefer.training)

        _, vgg_params = vgg_mod.init_vgg(jax.random.PRNGKey(17))
        if vgg_weights_path is not None:
            if vgg_weights_path.endswith(".npz"):
                vgg_params = vgg_mod.load_weights(vgg_weights_path,
                                                  vgg_params)
            else:
                # the released slim vgg_16.ckpt itself, parsed TF-free
                # (the reference restores it at graph build,
                # train_pixrefer.py:80-92)
                from voicepuppet_tpu.tools.tf_bundle import \
                    load_vgg16_checkpoint
                vgg_params, _, vgg_missing = load_vgg16_checkpoint(
                    vgg_weights_path, vgg_params)
                if vgg_missing:
                    raise ValueError(
                        f"vgg ckpt {vgg_weights_path}: "
                        f"{len(vgg_missing)} trunk variables missing or "
                        f"mis-shaped, e.g. {vgg_missing[:3]}")
        self.vgg_params = vgg_params

        self._train_step = self._build_step()
        self._multi_step = None
        self._infer_step = None

    def init_state(self, seed: int = 0) -> GANTrainState:
        s = self.img_size
        b = 1
        rng = jax.random.PRNGKey(seed)
        g_vars = self.gen_eval.init(rng, jnp.zeros((b, s, s, 6)),
                                    jnp.zeros((b, s, s, 6)),
                                    jnp.zeros((b, s, s, 3)))
        d_vars = px.Discriminator(self.cfg.pixrefer.ndf).init(
            jax.random.fold_in(rng, 1), jnp.zeros((b, s, s, 3)),
            jnp.zeros((b, s, s, 3)))
        return GANTrainState.create(g_vars["params"], d_vars["params"],
                                    batch_stats={}, g_tx=self.g_tx,
                                    d_tx=self.d_tx)

    # ---- the jitted DP GAN step ----
    def _build_step(self):
        cfg = self.cfg.pixrefer

        def step(state: GANTrainState, batch, vgg_params, rng):
            # rng is kept for step-signature uniformity; PixReferNet has no
            # stochastic layers (the reference's dropout-free pix2pix)
            inputs, fg_inputs, targets, masks = batch
            inputs_p = px.preprocess(inputs)
            fg_p = px.preprocess(fg_inputs)
            targets_p = px.preprocess(targets)

            # G forward once for the D step (constant w.r.t. D)
            _, _, fake_fg0 = self.gen.apply({"params": state.g_params},
                                            inputs_p, fg_p, targets_p)
            fake_fg0 = jax.lax.stop_gradient(fake_fg0)

            def d_loss_fn(d_params):
                pr1 = self.disc.apply({"params": d_params},
                                      inputs_p[..., 3:], fg_p[..., 3:])
                pr2 = self.disc.apply({"params": d_params},
                                      inputs_p[..., :3], fg_p[..., :3])
                predict_real = (pr1 + pr2) / 2.0
                predict_fake = self.disc.apply({"params": d_params},
                                               inputs_p[..., 3:], fake_fg0)
                loss = px.discriminator_loss(predict_real, predict_fake)
                return jax.lax.pmean(loss, "data")

            d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.d_params)
            d_updates, d_opt_state = state.d_tx.update(
                d_grads, state.d_opt_state, state.d_params)
            new_d_params = optax.apply_updates(state.d_params, d_updates)

            # G step against the UPDATED discriminator (reference ordering)
            def g_loss_fn(g_params):
                outputs, alphas, outputs_fg = self.gen.apply(
                    {"params": g_params}, inputs_p, fg_p, targets_p)
                predict_fake = self.disc.apply({"params": new_d_params},
                                               inputs_p[..., 3:],
                                               outputs_fg)
                perc = vgg_mod.perceptual_loss(vgg_params, fg_p[..., 3:],
                                               outputs_fg,
                                               dtype=self.perceptual_dtype)
                total, gan, l1 = px.generator_loss(
                    predict_fake, targets_p, outputs, alphas, masks, perc,
                    cfg.gan_weight, cfg.l1_weight)
                return jax.lax.pmean(total, "data"), (gan, l1, perc)

            (g_loss, (gan_t, l1_t, perc_t)), g_grads = jax.value_and_grad(
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
                       "perceptual": jax.lax.pmean(perc_t, "data")}
            return state, metrics

        self._step_raw = step     # (state, batch, vgg_params, rng)
        mapped = jax.shard_map(
            step, mesh=self.mesh,
            in_specs=(P(), P("data"), P(), P()),
            out_specs=(P(), P()),
            check_vma=True)
        return jax.jit(mapped, donate_argnums=(0,))

    def train_step(self, state: GANTrainState, host_batch, rng):
        batch = shard_batch(host_batch, self.mesh)
        return self._train_step(state, batch, self.vgg_params, rng)

    def train_multi_step(self, state: GANTrainState, host_batches, rng):
        """K D-then-G optimizer steps in ONE dispatch (device-side
        ``lax.scan``) — semantically K sequential ``train_step`` calls
        (pinned by test_pixrefer_multi_step_matches_sequential).  The true
        D+G step compute is ~tens of ms once the batch is device-resident
        (docs/PERF.md step decomposition), so through a high-latency
        dispatch path the ~27 ms per-call round trip is material; a scan
        amortizes it exactly as for BFMNet.  Every metrics leaf gains a
        leading [K] axis; ``state.step`` advances by 2K."""
        from voicepuppet_tpu.parallel.mesh import (data_parallel_multi_step,
                                                   shard_batch_stacked)
        if self._multi_step is None:
            self._multi_step = data_parallel_multi_step(
                self._step_raw, self.mesh, num_extras=1)
        batches = shard_batch_stacked(host_batches, self.mesh)
        return self._multi_step(state, batches, rng, self.vgg_params)

    # ---- inference (ref: pixrefer.py:414-438) ----
    def infer(self, state: GANTrainState, inputs, fg_inputs, targets):
        """[0,1] images in; returns (outputs, outputs_fg) in [0,1]."""
        if self._infer_step is None:
            @jax.jit
            def run(g_params, inputs, fg_inputs, targets):
                outputs, alphas, outputs_fg = self.gen_eval.apply(
                    {"params": g_params}, px.preprocess(inputs),
                    px.preprocess(fg_inputs), px.preprocess(targets))
                # ref: infer deprocesses Outputs and Outputs_FG+α-1
                return (px.deprocess(outputs),
                        px.deprocess(outputs_fg + alphas - 1.0))
            self._infer_step = run
        return self._infer_step(state.g_params, inputs, fg_inputs, targets)

    # ---- loop (ref: train_pixrefer.py:134-153) ----
    def fit(self, state, batches: Iterator, num_steps: int, logger=None,
            ckpt=None, seed: int = 0, steps_per_call: int = 1,
            profiler=None):
        """``steps_per_call=K`` packs K D+G steps per device dispatch
        (``train_multi_step``); summary/checkpoint cadences fire when one
        of the dispatch's step values is an exact interval multiple, at
        most once per dispatch (``state.step`` advances by 2 per
        iteration, pixrefer.py:400,407, so a K-call strides 2K; 2K larger
        than an interval coarsens that cadence to once-per-dispatch —
        warned).  K=1 reproduces the reference loop shape exactly
        (train_pixrefer.py:134-153)."""
        rng = jax.random.PRNGKey(seed)
        tcfg = self.cfg.pixrefer.training
        k = max(1, int(steps_per_call))
        if k > 1:
            import warnings
            for label, iv in (("summary_interval", tcfg.summary_interval),
                              ("save_interval",
                               ckpt.save_interval if ckpt else None)):
                if iv and 2 * k > iv:
                    warnings.warn(
                        f"steps_per_call={k} (stride {2 * k}) exceeds "
                        f"{label}={iv}: that cadence coarsens to once "
                        "per dispatch")
        done = 0
        while done < num_steps:
            if profiler is not None:
                profiler.step(int(state.step))
            kk = min(k, num_steps - done)
            if kk == k and k > 1:
                rng, sub = jax.random.split(rng)
                got = [next(batches) for _ in range(kk)]
                batch = got[-1]
                state, stacked = self.train_multi_step(state, got, sub)
                # ONE fetch for the whole [K]-stacked metrics tree —
                # per-row/per-metric float() would pay K*len(metrics)
                # dispatch round trips, cancelling the amortization
                stacked = jax.device_get(stacked)
                metrics_rows = [
                    jax.tree_util.tree_map(lambda x, i=i: x[i], stacked)
                    for i in range(kk)]
            else:
                # K=1, and the tail when K does not divide num_steps:
                # kk sequential steps through the already-compiled
                # single-step program (a [kk]-shaped scan would
                # recompile the whole D+G program for one dispatch)
                metrics_rows = []
                for _ in range(kk):
                    rng, sub = jax.random.split(rng)
                    batch = next(batches)
                    state, metrics = self.train_step(state, batch, sub)
                    metrics_rows.append(metrics)
            done += kk
            step = int(state.step)
            if logger is not None:
                base = step - 2 * kk
                for i, m in enumerate(metrics_rows):
                    logger.log(base + 2 * (i + 1), **m)
                # image summaries at summary cadence
                # (ref: train_pixrefer.py:101-131, 144-146).  Fire iff
                # one of this dispatch's kk step values (stride 2) is an
                # EXACT multiple of the interval — a plain floor-division
                # crossing test would also fire on odd multiples the
                # stride-2 counter never lands on (e.g. interval 25 at
                # step 26), which the reference's `step % iv == 0` never
                # does
                if _hit_interval(step, 2, kk, tcfg.summary_interval):
                    inputs, fg_inputs, targets, masks = batch
                    outputs, out_fg = self.infer(state, inputs[:1],
                                                 fg_inputs[:1],
                                                 targets[:1])
                    strip = np.concatenate(
                        [np.asarray(inputs[0, ..., 3:6]),
                         np.asarray(targets[0]),
                         np.clip(np.asarray(outputs[0]), 0, 1)], axis=1)
                    logger.log_image(step, "pixrefer", strip)
            if ckpt is not None:
                if _hit_interval(step, 2, kk, ckpt.save_interval) \
                        and step > 0:
                    ckpt.save(step, state)
        if profiler is not None:
            profiler.close()
        return state


def main(argv=None):
    import argparse
    import os
    from voicepuppet_tpu.config import load_config
    from voicepuppet_tpu.data.generators import (FileSource,
                                                 PixReferBatcher)
    from voicepuppet_tpu.train.checkpoint import CheckpointManager
    from voicepuppet_tpu.train.metrics import (MetricsLogger,
                                                add_profiler_args,
                                                profiler_from_args)

    p = argparse.ArgumentParser()
    p.add_argument("--config_path", required=True)
    p.add_argument("--ckpt_dir", default="ckpt_pixrefer")
    p.add_argument("--log_dir", default="log")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--dtype", choices=("float32", "bfloat16"),
                   default="float32",
                   help="bfloat16 = mixed-precision step (params/optimizer/"
                        "losses stay float32; measured SLOWER on v5e — "
                        "see docs/PERF.md)")
    p.add_argument("--perceptual_dtype", choices=("float32", "bfloat16"),
                   default=None,
                   help="dtype for ONLY the frozen VGG perceptual trunk "
                        "(default: follow --dtype). bfloat16 targets the "
                        "dominant VGG backward without the BN cast "
                        "overhead of whole-step bf16 — see docs/PERF.md")
    p.add_argument("--steps_per_call", type=int, default=1,
                   help="pack K D+G steps into one device dispatch via a "
                        "device-side lax.scan (amortizes the per-dispatch "
                        "round trip; docs/PERF.md)")
    add_profiler_args(p)
    args = p.parse_args(argv)

    cfg = load_config(args.config_path)
    vgg_path = os.path.join(cfg.model_dir, "vgg16_weights.npz")
    dtypes = {"float32": jnp.float32, "bfloat16": jnp.bfloat16, None: None}
    trainer = PixReferTrainer(
        cfg, vgg_weights_path=vgg_path if os.path.exists(vgg_path) else None,
        train_dtype=dtypes[args.dtype],
        perceptual_dtype=dtypes[args.perceptual_dtype])
    state = trainer.init_state()
    tcfg = cfg.pixrefer.training
    ckpt = CheckpointManager(args.ckpt_dir, tcfg.max_to_keep,
                             tcfg.save_interval)
    state = ckpt.restore(state)
    logger = MetricsLogger(args.log_dir, "pixrefer")
    src = FileSource(cfg.dataset.train_dataset_path, cfg, load_images=True)
    steps = args.steps if args.steps is not None else tcfg.epochs
    from voicepuppet_tpu.data.generators import (BackgroundBatches,
                                                 prefetch_to_device)
    # 512² JPEG decode + crop aug is host-bound single-threaded; worker
    # threads overlap it with the device step (ref: tf.data
    # num_parallel_calls=4, generator.py:502)
    bg = BackgroundBatches(
        lambda i: iter(PixReferBatcher(cfg, src, seed=i,
                                       batch_size=trainer.global_batch)),
        num_workers=4)
    batches = prefetch_to_device(bg, trainer.mesh)
    try:
        trainer.fit(state, batches, steps, logger, ckpt,
                    steps_per_call=args.steps_per_call,
                    profiler=profiler_from_args(args))
    finally:
        bg.close()


if __name__ == "__main__":
    main()
