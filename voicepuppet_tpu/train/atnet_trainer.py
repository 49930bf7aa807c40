"""ATNet trainer — train_atnet.py equivalent, data-parallel.

Same single-optimizer structure as the BFMNet trainer (masked sequence
loss + temporal loss + backbone L2, Adam with exp-decay and global-norm
clip; ref: atnet.py:281-312, train_atnet.py:106-141), on the landmark
task.  Batch layout matches ATNetDataGenerator (generator.py:232-248).
"""

from __future__ import annotations

import functools
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from voicepuppet_tpu.config import Config
from voicepuppet_tpu.models.atnet import ATNet, atnet_loss
from voicepuppet_tpu.models.layers import l2_regularization
from voicepuppet_tpu.parallel.mesh import (data_parallel_step, make_mesh,
                                           mesh_global_batch, shard_batch)
from voicepuppet_tpu.train.optim import reference_adam
from voicepuppet_tpu.train.state import TrainState


class ATNetTrainer:
    def __init__(self, cfg: Config, pca_component: np.ndarray, mesh=None,
                 width_mult: float = 1.0,
                 log_gradients: Optional[bool] = None):
        """``log_gradients=False`` drops the gradient pytree from the
        step's metrics: the reference-cadence TB histograms need it
        (train_atnet.py:96-101), but when histogram logging is off it is
        a standing extra gradient-tree copy in HBM every step.  Default
        ``None`` = decide per call: ``fit`` asks the logger
        (``MetricsLogger.wants_histograms``); direct ``train_step``
        calls default to True."""
        self.cfg = cfg
        self.log_gradients = log_gradients
        self._steps = {}
        self.mesh = mesh if mesh is not None else make_mesh()
        # reference batch 16 (train_atnet.py:41) rounded up to the mesh
        self.global_batch = mesh_global_batch(cfg.atnet.batch_size,
                                              self.mesh)
        self.model = ATNet(cfg.atnet, pca_component, bn_axis="data",
                           width_mult=width_mult)
        self.eval_model = ATNet(cfg.atnet, pca_component, bn_axis=None,
                                width_mult=width_mult)
        t = cfg.atnet.training
        self.tx = reference_adam(t.learning_rate, t.decay_steps,
                                 t.decay_rate, max_grad_norm=t.max_grad_norm)

    def init_state(self, seed: int = 0, example_t: int = 25) -> TrainState:
        t = example_t
        b = 1
        rng = jax.random.PRNGKey(seed)
        variables = self.eval_model.init(
            {"params": rng, "dropout": rng},
            jnp.zeros((b, t, 1)), jnp.zeros((b, t, 3)),
            jnp.zeros((b, t * self.cfg.frame_mfcc_scale, 80)),
            jnp.zeros((b, 136)), jnp.full((b,), t, jnp.int32),
            train=False)
        return TrainState.create(variables["params"],
                                 variables.get("batch_stats", {}), self.tx)

    def _step_for(self, log_gradients: bool):
        if log_gradients not in self._steps:
            self._steps[log_gradients] = data_parallel_step(
                functools.partial(self._step, log_gradients=log_gradients),
                self.mesh)
        return self._steps[log_gradients]

    def _step(self, state: TrainState, batch, rng,
              log_gradients: bool = True):
        landmark, ears, poses, mfccs, example_lmk, seq_len = batch

        def loss_of(params):
            out, mut = self.model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                ears, poses, mfccs, example_lmk, seq_len, train=True,
                rngs={"dropout": rng}, mutable=["batch_stats"])
            loss = (atnet_loss(out, landmark, seq_len)
                    + l2_regularization(params))
            return jax.lax.pmean(loss, "data"), mut["batch_stats"]

        (loss, batch_stats), grads = jax.value_and_grad(
            loss_of, has_aux=True)(state.params)
        state = state.apply_gradients(grads, batch_stats=batch_stats)
        metrics = {"loss": loss}
        if log_gradients:
            # grads ride along for TB histograms (ref: train_atnet.py:
            # 96-101); off -> XLA never materializes them as outputs
            metrics["_grads"] = {"atnet": grads}
        return state, metrics

    def train_step(self, state, host_batch, rng,
                   log_gradients: Optional[bool] = None):
        want = (log_gradients if log_gradients is not None
                else self.log_gradients if self.log_gradients is not None
                else True)
        return self._step_for(want)(
            state, shard_batch(host_batch, self.mesh), rng)

    def infer(self, state, ears, poses, mfccs, example_lmk, seq_len):
        return self.eval_model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            ears, poses, mfccs, example_lmk, seq_len, train=False)

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
                    # the reference skips BatchNorm vars
                    # (train_atnet.py:98-100)
                    logger.maybe_log_histograms(int(state.step), grads,
                                                exclude=("BatchNorm",
                                                         "bn"))
            if ckpt is not None:
                ckpt.maybe_save(int(state.step), state)
        if profiler is not None:
            profiler.close()
        return state


def main(argv=None):
    """CLI mirroring train_atnet.py (voicepuppet/atvgnet/train_atnet.py:
    106-141).  The reference reads the landmark-PCA assets through the
    ``mean_file``/``components_file`` hparams that params.yml never defines
    (bit-rot, SURVEY.md §2.4); here they load from
    ``<model_dir>/lmk_mean.npy`` / ``<model_dir>/lmk_components.npy`` when
    present and fall back to a synthetic orthonormal basis."""
    import argparse
    import os

    from voicepuppet_tpu.config import load_config
    from voicepuppet_tpu.data.generators import (ATNetBatcher, FileSource,
                                                 prefetch_to_device)
    from voicepuppet_tpu.models.atnet import synthetic_pca_component
    from voicepuppet_tpu.train.checkpoint import CheckpointManager
    from voicepuppet_tpu.train.metrics import (MetricsLogger,
                                                add_profiler_args,
                                                profiler_from_args)

    p = argparse.ArgumentParser()
    p.add_argument("--config_path", required=True)
    p.add_argument("--ckpt_dir", default="ckpt_atnet")
    p.add_argument("--log_dir", default="log")
    p.add_argument("--steps", type=int, default=None)
    add_profiler_args(p)
    args = p.parse_args(argv)

    cfg = load_config(args.config_path)
    mean_path = os.path.join(cfg.model_dir, "lmk_mean.npy")
    comp_path = os.path.join(cfg.model_dir, "lmk_components.npy")
    pca_mean = (np.load(mean_path) if os.path.exists(mean_path)
                else np.zeros((cfg.atnet.landmark_size,), np.float32))
    pca_component = (np.load(comp_path) if os.path.exists(comp_path)
                     else synthetic_pca_component(
                         cfg.atnet.pca_components,
                         cfg.atnet.landmark_size))

    trainer = ATNetTrainer(cfg, pca_component)
    state = trainer.init_state()
    tcfg = cfg.atnet.training
    ckpt = CheckpointManager(args.ckpt_dir, tcfg.max_to_keep,
                             tcfg.save_interval)
    state = ckpt.restore(state)
    logger = MetricsLogger(args.log_dir, "atnet")
    src = FileSource(cfg.dataset.train_dataset_path, cfg)
    # streams/pca_renorm take the [136, K] transpose (see
    # tests/test_atvgnet.py:154); the model keeps [K, 136]
    batcher = ATNetBatcher(cfg, src, pca_mean, pca_component.T,
                           batch_size=trainer.global_batch)
    steps = args.steps if args.steps is not None else tcfg.epochs
    batches = prefetch_to_device(iter(batcher), trainer.mesh)
    trainer.fit(state, batches, steps, logger, ckpt,
                profiler=profiler_from_args(args))


if __name__ == "__main__":
    main()
