"""ATNet trainer — train_atnet.py equivalent, data-parallel.

Same single-optimizer structure as the BFMNet trainer (masked sequence
loss + temporal loss + backbone L2, Adam with exp-decay and global-norm
clip; ref: atnet.py:281-312, train_atnet.py:106-141), on the landmark
task.  Batch layout matches ATNetDataGenerator (generator.py:232-248).
"""

from __future__ import annotations

from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from voicepuppet_tpu.config import Config
from voicepuppet_tpu.models.atnet import ATNet, atnet_loss
from voicepuppet_tpu.models.layers import l2_regularization
from voicepuppet_tpu.parallel.mesh import (data_parallel_step, make_mesh,
                                           shard_batch)
from voicepuppet_tpu.train.optim import reference_adam
from voicepuppet_tpu.train.state import TrainState


class ATNetTrainer:
    def __init__(self, cfg: Config, pca_component: np.ndarray, mesh=None,
                 width_mult: float = 1.0):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh()
        self.model = ATNet(cfg.atnet, pca_component, bn_axis="data",
                           width_mult=width_mult)
        self.eval_model = ATNet(cfg.atnet, pca_component, bn_axis=None,
                                width_mult=width_mult)
        t = cfg.atnet.training
        self.tx = reference_adam(t.learning_rate, t.decay_steps,
                                 t.decay_rate, max_grad_norm=t.max_grad_norm)
        self._train_step = data_parallel_step(self._step, self.mesh)

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

    def _step(self, state: TrainState, batch, rng):
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
        return state, {"loss": loss}

    def train_step(self, state, host_batch, rng):
        return self._train_step(state, shard_batch(host_batch, self.mesh),
                                rng)

    def infer(self, state, ears, poses, mfccs, example_lmk, seq_len):
        return self.eval_model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            ears, poses, mfccs, example_lmk, seq_len, train=False)

    def fit(self, state, batches: Iterator, num_steps: int, logger=None,
            ckpt=None, seed: int = 0):
        rng = jax.random.PRNGKey(seed)
        for _ in range(num_steps):
            rng, sub = jax.random.split(rng)
            state, metrics = self.train_step(state, next(batches), sub)
            if logger is not None:
                logger.log(int(state.step), **metrics)
            if ckpt is not None:
                ckpt.maybe_save(int(state.step), state)
        return state
