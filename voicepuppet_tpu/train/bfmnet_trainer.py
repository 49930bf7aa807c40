"""BFMNet trainer — the train_bfmnet.py equivalent, data-parallel over ICI.

Reference loop (voicepuppet/bfmnet/train_bfmnet.py:112-145): per-step
optimize + loss print, eval + rendered coeff-grid every ``eval_interval``,
checkpoint every ``save_interval``.  Here the step is one jitted shard_map
program over the device mesh: each device computes the vertex-space loss on
its batch shard, gradients are pmean-reduced over the ``data`` axis, and the
replicated Adam update runs everywhere.

CLI: ``python -m voicepuppet_tpu.train.bfmnet_trainer --config_path <yml>``
(mirrors train_bfmnet.py's optparse contract).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from voicepuppet_tpu.config import Config
from voicepuppet_tpu.face3d.bfm import BFMModel
from voicepuppet_tpu.models.bfmnet import (BFMNet, BFMNetLoss,
                                           make_mouth_mask)
from voicepuppet_tpu.models.layers import l2_regularization
from voicepuppet_tpu.parallel.mesh import (data_parallel_multi_step,
                                           data_parallel_step, make_mesh,
                                           mesh_global_batch, shard_batch,
                                           shard_batch_local,
                                           shard_batch_stacked)
from voicepuppet_tpu.train.optim import bfmnet_optimizer
from voicepuppet_tpu.train.state import TrainState


class BFMNetTrainer:
    def __init__(self, cfg: Config, face_model: BFMModel,
                 mouth_idx: Optional[np.ndarray] = None,
                 mesh=None, tx=None):
        self.cfg = cfg
        # sync-BN over the data axis: DP training keeps the reference's
        # full-batch batch-norm semantics exactly.  The eval/init twin has
        # no axis binding (it runs outside shard_map); both share the same
        # parameter structure.
        self.model = BFMNet(cfg.bfmnet, bn_axis="data")
        self.eval_model = BFMNet(cfg.bfmnet, bn_axis=None)
        mouth_mask = make_mouth_mask(face_model.num_vertices, mouth_idx,
                                     cfg.bfmnet.mouth_weight)
        self.loss_fn = BFMNetLoss(face_model.exBase, mouth_mask)
        self.mesh = mesh if mesh is not None else make_mesh()
        # reference batch sizes (train_bfmnet.py:43) need not divide the
        # mesh; batchers should produce this rounded-up global batch
        self.global_batch = mesh_global_batch(cfg.bfmnet.batch_size,
                                              self.mesh)
        self.tx = tx if tx is not None else bfmnet_optimizer(
            cfg.bfmnet.training)
        self._train_step = data_parallel_step(self._step, self.mesh)
        self._multi_step = None
        self._eval_step = None

    # ---- state ----
    def init_state(self, seed: int = 0, example_t: int = 24) -> TrainState:
        t = example_t
        b = max(self.cfg.bfmnet.batch_size // self.mesh.shape["data"], 1)
        rng = jax.random.PRNGKey(seed)
        # init with train=False: sync-BN's axis_name is only bound inside
        # the shard_map'd step, not here
        variables = self.eval_model.init(
            {"params": rng, "dropout": rng},
            jnp.zeros((b, t, 1), jnp.float32),
            jnp.zeros((b, t * self.cfg.frame_mfcc_scale, 80), jnp.float32),
            jnp.full((b,), t, jnp.int32), train=False)
        return TrainState.create(variables["params"],
                                 variables["batch_stats"], self.tx)

    # ---- the per-shard step (runs inside shard_map) ----
    def _step(self, state: TrainState, batch, rng):
        coeff, ears, mfccs, seq_len = batch

        def loss_of(params):
            out, mut = self.model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                ears, mfccs, seq_len, train=True,
                rngs={"dropout": rng}, mutable=["batch_stats"])
            loss = (self.loss_fn(out, coeff, seq_len)
                    + l2_regularization(params))
            # the GLOBAL loss is the pmean of shard losses; differentiating
            # it directly yields replica-identical global gradients — under
            # VMA-tracked shard_map the cross-shard cotangent psum happens
            # inside AD, so no manual gradient pmean is needed (doing both
            # would double-count).
            return jax.lax.pmean(loss, axis_name="data"), mut["batch_stats"]

        (loss, batch_stats), grads = jax.value_and_grad(
            loss_of, has_aux=True)(state.params)
        # batch_stats already replica-identical: sync-BN pmean'd the moments
        state = state.apply_gradients(grads, batch_stats=batch_stats)
        metrics = {"loss": loss, "grad_norm": optax_global_norm(grads)}
        return state, metrics

    def train_step(self, state: TrainState, host_batch, rng):
        batch = shard_batch(host_batch, self.mesh)
        return self._train_step(state, batch, rng)

    def train_step_local(self, state: TrainState, local_host_batch, rng):
        """Multi-host feeding: ``local_host_batch`` holds only THIS
        process's ``local_batch_rows(global_batch, mesh)`` samples; the
        global array is assembled from per-process pieces with no
        cross-host batch movement (parallel.mesh.shard_batch_local).
        Single-process it is exactly :meth:`train_step`."""
        batch = shard_batch_local(local_host_batch, self.mesh)
        return self._train_step(state, batch, rng)

    def train_multi_step(self, state: TrainState, host_batches, rng):
        """K optimizer steps in ONE dispatch (lax.scan on device) —
        semantically K sequential ``train_step`` calls (float-identical
        up to XLA fusion noise; see data_parallel_multi_step); the BFMNet
        step is small enough to be dispatch-bound, so this is where its
        real-chip steps/s comes from (docs/PERF.md).  Every metrics leaf
        gains a leading [K] axis."""
        if self._multi_step is None:
            self._multi_step = data_parallel_multi_step(self._step,
                                                        self.mesh)
        batches = shard_batch_stacked(host_batches, self.mesh)
        return self._multi_step(state, batches, rng)

    def eval_loss(self, state: TrainState, host_batch) -> jax.Array:
        if self._eval_step is None:
            @jax.jit
            def eval_step(params, batch_stats, batch):
                coeff, ears, mfccs, seq_len = batch
                out = self.eval_model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    ears, mfccs, seq_len, train=False)
                return self.loss_fn(out, coeff, seq_len), out
            self._eval_step = eval_step
        return self._eval_step(state.params, state.batch_stats, host_batch)

    # ---- loop (ref: train_bfmnet.py:112-145) ----
    def fit(self, state: TrainState, batches: Iterator, num_steps: int,
            eval_batches: Optional[Iterator] = None,
            logger=None, ckpt=None, eval_hook: Optional[Callable] = None,
            seed: int = 0, steps_per_call: int = 1,
            profiler=None) -> TrainState:
        """``steps_per_call=K`` packs K optimizer steps into each device
        dispatch (``train_multi_step``); eval/checkpoint cadences fire on
        interval *crossings*, at most once per dispatch — preserved when
        K does not divide an interval, but K larger than an interval
        coarsens that cadence to once-per-dispatch (warned).  K=1
        reproduces the reference loop shape exactly
        (train_bfmnet.py:112-145)."""
        rng = jax.random.PRNGKey(seed)
        tcfg = self.cfg.bfmnet.training
        k = max(1, int(steps_per_call))
        if k > 1:
            import warnings
            for label, iv in (("eval_interval",
                               tcfg.eval_interval if eval_batches
                               is not None else None),
                              ("save_interval",
                               ckpt.save_interval if ckpt else None)):
                if iv and k > iv:
                    warnings.warn(
                        f"steps_per_call={k} exceeds {label}={iv}: that "
                        "cadence coarsens to once per dispatch")
        done = 0
        while done < num_steps:
            if profiler is not None:
                profiler.step(int(state.step))
            kk = min(k, num_steps - done)
            if kk == k and k > 1:
                rng, step_rng = jax.random.split(rng)
                state, stacked = self.train_multi_step(
                    state, [next(batches) for _ in range(kk)], step_rng)
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
                # recompile the step program for one dispatch)
                metrics_rows = []
                for _ in range(kk):
                    rng, step_rng = jax.random.split(rng)
                    state, metrics = self.train_step(state, next(batches),
                                                     step_rng)
                    metrics_rows.append(metrics)
            done += kk
            step = int(state.step)
            if logger is not None:
                base = step - kk
                for i, m in enumerate(metrics_rows):
                    logger.log(base + i + 1, **m)
            if eval_batches is not None and (
                    step // tcfg.eval_interval
                    > (step - kk) // tcfg.eval_interval):
                eval_batch = next(eval_batches)
                eval_loss, eval_out = self.eval_loss(state, eval_batch)
                if logger is not None:
                    logger.log(step, eval_loss=eval_loss)
                if eval_hook is not None:
                    eval_hook(step, state, eval_batch, eval_out)
            if ckpt is not None:
                # interval-crossing (== exact-multiple when kk == 1, the
                # reference cadence; K>1 must not step over a boundary)
                if (step // ckpt.save_interval
                        > (step - kk) // ckpt.save_interval and step > 0):
                    ckpt.save(step, state)
        if profiler is not None:
            profiler.close()
        return state


def optax_global_norm(tree) -> jax.Array:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))


def main(argv=None):
    import argparse
    from voicepuppet_tpu.config import load_config
    from voicepuppet_tpu.face3d.bfm import load_bfm, synthetic_bfm
    from voicepuppet_tpu.data.generators import BFMNetBatcher, FileSource
    from voicepuppet_tpu.train.checkpoint import CheckpointManager
    from voicepuppet_tpu.train.metrics import (MetricsLogger,
                                                add_profiler_args,
                                                profiler_from_args)

    p = argparse.ArgumentParser()
    p.add_argument("--config_path", required=True)
    p.add_argument("--ckpt_dir", default="ckpt_bfmnet")
    p.add_argument("--log_dir", default="log")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--steps_per_call", type=int, default=1,
                   help="pack K optimizer steps into one device dispatch "
                        "(lax.scan); amortizes host round trips for this "
                        "dispatch-bound step. Same math per step; with "
                        "dropout active the per-step rng chain differs "
                        "from K=1 (equally independent keys, so loss "
                        "curves match in distribution, not bit-wise)")
    add_profiler_args(p)
    args = p.parse_args(argv)

    cfg = load_config(args.config_path)
    import os
    face_model = (load_bfm(cfg.model_dir)
                  if os.path.exists(os.path.join(cfg.model_dir,
                                                 "BFM_model_front.mat"))
                  else synthetic_bfm())
    mouth_path = os.path.join(cfg.model_dir, "mouth_idx.npy")
    mouth_idx = np.load(mouth_path) if os.path.exists(mouth_path) else None

    trainer = BFMNetTrainer(cfg, face_model, mouth_idx)
    state = trainer.init_state()
    tcfg = cfg.bfmnet.training
    ckpt = CheckpointManager(args.ckpt_dir, tcfg.max_to_keep,
                             tcfg.save_interval)
    state = ckpt.restore(state)
    logger = MetricsLogger(args.log_dir, "bfmnet")

    train_src = FileSource(cfg.dataset.train_dataset_path, cfg)
    eval_src = FileSource(cfg.dataset.eval_dataset_path, cfg)
    batcher = BFMNetBatcher(cfg, train_src,
                            batch_size=trainer.global_batch)
    eval_batcher = BFMNetBatcher(cfg, eval_src, shuffle=False)

    # rendered eval grids at eval cadence, the reference's de-facto
    # integration test (train_bfmnet.py:130-138, bfm_visual.py:88-154)
    eval_dir = os.path.join(args.log_dir, "eval_bfmnet")

    def eval_hook(step, _state, batch, eval_out):
        from voicepuppet_tpu.utils.viz import plot_bfm_coeff_seq
        coeff = np.asarray(batch[0][0])          # [T, 257] first row
        pred = np.asarray(eval_out[0])           # [T, 64]
        plot_bfm_coeff_seq(eval_dir, step, coeff, pred, face_model)

    steps = args.steps if args.steps is not None else tcfg.epochs
    from voicepuppet_tpu.data.generators import prefetch_to_device
    batches = prefetch_to_device(iter(batcher), trainer.mesh)
    trainer.fit(state, batches, steps, iter(eval_batcher), logger,
                ckpt, eval_hook=eval_hook,
                steps_per_call=args.steps_per_call,
                profiler=profiler_from_args(args))


if __name__ == "__main__":
    main()
