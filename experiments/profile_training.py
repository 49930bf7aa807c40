"""Training throughput on the real TPU chip (round-2 VERDICT next #4).

Fetch-verified steps/s and per-step wall for:
  * the BFMNet train step at full reference scale (T=24, width 1.0,
    full 35.7k-vertex loss basis), global batch 4 and 8;
  * the PixRefer D-then-G step at 512², ngf/ndf 64, batch 2 and 8.

Method: N dispatched steps with state threading, one value fetch at the
end (the ~27 ms dispatch/fetch latency floor amortizes across the queued
steps); per-step = (wall_N - wall_1) / (N - 1).
"""
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from voicepuppet_tpu.config import Config
from voicepuppet_tpu.face3d import bfm as bfm_mod

cfg = Config()
N = 12


def timed_steps(trainer, state, batch, n):
    rng = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    for i in range(n):
        rng, sub = jax.random.split(rng)
        state, metrics = trainer.train_step(state, batch, sub)
    # fetch-verified: force execution of the whole chain
    loss = float(np.asarray(
        jax.tree_util.tree_leaves(metrics)[0]).ravel()[0])
    return time.perf_counter() - t0, loss, state


def per_step(trainer, state, batch):
    """Warm up, then time two N-step windows and keep the better —
    robust to one-off tunnel stalls; the ~27 ms dispatch/fetch floor
    amortizes over the N queued steps."""
    _, _, state = timed_steps(trainer, state, batch, 1)   # compile
    _, _, state = timed_steps(trainer, state, batch, 2)   # warm
    wA, loss, state = timed_steps(trainer, state, batch, N)
    wB, loss, state = timed_steps(trainer, state, batch, N)
    return min(wA, wB) / N, loss, state


def bench_bfmnet(batch_size):
    from voicepuppet_tpu.train.bfmnet_trainer import BFMNetTrainer
    face = bfm_mod.synthetic_bfm(num_theta=189, num_phi=189, seed=0)
    c = dataclasses.replace(
        cfg, bfmnet=dataclasses.replace(cfg.bfmnet,
                                        batch_size=batch_size))
    trainer = BFMNetTrainer(c, face)
    state = trainer.init_state(example_t=24)
    rng = np.random.RandomState(0)
    t = 24
    b = trainer.global_batch
    batch = (rng.randn(b, t, 257).astype(np.float32) * 0.1,
             rng.rand(b, t, 1).astype(np.float32) * 0.1,
             rng.randn(b, t * 5, 80).astype(np.float32),
             np.full((b,), t, np.int32))
    per, loss, state = per_step(trainer, state, batch)
    print(f"bfmnet  batch={b:2d}: {per*1e3:7.1f} ms/step  "
          f"{1.0/per:6.2f} steps/s  {b/per:7.1f} samples/s  "
          f"(loss={loss:.4f})", flush=True)


def timed_multi(trainer, state, batches_list, n):
    """n multi-step dispatches (each = len(batches_list) optimizer steps),
    one value fetch at the end."""
    rng = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    for _ in range(n):
        rng, sub = jax.random.split(rng)
        state, metrics = trainer.train_multi_step(state, batches_list, sub)
    loss = float(np.asarray(
        jax.tree_util.tree_leaves(metrics)[0]).ravel()[-1])
    return time.perf_counter() - t0, loss, state


def bench_bfmnet_multi(batch_size, k=8):
    """Single-step dispatch vs K-steps-per-dispatch (lax.scan), interleaved
    A/B in one process, per-variant minima (CLAUDE.md timing rules)."""
    from voicepuppet_tpu.train.bfmnet_trainer import BFMNetTrainer
    face = bfm_mod.synthetic_bfm(num_theta=189, num_phi=189, seed=0)
    c = dataclasses.replace(
        cfg, bfmnet=dataclasses.replace(cfg.bfmnet,
                                        batch_size=batch_size))
    trainer = BFMNetTrainer(c, face)
    s1 = trainer.init_state(example_t=24)
    sk = trainer.init_state(example_t=24)
    rng = np.random.RandomState(0)
    t = 24
    b = trainer.global_batch

    def mk():
        return (rng.randn(b, t, 257).astype(np.float32) * 0.1,
                rng.rand(b, t, 1).astype(np.float32) * 0.1,
                rng.randn(b, t * 5, 80).astype(np.float32),
                np.full((b,), t, np.int32))

    batch = mk()
    batches = [mk() for _ in range(k)]
    _, _, s1 = timed_steps(trainer, s1, batch, 1)        # compile
    _, _, s1 = timed_steps(trainer, s1, batch, 2)        # warm
    _, _, sk = timed_multi(trainer, sk, batches, 1)      # compile
    _, _, sk = timed_multi(trainer, sk, batches, 1)      # warm
    n1, nk = 16, 2                                       # 16 steps each
    best1 = bestk = np.inf
    for _ in range(3):                                   # A/B/A/B…
        w, _, s1 = timed_steps(trainer, s1, batch, n1)
        best1 = min(best1, w / n1)
        w, _, sk = timed_multi(trainer, sk, batches, nk)
        bestk = min(bestk, w / (nk * k))
    for name, per in (("K=1", best1), (f"K={k}", bestk)):
        print(f"bfmnet  batch={b:2d} {name:4s}: {per*1e3:7.1f} ms/step  "
              f"{1.0/per:6.2f} steps/s  {b/per:7.1f} samples/s",
              flush=True)


def bench_pixrefer(batch_size, train_dtype=jnp.float32):
    from voicepuppet_tpu.train.pixrefer_trainer import PixReferTrainer
    c = dataclasses.replace(
        cfg, pixrefer=dataclasses.replace(cfg.pixrefer,
                                          batch_size=batch_size))
    trainer = PixReferTrainer(c, train_dtype=train_dtype)
    state = trainer.init_state()
    rng = np.random.RandomState(0)
    b = trainer.global_batch
    s = c.pixrefer.img_size
    batch = (rng.rand(b, s, s, 6).astype(np.float32),
             rng.rand(b, s, s, 6).astype(np.float32),
             rng.rand(b, s, s, 3).astype(np.float32),
             (rng.rand(b, s, s, 3) > 0.5).astype(np.float32))
    per, loss, state = per_step(trainer, state, batch)
    dt = jnp.dtype(train_dtype).name
    print(f"pixrefer batch={b:2d}: {per*1e3:7.1f} ms/step "
          f"(D+G, 512², {dt})  {1.0/per:6.2f} steps/s  "
          f"{b/per:7.2f} samples/s  (loss={loss:.4f})", flush=True)


def bench_pixrefer_ab(batch_size):
    """Interleaved f32 / bf16 A/B in ONE process (per-variant minima over
    alternating windows — the only timing method that survives tunnel
    weather; CLAUDE.md)."""
    from voicepuppet_tpu.train.pixrefer_trainer import PixReferTrainer
    c = dataclasses.replace(
        cfg, pixrefer=dataclasses.replace(cfg.pixrefer,
                                          batch_size=batch_size))
    rng = np.random.RandomState(0)
    s = c.pixrefer.img_size
    variants = {}
    for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        trainer = PixReferTrainer(c, train_dtype=dt)
        state = trainer.init_state()
        b = trainer.global_batch
        batch = (rng.rand(b, s, s, 6).astype(np.float32),
                 rng.rand(b, s, s, 6).astype(np.float32),
                 rng.rand(b, s, s, 3).astype(np.float32),
                 (rng.rand(b, s, s, 3) > 0.5).astype(np.float32))
        _, _, state = timed_steps(trainer, state, batch, 1)   # compile
        _, _, state = timed_steps(trainer, state, batch, 2)   # warm
        variants[name] = [trainer, state, batch, np.inf]
    for _ in range(3):                                        # A/B/A/B…
        for name, v in variants.items():
            w, loss, v[1] = timed_steps(v[0], v[1], v[2], N)
            v[3] = min(v[3], w / N)
    for name, (trainer, _, _, per) in variants.items():
        b = trainer.global_batch
        print(f"pixrefer batch={b:2d} {name:4s}: {per*1e3:7.1f} ms/step "
              f"(D+G, 512²)  {1.0/per:6.2f} steps/s  "
              f"{b/per:7.2f} samples/s", flush=True)


def bench_pixrefer_multi(batch_size, k=4):
    """PixRefer D+G: device-resident single-step dispatch vs
    K-steps-per-dispatch, interleaved A/B in one process.  Both variants
    use device-resident batches (shard_batch / jnp-stacked prefetched
    arrays) so the comparison isolates dispatch overhead, not the h2d
    the fit loop overlaps via prefetch_to_device."""
    from voicepuppet_tpu.train.pixrefer_trainer import PixReferTrainer
    from voicepuppet_tpu.parallel.mesh import shard_batch
    c = dataclasses.replace(
        cfg, pixrefer=dataclasses.replace(cfg.pixrefer,
                                          batch_size=batch_size))
    trainer = PixReferTrainer(c)
    s1 = trainer.init_state()
    sk = trainer.init_state()
    rng = np.random.RandomState(0)
    b = trainer.global_batch
    s = c.pixrefer.img_size

    def mk():
        return (rng.rand(b, s, s, 6).astype(np.float32),
                rng.rand(b, s, s, 6).astype(np.float32),
                rng.rand(b, s, s, 3).astype(np.float32),
                (rng.rand(b, s, s, 3) > 0.5).astype(np.float32))

    batch = shard_batch(mk(), trainer.mesh)
    batches = [shard_batch(mk(), trainer.mesh) for _ in range(k)]
    _, _, s1 = timed_steps(trainer, s1, batch, 1)        # compile
    _, _, s1 = timed_steps(trainer, s1, batch, 2)        # warm
    _, _, sk = timed_multi(trainer, sk, batches, 1)      # compile
    _, _, sk = timed_multi(trainer, sk, batches, 1)      # warm
    n1, nk = 8, 2
    best1 = bestk = np.inf
    for _ in range(3):                                   # A/B/A/B…
        w, _, s1 = timed_steps(trainer, s1, batch, n1)
        best1 = min(best1, w / n1)
        w, _, sk = timed_multi(trainer, sk, batches, nk)
        bestk = min(bestk, w / (nk * k))
    for name, per in (("K=1", best1), (f"K={k}", bestk)):
        print(f"pixrefer batch={b:2d} {name:4s} (device-resident): "
              f"{per*1e3:7.1f} ms/step  {1.0/per:6.2f} steps/s  "
              f"{b/per:7.2f} samples/s", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "bfmnet"):
        bench_bfmnet(4)
        bench_bfmnet(8)
    if which in ("all", "pixrefer"):
        bench_pixrefer(2)
        bench_pixrefer(8)
    if which in ("all", "pixrefer_ab", "ab"):
        bench_pixrefer_ab(2)
    if which in ("ab8",):
        bench_pixrefer_ab(8)
    if which in ("multi",):
        bench_bfmnet_multi(4)
        bench_bfmnet_multi(8)
    if which in ("multi32",):
        bench_bfmnet_multi(8, k=32)
    if which in ("pxmulti",):
        bench_pixrefer_multi(2)
    if which in ("pxmulti8",):
        bench_pixrefer_multi(8)
