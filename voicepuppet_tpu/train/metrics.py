"""Training observability.

The reference's telemetry is per-step stdout prints plus TensorBoard
scalar/image summaries for the GAN trainers (SURVEY.md §5;
train_bfmnet.py:124, train_pixrefer.py:101-131).  Here: a JSONL metrics
stream (machine-readable, TensorBoard-free) + stdout mirroring + image
dumps, and an optional jax.profiler trace hook (the reference has no
profiler at all).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import numpy as np


class MetricsLogger:
    """JSONL metrics + stdout mirroring + TensorBoard event files.

    ``tensorboard=True`` (default) additionally writes scalar/image
    summaries in real TensorBoard format (utils/tb_writer.py — hand-rolled
    wire encoding, no TF dependency), restoring the reference's
    observability surface (train_pixrefer.py:101-131)."""

    def __init__(self, log_dir: str, name: str = "train",
                 print_every: int = 1, tensorboard: bool = True,
                 histogram_interval: int = 100):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f"{name}_metrics.jsonl")
        self._f = open(self.path, "a")
        self.print_every = print_every
        # gradient-histogram cadence: the reference writes summaries
        # (incl. gradient histograms) every summary_step
        # (train_pixflow.py:131-134)
        self.histogram_interval = histogram_interval
        self._t0 = time.time()
        self._tb = None
        if tensorboard:
            from voicepuppet_tpu.utils.tb_writer import TBEventWriter
            self._tb = TBEventWriter(os.path.join(log_dir, "tb", name))

    @property
    def wants_histograms(self) -> bool:
        """True iff histogram summaries would actually be written —
        trainers use this to decide whether to materialize gradient trees
        as step outputs at all (a standing HBM copy per step otherwise)."""
        return self._tb is not None and bool(self.histogram_interval)

    def log(self, step: int, **metrics):
        rec = {"step": int(step), "wall_s": round(time.time() - self._t0, 3)}
        for k, v in metrics.items():
            rec[k] = float(np.asarray(v)) if not isinstance(v, str) else v
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in rec.items():
                if k not in ("step", "wall_s") and not isinstance(v, str):
                    self._tb.scalar(k, v, int(step))
            self._tb.flush()
        if self.print_every and step % self.print_every == 0:
            parts = " ".join(f"{k}={rec[k]:.6g}" for k in metrics
                             if not isinstance(metrics[k], str))
            print(f"step {step}: {parts}", flush=True)

    def log_image(self, step: int, name: str, image: np.ndarray):
        """Dump an eval image (ref eval-grid cadence, train_bfmnet.py:138)."""
        from PIL import Image
        img_dir = os.path.join(os.path.dirname(self.path), "images")
        os.makedirs(img_dir, exist_ok=True)
        arr = np.asarray(image)
        if arr.dtype != np.uint8:
            arr = np.clip(arr * 255.0 if arr.max() <= 1.5 else arr, 0,
                          255).astype(np.uint8)
        Image.fromarray(arr).save(
            os.path.join(img_dir, f"{name}_{step}.jpg"))
        if self._tb is not None:
            self._tb.image(name, arr, int(step))
            self._tb.flush()

    def log_histograms(self, step: int, trees: Dict[str, Any],
                       exclude: tuple = ()):
        """Write one TB histogram per gradient leaf (the reference's
        per-variable gradient histograms; train_pixflow.py:113-115,
        train_atnet.py:96-101 — the latter skips BatchNorm vars, passed
        here via ``exclude`` substrings).  ``trees`` maps a group name
        (e.g. "generator") to a gradient pytree."""
        if self._tb is None:
            return
        import jax
        # ONE batched fetch for every leaf: per-leaf np.asarray would pay
        # a ~27 ms dispatch round trip per variable through the dev
        # tunnel (hundreds of leaves -> seconds of pure latency per event)
        trees = jax.device_get(trees)
        for name, tree in trees.items():
            for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
                parts = [str(getattr(p, "key", getattr(p, "name", p)))
                         for p in path]
                tag = "/".join([name] + parts)
                if any(e in tag for e in exclude):
                    continue
                self._tb.histogram(tag + "/gradients", np.asarray(leaf),
                                   int(step))
        self._tb.flush()

    def maybe_log_histograms(self, step: int, trees, exclude: tuple = ()):
        """Histogram logging at the summary cadence; cheap no-op between
        (the grads stay device-resident unless this fetches them)."""
        if (self._tb is None or not self.histogram_interval
                or trees is None
                or int(step) % self.histogram_interval != 0):
            return
        self.log_histograms(int(step), trees, exclude)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()


class ProfilerHook:
    """Capture an XLA/host trace for steps [start, start+count) into
    ``log_dir`` (TensorBoard's profile plugin format + perfetto .json.gz)
    — the reference has no tracing at all (SURVEY §5).

    Wired into every trainer ``fit`` loop via the CLI flags
    ``--profile_steps N`` / ``--profile_start S``; ``step()`` is called
    with the global step BEFORE each dispatch, so with
    ``steps_per_call=K`` the window snaps outward to whole dispatches
    (a trace cannot start or stop inside one device call).  Skip the
    first step or two (default start 2): they contain compilation."""

    def __init__(self, log_dir: str, start_step: int = 0, num_steps: int = 0):
        self.log_dir = log_dir
        self.start = start_step
        self.stop = start_step + num_steps
        self._active = False

    def step(self, step: int):
        import jax
        if self.stop <= self.start:
            return
        if step >= self.stop:
            self.close()
        elif step >= self.start and not self._active:
            jax.profiler.start_trace(self.log_dir)
            self._active = True

    def close(self):
        """Stop the trace if still running (end-of-fit safety net so a
        window past num_steps still flushes to disk)."""
        if self._active:
            import jax
            jax.profiler.stop_trace()
            self._active = False


def add_profiler_args(parser):
    """Shared ``--profile_steps`` / ``--profile_start`` flags for every
    trainer CLI (the reference has no profiler at all, SURVEY §5)."""
    parser.add_argument(
        "--profile_steps", type=int, default=0,
        help="capture a jax.profiler trace for this many steps into "
             "<log_dir>/profile (TensorBoard profile plugin + perfetto "
             "trace.json.gz); 0 disables")
    parser.add_argument(
        "--profile_start", type=int, default=2,
        help="global step at which the trace window opens (default 2: "
             "the first dispatch contains XLA compilation)")


def profiler_from_args(args):
    """None when --profile_steps is 0, else a ProfilerHook writing under
    <log_dir>/profile."""
    if getattr(args, "profile_steps", 0) <= 0:
        return None
    return ProfilerHook(os.path.join(args.log_dir, "profile"),
                        args.profile_start, args.profile_steps)
