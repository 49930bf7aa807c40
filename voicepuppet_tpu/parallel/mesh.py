"""Device mesh + data-parallel execution layer.

The reference has *no* distribution story — one process, one GPU, manual
``CUDA_VISIBLE_DEVICES`` pinning per trainer (SURVEY.md §2.3;
train_bfmnet.py:41).  This module is the TPU-native replacement: a
``jax.sharding.Mesh`` over the slice with a ``data`` axis (and an optional
``model`` axis for tensor sharding), and a ``shard_map``-based train-step
wrapper where each device computes gradients on its batch shard and reduces
them with ``lax.pmean`` over ICI.

Design choices:
  * explicit ``shard_map`` + ``psum``/``pmean`` rather than implicit GSPMD:
    the collective schedule is visible and rides ICI by construction.
  * parameters/optimizer state are replicated (the models are small — the
    largest, PixReferNet, is ~56M params ≈ 220 MB fp32, far under one
    v5e's HBM); batch is sharded on the leading axis.
  * per-device RNG derived by folding in the data-axis index, so dropout /
    GAN noise differs across shards.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              data_parallel: int = 0, model_parallel: int = 1,
              data_axis: str = "data", model_axis: str = "model") -> Mesh:
    """Build a [data, model] mesh.  ``data_parallel=0`` puts all remaining
    devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data_parallel <= 0:
        assert n % model_parallel == 0, (n, model_parallel)
        data_parallel = n // model_parallel
    use = data_parallel * model_parallel
    grid = np.asarray(devices[:use]).reshape(data_parallel, model_parallel)
    return Mesh(grid, (data_axis, model_axis))


def mesh_global_batch(requested: int, mesh: Mesh, axis: str = "data",
                      name: str = "batch_size") -> int:
    """Round a global batch size up to a multiple of the data-axis size.

    The reference batch sizes (BFMNet 4, PixRefer 2, PixFlow 3, ATNet 16,
    VGNet 4; train_*.py) were chosen for ONE GPU; a sharded leading axis
    must divide evenly over ``mesh.shape[axis]``.  Rounding up (with a
    warning) keeps every device busy instead of crashing at device_put —
    on a v5e-8, PixRefer's batch 2 becomes 8.

    This IS a training-dynamics divergence from the reference: a 4x batch
    at the same lr schedule has 4x lower gradient noise.  The alternative
    — pad the global batch to the mesh and MASK the pad out of the loss —
    was considered and rejected: (a) per-sample loss masks would have to
    thread through every GAN loss (incl. the PatchGAN reductions and the
    VGG perceptual term), (b) the reference's always-train-mode BatchNorm
    computes moments over the batch, so padded samples would corrupt the
    statistics unless BN itself were also made mask-aware — at which
    point the "reference semantics" being preserved are gone anyway, and
    (c) idle devices computing garbage they then throw away buy nothing
    over simply training on more data.  Matching the reference's exact
    noise scale on a mesh means choosing a batch that divides it — the
    trainers accept any such ``batch_size`` and only ROUND when the
    configured one cannot shard."""
    n = mesh.shape[axis]
    if requested % n == 0:
        return requested
    rounded = -(-requested // n) * n
    import logging
    logging.getLogger(__name__).warning(
        "%s=%d is not divisible by the %d-device '%s' mesh axis; "
        "rounding up to %d", name, requested, n, axis, rounded)
    return rounded


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Device-put a host batch pytree sharded on its leading axis.  The
    leading dimension must be divisible by the axis size — size global
    batches with :func:`mesh_global_batch`."""
    n = mesh.shape[axis]
    leaves = jax.tree_util.tree_leaves(batch)
    if leaves and hasattr(leaves[0], "shape") and leaves[0].shape:
        lead = leaves[0].shape[0]
        if lead % n != 0:
            raise ValueError(
                f"global batch {lead} is not divisible by the {n}-device "
                f"'{axis}' mesh axis; round it up with mesh_global_batch()")
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Device-put a pytree fully replicated over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def data_parallel_step(step_fn: Callable, mesh: Mesh,
                       data_axis: str = "data",
                       donate_state: bool = True) -> Callable:
    """Wrap ``step_fn(state, batch, rng) -> (state, metrics)`` into a jitted
    shard_map program: batch sharded over ``data_axis``, state replicated.

    ``step_fn`` runs *inside* the mapped region.  The correct reduction
    idiom under VMA-tracked shard_map is to ``lax.pmean`` the LOSS inside
    the differentiated function — autodiff then inserts the gradient psum;
    do NOT also pmean the gradients (that double-reduces).
    """

    # check_vma=True is load-bearing: varying-manual-axes tracking is what
    # makes autodiff of collectives (the sync-BN pmean, the gradient psum)
    # transpose correctly — with it off, cross-shard cotangent sums through
    # psum are silently dropped and DP gradients come out wrong.
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(data_axis), P()),
        out_specs=(P(), P()),
        check_vma=True)
    def mapped(state, batch, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(data_axis))
        return step_fn(state, batch, rng)

    return jax.jit(mapped, donate_argnums=(0,) if donate_state else ())


def data_parallel_multi_step(step_fn: Callable, mesh: Mesh,
                             data_axis: str = "data",
                             donate_state: bool = True,
                             num_extras: int = 0) -> Callable:
    """Like :func:`data_parallel_step`, but runs K optimizer steps per
    dispatch: ``lax.scan`` drives ``step_fn`` over batches stacked on a
    NEW leading axis ([K, B, ...], sharded on the BATCH axis), so one
    host→device round trip covers K steps.

    This is a TPU-native trick the reference's session-per-step TF1 loop
    cannot express (train_bfmnet.py:112-145): small train steps are
    dispatch-bound (each dispatch+fetch pays the host round trip — ~27 ms
    through the dev tunnel, CLAUDE.md), and a device-side scan amortizes
    that across K steps.  Semantics are K sequential steps — same math,
    state threaded through the scan carry; float-level results track the
    K-single-dispatch path up to XLA fusion/reassociation noise (~1e-4
    relative after a few steps) — pinned by
    tests/test_train.py::test_multi_step_matches_sequential.  Caveat:
    the per-step rng chain differs from the K=1 loop's (one split-chain
    inside the scan vs one split per host call), so when dropout is
    active the masks differ — equally independent keys, matching in
    distribution, not bit-wise; the equivalence test pins drop_rate=0.

    Returns ``multi(state, batches, rng, *extras) -> (state, metrics)``
    where every metrics leaf gains a leading [K] axis (one row per inner
    step).  ``num_extras`` replicated pytree arguments (e.g. a frozen VGG
    trunk) are threaded through every inner call as
    ``step_fn(state, batch, *extras, rng)`` — passed as jit arguments,
    not closure constants, so they are not baked into the executable.
    The per-step RNG chain is ``split`` from the axis-folded call rng, so
    dropout differs per inner step and per shard."""

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(None, data_axis), P()) + (P(),) * num_extras,
        out_specs=(P(), P()),
        check_vma=True)
    def mapped(state, batches, rng, *extras):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(data_axis))

        def body(carry, batch):
            st, r = carry
            r, sub = jax.random.split(r)
            st, metrics = step_fn(st, batch, *extras, sub)
            return (st, r), metrics

        (state, _), metrics = jax.lax.scan(body, (state, rng), batches)
        return state, metrics

    return jax.jit(mapped, donate_argnums=(0,) if donate_state else ())


def shard_batch_stacked(batches: Sequence[Any], mesh: Mesh,
                        axis: str = "data") -> Any:
    """Stack K batches into [K, B, ...] leaves and device-put them
    sharded on the BATCH axis (axis 1) for a multi-step dispatch.

    Host (numpy) batches stack on host then upload once.  Batches that
    are ALREADY device arrays (e.g. from ``prefetch_to_device``) stack
    with ``jnp.stack`` — ``np.stack`` on device arrays would silently
    fetch every batch back through the d2h link (11-39 MB/s on the dev
    tunnel), defeating the prefetch."""
    n = mesh.shape[axis]

    def stack(*xs):
        if any(isinstance(x, jax.Array) for x in xs):
            return jnp.stack([jnp.asarray(x) for x in xs], axis=0)
        return np.stack(xs, axis=0)

    stacked = jax.tree_util.tree_map(stack, *batches)
    leaves = jax.tree_util.tree_leaves(stacked)
    if leaves and hasattr(leaves[0], "shape") and len(leaves[0].shape) > 1:
        if leaves[0].shape[1] % n != 0:
            raise ValueError(
                f"global batch {leaves[0].shape[1]} is not divisible by "
                f"the {n}-device '{axis}' mesh axis")
    sharding = NamedSharding(mesh, P(None, axis))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), stacked)


def local_batch_rows(global_batch: int, mesh: Mesh,
                     axis: str = "data") -> int:
    """Rows of the global batch THIS process must produce for
    :func:`shard_batch_local`.

    On a multi-host pod each process addresses only its local chips, so a
    batch sharded over ``axis`` is fed per-process: the data pipeline on
    each host yields ``global_batch / process_count`` samples.  Requires
    the per-process row count to itself divide over the process's local
    share of the axis (true for the standard contiguous device order that
    :func:`make_mesh` uses)."""
    procs = jax.process_count()
    if global_batch % mesh.shape[axis] != 0 or global_batch % procs != 0:
        raise ValueError(
            f"global batch {global_batch} must divide both the "
            f"{mesh.shape[axis]}-device '{axis}' axis and "
            f"{procs} processes")
    return global_batch // procs


def shard_batch_local(local_batch: Any, mesh: Mesh, axis: str = "data"
                      ) -> Any:
    """Multi-host feeding path: build a GLOBAL batch array from only this
    process's local rows (``jax.make_array_from_process_local_data``).

    :func:`shard_batch` device-puts a *global* host batch — fine in one
    process, impossible on a real multi-host v5e pod where each host
    holds only its shard of the input pipeline.  Here every process
    passes its :func:`local_batch_rows` rows; JAX assembles the logical
    [global_batch, ...] array from the per-process pieces without any
    cross-host data movement (each piece lands on that process's
    addressable devices only; DCN never sees batch data).

    In a single process this is exactly :func:`shard_batch` (pinned by
    tests/test_train.py::test_shard_batch_local_matches_global).  The
    result feeds :func:`data_parallel_step` unchanged — shard_map only
    sees the global sharding, not how it was built."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)), local_batch)


def pmean_metric(x: Any, data_axis: str = "data") -> Any:
    """Average a per-shard metric over the data axis (for values NOT
    already reduced through the loss-pmean autodiff path)."""
    return jax.lax.pmean(x, axis_name=data_axis)
