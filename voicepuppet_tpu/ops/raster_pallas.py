"""Pallas TPU z-buffer rasterizer.

The production kernel for flat-shaded mesh rendering (the reference's
``_render_colors_core``, utils/cython/mesh_core.cpp:169-231).  XLA's
scatter lowers to a serialized ~9ns/element loop on TPU, which made the
scatter-based formulation (face3d/raster.py) cost ~1.1s per 16-frame
chunk; this kernel keeps the depth/winner buffers resident in VMEM and
processes triangles **sequentially in index order** — which is not just
fast but reproduces the C++ semantics *exactly*: in-order processing with
a strict ``>`` depth test means the first triangle at a given depth wins.

Layout strategy:
  * XLA precomputes per-triangle constants (bbox, barycentric setup, flat
    depth) as one [B, F, 16] f32 tensor — vectorized, cheap.
  * grid = (B/FB frame groups, F/chunk triangle chunks); the per-frame
    depth and winner buffers are *outputs* whose block index depends only
    on the frame group, so they stay in VMEM across the chunk dimension
    (initialized at chunk 0).
  * **frame interleaving (FB)**: each grid step carries FB frames and the
    inner body updates all FB buffers for triangle i.  Without this the
    loop is serialized on the store->load round-trip of the depth window
    (triangle i+1 reads what triangle i wrote to the same buffer); the FB
    chains are independent, so the compiler overlaps them.  Measured on
    70,688 triangles x 16 frames @224²: fb=1 ~225 ns/tri-frame,
    fb=8 ~46 ns — a 5x speedup for free.  (An interval-table variant with
    8x fewer scalar reads measured *slower* end-to-end: the XLA-side
    [B,F,win,win] coverage precompute costs more than it saves.)
  * each triangle updates a win-row full-width [win, W] window at an
    8-aligned origin: row-aligned reads avoid lane-misaligned dynamic
    slicing; the inside test is evaluated on [win, W] lanes with the same
    dot-product barycentric math as the C++ (mesh_core.cpp:23-50),
    including the degenerate-triangle quirk (inv_deno = 0 -> whole bbox
    passes).

Triangles taller than win-7 px do not fit the aligned window; the
production entry points run a device-side ``fits`` preflight and fall
back to a full-canvas window via ``lax.cond`` (guard=True default), so a
novel mesh/scale renders correctly — slower — instead of silently
cropped (BFM triangles at 224² are 1-7 px tall, so the guard never fires
on the product path; measured cost ~0).  The winner buffer holds
triangle ids; color lookup happens outside as a vectorized gather.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEPTH_INIT = -99999.0
# default per-triangle update window: rows start at an 8-aligned origin —
# Mosaic requires dynamic sublane slices to be provably 8-aligned; a
# win-row aligned window guarantees coverage of spans <= win - 7 rows
WIN = 16
# 256-triangle SMEM blocks: per-triangle constants are consumed as scalars,
# and scalar reads from SMEM measured ~20% faster than VMEM (204 vs 255 ms
# per 16-frame chunk at 70k triangles)
T_CHUNK = 256
# frame-interleave factor: 8 breaks the depth-window store->load chain
# 8-ways; the (fb, chunk, 16) f32 SMEM block must stay <= 32 KB (a
# (16, 64, 16) block fails to compile), hence chunk = 512 // fb
FB = 8


def _fb_for_batch(b: int, fb: int = FB) -> int:
    while b % fb:
        fb //= 2
    return max(fb, 1)


def _unroll_for(chunk: int, unroll: int = 4) -> int:
    """Largest of 4/2/1 dividing ``chunk``: the triangle-unroll loop runs
    ``chunk // unroll`` iterations, so a non-dividing unroll would
    silently skip the trailing ``chunk % unroll`` triangles of every
    chunk (reachable with an explicit non-power-of-two ``fb``)."""
    while chunk % unroll:
        unroll //= 2
    return max(unroll, 1)


def _triangle_table(vertices: jax.Array, triangles: jax.Array,
                    h: int, w: int, win: int = WIN,
                    pad_to: int = T_CHUNK) -> jax.Array:
    """[B, V, 3] + [F, 3] -> [B, F_pad, 16] f32 per-triangle constants:
    (p0x, p0y, v0x, v0y, v1x, v1y, dot00, dot01, dot11, inv_deno,
     flat_depth, x_min, x_max, y_min, y_max, y0w)."""
    tri_xy = vertices[:, triangles, :2]          # [B, F, 3, 2]
    tri_z = vertices[:, triangles, 2]            # [B, F, 3]
    p0 = tri_xy[:, :, 0]
    v0 = tri_xy[:, :, 2] - p0
    v1 = tri_xy[:, :, 1] - p0
    dot00 = jnp.sum(v0 * v0, -1)
    dot01 = jnp.sum(v0 * v1, -1)
    dot11 = jnp.sum(v1 * v1, -1)
    deno = dot00 * dot11 - dot01 * dot01
    inv_deno = jnp.where(deno == 0, 0.0,
                         1.0 / jnp.where(deno == 0, 1.0, deno))
    flat_depth = jnp.mean(tri_z, axis=-1)
    xs = tri_xy[..., 0]
    ys = tri_xy[..., 1]
    x_min = jnp.maximum(jnp.ceil(jnp.min(xs, -1)), 0.0)
    x_max = jnp.minimum(jnp.floor(jnp.max(xs, -1)), w - 1.0)
    y_min = jnp.maximum(jnp.ceil(jnp.min(ys, -1)), 0.0)
    y_max = jnp.minimum(jnp.floor(jnp.max(ys, -1)), h - 1.0)
    # 8-aligned clamped window origin for the dynamic row slice
    y0w = jnp.clip(jnp.floor(y_min / 8.0) * 8.0, 0.0, float(h - win))
    table = jnp.stack([p0[..., 0], p0[..., 1], v0[..., 0], v0[..., 1],
                       v1[..., 0], v1[..., 1], dot00, dot01, dot11,
                       inv_deno, flat_depth, x_min, x_max, y_min, y_max,
                       y0w], axis=-1)
    b, f, _ = table.shape
    f_pad = -(-f // pad_to) * pad_to
    if f_pad != f:
        pad = jnp.zeros((b, f_pad - f, 16), jnp.float32)
        # empty bbox (x_max < x_min) -> never draws
        pad = pad.at[..., 12].set(-1.0)
        table = jnp.concatenate([table, pad], axis=1)
    return table


def _raster_kernel(tri_ref, depth_ref, winner_ref, *, h: int, w: int,
                   num_tri: int, win: int, fb: int, chunk: int,
                   unroll: int = 4, band_h: int = 0,
                   nb_bands: int = 0):
    """``band_h``: x-banded mode (rasterize_winner_xband_pallas) — the
    output rows hold ``h // band_h`` stacked band_h-row bands and y0w
    (slot 15) is pre-shifted by band·band_h for ADDRESSING only; the
    y COORDINATE base is recovered as ``y0w % band_h`` so the
    barycentric math sees the original (unshifted, hence un-rounded)
    p0y/y_min/y_max.  Shifting p0y itself by +band·band_h is NOT
    bit-safe in float32: the sum lands on a coarser ulp grid and drops
    low bits of p0y, flipping borderline inside tests (caught on-device
    in round 4 — 5/114k winner flips on the real mesh)."""
    # band_h requires the band count: the y rebase below peels band_h
    # off y0c exactly (nb_bands - 1) times, so a defaulted nb_bands
    # would silently leave top-band rows unrebased for nb >= 3
    assert band_h == 0 or nb_bands >= 1, (band_h, nb_bands)
    chunk_id = pl.program_id(1)

    @pl.when(chunk_id == 0)
    def _():
        depth_ref[...] = jnp.full((fb, h, w), DEPTH_INIT, jnp.float32)
        winner_ref[...] = jnp.full((fb, h, w), num_tri, jnp.int32)

    col = jax.lax.broadcasted_iota(jnp.int32, (win, w), 1).astype(
        jnp.float32)
    row_off = jax.lax.broadcasted_iota(jnp.int32, (win, w), 0).astype(
        jnp.float32)

    def one(i, fr):
        p0x = tri_ref[fr, i, 0]
        p0y = tri_ref[fr, i, 1]
        v0x = tri_ref[fr, i, 2]
        v0y = tri_ref[fr, i, 3]
        v1x = tri_ref[fr, i, 4]
        v1y = tri_ref[fr, i, 5]
        dot00 = tri_ref[fr, i, 6]
        dot01 = tri_ref[fr, i, 7]
        dot11 = tri_ref[fr, i, 8]
        inv_deno = tri_ref[fr, i, 9]
        flat_depth = tri_ref[fr, i, 10]
        x_min = tri_ref[fr, i, 11]
        x_max = tri_ref[fr, i, 12]
        y_min = tri_ref[fr, i, 13]
        y_max = tri_ref[fr, i, 14]
        y0w = pl.multiple_of(tri_ref[fr, i, 15].astype(jnp.int32), 8)
        if band_h:
            # y0w % band_h without the scalar-division latency: nb is
            # tiny (2-3 bands), so peel h off with compare-selects
            y0c = y0w
            for _ in range(nb_bands - 1):
                y0c = jnp.where(y0c >= band_h, y0c - band_h, y0c)
        else:
            y0c = y0w

        rows = row_off + y0c.astype(jnp.float32)
        px = col - p0x
        py = rows - p0y
        dot02 = v0x * px + v0y * py
        dot12 = v1x * px + v1y * py
        u = (dot11 * dot02 - dot01 * dot12) * inv_deno
        v = (dot00 * dot12 - dot01 * dot02) * inv_deno
        inside = (u >= 0.0) & (v >= 0.0) & (u + v < 1.0)
        in_box = ((col >= x_min) & (col <= x_max)
                  & (rows >= y_min) & (rows <= y_max))

        d_win = depth_ref[fr, pl.ds(y0w, win), :]
        update = inside & in_box & (flat_depth > d_win)
        # unconditional stores: a per-triangle @pl.when skip was
        # measured 1.6x SLOWER than predicated writes (branch stalls)
        depth_ref[fr, pl.ds(y0w, win), :] = jnp.where(
            update, flat_depth, d_win)
        w_win = winner_ref[fr, pl.ds(y0w, win), :]
        winner_ref[fr, pl.ds(y0w, win), :] = jnp.where(
            update, jnp.int32(chunk_id * chunk + i), w_win)

    def body(j, _):
        # python-unrolled over the fb interleaved frames (fb independent
        # read-modify-write chains for the compiler to overlap) and over
        # `unroll` consecutive triangles (amortizes loop bookkeeping:
        # measured 36.6 -> 34.3 ms per 16 frames at 70k tris, bit-exact
        # since same-frame updates stay in triangle order)
        for u_ in range(unroll):
            i = j * unroll + u_
            for fr in range(fb):
                one(i, fr)
        return 0

    jax.lax.fori_loop(0, chunk // unroll, body, 0)


def _winner_pallas_call(kernel, table: jax.Array, *, b: int, h: int,
                        w: int, fb: int, nc: int, slots: int,
                        interpret: bool):
    """Shared pallas_call layout for every winner-raster kernel: SMEM
    per-triangle table blocks, fb-interleaved VMEM depth/winner outputs
    resident across the triangle-chunk grid dimension."""
    return pl.pallas_call(
        kernel,
        grid=(b // fb, nc),
        in_specs=[pl.BlockSpec((fb, table.shape[1] // nc, slots),
                               lambda bi, ci: (bi, ci, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec((fb, h, w), lambda bi, ci: (bi, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((fb, h, w), lambda bi, ci: (bi, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((b, h, w), jnp.float32),
                   jax.ShapeDtypeStruct((b, h, w), jnp.int32)),
        interpret=interpret,
    )(table)


def _window_fits(table: jax.Array, win: int) -> jax.Array:
    """Device-side preflight: True iff every triangle's bbox rows land in
    its win-row aligned window (y_max <= y0w + win - 1).  Padded triangles
    have y_max = y0w = 0 and always pass (their empty x-bbox never draws).
    """
    return jnp.all(table[..., 14] <= table[..., 15] + (win - 1.0))


@functools.partial(jax.jit,
                   static_argnames=("h", "w", "win", "fb", "guard",
                                    "interpret"))
def rasterize_winner_pallas(vertices: jax.Array, triangles: jax.Array,
                            h: int = 224, w: int = 224, win: int = WIN,
                            fb: Optional[int] = None, guard: bool = True,
                            interpret: bool = False):
    """[B,V,3] + [F,3] -> (winner [B,h,w] int32 in [0,F], depth [B,h,w]).

    ``winner == F`` marks uncovered pixels.  ``win`` (multiple of 8)
    should be >= max triangle bbox height + 7; scale it with the canvas.
    ``fb``: frame-interleave factor (must divide B; default: largest of
    8,4,2,1 that divides B).

    ``guard`` (default on): a device-side fits preflight detects any
    triangle taller than its aligned window and reruns the kernel with a
    full-canvas window via ``lax.cond`` — a novel mesh/scale combination
    renders CORRECTLY (slower) instead of silently cropped (the C++
    bbox loop never crops, mesh_core.cpp:169-231).  The guarded path
    needs ``h % 8 == 0`` (224/512/672 all qualify); otherwise the
    preflight is skipped as before."""
    assert win % 8 == 0 and win >= 8
    b = vertices.shape[0]
    f = triangles.shape[0]
    if fb is None:
        fb = _fb_for_batch(b)
    assert b % fb == 0
    chunk = 512 // fb
    table = _triangle_table(vertices.astype(jnp.float32), triangles, h, w,
                            win, pad_to=chunk)
    f_pad = table.shape[1]
    nc = f_pad // chunk

    kernel = functools.partial(_raster_kernel, h=h, w=w, num_tri=f,
                               win=win, fb=fb, chunk=chunk,
                               unroll=_unroll_for(chunk))
    run = functools.partial(_winner_pallas_call, b=b, h=h, w=w, fb=fb,
                            nc=nc, slots=16, interpret=interpret)
    if guard and win < h and h % 8 == 0:
        full_kernel = functools.partial(_raster_kernel, h=h, w=w,
                                        num_tri=f, win=h, fb=fb,
                                        chunk=chunk,
                                        unroll=_unroll_for(chunk))
        depth, winner = jax.lax.cond(
            _window_fits(table, win),
            lambda tab: run(kernel, tab),
            # win = h makes every aligned window origin 0 (full canvas)
            lambda tab: run(full_kernel, tab.at[..., 15].set(0.0)),
            table)
    else:
        depth, winner = run(kernel, table)
    # mask winners that never drew (padded triangles can't draw: empty bbox)
    return winner, depth


def _grouped_table(vertices: jax.Array, triangles: jax.Array, h: int,
                   w: int, win: int, group: int, pad_to: int,
                   base_table: Optional[jax.Array] = None
                   ) -> Tuple[jax.Array, jax.Array]:
    """Per-triangle table with slot 15 = the SHARED window origin of each
    ``group`` consecutive triangles, plus a scalar ``fits`` flag.

    ``fits`` is True iff every real triangle's bbox rows land inside its
    group's ``win``-row window — the precondition under which the grouped
    kernel is bit-exact vs the sequential spec.  Pad rows get
    ``y_min = h`` / ``y_max = -1`` so they neither drag a mixed group's
    window origin nor trip the fits check (their empty x-bbox already
    keeps them from drawing).

    ``base_table``: a prebuilt :func:`_triangle_table` (16-slot) or
    :func:`_append_z` (20-slot) table to derive from — fallback-enabled
    callers keep that table for the ``lax.cond`` per-triangle branch, so
    reusing it here avoids gathering the [B, F, 16] constants twice per
    raster call.  Only slots 13/14 (pad rows) and 15 differ."""
    table = (_triangle_table(vertices, triangles, h, w, win, pad_to=pad_to)
             if base_table is None else base_table)
    b, f_pad, _ = table.shape
    f = triangles.shape[0]
    if f_pad != f:
        table = table.at[:, f:, 13].set(float(h))
        table = table.at[:, f:, 14].set(-1.0)
    assert f_pad % group == 0
    ymin_g = jnp.min(table[:, :, 13].reshape(b, f_pad // group, group), -1)
    y0g = jnp.clip(jnp.floor(ymin_g / 8.0) * 8.0, 0.0, float(h - win))
    y0g = jnp.repeat(y0g, group, axis=1)
    table = table.at[:, :, 15].set(y0g)
    fits = jnp.all(table[:, :, 14] - y0g <= win - 1.0)
    return table, fits


def _raster_kernel_grouped(tri_ref, depth_ref, winner_ref, *, h: int,
                           w: int, num_tri: int, win: int, fb: int,
                           chunk: int, group: int):
    """Grouped-RMW variant of :func:`_raster_kernel`: merge ``group``
    consecutive triangles in registers with the order-free
    (max-depth, min-id) rule — proven equivalent to the sequential C++
    semantics in face3d/raster.py:14-23 — then do ONE depth/winner window
    read-modify-write per group.  The round-3 kernel study
    (docs/PERF.md) measured a structural ~30 ns/(triangle, frame) floor
    tied to the per-triangle store->load RMW chain itself (halving vector
    work or deleting whole buffers moved nothing); grouping divides the
    chain length per frame by ``group``.

    Requires every triangle's bbox rows inside its group's ``win``-row
    window (the ``fits`` flag from :func:`_grouped_table`); callers fall
    back to the per-triangle kernel otherwise."""
    chunk_id = pl.program_id(1)

    @pl.when(chunk_id == 0)
    def _():
        depth_ref[...] = jnp.full((fb, h, w), DEPTH_INIT, jnp.float32)
        winner_ref[...] = jnp.full((fb, h, w), num_tri, jnp.int32)

    col = jax.lax.broadcasted_iota(jnp.int32, (win, w), 1).astype(
        jnp.float32)
    row_off = jax.lax.broadcasted_iota(jnp.int32, (win, w), 0).astype(
        jnp.float32)

    def one_group(j, fr):
        base = j * group
        y0g = pl.multiple_of(tri_ref[fr, base, 15].astype(jnp.int32), 8)
        rows = row_off + y0g.astype(jnp.float32)
        g_depth = jnp.full((win, w), DEPTH_INIT, jnp.float32)
        g_id = jnp.full((win, w), num_tri, jnp.int32)
        for k in range(group):
            i = base + k
            p0x = tri_ref[fr, i, 0]
            p0y = tri_ref[fr, i, 1]
            v0x = tri_ref[fr, i, 2]
            v0y = tri_ref[fr, i, 3]
            v1x = tri_ref[fr, i, 4]
            v1y = tri_ref[fr, i, 5]
            dot00 = tri_ref[fr, i, 6]
            dot01 = tri_ref[fr, i, 7]
            dot11 = tri_ref[fr, i, 8]
            inv_deno = tri_ref[fr, i, 9]
            flat_depth = tri_ref[fr, i, 10]
            x_min = tri_ref[fr, i, 11]
            x_max = tri_ref[fr, i, 12]
            y_min = tri_ref[fr, i, 13]
            y_max = tri_ref[fr, i, 14]

            px = col - p0x
            py = rows - p0y
            dot02 = v0x * px + v0y * py
            dot12 = v1x * px + v1y * py
            u = (dot11 * dot02 - dot01 * dot12) * inv_deno
            v = (dot00 * dot12 - dot01 * dot02) * inv_deno
            inside = (u >= 0.0) & (v >= 0.0) & (u + v < 1.0)
            in_box = ((col >= x_min) & (col <= x_max)
                      & (rows >= y_min) & (rows <= y_max))
            cand = jnp.where(inside & in_box, flat_depth, DEPTH_INIT)
            # strict > keeps the earlier (lower-id) triangle on depth
            # ties — the same first-wins rule the sequential loop applies
            upd = cand > g_depth
            g_depth = jnp.where(upd, cand, g_depth)
            g_id = jnp.where(upd, jnp.int32(chunk_id * chunk + i), g_id)

        d_win = depth_ref[fr, pl.ds(y0g, win), :]
        upd = g_depth > d_win
        depth_ref[fr, pl.ds(y0g, win), :] = jnp.where(upd, g_depth, d_win)
        w_win = winner_ref[fr, pl.ds(y0g, win), :]
        winner_ref[fr, pl.ds(y0g, win), :] = jnp.where(upd, g_id, w_win)

    def body(j, _):
        for fr in range(fb):
            one_group(j, fr)
        return 0

    jax.lax.fori_loop(0, chunk // group, body, 0)


@functools.partial(jax.jit,
                   static_argnames=("h", "w", "win", "group", "fb",
                                    "fallback", "interpret"))
def rasterize_winner_grouped_pallas(vertices: jax.Array,
                                    triangles: jax.Array, h: int = 224,
                                    w: int = 224, win: int = 32,
                                    group: int = 4,
                                    fb: Optional[int] = None,
                                    fallback: bool = True,
                                    interpret: bool = False):
    """Grouped-RMW winner raster: one window read-modify-write per
    ``group`` consecutive triangles (see :func:`_raster_kernel_grouped`).

    Bit-exact vs :func:`rasterize_winner_pallas` (and the sequential C++
    spec) whenever each group's row spread fits the ``win``-row window —
    true for mesh-local triangle orders like the BFM topology, where
    consecutive triangles are screen-adjacent.  With ``fallback=True``
    (default) a cheap XLA fits-check selects the per-triangle kernel via
    ``lax.cond`` when any group does not fit, removing the GROUPING
    precondition — what remains is the per-triangle kernel's own caveat:
    individual triangles taller than ``win - 7`` rows are still cropped
    by the aligned window (size ``win`` from the expected bbox span, as
    ``render_colors_auto`` does).  ``fallback=False`` additionally crops
    oversized groups."""
    assert win % 8 == 0 and win >= 8 and h >= win
    b = vertices.shape[0]
    f = triangles.shape[0]
    if fb is None:
        fb = _fb_for_batch(b)
    assert b % fb == 0
    chunk = 512 // fb
    assert chunk % group == 0, (chunk, group)
    verts = vertices.astype(jnp.float32)
    # fallback path reuses the per-triangle table as the grouped table's
    # base: the two differ only in slots 13/14 (pads) and 15, so building
    # [B, F, 16] constants once serves both lax.cond branches
    table_t = (None if not fallback else
               _triangle_table(verts, triangles, h, w, win, pad_to=chunk))
    table_g, fits = _grouped_table(verts, triangles, h, w, win, group,
                                   pad_to=chunk, base_table=table_t)
    nc = table_g.shape[1] // chunk

    def run(kernel, tab):
        # one shared pallas_call layout: the fallback path must stay
        # structurally identical to the grouped path (and to
        # rasterize_winner_pallas) so a block-spec change can't silently
        # diverge them
        return _winner_pallas_call(kernel, tab, b=b, h=h, w=w, fb=fb,
                                   nc=nc, slots=16, interpret=interpret)

    grouped_kernel = functools.partial(_raster_kernel_grouped, h=h, w=w,
                                       num_tri=f, win=win, fb=fb,
                                       chunk=chunk, group=group)
    if not fallback:
        depth, winner = run(grouped_kernel, table_g)
        return winner, depth

    # per-triangle fallback at the SAME win (a superset window: covers
    # anything the default 16-row window covers)
    pertri_kernel = functools.partial(_raster_kernel, h=h, w=w, num_tri=f,
                                      win=win, fb=fb, chunk=chunk,
                                      unroll=_unroll_for(chunk))
    depth, winner = jax.lax.cond(
        fits,
        lambda tabs: run(grouped_kernel, tabs[0]),
        lambda tabs: run(pertri_kernel, tabs[1]),
        (table_g, table_t))
    return winner, depth


@functools.partial(jax.jit,
                   static_argnames=("h", "w", "win", "group", "fb",
                                    "fallback", "interpret"))
def render_colors_grouped_pallas(vertices: jax.Array, colors: jax.Array,
                                 triangles: jax.Array, h: int = 224,
                                 w: int = 224, win: int = 32,
                                 group: int = 4,
                                 fb: Optional[int] = None,
                                 fallback: bool = True,
                                 interpret: bool = False
                                 ) -> Tuple[jax.Array, jax.Array]:
    """Grouped-RMW variant of :func:`render_colors_pallas` (flat-shaded
    z-buffer, exact C++ ordering semantics; mesh_core.cpp:169-231)."""
    winner, _ = rasterize_winner_grouped_pallas(
        vertices, triangles, h, w, win=win, group=group, fb=fb,
        fallback=fallback, interpret=interpret)
    return _flat_color_image(winner, colors, triangles, h, w)


# ---- x-banded winner raster: 128-lane windows ----------------------------
#
# The round-3/4 kernel studies (docs/PERF.md) localized the per-triangle
# floor in the [win, W] window VECTOR work itself (fb sweeps, grouped-RMW,
# and the carried-register Phase A all measured no gain from touching the
# RMW chain, while the "w=128 canvas" row measured ~19% faster).  A 224-px
# canvas pads to 256 lanes = 2 vector registers per window row; assigning
# every triangle to one of ``nb`` 128-lane x-bands (origins 0, 96, 192, …
# — adjacent bands overlap by 32 px >> the p99 ~7 px triangle width)
# halves that.  The band shift is folded into the per-triangle constants
# (p0x/x_min/x_max shifted by -96·band — bit-safe: band > 0 implies
# x_min >= 96·band, so p0x >= 96·band - 1 and the subtraction's result is
# a multiple of ulp(p0x) below it in magnitude, i.e. exact; the
# barycentric subtraction then rounds the same real number either way),
# and the bands stack along rows via the INTEGER window origin y0w only
# (+h·band, exact) — p0y/y_min/y_max stay unshifted and the kernel's
# band_h mode recovers the y coordinate base as y0w % h, because
# p0y + h·band would land on a coarser float32 grid and drop low bits
# (measured on-device: 5/114k winner flips).  Per-band results
# merge with the order-free (max-depth, min-id) rule — proven equivalent
# to the sequential C++ semantics in face3d/raster.py:14-23
# (mesh_core.cpp:169-231's in-order strict-> depth test).
XBAND_STRIDE = 96
XBAND_LANES = 128


def _num_xbands(w: int) -> int:
    """Bands at origins 0, 96, 192, … covering [96k, 96k+128) up to w."""
    if w <= XBAND_LANES:
        return 1
    return -(-(w - XBAND_LANES) // XBAND_STRIDE) + 1


def _xband_table(table: jax.Array, h: int, nb: int
                 ) -> Tuple[jax.Array, jax.Array]:
    """Shift each triangle's constants into its 128-lane x-band.

    band = clip(floor(x_min/96), 0, nb-1): x coords shift by -96·band
    (p0x, x_min, x_max — exact in float32 since band > 0 implies
    p0x >= 96·band - 1; the edge vectors are translation invariant).
    Along y ONLY the integer window origin y0w shifts (+h·band, exact)
    so band k's window rows land in rows [k·h, (k+1)·h) of the stacked
    buffer; p0y/y_min/y_max stay in the original coordinate domain and
    the kernel's band_h mode rebases rows via y0w % h (shifting p0y
    would round its low bits away — see _raster_kernel).  y0w stays
    8-aligned because h % 8 == 0 (asserted by the caller).

    Returns (banked table, fits_x): fits_x is True iff every triangle's
    x-extent lands inside its band — x_max - 96·band <= 127, guaranteed
    for spans <= 33 px except degenerate/oversized ones, which the guard
    routes to the full-width kernel.  fits_x ALSO requires
    |p0x| < 2^29: x_min/x_max are canvas-clipped, but p0x is the raw
    vertex coordinate, and the -96·band shift is exact only while
    ulp(p0x) divides 96 (ulp <= 32, i.e. |p0x| < 2^29) — a mesh with a
    far off-canvas vertex whose clipped bbox still fits its band would
    otherwise round p0x and flip borderline inside tests.  Padded rows
    (x_min 0, x_max -1) take band 0 and never draw."""
    bank = jnp.clip(jnp.floor(table[..., 11] / float(XBAND_STRIDE)),
                    0.0, float(nb - 1))
    xs = bank * float(XBAND_STRIDE)
    ys = bank * float(h)
    t = table
    t = t.at[..., 0].add(-xs)
    t = t.at[..., 11].add(-xs)
    t = t.at[..., 12].add(-xs)
    t = t.at[..., 15].add(ys)
    fits_x = (jnp.all(t[..., 12] <= float(XBAND_LANES - 1))
              & jnp.all(jnp.abs(table[..., 0]) < float(2 ** 29)))
    return t, fits_x


def _merge_xbands(depth_b: jax.Array, winner_b: jax.Array, b: int, h: int,
                  w: int, nb: int, num_tri: int
                  ) -> Tuple[jax.Array, jax.Array]:
    """[B, nb·h, 128] stacked band buffers -> [B, h, w] canvas via the
    order-free (max-depth, min-id) merge on the 32-px band overlaps
    (exact: face3d/raster.py:14-23).  Uncovered pixels hold
    (DEPTH_INIT, num_tri) in every band and merge to themselves."""
    d = depth_b.reshape(b, nb, h, XBAND_LANES)
    wn = winner_b.reshape(b, nb, h, XBAND_LANES)
    out_d = jnp.full((b, h, w), DEPTH_INIT, jnp.float32)
    out_w = jnp.full((b, h, w), num_tri, jnp.int32)
    for k in range(nb):
        x0 = XBAND_STRIDE * k
        width = min(XBAND_LANES, w - x0)
        dk = d[:, k, :, :width]
        wk = wn[:, k, :, :width]
        cd = out_d[:, :, x0:x0 + width]
        cw = out_w[:, :, x0:x0 + width]
        better = (dk > cd) | ((dk == cd) & (wk < cw))
        out_d = out_d.at[:, :, x0:x0 + width].set(jnp.where(better, dk, cd))
        out_w = out_w.at[:, :, x0:x0 + width].set(jnp.where(better, wk, cw))
    return out_d, out_w


@functools.partial(jax.jit,
                   static_argnames=("h", "w", "win", "fb", "guard",
                                    "interpret"))
def rasterize_winner_xband_pallas(vertices: jax.Array,
                                  triangles: jax.Array, h: int = 224,
                                  w: int = 224, win: int = WIN,
                                  fb: Optional[int] = None,
                                  guard: bool = True,
                                  interpret: bool = False):
    """x-banded :func:`rasterize_winner_pallas`: identical signature and
    bit-exact output, with the per-triangle window vector work running on
    [win, 128] lanes instead of [win, W-padded-to-256].

    ``guard`` (default on): the fits preflight additionally checks the
    x-extent (x_max inside the triangle's band) and falls back to the
    full-width full-canvas-window kernel via ``lax.cond`` — correct
    output for any mesh/scale, slower.  ``guard=False`` renders the
    banded path unconditionally (crops oversized triangles, like the
    unguarded per-triangle path).  Canvases <= 128 px wide or with
    h % 8 != 0 dispatch straight to :func:`rasterize_winner_pallas`."""
    assert win % 8 == 0 and win >= 8
    b = vertices.shape[0]
    f = triangles.shape[0]
    nb = _num_xbands(w)
    if nb == 1 or h % 8 != 0:
        return rasterize_winner_pallas(vertices, triangles, h, w, win=win,
                                       fb=fb, guard=guard,
                                       interpret=interpret)
    if fb is None:
        fb = _fb_for_batch(b)
    assert b % fb == 0
    chunk = 512 // fb
    table = _triangle_table(vertices.astype(jnp.float32), triangles, h, w,
                            win, pad_to=chunk)
    table_x, fits_x = _xband_table(table, h, nb)
    nc = table.shape[1] // chunk

    band_kernel = functools.partial(_raster_kernel, h=nb * h,
                                    w=XBAND_LANES, num_tri=f, win=win,
                                    fb=fb, chunk=chunk,
                                    unroll=_unroll_for(chunk), band_h=h,
                                    nb_bands=nb)

    def run_band(tab):
        depth_b, winner_b = _winner_pallas_call(
            band_kernel, tab, b=b, h=nb * h, w=XBAND_LANES, fb=fb, nc=nc,
            slots=16, interpret=interpret)
        return _merge_xbands(depth_b, winner_b, b, h, w, nb, f)

    if not guard:
        depth, winner = run_band(table_x)
        return winner, depth

    full_kernel = functools.partial(_raster_kernel, h=h, w=w, num_tri=f,
                                    win=h, fb=fb, chunk=chunk,
                                    unroll=_unroll_for(chunk))

    def run_full(tab):
        # win = h makes every aligned window origin 0 (full canvas)
        return _winner_pallas_call(full_kernel, tab.at[..., 15].set(0.0),
                                   b=b, h=h, w=w, fb=fb, nc=nc, slots=16,
                                   interpret=interpret)

    # fits on the UNSHIFTED table: table_x's y0w carries the +h·band
    # addressing shift while y_max does not, so checking table_x would
    # be spuriously lenient (the relation itself is shift-invariant)
    depth, winner = jax.lax.cond(
        _window_fits(table, win) & fits_x,
        lambda tabs: run_band(tabs[0]),
        lambda tabs: run_full(tabs[1]),
        (table_x, table))
    return winner, depth


@functools.partial(jax.jit,
                   static_argnames=("h", "w", "win", "fb", "guard",
                                    "interpret"))
def render_colors_xband_pallas(vertices: jax.Array, colors: jax.Array,
                               triangles: jax.Array, h: int = 224,
                               w: int = 224, win: int = WIN,
                               fb: Optional[int] = None,
                               guard: bool = True,
                               interpret: bool = False
                               ) -> Tuple[jax.Array, jax.Array]:
    """x-banded variant of :func:`render_colors_pallas` (flat-shaded
    z-buffer, exact C++ ordering semantics; mesh_core.cpp:169-231)."""
    winner, _ = rasterize_winner_xband_pallas(vertices, triangles, h, w,
                                              win=win, fb=fb, guard=guard,
                                              interpret=interpret)
    return _flat_color_image(winner, colors, triangles, h, w)


def _raster_kernel_interp(tri_ref, depth_ref, winner_ref, *, h: int,
                          w: int, num_tri: int, win: int, fb: int,
                          chunk: int, unroll: int = 4):
    """Variant for ``_rasterize_triangles_core`` / ``_render_texture_core``
    semantics (mesh_core.cpp:108-166, 234-333): barycentric-INTERPOLATED
    per-pixel depth, and a 2px canvas border that unconditionally passes
    the inside test (mesh_core.cpp:148, 292).  Table rows carry 19 f32s
    (the flat 16 + z0, z1, z2), padded to 20."""
    chunk_id = pl.program_id(1)

    @pl.when(chunk_id == 0)
    def _():
        depth_ref[...] = jnp.full((fb, h, w), DEPTH_INIT, jnp.float32)
        winner_ref[...] = jnp.full((fb, h, w), num_tri, jnp.int32)

    col = jax.lax.broadcasted_iota(jnp.int32, (win, w), 1).astype(
        jnp.float32)
    row_off = jax.lax.broadcasted_iota(jnp.int32, (win, w), 0).astype(
        jnp.float32)
    col_border = (col < 2.0) | (col > w - 3.0)

    def one(i, fr):
        tri_id = chunk_id * chunk + i
        p0x = tri_ref[fr, i, 0]
        p0y = tri_ref[fr, i, 1]
        v0x = tri_ref[fr, i, 2]
        v0y = tri_ref[fr, i, 3]
        v1x = tri_ref[fr, i, 4]
        v1y = tri_ref[fr, i, 5]
        dot00 = tri_ref[fr, i, 6]
        dot01 = tri_ref[fr, i, 7]
        dot11 = tri_ref[fr, i, 8]
        inv_deno = tri_ref[fr, i, 9]
        x_min = tri_ref[fr, i, 11]
        x_max = tri_ref[fr, i, 12]
        y_min = tri_ref[fr, i, 13]
        y_max = tri_ref[fr, i, 14]
        y0w = pl.multiple_of(tri_ref[fr, i, 15].astype(jnp.int32), 8)
        z0 = tri_ref[fr, i, 16]
        z1 = tri_ref[fr, i, 17]
        z2 = tri_ref[fr, i, 18]

        rows = row_off + y0w.astype(jnp.float32)
        px = col - p0x
        py = rows - p0y
        dot02 = v0x * px + v0y * py
        dot12 = v1x * px + v1y * py
        u = (dot11 * dot02 - dot01 * dot12) * inv_deno
        v = (dot00 * dot12 - dot01 * dot02) * inv_deno
        inside = (u >= 0.0) & (v >= 0.0) & (u + v < 1.0)
        border = col_border | (rows < 2.0) | (rows > h - 3.0)
        in_box = ((col >= x_min) & (col <= x_max)
                  & (rows >= y_min) & (rows <= y_max))
        # weight[0]=1-u-v -> p0, weight[1]=v -> p1, weight[2]=u -> p2
        # (get_point_weight, mesh_core.cpp:53-82)
        pdepth = (1.0 - u - v) * z0 + v * z1 + u * z2

        d_win = depth_ref[fr, pl.ds(y0w, win), :]
        update = (inside | border) & in_box & (pdepth > d_win)
        depth_ref[fr, pl.ds(y0w, win), :] = jnp.where(
            update, pdepth, d_win)
        w_win = winner_ref[fr, pl.ds(y0w, win), :]
        winner_ref[fr, pl.ds(y0w, win), :] = jnp.where(
            update, jnp.int32(tri_id), w_win)

    def body(j, _):
        for u_ in range(unroll):
            for fr in range(fb):
                one(j * unroll + u_, fr)
        return 0

    jax.lax.fori_loop(0, chunk // unroll, body, 0)


def _raster_kernel_interp_grouped(tri_ref, depth_ref, winner_ref, *,
                                  h: int, w: int, num_tri: int, win: int,
                                  fb: int, chunk: int, group: int):
    """Grouped-RMW variant of :func:`_raster_kernel_interp`: the same
    register merge as :func:`_raster_kernel_grouped`, under the
    interpolated-depth + 2px-border-override semantics
    (mesh_core.cpp:108-166)."""
    chunk_id = pl.program_id(1)

    @pl.when(chunk_id == 0)
    def _():
        depth_ref[...] = jnp.full((fb, h, w), DEPTH_INIT, jnp.float32)
        winner_ref[...] = jnp.full((fb, h, w), num_tri, jnp.int32)

    col = jax.lax.broadcasted_iota(jnp.int32, (win, w), 1).astype(
        jnp.float32)
    row_off = jax.lax.broadcasted_iota(jnp.int32, (win, w), 0).astype(
        jnp.float32)
    col_border = (col < 2.0) | (col > w - 3.0)

    def one_group(j, fr):
        base = j * group
        y0g = pl.multiple_of(tri_ref[fr, base, 15].astype(jnp.int32), 8)
        rows = row_off + y0g.astype(jnp.float32)
        row_border = (rows < 2.0) | (rows > h - 3.0)
        g_depth = jnp.full((win, w), DEPTH_INIT, jnp.float32)
        g_id = jnp.full((win, w), num_tri, jnp.int32)
        for k in range(group):
            i = base + k
            p0x = tri_ref[fr, i, 0]
            p0y = tri_ref[fr, i, 1]
            v0x = tri_ref[fr, i, 2]
            v0y = tri_ref[fr, i, 3]
            v1x = tri_ref[fr, i, 4]
            v1y = tri_ref[fr, i, 5]
            dot00 = tri_ref[fr, i, 6]
            dot01 = tri_ref[fr, i, 7]
            dot11 = tri_ref[fr, i, 8]
            inv_deno = tri_ref[fr, i, 9]
            x_min = tri_ref[fr, i, 11]
            x_max = tri_ref[fr, i, 12]
            y_min = tri_ref[fr, i, 13]
            y_max = tri_ref[fr, i, 14]
            z0 = tri_ref[fr, i, 16]
            z1 = tri_ref[fr, i, 17]
            z2 = tri_ref[fr, i, 18]

            px = col - p0x
            py = rows - p0y
            dot02 = v0x * px + v0y * py
            dot12 = v1x * px + v1y * py
            u = (dot11 * dot02 - dot01 * dot12) * inv_deno
            v = (dot00 * dot12 - dot01 * dot02) * inv_deno
            inside = (u >= 0.0) & (v >= 0.0) & (u + v < 1.0)
            in_box = ((col >= x_min) & (col <= x_max)
                      & (rows >= y_min) & (rows <= y_max))
            pdepth = (1.0 - u - v) * z0 + v * z1 + u * z2
            cand = jnp.where((inside | col_border | row_border) & in_box,
                             pdepth, DEPTH_INIT)
            upd = cand > g_depth
            g_depth = jnp.where(upd, cand, g_depth)
            g_id = jnp.where(upd, jnp.int32(chunk_id * chunk + i), g_id)

        d_win = depth_ref[fr, pl.ds(y0g, win), :]
        upd = g_depth > d_win
        depth_ref[fr, pl.ds(y0g, win), :] = jnp.where(upd, g_depth, d_win)
        w_win = winner_ref[fr, pl.ds(y0g, win), :]
        winner_ref[fr, pl.ds(y0g, win), :] = jnp.where(upd, g_id, w_win)

    def body(j, _):
        for fr in range(fb):
            one_group(j, fr)
        return 0

    jax.lax.fori_loop(0, chunk // group, body, 0)


def _append_z(table: jax.Array, verts: jax.Array, triangles: jax.Array
              ) -> jax.Array:
    """16-slot table -> 20-slot (z0, z1, z2, pad) for the interp kernels."""
    b, f_pad, _ = table.shape
    f = triangles.shape[0]
    tri_z = verts[:, triangles, 2]                      # [B, F, 3]
    if f_pad != f:
        tri_z = jnp.concatenate(
            [tri_z, jnp.zeros((b, f_pad - f, 3), jnp.float32)], axis=1)
    return jnp.concatenate(
        [table, tri_z, jnp.zeros((b, f_pad, 1), jnp.float32)], axis=-1)


@functools.partial(jax.jit,
                   static_argnames=("h", "w", "win", "fb", "group",
                                    "guard", "interpret"))
def rasterize_winner_interp_pallas(vertices: jax.Array,
                                   triangles: jax.Array, h: int = 224,
                                   w: int = 224, win: int = WIN,
                                   fb: Optional[int] = None,
                                   group: int = 0, guard: bool = True,
                                   interpret: bool = False):
    """Winner/depth buffers under the interpolated-depth + border-override
    semantics (mesh_core.cpp:108-166).

    ``group`` > 0 uses the grouped-RMW kernel (one window RMW per
    ``group`` consecutive triangles, exact order-free merge) with an XLA
    fits-check falling back to the per-triangle kernel — see
    :func:`rasterize_winner_grouped_pallas`.

    ``guard`` adds the too-tall-triangle preflight + full-canvas-window
    fallback of :func:`rasterize_winner_pallas` on the per-triangle path
    (``group <= 0`` only; the grouped knob keeps its own group-locality
    fallback)."""
    assert win % 8 == 0 and win >= 8
    b = vertices.shape[0]
    f = triangles.shape[0]
    if fb is None:
        fb = _fb_for_batch(b)
    assert b % fb == 0
    # 20-wide rows: keep the (fb, chunk, 20) f32 SMEM block <= 32 KB
    chunk = max(8, (32768 // (fb * 20 * 4)) // 8 * 8)
    verts = vertices.astype(jnp.float32)
    table = _append_z(
        _triangle_table(verts, triangles, h, w, win, pad_to=chunk),
        verts, triangles)
    nc = table.shape[1] // chunk

    kernel = functools.partial(_raster_kernel_interp, h=h, w=w, num_tri=f,
                               win=win, fb=fb, chunk=chunk,
                               unroll=_unroll_for(chunk))
    if group <= 0:
        run = functools.partial(_winner_pallas_call, b=b, h=h, w=w, fb=fb,
                                nc=nc, slots=20, interpret=interpret)
        if guard and win < h and h % 8 == 0:
            full_kernel = functools.partial(
                _raster_kernel_interp, h=h, w=w, num_tri=f, win=h, fb=fb,
                chunk=chunk, unroll=_unroll_for(chunk))
            depth, winner = jax.lax.cond(
                _window_fits(table, win),
                lambda tab: run(kernel, tab),
                lambda tab: run(full_kernel, tab.at[..., 15].set(0.0)),
                table)
        else:
            depth, winner = run(kernel, table)
        return winner, depth

    assert h >= win and chunk % group == 0, (chunk, group)
    # derive the grouped table from the 20-slot fallback table already
    # built above (only slots 13/14/15 change) — avoids a second
    # [B, F, 16] constants gather AND a second _append_z z-gather
    table_g, fits = _grouped_table(verts, triangles, h, w, win, group,
                                   pad_to=chunk, base_table=table)
    grouped_kernel = functools.partial(
        _raster_kernel_interp_grouped, h=h, w=w, num_tri=f, win=win,
        fb=fb, chunk=chunk, group=group)
    depth, winner = jax.lax.cond(
        fits,
        lambda tabs: _winner_pallas_call(grouped_kernel, tabs[0], b=b,
                                         h=h, w=w, fb=fb, nc=nc, slots=20,
                                         interpret=interpret),
        lambda tabs: _winner_pallas_call(kernel, tabs[1], b=b, h=h, w=w,
                                         fb=fb, nc=nc, slots=20,
                                         interpret=interpret),
        (table_g, table))
    return winner, depth


@functools.partial(jax.jit,
                   static_argnames=("h", "w", "win", "fb", "group",
                                    "interpret"))
def rasterize_triangles_pallas(vertices: jax.Array, triangles: jax.Array,
                               h: int = 224, w: int = 224, win: int = WIN,
                               fb: Optional[int] = None, group: int = 0,
                               interpret: bool = False):
    """Mosaic fast path for face3d.raster.rasterize_triangles
    (mesh_core.cpp:108-166): winner kernel + shared XLA barycentric
    recompute.  Returns a face3d.raster.RasterOut."""
    from voicepuppet_tpu.face3d.raster import winner_weights
    winner, depth = rasterize_winner_interp_pallas(
        vertices, triangles, h, w, win=win, fb=fb, group=group,
        interpret=interpret)
    return winner_weights(vertices.astype(jnp.float32), triangles,
                          winner, depth, h, w)


@functools.partial(jax.jit,
                   static_argnames=("h", "w", "win", "fb", "group",
                                    "bilinear", "interpret"))
def render_texture_pallas(vertices: jax.Array, triangles: jax.Array,
                          texture: jax.Array, tex_coords: jax.Array,
                          tex_triangles: jax.Array, h: int = 224,
                          w: int = 224, win: int = WIN,
                          fb: Optional[int] = None, group: int = 0,
                          bilinear: bool = True,
                          interpret: bool = False):
    """Mosaic fast path for face3d.raster.render_texture
    (mesh_core.cpp:234-333)."""
    from voicepuppet_tpu.face3d.raster import sample_texture
    out = rasterize_triangles_pallas(vertices, triangles, h, w, win=win,
                                     fb=fb, group=group,
                                     interpret=interpret)
    return sample_texture(out, texture, tex_coords, tex_triangles,
                          bilinear)


@functools.partial(jax.jit,
                   static_argnames=("h", "w", "win", "fb", "guard",
                                    "interpret"))
def render_colors_pallas(vertices: jax.Array, colors: jax.Array,
                         triangles: jax.Array, h: int = 224, w: int = 224,
                         win: int = WIN, fb: Optional[int] = None,
                         guard: bool = True, interpret: bool = False
                         ) -> Tuple[jax.Array, jax.Array]:
    """Drop-in fast path for face3d.raster.render_colors (flat-shaded
    z-buffer, exact C++ ordering semantics).  vertices [B,V,3],
    colors [B,V,C] (0-255 integral), triangles [F,3] int32.  ``guard``:
    see :func:`rasterize_winner_pallas`."""
    winner, _ = rasterize_winner_pallas(vertices, triangles, h, w,
                                        win=win, fb=fb, guard=guard,
                                        interpret=interpret)
    return _flat_color_image(winner, colors, triangles, h, w)


def _flat_color_image(winner: jax.Array, colors: jax.Array,
                      triangles: jax.Array, h: int, w: int
                      ) -> Tuple[jax.Array, jax.Array]:
    """Winner-id buffer -> flat-shaded uint8 image + coverage mask
    ((int)((c0+c1+c2)/3) per channel, mesh_core.cpp:216-229)."""
    b = colors.shape[0]
    f = triangles.shape[0]
    tri_colors = colors[:, triangles, :]
    color_sum = jnp.sum(jnp.floor(tri_colors), axis=2)
    flat_color = jnp.floor(color_sum / 3.0)
    c = flat_color.shape[-1]
    flat_color = jnp.concatenate(
        [flat_color, jnp.zeros((b, 1, c), flat_color.dtype)], axis=1)
    gidx = (winner.reshape(b, -1)
            + (jnp.arange(b, dtype=jnp.int32) * (f + 1))[:, None]
            ).reshape(-1)
    image = flat_color.reshape(b * (f + 1), c)[gidx].reshape(b, h, w, c)
    covered = winner < f
    image = jnp.where(covered[..., None], image, 0.0)
    mask = jnp.where(covered, jnp.uint8(255), jnp.uint8(0))
    return image.astype(jnp.uint8), mask
