from voicepuppet_tpu.ops.raster_pallas import (render_colors_pallas,
                                               render_colors_grouped_pallas,
                                               render_colors_xband_pallas,
                                               rasterize_triangles_pallas,
                                               rasterize_winner_pallas,
                                               render_texture_pallas)


def render_colors_auto(vertices, colors, triangles, h: int = 224,
                       w: int = 224, bb: int = 6, group: int = 0,
                       xband: bool = True):
    """Backend-dispatched flat-shaded raster: the Mosaic kernel on TPU,
    the XLA scatter formulation elsewhere (CPU tests / virtual meshes).

    ``bb`` = expected max triangle bbox span in pixels (scale it with the
    canvas); the Mosaic kernel's aligned row window is derived from it.
    An under-estimated ``bb`` is caught by the kernel's device-side
    preflight, which falls back to a full-canvas window — correct output,
    reduced throughput (raster_pallas.rasterize_winner_pallas guard).

    ``xband`` (default on) runs the x-banded kernel on canvases wider
    than 128 px: 128-lane windows, measured faster than the plain
    per-triangle kernel at the production 224² raster (A/B table:
    docs/PERF.md "x-banded kernel"), bit-exact, with its own
    device-side x-extent preflight falling back to the full-width
    kernel.  Dispatched only when the stacked band buffer is no larger
    than the plain kernel's lane-padded buffer (nb·128 <= w padded to
    128) — true at 224, false at e.g. 256/512 where the extra bands
    would only raise VMEM pressure.

    ``group`` > 0 selects the grouped-RMW kernel (one depth-window RMW
    per ``group`` consecutive triangles; exact via order-free merge +
    per-triangle fallback when the mesh order lacks screen locality —
    ops/raster_pallas.py)."""
    import jax
    if jax.default_backend() == "tpu":
        win = max(16, -(-(bb + 7) // 8) * 8)
        if group > 0:
            return render_colors_grouped_pallas(
                vertices, colors, triangles, h=h, w=w, win=win,
                group=group)
        from voicepuppet_tpu.ops.raster_pallas import (XBAND_LANES,
                                                       _num_xbands)
        lanes_ok = (_num_xbands(w) * XBAND_LANES
                    <= -(-w // XBAND_LANES) * XBAND_LANES)
        if xband and h % 8 == 0 and lanes_ok:
            return render_colors_xband_pallas(vertices, colors, triangles,
                                              h=h, w=w, win=win)
        return render_colors_pallas(vertices, colors, triangles, h=h, w=w,
                                    win=win)
    from voicepuppet_tpu.face3d.raster import render_colors
    return render_colors(vertices, colors, triangles, h=h, w=w, bb=bb)


__all__ = ["render_colors_pallas", "render_colors_grouped_pallas",
           "render_colors_xband_pallas", "rasterize_winner_pallas",
           "rasterize_triangles_pallas", "render_texture_pallas",
           "render_colors_auto"]
