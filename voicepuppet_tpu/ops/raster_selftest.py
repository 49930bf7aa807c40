"""On-hardware parity gate for the production Mosaic raster kernels.

The committed pytest suite runs the Pallas kernels in interpret mode
(kernel *math* on the virtual CPU mesh); this module compiles the
PRODUCTION kernels on the actual default backend and asserts parity
against the sequential NumPy spec (`face3d/raster_ref.py`, the pinned
re-statement of mesh_core.cpp) on the quirk meshes — depth ties,
degenerate triangles, integer color truncation, both guard branches of
the window preflights, and the low-bit-y regression mesh that caught the
round-4 Mosaic winner-flip (5/114k pixels) which interpret mode cannot
see.

Parity contract: the engineered quirk cases (ties, degenerate,
truncation, seam merge, the edge-through-pixel-centers mesh) must be
BIT-EXACT, and the x-banded kernel must equal the plain kernel
bit-exactly on-device (same codegen — any difference is a band-shift
rounding bug, the round-4 class).  Random-soup cases vs the HOST spec
additionally tolerate a bounded handful of pixels proven borderline by a
float64 recomputation (device FMA rounding of the edge functions, see
``BORDERLINE_EPS``); every tolerated flip is verified, never assumed.

Run directly (exit code 0/1, one JSON line)::

    JAX_PLATFORMS=axon python -m voicepuppet_tpu.ops.raster_selftest

or via `tests_tpu/` (real-chip pytest tier), or implicitly by bench.py,
which records the report in its JSON output.  Each case is a distinct
(kernel, shape) program; with a warm `.jax_cache/` the whole gate runs
in well under 2 minutes on-chip.
"""

from __future__ import annotations

import json
from typing import Callable, Dict, List, Tuple

import numpy as np

H = W = 96
WIDE_W = 224
N_SOUP = 256


def _soup(seed: int = 0, n: int = N_SOUP, w: int = W, x0: float = 4.0,
          max_span: float = 8.0) -> Tuple[np.ndarray, np.ndarray,
                                          np.ndarray]:
    """Deterministic triangle soup with bbox spans <= ``max_span`` (fits
    the win=16 row window), coordinates on a quarter-pixel grid nudged
    off pixel centers, distinct depths (tie semantics get their own
    cases)."""
    rng = np.random.default_rng(seed)
    anchor = rng.uniform([x0, 4.0], [w - max_span - 6.0,
                                     H - max_span - 6.0], (n, 2))
    offs = rng.uniform(1.0, max_span - 1.0, (n, 2, 2))
    pts = np.concatenate([anchor[:, None], anchor[:, None] + offs], 1)
    pts = np.floor(pts * 4.0) / 4.0 + 0.3
    depth = np.repeat(rng.uniform(1.0, 50.0, (n, 1)), 3, 1)[..., None]
    verts = np.concatenate([pts, depth], -1).reshape(-1, 3)
    tris = np.arange(3 * n, dtype=np.int32).reshape(n, 3)
    colors = np.repeat(rng.integers(0, 256, (n, 1, 3)), 3, 1)
    return (verts.astype(np.float32), tris,
            colors.reshape(-1, 3).astype(np.float32))


def _expect_equal(got, want, label: str):
    got, want = np.asarray(got), np.asarray(want)
    if got.shape != want.shape:
        raise AssertionError(f"{label}: shape {got.shape} != {want.shape}")
    bad = got != want
    if bad.any():
        raise AssertionError(
            f"{label}: {int(bad.sum())}/{bad.size} elements differ "
            f"(first at {tuple(int(i) for i in np.argwhere(bad)[0])})")


# Cross-hardware float reality: the TPU compiles the edge-function dot
# products with fused multiply-adds, so at pixels whose barycentric u/v
# sit within ~an ulp of 0 (pixel center effectively ON an edge) the
# inside test can legitimately flip vs the host float32 sequential spec —
# exactly the borderline-pixel caveat tests/test_raster.py documents for
# its tall-triangle meshes.  The ordering/tie/truncation SEMANTICS are
# integer-decided and must stay exact; random-soup cases therefore allow
# flips ONLY at pixels proven borderline by a float64 recomputation, and
# only a handful of them.
BORDERLINE_EPS = 3e-5
MAX_BORDERLINE = 16


def _borderline_pixels(verts: np.ndarray, tris: np.ndarray, h: int,
                       w: int, eps: float = BORDERLINE_EPS):
    """Pixels whose center lies within ``eps`` (in barycentric units,
    float64) of some triangle's edge — the only places the FMA-rounded
    device inside-test may differ from the host spec."""
    v = verts.astype(np.float64)
    out = set()
    for t in tris:
        p0, p1, p2 = v[t[0], :2], v[t[1], :2], v[t[2], :2]
        x0 = max(int(np.ceil(min(p0[0], p1[0], p2[0]))), 0)
        x1 = min(int(np.floor(max(p0[0], p1[0], p2[0]))), w - 1)
        y0 = max(int(np.ceil(min(p0[1], p1[1], p2[1]))), 0)
        y1 = min(int(np.floor(max(p0[1], p1[1], p2[1]))), h - 1)
        if x1 < x0 or y1 < y0:
            continue
        gx, gy = np.meshgrid(np.arange(x0, x1 + 1), np.arange(y0, y1 + 1))
        v0, v1 = p2 - p0, p1 - p0
        v2x, v2y = gx - p0[0], gy - p0[1]
        dot00, dot01, dot11 = v0 @ v0, v0 @ v1, v1 @ v1
        dot02 = v0[0] * v2x + v0[1] * v2y
        dot12 = v1[0] * v2x + v1[1] * v2y
        deno = dot00 * dot11 - dot01 * dot01
        inv = 0.0 if deno == 0 else 1.0 / deno
        u = (dot11 * dot02 - dot01 * dot12) * inv
        uv = (dot00 * dot12 - dot01 * dot02) * inv
        near = ((np.abs(u) < eps) | (np.abs(uv) < eps)
                | (np.abs(u + uv - 1.0) < eps))
        for yy, xx in zip(gy[near], gx[near]):
            out.add((int(yy), int(xx)))
    return out


def _expect_match(got_img, got_mask, want_img, want_mask, verts, tris,
                  h: int, w: int, label: str) -> str:
    """Exact equality except at float64-verified borderline-edge pixels
    (bounded count).  Returns the per-case status suffix."""
    got_img, got_mask = np.asarray(got_img), np.asarray(got_mask)
    bad = np.argwhere((got_mask != want_mask)
                      | (got_img != want_img).any(-1))
    if len(bad) == 0:
        return "exact"
    if len(bad) > MAX_BORDERLINE:
        raise AssertionError(f"{label}: {len(bad)} pixels differ "
                             f"(> {MAX_BORDERLINE} borderline budget)")
    border = _borderline_pixels(verts, tris, h, w)
    hard = [tuple(int(i) for i in p) for p in bad
            if tuple(int(i) for i in p) not in border]
    if hard:
        raise AssertionError(
            f"{label}: {len(hard)} NON-borderline pixels differ, first "
            f"at {hard[0]} ({len(bad)} total)")
    return f"{len(bad)} borderline-edge flips (f64-verified < "\
           f"{BORDERLINE_EPS:g})"


def _render_ref(verts, tris, colors, h, w):
    from voicepuppet_tpu.face3d import raster_ref
    return raster_ref.render_colors_ref(verts, tris, colors, h, w)


# --------------------------------------------------------------------------
# cases — each returns None or raises AssertionError
# --------------------------------------------------------------------------

def case_plain_soup():
    """Per-triangle kernel, guard branch NOT tripped (windows fit)."""
    from voicepuppet_tpu.ops.raster_pallas import render_colors_pallas
    verts, tris, colors = _soup()
    want_img, want_mask = _render_ref(verts, tris, colors, H, W)
    img, mask = render_colors_pallas(verts[None], colors[None], tris,
                                     h=H, w=W, win=16)
    return _expect_match(img[0], mask[0], want_img, want_mask, verts,
                         tris, H, W, "soup")


def case_plain_tall_guard():
    """Same compiled program, data that trips the too-tall preflight:
    the lax.cond full-canvas fallback must render exactly."""
    from voicepuppet_tpu.ops.raster_pallas import render_colors_pallas
    verts, tris, colors = _soup(seed=1)
    verts = verts.copy()
    verts[tris[0], :2] = [[W * 0.5, 2.3], [W * 0.25, H - 3.3],
                          [W * 0.75, H - 5.3]]
    verts[tris[0], 2] = 0.5  # nearest: its pixels must be visible
    want_img, want_mask = _render_ref(verts, tris, colors, H, W)
    img, mask = render_colors_pallas(verts[None], colors[None], tris,
                                     h=H, w=W, win=16)
    if np.asarray(mask[0])[want_mask > 0].sum() == 0:
        raise AssertionError("guard fallback rendered nothing")
    return _expect_match(img[0], mask[0], want_img, want_mask, verts,
                         tris, H, W, "tall")


def case_degenerate_truncation_tie():
    """The three scalar quirks on one tiny canvas: zero-area triangle
    rendered across its bbox (mesh_core.cpp:40-49), (int)(c0+c1+c2)/3
    color truncation (:219), and exact-depth-tie first-wins (:205)."""
    from voicepuppet_tpu.ops.raster_pallas import render_colors_pallas
    verts = np.array([
        [10.0, 10.0, 1.0], [14.0, 10.0, 1.0], [12.0, 10.0, 1.0],  # degen
        [2.0, 14.0, 1.0], [20.0, 14.0, 1.0], [2.0, 30.0, 1.0],    # A
        [2.0, 14.0, 1.0], [20.0, 14.0, 1.0], [2.0, 30.0, 1.0],    # B=tie
    ], np.float32)
    tris = np.array([[0, 1, 2], [3, 4, 5], [6, 7, 8]], np.int32)
    colors = np.array([[90.0]] * 3 + [[9.0], [9.0], [10.0]]
                      + [[200.0]] * 3, np.float32)
    want_img, want_mask = _render_ref(verts, tris, colors, 32, 32)
    img, mask = render_colors_pallas(verts[None], colors[None], tris,
                                     h=32, w=32, win=32)
    _expect_equal(mask[0], want_mask, "mask")
    _expect_equal(img[0], want_img, "img")
    img0 = np.asarray(img[0])
    if want_mask[10, 12] == 0 or img0[20, 5, 0] != 9:
        raise AssertionError("quirk premise broken: degenerate pixel "
                             f"{want_mask[10, 12]}, truncated {img0[20,5,0]}")


def case_xband_soup_and_wide_guard():
    """x-banded kernel (production default for w > 128): soup spread over
    both bands takes the banded branch; a second run with one triangle
    wider than the band slack must trip the x-fits preflight and fall
    back full-width — both exact."""
    from voicepuppet_tpu.ops.raster_pallas import (
        _num_xbands, render_colors_xband_pallas)
    assert _num_xbands(WIDE_W) == 2
    verts, tris, colors = _soup(seed=2, w=WIDE_W)
    want_img, want_mask = _render_ref(verts, tris, colors, H, WIDE_W)
    if not (want_mask[:, :96].sum() > 0 and want_mask[:, 128:].sum() > 0):
        raise AssertionError("soup premise broken: bands not both covered")
    img, mask = render_colors_xband_pallas(verts[None], colors[None], tris,
                                           h=H, w=WIDE_W, win=16)
    s1 = _expect_match(img[0], mask[0], want_img, want_mask, verts, tris,
                       H, WIDE_W, "banded")

    verts = verts.copy()
    verts[tris[0], :2] = [[60.3, H * 0.4], [180.3, H * 0.3],
                          [120.3, H * 0.6]]
    verts[tris[0], 2] = 0.5
    want_img, want_mask = _render_ref(verts, tris, colors, H, WIDE_W)
    img, mask = render_colors_xband_pallas(verts[None], colors[None], tris,
                                           h=H, w=WIDE_W, win=16)
    s2 = _expect_match(img[0], mask[0], want_img, want_mask, verts, tris,
                       H, WIDE_W, "fallback")
    return f"banded {s1}; fallback {s2}"


def case_xband_seam_ties():
    """Triangles in DIFFERENT bands overlapping in the [96, 128) seam:
    nearer wins regardless of band, exact tie -> lower id
    (mesh_core.cpp:205 strict >)."""
    from voicepuppet_tpu.ops.raster_pallas import render_colors_xband_pallas
    tri_a = [[90.0, 10.0], [120.0, 10.0], [105.0, 40.0]]
    tri_b = [[100.0, 5.0], [126.0, 20.0], [96.5, 35.0]]
    for za, zb, win_color in [(5.0, 1.0, 200), (1.0, 5.0, 50),
                              (3.0, 3.0, 200)]:
        verts = np.array([p + [za] for p in tri_a]
                         + [p + [zb] for p in tri_b], np.float32)
        colors = np.array([[200.0]] * 3 + [[50.0]] * 3, np.float32)
        tris = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
        want_img, want_mask = _render_ref(verts, tris, colors, 48, WIDE_W)
        img, mask = render_colors_xband_pallas(
            verts[None], colors[None], tris, h=48, w=WIDE_W, win=48,
            guard=False)   # force the banded path even for the seam pair
        _expect_equal(mask[0], want_mask, f"mask z=({za},{zb})")
        _expect_equal(img[0], want_img, f"img z=({za},{zb})")
        if np.asarray(img[0])[15, 107, 0] != win_color:
            raise AssertionError(f"seam winner z=({za},{zb})")


def _low_bit_y_mesh():
    """The round-4 regression mesh (commit 72f0823): band-1 triangles
    whose y carries 2^-17-grade low bits (finer than ulp at y+224) and
    exact depth ties, so winner identity hangs on bit-exact inside
    tests."""
    rng = np.random.default_rng(7)
    n = 96
    anchor = rng.uniform([100.0, 8.0], [200.0, 200.0], (n, 2))
    offs = rng.uniform(2.0, 14.0, (n, 2, 2))
    offs[..., 1] = np.clip(offs[..., 1], 2.0, 8.0)
    pts = np.concatenate([anchor[:, None], anchor[:, None] + offs], 1)
    pts = np.float32(np.floor(pts * 4) / 4)
    pts[..., 1] += np.float32(2.0 ** -17) * rng.integers(
        0, 8, (n, 3)).astype(np.float32)
    verts = np.concatenate(
        [pts.reshape(-1, 2), np.full((3 * n, 1), 5.0, np.float32)],
        axis=1).astype(np.float32)
    tris = np.arange(3 * n, dtype=np.int32).reshape(n, 3)
    colors = np.repeat(rng.uniform(0, 255, (n, 1, 3)), 3, axis=1
                       ).reshape(-1, 3).astype(np.float32)
    return verts, tris, colors


def case_low_bit_y_regression():
    """The exact round-4 failure class: the x-banded kernel vs the plain
    kernel, BOTH compiled by Mosaic on this chip, must agree BIT-EXACTLY
    on the low-bit-y tie mesh (same codegen, so any difference is the
    band coordinate shift rounding y's low bits away — the 5/114k winner
    flip).  Plus borderline-bounded parity against the host spec (the
    mesh's quarter-grid x coordinates put edges exactly through pixel
    centers, where device FMA rounding may legitimately flip vs the
    host; y low bits are the quantity under test, not x borderlines)."""
    from voicepuppet_tpu.ops.raster_pallas import (
        render_colors_pallas, render_colors_xband_pallas)
    verts, tris, colors = _low_bit_y_mesh()
    p_img, p_mask = render_colors_pallas(verts[None], colors[None], tris,
                                         h=224, w=224, guard=False)
    x_img, x_mask = render_colors_xband_pallas(verts[None], colors[None],
                                               tris, h=224, w=224,
                                               guard=False)
    _expect_equal(x_mask, p_mask, "xband vs plain mask")
    _expect_equal(x_img, p_img, "xband vs plain img")
    want_img, want_mask = _render_ref(verts, tris, colors, 224, 224)
    s = _expect_match(p_img[0], p_mask[0], want_img, want_mask, verts,
                      tris, 224, 224, "vs spec")
    return f"xband==plain exact; vs spec {s}"


def case_edge_through_pixel_centers():
    """Deterministic p0y-rounding case: an edge passing 2^-17 below pixel
    centers must leave those pixels OUTSIDE (u exactly negative)."""
    from voicepuppet_tpu.ops.raster_pallas import render_colors_xband_pallas
    eps = np.float32(2.0 ** -17)
    verts = np.array([[104.0, 40.0 - eps, 5.0],
                      [120.0, 52.0 - eps, 5.0],
                      [118.0, 42.0, 5.0]], np.float32)
    tris = np.array([[0, 1, 2]], np.int32)
    colors = np.full((3, 3), 90.0, np.float32)
    want_img, want_mask = _render_ref(verts, tris, colors, 224, 224)
    if want_mask[46, 112] != 0 or want_mask[44, 112] == 0:
        raise AssertionError("premise broken: edge pixels not borderline")
    img, mask = render_colors_xband_pallas(verts[None], colors[None], tris,
                                           h=224, w=224, guard=False)
    _expect_equal(mask[0], want_mask, "mask")
    _expect_equal(img[0], want_img, "img")


def case_interp_winner():
    """Interp-depth winner kernel (mesh_core.cpp:108-166) on the soup:
    winner ids exact away from legitimate depth ties (none in this soup),
    interpolated depth to float32 tolerance."""
    from voicepuppet_tpu.face3d import raster_ref
    from voicepuppet_tpu.ops.raster_pallas import \
        rasterize_winner_interp_pallas
    verts, tris, colors = _soup(seed=3)
    want_d, want_t, _ = raster_ref.rasterize_triangles_ref(verts, tris,
                                                           H, W)
    winner, depth = rasterize_winner_interp_pallas(verts[None], tris,
                                                   h=H, w=W, win=16)
    got_t = np.asarray(winner[0])
    got_t = np.where(got_t == tris.shape[0], -1, got_t)
    bad = np.argwhere(got_t != want_t)
    suffix = "exact"
    if len(bad):
        if len(bad) > MAX_BORDERLINE:
            raise AssertionError(f"{len(bad)} winner pixels differ")
        border = _borderline_pixels(verts, tris, H, W)
        hard = [tuple(int(i) for i in p) for p in bad
                if tuple(int(i) for i in p) not in border]
        if hard:
            raise AssertionError(
                f"{len(hard)} NON-borderline winner flips, first at "
                f"{hard[0]}")
        suffix = f"{len(bad)} borderline-edge winner flips"
    agree = (got_t == want_t) & (want_t >= 0)
    err = np.abs(np.asarray(depth[0])[agree] - want_d[agree]).max()
    if err > 1e-4:
        raise AssertionError(f"interp depth err {err}")
    return suffix


CASES: List[Tuple[str, Callable[[], None]]] = [
    ("plain_soup", case_plain_soup),
    ("plain_tall_guard", case_plain_tall_guard),
    ("degenerate_truncation_tie", case_degenerate_truncation_tie),
    ("xband_soup_and_wide_guard", case_xband_soup_and_wide_guard),
    ("xband_seam_ties", case_xband_seam_ties),
    ("low_bit_y_regression", case_low_bit_y_regression),
    ("edge_through_pixel_centers", case_edge_through_pixel_centers),
    ("interp_winner", case_interp_winner),
]


def run_selftest() -> Dict:
    """Run every case on the current default backend.  Returns
    ``{"ok": bool, "backend": str, "cases": {name: "ok" | "FAIL: ..."}}``
    — never raises."""
    import sys
    import time

    import jax
    report: Dict = {"backend": jax.default_backend(), "cases": {}}
    ok = True
    verbose = sys.stderr.isatty() or __name__ == "__main__"
    for name, fn in CASES:
        t0 = time.time()
        try:
            note = fn()
            report["cases"][name] = ("ok" if note in (None, "exact")
                                     else f"ok: {note}")
        except Exception as exc:  # noqa: BLE001 — report, don't abort
            ok = False
            report["cases"][name] = f"FAIL: {type(exc).__name__}: {exc}"
        if verbose:
            print(f"  {name}: {report['cases'][name]} "
                  f"({time.time() - t0:.1f}s)", file=sys.stderr, flush=True)
    report["ok"] = ok
    return report


if __name__ == "__main__":
    import sys
    rep = run_selftest()
    print(json.dumps(rep), flush=True)
    sys.exit(0 if rep["ok"] else 1)
