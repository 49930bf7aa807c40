"""Evaluation visualization.

Re-creations of the reference's eval imagery, rendered on device:

  * :func:`plot_bfm_coeff_seq` — the BFMNet eval grid
    (utils/bfm_visual.py:88-154): rows of rendered faces, ground-truth
    coefficient sequence on the top rows and predictions below, written as
    one ``bfmnet_<step>.jpg``.  The reference rasterizes each face on the
    host through the C++ kernel per eval; here all faces render as one
    batched device program.
  * :func:`plot_lmk_seq` / :func:`plot_image_seq` — the ATVGNet eval sheets
    (voicepuppet/atvgnet/plot.py:41-127): landmark stroke drawings and
    real-vs-fake image rows.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

# 68-landmark stroke topology (plot.py:9-38 defines the same contours:
# jaw, brows, nose bridge/base, eyes, outer/inner lips)
LANDMARK_STROKES = (
    list(range(0, 17)),           # jaw
    list(range(17, 22)),          # right brow
    list(range(22, 27)),          # left brow
    list(range(27, 31)),          # nose bridge
    list(range(31, 36)),          # nose base
    list(range(36, 42)) + [36],   # right eye (closed)
    list(range(42, 48)) + [42],   # left eye (closed)
    list(range(48, 60)) + [48],   # outer lip (closed)
    list(range(60, 68)) + [60],   # inner lip (closed)
)


def render_coeff_grid(coeff_seq: np.ndarray, face_model, cols: int = 10,
                      size: int = 224) -> np.ndarray:
    """Render a [T, 257] coefficient sequence into a grid image
    [rows*size, cols*size, 3] uint8 — one batched device render."""
    import jax.numpy as jnp
    from voicepuppet_tpu.face3d import morph
    from voicepuppet_tpu.ops import render_colors_auto

    t = coeff_seq.shape[0]
    fm = morph.device_bfm(face_model)
    rec = morph.reconstruct(jnp.asarray(coeff_seq, jnp.float32), fm,
                            image_size=float(size))
    verts = jnp.concatenate([rec.face_projection, rec.z_buffer], axis=-1)
    colors = jnp.floor(jnp.clip(rec.face_color, 0.0, 255.0))
    imgs, _ = render_colors_auto(verts, colors, fm.tri, h=size, w=size)
    imgs = np.asarray(imgs)

    rows = -(-t // cols)
    grid = np.zeros((rows * size, cols * size, 3), np.uint8)
    for i in range(t):
        r, c = divmod(i, cols)
        grid[r * size:(r + 1) * size, c * size:(c + 1) * size] = imgs[i]
    return grid


def plot_bfm_coeff_seq(out_dir: str, step: int, real_coeff: np.ndarray,
                       pred_exp: np.ndarray, face_model,
                       cols: int = 10, size: int = 224,
                       max_frames: int = 30) -> str:
    """BFMNet eval sheet (ref: utils/bfm_visual.py:88-154): top rows render
    the ground-truth sequence, bottom rows the same identity with predicted
    expressions spliced in (dims [80, 144))."""
    os.makedirs(out_dir, exist_ok=True)
    t = min(real_coeff.shape[0], pred_exp.shape[0], max_frames)
    real = np.asarray(real_coeff[:t], np.float32)
    pred = real.copy()
    pred[:, 80:144] = pred_exp[:t]
    grid = np.concatenate([render_coeff_grid(real, face_model, cols, size),
                           render_coeff_grid(pred, face_model, cols, size)],
                          axis=0)
    path = os.path.join(out_dir, f"bfmnet_{step}.jpg")
    from PIL import Image
    Image.fromarray(grid).save(path)
    return path


def draw_landmarks(canvas: np.ndarray, lmk: np.ndarray,
                   color=(0, 255, 0)) -> np.ndarray:
    """Stroke-draw 68 landmarks onto an image (ref: plot.py:41-81) with
    PIL line drawing instead of cv2."""
    from PIL import Image, ImageDraw
    img = Image.fromarray(canvas if canvas.dtype == np.uint8 else
                          np.clip(canvas * 255, 0, 255).astype(np.uint8))
    draw = ImageDraw.Draw(img)
    pts = lmk.reshape(-1, 2)
    for stroke in LANDMARK_STROKES:
        xy = [(float(pts[i, 0]), float(pts[i, 1])) for i in stroke]
        draw.line(xy, fill=tuple(color), width=1)
    return np.asarray(img)


def plot_lmk_seq(out_dir: str, step: int, mean: np.ndarray,
                 component: np.ndarray, seq_len: np.ndarray,
                 real_lmk_seq: np.ndarray, pred_lmk_seq: np.ndarray,
                 img_size: int = 224, cols: int = 10,
                 max_frames: int = 30) -> str:
    """ATNet eval sheet (ref: plot.py:41-81): strokes of real (green) and
    predicted (red) landmark sequences on white canvases, predictions
    un-projected through the PCA renorm."""
    os.makedirs(out_dir, exist_ok=True)
    t = min(int(seq_len[0]), max_frames, real_lmk_seq.shape[1])

    def denorm(lmk):
        # invert the [-1,1] renorm (generator.py:198-200)
        return (lmk / 2.0 + 0.5) * img_size

    size = img_size
    rows = 2 * (-(-t // cols))
    grid = np.full((rows * size, cols * size, 3), 255, np.uint8)
    for i in range(t):
        r, c = divmod(i, cols)
        real = denorm(real_lmk_seq[0, i]).reshape(-1, 2)
        pred = denorm(pred_lmk_seq[0, i]).reshape(-1, 2)
        cell = np.full((size, size, 3), 255, np.uint8)
        cell = draw_landmarks(cell, real, (0, 200, 0))
        grid[r * size:(r + 1) * size, c * size:(c + 1) * size] = cell
        r2 = r + rows // 2
        cell2 = np.full((size, size, 3), 255, np.uint8)
        cell2 = draw_landmarks(cell2, pred, (220, 0, 0))
        grid[r2 * size:(r2 + 1) * size, c * size:(c + 1) * size] = cell2
    path = os.path.join(out_dir, f"atnet_{step}.jpg")
    from PIL import Image
    Image.fromarray(grid).save(path)
    return path


def plot_image_seq(out_dir: str, step: int, real_img_seq: np.ndarray,
                   fake_img_seq: np.ndarray,
                   attention: Optional[np.ndarray] = None,
                   cols: int = 10, max_frames: int = 10) -> str:
    """VGNet eval sheet (ref: plot.py:84-127): real row / fake row /
    attention row."""
    os.makedirs(out_dir, exist_ok=True)
    t = min(real_img_seq.shape[1], fake_img_seq.shape[1], max_frames, cols)
    s = real_img_seq.shape[2]

    def to_u8(x):
        x = np.asarray(x)
        if x.dtype != np.uint8:
            x = np.clip(x * 255.0 if x.max() <= 1.5 else x, 0,
                        255).astype(np.uint8)
        return x

    rows = 3 if attention is not None else 2
    grid = np.zeros((rows * s, t * s, 3), np.uint8)
    for i in range(t):
        grid[:s, i * s:(i + 1) * s] = to_u8(real_img_seq[0, i])
        grid[s:2 * s, i * s:(i + 1) * s] = to_u8(fake_img_seq[0, i])
        if attention is not None:
            att = to_u8(np.repeat(attention[0, i], 3, axis=-1))
            grid[2 * s:3 * s, i * s:(i + 1) * s] = att
    path = os.path.join(out_dir, f"vgnet_{step}.jpg")
    from PIL import Image
    Image.fromarray(grid).save(path)
    return path
