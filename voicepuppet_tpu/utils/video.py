"""Video writing helpers (ref: voicepuppet/atvgnet/plot.py:130-173 —
avi/mp4 writers with ffmpeg audio mux; here ffmpeg does both)."""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
from typing import Optional

import numpy as np


def save_image_seq_video(frames: np.ndarray, out_path: str,
                         frame_rate: int = 25,
                         audio_path: Optional[str] = None) -> bool:
    """[T, H, W, 3] uint8 -> H.264 mp4 (+ optional audio track).

    Without ffmpeg on PATH the frames are written as a PNG sequence in
    ``<out_path minus extension>_frames/`` instead and False is returned."""
    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg is None:
        from PIL import Image
        frame_dir = os.path.splitext(out_path)[0] + "_frames"
        os.makedirs(frame_dir, exist_ok=True)
        for i in range(frames.shape[0]):
            Image.fromarray(np.asarray(frames[i], np.uint8)).save(
                os.path.join(frame_dir, f"{i}.png"))
        return False
    from PIL import Image
    with tempfile.TemporaryDirectory() as td:
        for i in range(frames.shape[0]):
            Image.fromarray(np.asarray(frames[i], np.uint8)).save(
                os.path.join(td, f"{i}.png"))
        cmd = [ffmpeg, "-v", "error", "-framerate", str(frame_rate),
               "-i", os.path.join(td, "%d.png")]
        if audio_path:
            cmd += ["-i", audio_path, "-c:a", "aac", "-shortest"]
        cmd += ["-c:v", "libx264", "-pix_fmt", "yuv420p", "-y", out_path]
        subprocess.run(cmd, check=False)
    return os.path.exists(out_path)
