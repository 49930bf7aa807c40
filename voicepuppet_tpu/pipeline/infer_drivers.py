"""Secondary inference drivers.

Re-creations of the reference's per-model inference CLIs (SURVEY.md §2
"Inference drivers"), built on the batched device programs:

  * :func:`infer_bfmnet` — audio -> BFM coefficients -> rasterized mesh
    video at 672² with a sweeping-yaw visualization, a blink pattern in
    the ear input, and shape coords mapped by ``112 - xy*112`` then x3
    (ref: voicepuppet/bfmnet/infer_bfmnet.py:150-235).  The reference
    renders one frame per host call; here frames render in device batches.
  * :func:`infer_pixrefer` — rendered-face sequence + reference panel ->
    GAN frames (ref: voicepuppet/pixrefer/infer_pixrefer.py).
  * :func:`infer_pixflow` — reference/current rendered-face pairs through
    PixFlowNet (ref: voicepuppet/pixflow/infer_pixflow.py).
  * :func:`infer_bfm_pixflow` — audio -> coefficients -> rendered faces ->
    PixFlowNet frames, the PixFlow end-to-end path
    (ref: voicepuppet/pixflow/infer_bfm_pixflow.py).
"""

from __future__ import annotations

import os
from typing import Iterator, Optional, Sequence

import numpy as np

from voicepuppet_tpu.config import Config


def _blink_ears(t: int) -> np.ndarray:
    """The infer_bfmnet ear pattern: 0.2 for the first half, 0.9 after
    (ref: infer_bfmnet.py:162-165)."""
    ears = np.full((1, t, 1), 0.9, np.float32)
    ears[0, : t // 2, 0] = 0.2
    return ears


def render_coeff_video_frames(coeff_seq: np.ndarray, face_model,
                              img_size: int = 672, yaw_shift: float = 0.04,
                              yaw_bound: float = 0.8,
                              chunk: int = 8) -> np.ndarray:
    """[T,257] -> [T,img_size,img_size,3] uint8 rendered mesh frames with
    the sweeping-yaw pose (ref: infer_bfmnet.py:203-235).

    Divergence note: the reference advances a yaw angle but never passes
    it into its Reconstruction call (infer_bfmnet.py:204-211 — the sweep
    is dead code there); here reconstruct_rotation applies the yaw to the
    shape itself so the head actually sweeps."""
    import jax.numpy as jnp
    from voicepuppet_tpu.face3d import morph
    from voicepuppet_tpu.ops import render_colors_auto

    fm = morph.device_bfm(face_model)
    t = coeff_seq.shape[0]
    coeffs = np.array(coeff_seq, np.float32)
    yaw = np.zeros((t,), np.float32)
    a, s = 0.0, yaw_shift
    for i in range(t):
        a += s
        if a > yaw_bound or a < -yaw_bound:
            s = -s
        yaw[i] = a

    scale = img_size / 224.0
    # triangle bbox spans scale with the canvas; size the raster window
    bb = max(6, int(np.ceil(7 * scale)))
    frames = np.zeros((t, img_size, img_size, 3), np.uint8)
    for start in range(0, t, chunk):
        n = min(chunk, t - start)
        c = np.zeros((chunk, 257), np.float32)
        c[:n] = coeffs[start:start + n]
        ang = np.zeros((chunk, 3), np.float32)
        ang[:n, 1] = yaw[start:start + n]
        rec = morph.reconstruct_rotation(jnp.asarray(c), fm,
                                         jnp.asarray(ang))
        # shape[:, :2] = 112 - xy*112, scaled to the canvas (the reference
        # hardcodes x3 for its 672 canvas; infer_bfmnet.py:218-221)
        shape = rec.face_shape
        xy = (112.0 - shape[..., :2] * 112.0) * scale
        z = shape[..., 2:3] * scale
        verts = jnp.concatenate([xy, z], axis=-1)
        colors = jnp.floor(jnp.clip(rec.face_color, 0.0, 255.0))
        imgs, _ = render_colors_auto(verts, colors, fm.tri,
                                     h=img_size, w=img_size, bb=bb)
        frames[start:start + n] = np.asarray(imgs[:n])
    return frames


def infer_bfmnet(cfg: Config, synthesizer, identity, audio_path_or_pcm,
                 out_dir: str = "output",
                 audio_path_for_mux: Optional[str] = None) -> np.ndarray:
    """audio -> coefficient sequence -> 672² mesh video
    (ref: infer_bfmnet.py:125-235)."""
    from voicepuppet_tpu.audio.io import load_audio
    from voicepuppet_tpu.pipeline.synthesize import splice_coeff_sequence
    from voicepuppet_tpu.utils.video import save_image_seq_video

    if isinstance(audio_path_or_pcm, str):
        pcm = load_audio(audio_path_or_pcm, cfg.mel.sample_rate)
        audio_path_for_mux = audio_path_for_mux or audio_path_or_pcm
    else:
        pcm = np.asarray(audio_path_or_pcm, np.float32)
    t = int(1 + pcm.shape[0] / cfg.frame_wav_scale)
    pcm_len = cfg.pcm_length_for_frames(t)
    if pcm.shape[0] < pcm_len:
        pcm = np.pad(pcm, (0, pcm_len - pcm.shape[0]))
    import jax.numpy as jnp
    exp = synthesizer._coeff_prog(jnp.asarray(pcm[None, :pcm_len]),
                                  jnp.asarray(_blink_ears(t)),
                                  jnp.asarray([t], np.int32))
    coeff_seq = np.asarray(splice_coeff_sequence(identity.bfmcoeff, exp))
    frames = render_coeff_video_frames(coeff_seq,
                                       synthesizer.face_model)
    os.makedirs(out_dir, exist_ok=True)
    save_image_seq_video(frames, os.path.join(out_dir, "bfmnet.mp4"),
                         cfg.frame_rate, audio_path_for_mux)
    return frames


def infer_pixrefer(cfg: Config, trainer, state, panel_paths: Sequence[str],
                   out_dir: str = "output") -> np.ndarray:
    """Run PixReferNet over a prepared 3-panel frame folder
    (ref: infer_pixrefer.py): frame 0 is the reference; every frame's
    rendered face drives the generator."""
    from voicepuppet_tpu.data.loaders import load_image, save_image
    s = cfg.pixrefer.img_size
    ref = load_image(panel_paths[0])
    face3d_ref = ref[:, s:2 * s, :]
    fg_ref = ref[:, :s, :] * ref[:, 2 * s:, :]
    frames = []
    os.makedirs(out_dir, exist_ok=True)
    for i, path in enumerate(panel_paths):
        panel = load_image(path)
        inputs = np.concatenate([face3d_ref, panel[:, s:2 * s, :]],
                                axis=-1)[None]
        fg_inputs = np.concatenate([fg_ref, np.zeros_like(fg_ref)],
                                   axis=-1)[None]
        targets = panel[:, :s, :][None]
        out, _ = trainer.infer(state, inputs, fg_inputs, targets)
        frame = np.asarray(out[0])
        frames.append(frame)
        save_image(os.path.join(out_dir, f"{i}.jpg"), frame)
    return np.stack(frames)


def infer_pixflow(cfg: Config, trainer, state, panel_paths: Sequence[str],
                  out_dir: str = "output") -> np.ndarray:
    """Run PixFlowNet over prepared panels (ref: infer_pixflow.py):
    reference fg + (ref, cur) rendered-face pairs -> fg frames."""
    from voicepuppet_tpu.data.loaders import load_image, save_image
    s = cfg.pixflow.img_size
    ref = load_image(panel_paths[0])
    ref_face = ref[:, s:2 * s, :]
    ref_fg = ref[:, :s, :] * ref[:, 2 * s:, :]
    frames = []
    os.makedirs(out_dir, exist_ok=True)
    for i, path in enumerate(panel_paths):
        panel = load_image(path)
        inputs = np.concatenate([ref_face, panel[:, s:2 * s, :]],
                                axis=-1)[None]
        fg_inputs = np.concatenate([ref_fg, np.zeros_like(ref_fg)],
                                   axis=-1)[None]
        out, _ = trainer.infer(state, inputs, fg_inputs)
        frame = np.asarray(out[0])
        frames.append(frame)
        save_image(os.path.join(out_dir, f"{i}.jpg"), frame)
    return np.stack(frames)


def infer_bfm_pixflow(cfg: Config, synthesizer, pixflow_trainer,
                      pixflow_state, identity, panel: np.ndarray,
                      audio_path_or_pcm, out_dir: str = "output"
                      ) -> np.ndarray:
    """audio + reference panel -> coefficients -> rendered faces ->
    PixFlowNet frames (ref: infer_bfm_pixflow.py)."""
    import jax.numpy as jnp
    from voicepuppet_tpu.audio.io import load_audio
    from voicepuppet_tpu.data.loaders import save_image
    from voicepuppet_tpu.pipeline.synthesize import splice_coeff_sequence

    s = cfg.pixflow.img_size
    if isinstance(audio_path_or_pcm, str):
        pcm = load_audio(audio_path_or_pcm, cfg.mel.sample_rate)
    else:
        pcm = np.asarray(audio_path_or_pcm, np.float32)
    exp = synthesizer.predict_expressions(pcm)
    coeff_seq = np.asarray(splice_coeff_sequence(identity.bfmcoeff, exp))
    rendered = render_coeff_video_frames(coeff_seq,
                                         synthesizer.face_model,
                                         img_size=s, yaw_shift=0.0)
    ref_face = panel[:, s:2 * s, :]
    ref_fg = panel[:, :s, :] * (panel[:, 2 * s:, :]
                                if panel.shape[1] >= 3 * s
                                else np.ones_like(panel[:, :s, :]))
    frames = []
    os.makedirs(out_dir, exist_ok=True)
    for i in range(rendered.shape[0]):
        cur = rendered[i].astype(np.float32) / 255.0
        inputs = np.concatenate([ref_face, cur], axis=-1)[None]
        fg_inputs = np.concatenate([ref_fg, np.zeros_like(ref_fg)],
                                   axis=-1)[None]
        out, _ = pixflow_trainer.infer(pixflow_state, inputs, fg_inputs)
        frame = np.asarray(out[0])
        frames.append(frame)
        save_image(os.path.join(out_dir, f"{i}.jpg"), frame)
    return np.stack(frames)


def infer_atvgnet(cfg: Config, atnet_trainer, atnet_state, vgnet_trainer,
                  vgnet_state, example_img: np.ndarray,
                  example_landmark: np.ndarray, audio_path_or_pcm,
                  pca_mean: np.ndarray, pca_component: np.ndarray,
                  out_dir: str = "output",
                  audio_path_for_mux: Optional[str] = None) -> np.ndarray:
    """The legacy ATVGNet end-to-end path (ref: voicepuppet/atvgnet/
    infer.py): audio -> ATNet landmark sequence -> VGNet video frames,
    muxed to mp4.

    ``example_landmark`` is the 136-dim landmark of the example image in
    pixel coords; it is renormed through the PCA enhancement exactly like
    the training stream (generator.py:198-203)."""
    import jax.numpy as jnp
    from voicepuppet_tpu.audio.frontend import MelFrontend
    from voicepuppet_tpu.audio.io import load_audio
    from voicepuppet_tpu.data.generators import pca_renorm
    from voicepuppet_tpu.utils.video import save_image_seq_video

    if isinstance(audio_path_or_pcm, str):
        pcm = load_audio(audio_path_or_pcm, cfg.mel.sample_rate)
        audio_path_for_mux = audio_path_for_mux or audio_path_or_pcm
    else:
        pcm = np.asarray(audio_path_or_pcm, np.float32)

    t = int(1 + pcm.shape[0] / cfg.frame_wav_scale)
    pcm_len = cfg.pcm_length_for_frames(t)
    if pcm.shape[0] < pcm_len:
        pcm = np.pad(pcm, (0, pcm_len - pcm.shape[0]))
    mfcc = np.asarray(MelFrontend(cfg.mel)(pcm[None, :pcm_len]))

    img_size = example_img.shape[0]
    lmk = (np.asarray(example_landmark, np.float64) / img_size - 0.5) * 2.0
    lmk = pca_renorm(lmk[None], pca_mean, pca_component)[0]

    ears = _blink_ears(t)
    poses = np.zeros((1, t, 3), np.float32)
    seq_len = np.asarray([t], np.int32)
    lmk_seq = np.asarray(atnet_trainer.infer(
        atnet_state, jnp.asarray(ears), jnp.asarray(poses),
        jnp.asarray(mfcc), jnp.asarray(lmk[None], jnp.float32),
        jnp.asarray(seq_len)))

    video, attention, color = vgnet_trainer.gen_eval.apply(
        {"params": vgnet_state.g_params,
         "batch_stats": vgnet_state.batch_stats["g"]},
        jnp.asarray(example_img[None], jnp.float32),
        jnp.asarray(lmk_seq, jnp.float32),
        jnp.asarray(lmk[None], jnp.float32), jnp.asarray(seq_len),
        train=False)
    frames = np.clip(np.asarray(video[0]) * 255.0, 0, 255).astype(np.uint8)
    os.makedirs(out_dir, exist_ok=True)
    save_image_seq_video(frames, os.path.join(out_dir, "atvg.mp4"),
                         cfg.frame_rate, audio_path_for_mux)
    return frames
