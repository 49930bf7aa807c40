"""Streaming data pipelines feeding the trainers.

Re-architecture of generator/generator.py: the tf.data generator stack
becomes plain-python sample streams + a shuffle-buffer batcher, with the
log-mel extraction running on device per batch (the reference also maps
``extract_mfcc`` inside the input pipeline; generator.py:500-502).

Key reference semantics preserved:
  * the fixed 24-frame slicing with pcm windows ``hop*(24*5-1)+win`` at
    offsets ``i*24*640`` (generator.py:460-482)
  * leading-silence trim via an energy split at top_db=20
    (generator.py:461-464; librosa.effects.split semantics re-derived)
  * per-clip identity-coefficient averaging (generator.py:465-468 — note
    the reference's loop re-assigns every row each iteration; the net
    effect, all rows set to the clip mean, is what we implement)
  * the eye-aspect-ratio (EAR) features with ``1 - EAR`` (generator.py:82-96,
    450-451)
  * PixRefer pairing: random reference frame + random crop-resize aug of
    the 3-panel target|render|alpha images (generator.py:956-1019)

Deliberate divergence: the reference trims bfmcoeffs for leading silence
but slices the (untrimmed) ear array with the trimmed indices
(generator.py:450-482) — a misalignment bug; here ears are trimmed too.

Sources are pluggable: ``FileSource`` mirrors the reference's
"folder|frame_count" list files; ``ArraySource`` feeds in-memory clips
(tests / synthetic data).
"""

from __future__ import annotations

import math
import os
import random
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from voicepuppet_tpu.config import Config


# --------------------------------------------------------------------------
# feature math (ref: generator/generator.py:60-114)
# --------------------------------------------------------------------------

def ear_compute(landmarks: np.ndarray) -> np.ndarray:
    """Eye aspect ratio per frame from flattened 68-point landmarks [T, 136]
    (ref: generator.py:82-96).  Returns [T, 1]."""
    ps = np.asarray(landmarks, np.float64)

    def dist(i, j):
        return np.sqrt((ps[:, i] - ps[:, j]) ** 2
                       + (ps[:, i + 1] - ps[:, j + 1]) ** 2)

    ear1 = (dist(74, 82) + dist(76, 80)) / dist(72, 78)
    ear2 = (dist(86, 94) + dist(88, 92)) / dist(84, 90)
    return (((ear1 + ear2) / 2)[:, None]).astype(np.float32)


def split_bfmcoeff(coeff: np.ndarray):
    """[257] -> 6 groups (ref: generator.py:98-106)."""
    return (coeff[:80], coeff[80:144], coeff[144:224], coeff[224:227],
            coeff[227:254], coeff[254:])


def pose_compute(bfmcoeffs: np.ndarray) -> np.ndarray:
    """Per-frame euler angles (ref: generator.py:108-114)."""
    return np.asarray(bfmcoeffs)[:, 224:227]


def split_silence(pcm: np.ndarray, top_db: float = 20.0,
                  frame_length: int = 2048, hop_length: int = 512
                  ) -> np.ndarray:
    """Non-silent intervals [K, 2] in samples — librosa.effects.split
    semantics (used at generator.py:461): centered RMS frames, threshold at
    ``top_db`` below the max-RMS reference, contiguous runs mapped back to
    sample indices."""
    x = np.asarray(pcm, np.float32)
    if x.size == 0:
        return np.zeros((0, 2), np.int64)
    pad = frame_length // 2
    xp = np.pad(x, (pad, pad))
    n_frames = 1 + (len(xp) - frame_length) // hop_length
    idx = (np.arange(n_frames)[:, None] * hop_length
           + np.arange(frame_length)[None, :])
    frames = xp[idx]
    rms = np.sqrt(np.mean(frames.astype(np.float64) ** 2, axis=1))
    ref = rms.max()
    if ref <= 0:
        return np.zeros((0, 2), np.int64)
    db = 20.0 * np.log10(np.maximum(rms, 1e-10) / ref)
    non_silent = db > -top_db
    edges = np.diff(non_silent.astype(np.int8), prepend=0, append=0)
    starts = np.nonzero(edges == 1)[0]
    ends = np.nonzero(edges == -1)[0]
    intervals = np.stack([starts, ends], axis=1) * hop_length
    return np.minimum(intervals, len(x))


# --------------------------------------------------------------------------
# clip sources
# --------------------------------------------------------------------------

class ArraySource:
    """In-memory clips: list of dicts with keys among
    {'bfmcoeff' [T,257], 'landmark' [T,136], 'pcm' [S], 'images' [T,H,3W,3],
    'pose' [T,3]}."""

    def __init__(self, clips: Sequence[Dict[str, np.ndarray]]):
        self.clips = list(clips)

    def __iter__(self):
        return iter(self.clips)


class FileSource:
    """Reads the reference's "folder|frame_count" list files
    (ref: generator.py:428-448, datasets/makelist_bfm.py:15-45)."""

    def __init__(self, list_path: str, cfg: Config,
                 load_images: bool = False):
        self.cfg = cfg
        self.load_images = load_images
        with open(list_path) as f:
            self.entries = [line.strip().split("|") for line in f
                            if line.strip()]

    def __iter__(self):
        from voicepuppet_tpu.audio.io import load_audio
        from voicepuppet_tpu.data.loaders import (load_image,
                                                  load_landmarks,
                                                  load_text_array)
        d = self.cfg.dataset
        for folder, count in self.entries:
            count = int(count)
            clip: Dict[str, np.ndarray] = {"frame_count": count}
            bfm_path = os.path.join(folder, d.bfmcoeff_name)
            lmk_path = os.path.join(folder, d.landmark_name)
            wav_path = os.path.join(folder, d.wav_name)
            if os.path.exists(bfm_path):
                clip["bfmcoeff"] = load_text_array(bfm_path)
            if os.path.exists(lmk_path):
                clip["landmark"] = load_landmarks(lmk_path, norm_size=1.0)
            if os.path.exists(wav_path):
                clip["pcm"] = load_audio(wav_path,
                                         self.cfg.mel.sample_rate)
            if self.load_images:
                clip["image_paths"] = [
                    os.path.join(folder, f"{i}.jpg") for i in range(count)]
            yield clip


# --------------------------------------------------------------------------
# BFMNet stream (ref: generator.py:428-504)
# --------------------------------------------------------------------------

class BFMNetSampleStream:
    """Yields (bfmcoeff [T,257], ear [T,1], pcm [pcm_len], seq_len)."""

    def __init__(self, cfg: Config, source, seed: int = 0):
        self.cfg = cfg
        self.source = source
        self.rng = random.Random(seed)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, ...]]:
        cfg = self.cfg
        t = cfg.dataset.fixed_sequence_len  # 24 (generator.py:460)
        while True:
            clips = list(self.source)
            self.rng.shuffle(clips)
            if not clips:
                return
            yielded = False
            for clip in clips:
                if not all(k in clip for k in ("bfmcoeff", "landmark",
                                               "pcm")):
                    continue
                coeffs = np.array(clip["bfmcoeff"], np.float32)
                lmk = clip["landmark"]
                pcm = np.asarray(clip["pcm"], np.float32)
                count = coeffs.shape[0]
                if lmk.shape[0] != count or count <= 0:
                    continue
                ear = 1.0 - ear_compute(lmk)

                intervals = split_silence(pcm,
                                          cfg.dataset.silence_top_db)
                if intervals.shape[0] == 0:
                    continue
                start = int(intervals[0][0])
                sil_rm = start // cfg.frame_wav_scale
                pcm = pcm[start:]
                coeffs = coeffs[sil_rm:]
                ear = ear[sil_rm:]  # divergence: reference forgets this
                coeffs[:, :80] = coeffs[:, :80].mean(0, keepdims=True)

                count = count - sil_rm
                pcm_len = cfg.pcm_length_for_frames(t)
                for i in range(count // t):
                    c_slice = coeffs[i * t:(i + 1) * t]
                    e_slice = ear[i * t:(i + 1) * t]
                    p_start = i * t * cfg.frame_wav_scale
                    if pcm.shape[0] < p_start + pcm_len:
                        pcm = np.pad(pcm, (0, p_start + pcm_len
                                           - pcm.shape[0]))
                    yield (c_slice, e_slice,
                           pcm[p_start:p_start + pcm_len], t)
                    yielded = True
            if not yielded:
                return


class _ShuffleBuffer:
    """tf.data.Dataset.shuffle(bufsize) equivalent."""

    def __init__(self, it, bufsize: int, seed: int = 0):
        self.it = iter(it)
        self.buf: List = []
        self.bufsize = max(1, bufsize)
        self.rng = random.Random(seed)

    def __iter__(self):
        for item in self.it:
            if len(self.buf) < self.bufsize:
                self.buf.append(item)
            else:
                j = self.rng.randrange(self.bufsize)
                out, self.buf[j] = self.buf[j], item
                yield out
        self.rng.shuffle(self.buf)
        yield from self.buf
        self.buf = []


class BFMNetBatcher:
    """Batches BFMNet samples and runs the mel frontend on device.

    Yields numpy/jax tuples ``(coeff [B,T,257], ear [B,T,1],
    mfcc [B,T*5,80], seq_len [B])`` — the trainer's batch layout
    (ref pipeline: generator.py:488-504)."""

    def __init__(self, cfg: Config, source, shuffle: bool = True,
                 seed: int = 0, batch_size: Optional[int] = None):
        self.cfg = cfg
        self.source = source
        self.shuffle = shuffle
        self.seed = seed
        self.batch_size = batch_size or cfg.bfmnet.batch_size
        from voicepuppet_tpu.audio.frontend import MelFrontend
        self._frontend = MelFrontend(cfg.mel)
        import jax
        self._mfcc = jax.jit(self._frontend.__call__)

    def __iter__(self):
        stream = BFMNetSampleStream(self.cfg, self.source, self.seed)
        it = iter(stream)
        if self.shuffle:
            it = iter(_ShuffleBuffer(it, self.cfg.dataset.shuffle_bufsize,
                                     self.seed))
        batch = []
        for sample in it:
            batch.append(sample)
            if len(batch) == self.batch_size:
                yield self._collate(batch)
                batch = []

    def _collate(self, batch):
        import numpy as np
        max_t = max(s[3] for s in batch)
        max_p = max(s[2].shape[0] for s in batch)
        coeff = np.zeros((len(batch), max_t, 257), np.float32)
        ear = np.zeros((len(batch), max_t, 1), np.float32)
        pcm = np.zeros((len(batch), max_p), np.float32)
        seq_len = np.zeros((len(batch),), np.int32)
        for i, (c, e, p, t) in enumerate(batch):
            coeff[i, :t] = c
            ear[i, :t] = e
            pcm[i, :p.shape[0]] = p
            seq_len[i] = t
        mfcc = np.asarray(self._mfcc(pcm))
        return coeff, ear, mfcc, seq_len


# --------------------------------------------------------------------------
# PixRefer stream (ref: generator.py:924-1040)
# --------------------------------------------------------------------------

def _random_crop_resize(img: np.ndarray, crop_ratio: float,
                        rng: random.Random) -> np.ndarray:
    """Random square crop in [crop_ratio, 1] of size, resized back
    (ref: generator.py:978-989 applied per 3-panel image)."""
    from PIL import Image
    s = img.shape[0]
    rsize = rng.randint(int(s * crop_ratio), s)
    rx = rng.randint(0, s - rsize)
    ry = rng.randint(0, s - rsize)
    # reference crops rows [rx:rsize+rx] and cols [ry:rsize+ry]
    crop = img[rx:rsize + rx, ry:rsize + ry, :]
    chans = []
    for c0 in range(0, crop.shape[2], 3):
        pil = Image.fromarray(
            (np.clip(crop[:, :, c0:c0 + 3], 0, 1) * 255).astype(np.uint8))
        pil = pil.resize((s, s), Image.BILINEAR)
        chans.append(np.asarray(pil, np.float32) / 255.0)
    return np.concatenate(chans, axis=2)


def _split_panels(img: np.ndarray, img_size: int) -> np.ndarray:
    """[H, 3W, 3] -> [H, W, 9] stacking target|render|alpha channelwise
    (ref: generator.py:984-987)."""
    return np.concatenate([img[:, :img_size, :],
                           img[:, img_size:2 * img_size, :],
                           img[:, 2 * img_size:, :]], axis=-1)


class PixReferSampleStream:
    """Yields (inputs [S,S,6], fg_inputs [S,S,6], target [S,S,3],
    mask [S,S,3]) — reference pairing (generator.py:956-1019): channels are
    (reference frame ⊕ current frame) for the rendered-face inputs and the
    masked-foreground inputs."""

    def __init__(self, cfg: Config, source, seed: int = 0):
        self.cfg = cfg
        self.source = source
        self.rng = random.Random(seed)

    def _load_frame(self, clip, idx):
        if "images" in clip:
            return np.asarray(clip["images"][idx], np.float32)
        from voicepuppet_tpu.data.loaders import load_image
        return load_image(clip["image_paths"][idx])

    def __iter__(self):
        cfg = self.cfg
        s = cfg.pixrefer.img_size
        while True:
            clips = list(self.source)
            self.rng.shuffle(clips)
            if not clips:
                return
            yielded = False
            for clip in clips:
                n = clip.get("frame_count",
                             len(clip.get("images",
                                          clip.get("image_paths", []))))
                if n <= 0:
                    continue
                for i in range(n):
                    rnd = self.rng.randrange(n)
                    ref = _split_panels(self._load_frame(clip, rnd), s)
                    ref = _random_crop_resize(ref, cfg.pixrefer.crop_ratio,
                                              self.rng)
                    cur = _split_panels(self._load_frame(clip, i), s)
                    cur = _random_crop_resize(cur, cfg.pixrefer.crop_ratio,
                                              self.rng)
                    pair = np.stack([ref, cur])           # [2, S, S, 9]
                    inputs = np.concatenate([pair[0, :, :, 3:6],
                                             pair[1, :, :, 3:6]], axis=-1)
                    targets = pair[:, :, :, 0:3]
                    masks = pair[:, :, :, 6:9]
                    fg = targets * masks
                    fg_inputs = np.concatenate([fg[0], fg[1]], axis=-1)
                    yield (inputs.astype(np.float32),
                           fg_inputs.astype(np.float32),
                           targets[1].astype(np.float32),
                           masks[1].astype(np.float32))
                    yielded = True
            if not yielded:
                return


class PixReferBatcher:
    def __init__(self, cfg: Config, source, shuffle: bool = True,
                 seed: int = 0, batch_size: Optional[int] = None):
        self.cfg = cfg
        self.source = source
        self.shuffle = shuffle
        self.seed = seed
        self.batch_size = batch_size or cfg.pixrefer.batch_size

    def __iter__(self):
        stream = PixReferSampleStream(self.cfg, self.source, self.seed)
        it = iter(stream)
        if self.shuffle:
            it = iter(_ShuffleBuffer(it, 100, self.seed))
        batch = []
        for sample in it:
            batch.append(sample)
            if len(batch) == self.batch_size:
                yield tuple(np.stack([b[k] for b in batch])
                            for k in range(4))
                batch = []


def prefetch_to_device(iterator, mesh=None, size: int = 2):
    """Double-buffered host->device pipeline: keeps ``size`` batches in
    flight so host IO hides behind device steps (the reference relies on
    tf.data's internal threads; SURVEY.md §5 'distributed backend')."""
    import collections
    import jax
    from voicepuppet_tpu.parallel.mesh import shard_batch

    queue = collections.deque()

    def put(batch):
        if mesh is not None:
            return shard_batch(batch, mesh)
        return jax.tree_util.tree_map(jax.device_put, batch)

    for batch in iterator:
        queue.append(put(batch))
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
