"""Data pipeline tests (pattern from generator/test_generator.py:8-121, but
self-contained on synthetic clips instead of a prepared GRID dataset)."""

import numpy as np
import pytest

from voicepuppet_tpu.config import Config
from voicepuppet_tpu.data import generators as gen


def make_clip(rng, frames=60, sr=16000, fps=25, silence_frames=5):
    """Synthetic clip: leading silence then a loud tone."""
    coeff = rng.randn(frames, 257).astype(np.float32)
    lmk = rng.rand(frames, 136).astype(np.float32) * 100 + 10
    n = frames * sr // fps
    pcm = np.zeros(n, np.float32)
    start = silence_frames * sr // fps
    t = np.arange(n - start)
    pcm[start:] = 0.5 * np.sin(2 * np.pi * 220 * t / sr).astype(np.float32)
    return {"bfmcoeff": coeff, "landmark": lmk, "pcm": pcm}


@pytest.fixture(scope="module")
def cfg():
    return Config()


def test_split_silence_finds_onset(cfg):
    rng = np.random.RandomState(0)
    clip = make_clip(rng, silence_frames=10)
    intervals = gen.split_silence(clip["pcm"], cfg.dataset.silence_top_db)
    assert intervals.shape[0] >= 1
    onset = intervals[0][0]
    true_onset = 10 * 640
    assert abs(onset - true_onset) < 2048  # within one analysis window


def test_split_silence_all_silent():
    assert gen.split_silence(np.zeros(16000, np.float32)).shape[0] == 0


def test_ear_compute_shape_and_range():
    rng = np.random.RandomState(1)
    lmk = rng.rand(10, 136).astype(np.float32) * 100
    ears = gen.ear_compute(lmk)
    assert ears.shape == (10, 1)
    assert np.isfinite(ears).all()


def test_bfmnet_stream_slices(cfg):
    rng = np.random.RandomState(2)
    src = gen.ArraySource([make_clip(rng, frames=60, silence_frames=4)])
    stream = iter(gen.BFMNetSampleStream(cfg, src))
    c, e, p, t = next(stream)
    assert t == 24
    assert c.shape == (24, 257)
    assert e.shape == (24, 1)
    # pcm window math (generator.py:478)
    assert p.shape[0] == cfg.pcm_length_for_frames(24)
    # id coeffs averaged across the clip: constant over frames
    assert np.allclose(c[:, :80].std(axis=0), 0.0, atol=1e-6)


def test_bfmnet_batcher_layout(cfg):
    rng = np.random.RandomState(3)
    src = gen.ArraySource([make_clip(rng, frames=120, silence_frames=2)])
    batcher = gen.BFMNetBatcher(cfg, src, batch_size=2, shuffle=False)
    coeff, ear, mfcc, seq_len = next(iter(batcher))
    t = 24
    assert coeff.shape == (2, t, 257)
    assert ear.shape == (2, t, 1)
    # mfcc stride-alignment invariant (test_generator.py:47)
    assert mfcc.shape == (2, t * cfg.frame_mfcc_scale, 80)
    assert (seq_len == t).all()


def make_panel_clip(rng, frames=6, size=64):
    """3-panel [H, 3W, 3] float images: target | render | alpha."""
    imgs = []
    for _ in range(frames):
        target = rng.rand(size, size, 3)
        render = rng.rand(size, size, 3)
        alpha = (rng.rand(size, size, 1) > 0.5).astype(np.float64)
        alpha = np.repeat(alpha, 3, axis=2)
        imgs.append(np.concatenate([target, render, alpha],
                                   axis=1).astype(np.float32))
    return {"images": np.stack(imgs), "frame_count": frames}


def test_pixrefer_stream_channels(cfg):
    import dataclasses
    cfg64 = dataclasses.replace(
        cfg, pixrefer=dataclasses.replace(cfg.pixrefer, img_size=64,
                                          crop_ratio=1.0))
    rng = np.random.RandomState(4)
    clip = make_panel_clip(rng, frames=4, size=64)
    stream = iter(gen.PixReferSampleStream(cfg64,
                                           gen.ArraySource([clip]), seed=0))
    inputs, fg_inputs, target, mask = next(stream)
    assert inputs.shape == (64, 64, 6)
    assert fg_inputs.shape == (64, 64, 6)
    assert target.shape == (64, 64, 3)
    assert mask.shape == (64, 64, 3)
    # with crop_ratio=1 the current-frame channels must match the panels
    # of some source frame exactly
    matched = False
    for i in range(4):
        panels = gen._split_panels(clip["images"][i], 64)
        if np.allclose(inputs[..., 3:6], panels[..., 3:6], atol=2e-2):
            np.testing.assert_allclose(target, panels[..., 0:3], atol=2e-2)
            np.testing.assert_allclose(mask, panels[..., 6:9], atol=2e-2)
            np.testing.assert_allclose(fg_inputs[..., 3:6],
                                       panels[..., 0:3] * panels[..., 6:9],
                                       atol=3e-2)
            matched = True
            break
    assert matched


def test_shuffle_buffer_is_permutation():
    items = list(range(100))
    out = list(gen._ShuffleBuffer(iter(items), bufsize=10, seed=1))
    assert sorted(out) == items
    assert out != items


def test_background_batches_union_and_termination():
    """BackgroundBatches merges per-worker iterators into one stream and
    terminates when all workers are exhausted."""
    from voicepuppet_tpu.data.generators import BackgroundBatches

    def make_iter(idx):
        return iter([(idx, j) for j in range(5)])

    bg = BackgroundBatches(make_iter, num_workers=3, prefetch=4)
    got = list(bg)
    assert len(got) == 15
    # every worker contributed every item
    assert sorted(got) == [(i, j) for i in range(3) for j in range(5)]


def test_background_batches_overlaps_slow_producer():
    """With 4 workers, a sleep-bound producer delivers ~4x faster than
    serial (threads overlap; decode releases the GIL the same way)."""
    import time
    from voicepuppet_tpu.data.generators import BackgroundBatches

    def make_iter(idx):
        def it():
            for j in range(4):
                time.sleep(0.05)
                yield (idx, j)
        return it()

    t0 = time.time()
    got = list(BackgroundBatches(make_iter, num_workers=4, prefetch=8))
    dt = time.time() - t0
    assert len(got) == 16
    # serial would be 16*0.05 = 0.8 s; overlapped ~0.2 s (+overhead)
    assert dt < 0.6
