"""Audio frontend parity tests.

The oracle is an independent float64 NumPy STFT+mel implementation following
tf.signal's documented semantics (the reference pipeline's extract_mfcc,
generator/generator.py:60-80): periodic Hann, complete frames only, HTK mel
with DC bin zeroed, log(x + 1e-6).
"""

import numpy as np
import pytest

from voicepuppet_tpu.config import Config
from voicepuppet_tpu.audio.frontend import (MelFrontend, hann_window,
                                            linear_to_mel_weight_matrix)


def oracle_logmel(pcm, cfg):
    win, hop, nfft = cfg.win_length, cfg.hop_step, cfg.fft_length
    n = pcm.shape[-1]
    nf = 1 + (n - win) // hop
    window = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(win) / win)
    frames = np.stack([pcm[i * hop:i * hop + win] * window
                       for i in range(nf)])
    spec = np.abs(np.fft.rfft(frames, n=nfft, axis=-1))
    mel_mat = linear_to_mel_weight_matrix(
        cfg.num_mel_bins, nfft // 2 + 1, cfg.sample_rate,
        cfg.lower_edge_hertz, cfg.upper_edge_hertz).astype(np.float64)
    return np.log(spec @ mel_mat + 1e-6)


@pytest.fixture(scope="module")
def cfg():
    return Config()


def test_mel_matrix_properties(cfg):
    m = linear_to_mel_weight_matrix(80, 257, 16000, 80.0, 7600.0)
    assert m.shape == (257, 80)
    assert np.all(m[0] == 0.0)          # DC bin zeroed
    assert np.all(m >= 0.0)
    assert m.sum() > 0
    # each mel filter is a contiguous triangle
    col = m[:, 40]
    nz = np.nonzero(col)[0]
    assert np.all(np.diff(nz) == 1)


def test_frame_count_matches_stride_invariant(cfg):
    fe = MelFrontend(cfg.mel)
    for t in (1, 7, 24, 120):
        n = cfg.pcm_length_for_frames(t)
        assert fe.num_frames(n) == t * cfg.frame_mfcc_scale


def test_logmel_matches_oracle(cfg, rng):
    fe = MelFrontend(cfg.mel)
    t = 8
    pcm = rng.randn(2, cfg.pcm_length_for_frames(t)).astype(np.float32) * 0.1
    got = np.asarray(fe(pcm))
    want = np.stack([oracle_logmel(p.astype(np.float64), cfg.mel)
                     for p in pcm])
    assert got.shape == (2, t * 5, 80)
    # compare in linear mel domain (log amplifies f32 noise near the 1e-6
    # floor); 0.2% relative is well below feature scale
    np.testing.assert_allclose(np.exp(got), np.exp(want), rtol=2e-3,
                               atol=1e-5)
    np.testing.assert_allclose(got, want, atol=0.05)


def test_dft_matmul_matches_fft_path(cfg, rng):
    pcm = rng.randn(1, cfg.pcm_length_for_frames(4)).astype(np.float32)
    a = np.asarray(MelFrontend(cfg.mel, use_fft=False)(pcm))
    b = np.asarray(MelFrontend(cfg.mel, use_fft=True)(pcm))
    np.testing.assert_allclose(a, b, atol=0.05)


def test_hann_window_periodic():
    w = hann_window(512)
    assert w[0] == 0.0
    assert abs(w[256] - 1.0) < 1e-6
    # periodic (denominator N, not N-1): only one endpoint is zero
    assert w[-1] > 0.0
    assert np.isclose(w[-1], w[1])
