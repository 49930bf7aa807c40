"""TensorBoard event-writer tests: TFRecord framing CRCs, proto encoding,
scalar/image roundtrip through the module's own reader, and the
MetricsLogger integration (reference observability surface,
train_pixrefer.py:101-131; VERDICT missing #4)."""

import glob
import io
import os
import struct

import numpy as np

from voicepuppet_tpu.utils.tb_writer import (TBEventWriter, crc32c,
                                             read_events)


def test_crc32c_known_vectors():
    # RFC 3720 / common test vectors for CRC32C (Castagnoli)
    assert crc32c(b"") == 0x0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA


def test_scalar_roundtrip(tmp_path):
    w = TBEventWriter(str(tmp_path))
    w.scalar("loss", 1.5, step=1)
    w.scalar("loss", 0.75, step=2)
    w.scalar("lr", 3e-4, step=2)
    w.close()
    events = read_events(w.path)
    # first record is the file_version header
    assert events[0] == (0, {})
    scalars = [(s, v) for s, v in events[1:]]
    assert scalars[0][0] == 1 and scalars[0][1]["loss"] == 1.5
    assert scalars[1][1]["loss"] == 0.75
    assert abs(scalars[2][1]["lr"] - 3e-4) < 1e-9


def test_image_roundtrip(tmp_path):
    from PIL import Image
    w = TBEventWriter(str(tmp_path))
    img = (np.random.RandomState(0).rand(16, 24, 3) * 255).astype(np.uint8)
    w.image("eval", img, step=5)
    w.close()
    events = read_events(w.path)
    step, values = events[1]
    assert step == 5
    png = values["eval"]
    decoded = np.asarray(Image.open(io.BytesIO(png)))
    np.testing.assert_array_equal(decoded, img)


def test_metrics_logger_writes_tb(tmp_path):
    from voicepuppet_tpu.train.metrics import MetricsLogger
    logger = MetricsLogger(str(tmp_path), "unit")
    logger.log(1, loss=2.0)
    logger.log_image(1, "grid", np.zeros((8, 8, 3), np.uint8))
    logger.close()
    files = glob.glob(str(tmp_path / "tb" / "unit" / "events.out.tfevents*"))
    assert len(files) == 1
    events = read_events(files[0])
    tags = set()
    for _, values in events:
        tags |= set(values)
    assert "loss" in tags and "grid" in tags
    # jsonl still written
    assert (tmp_path / "unit_metrics.jsonl").exists()


def test_histogram_roundtrip(tmp_path):
    """Histogram proto encodes min/max/num/sum/sum_squares + packed
    bucket arrays and parses back exactly (ref gradient histograms,
    train_pixflow.py:113-115)."""
    w = TBEventWriter(str(tmp_path))
    rng = np.random.RandomState(0)
    vals = rng.randn(1000).astype(np.float32)
    w.histogram("g/kernel", vals, step=7, bins=20)
    # degenerate cases: constant array, empty-after-nan-filter
    w.histogram("g/const", np.full((5,), 2.5), step=7)
    w.histogram("g/nan", np.full((3,), np.nan), step=7)
    w.close()
    events = read_events(w.path)
    step, values = events[1]
    assert step == 7
    h = values["g/kernel"]
    assert h["num"] == 1000
    assert abs(h["min"] - vals.min()) < 1e-7
    assert abs(h["max"] - vals.max()) < 1e-7
    assert abs(h["sum"] - float(vals.astype(np.float64).sum())) < 1e-4
    assert abs(h["sum_squares"]
               - float(np.square(vals.astype(np.float64)).sum())) < 1e-4
    assert len(h["bucket"]) == len(h["bucket_limit"]) == 20
    assert sum(h["bucket"]) == 1000
    # counts match an independent np.histogram
    counts, edges = np.histogram(vals.astype(np.float64), bins=20)
    np.testing.assert_array_equal(np.asarray(h["bucket"]), counts)
    np.testing.assert_allclose(np.asarray(h["bucket_limit"]), edges[1:])
    hc = read_events(w.path)[2][1]["g/const"]
    assert hc["num"] == 5 and hc["bucket"] == [5.0]
    hn = read_events(w.path)[3][1]["g/nan"]
    assert hn["num"] == 1  # nan-filtered -> zero placeholder


def test_metrics_logger_gradient_histograms(tmp_path):
    """maybe_log_histograms honors the summary cadence and the exclude
    filter (ref: train_atnet.py:98-100 skips BatchNorm vars)."""
    from voicepuppet_tpu.train.metrics import MetricsLogger
    logger = MetricsLogger(str(tmp_path), "unit", histogram_interval=100)
    grads = {"atnet": {"Dense_0": {"kernel": np.ones((4, 4)),
                                   "bias": np.zeros((4,))},
                       "BatchNorm_0": {"scale": np.ones((4,))}}}
    logger.maybe_log_histograms(50, grads)          # off-cadence: no-op
    logger.maybe_log_histograms(100, grads, exclude=("BatchNorm",))
    logger.close()
    files = glob.glob(str(tmp_path / "tb" / "unit" / "events.out.tfevents*"))
    events = read_events(files[0])
    tags = {}
    for step, values in events:
        for tag, v in values.items():
            tags[tag] = (step, v)
    assert "atnet/Dense_0/kernel/gradients" in tags
    assert tags["atnet/Dense_0/kernel/gradients"][0] == 100
    assert "atnet/Dense_0/bias/gradients" in tags
    assert not any("BatchNorm" in t for t in tags)
    h = tags["atnet/Dense_0/kernel/gradients"][1]
    assert h["num"] == 16 and sum(h["bucket"]) == 16
