"""End-to-end synthesis pipeline tests on synthetic assets (scaled down
for CPU): the full audio+image -> frames contract of infer_bfmvid.py."""

import dataclasses
import os

import numpy as np
import pytest

from voicepuppet_tpu.config import Config
from voicepuppet_tpu.pipeline import align
from voicepuppet_tpu.pipeline.synthesize import (SynthesisAssets,
                                                 Synthesizer,
                                                 splice_coeff_sequence,
                                                 synthetic_identity,
                                                 _paste_geometry)


S = 256


@pytest.fixture(scope="module")
def cfg():
    base = Config()
    return dataclasses.replace(
        base,
        bfmnet=dataclasses.replace(base.bfmnet, backbone_width_mult=0.25,
                                   thinresnet_output_channels=64,
                                   encode_embedding_size=64,
                                   rnn_hidden_size=64),
        pixrefer=dataclasses.replace(base.pixrefer, ngf=8, ndf=8,
                                     img_size=S))


@pytest.fixture(scope="module")
def demo(cfg):
    from voicepuppet_tpu.face3d import bfm as bfm_mod
    fmodel = bfm_mod.synthetic_bfm(num_theta=16, num_phi=16, seed=1)
    return SynthesisAssets.demo(cfg, face_model=fmodel)


def test_head_sway_sequence():
    ang = align.head_sway_angles(30)
    assert ang.shape == (30, 3)
    # yaw bounces inside ±(0.03 + one step)
    assert np.abs(ang[:, 1]).max() <= 0.035 + 1e-6
    assert not np.all(np.diff(ang[:, 1]) > 0)  # direction flipped


def test_splice_coeff_sequence():
    idc = np.arange(257, dtype=np.float32)[None]
    exp = np.zeros((1, 4, 64), np.float32) + 0.5
    out = np.asarray(splice_coeff_sequence(idc, exp))
    assert out.shape == (4, 257)
    np.testing.assert_array_equal(out[0, :80], idc[0, :80])
    np.testing.assert_array_equal(out[0, 80:144], 0.5)
    np.testing.assert_array_equal(out[0, 144:], idc[0, 144:])


def test_paste_geometry_clips():
    (ty0, ty1, tx0, tx1), (sy0, sy1, sx0, sx1) = _paste_geometry(
        out_hw=100, center_x=10, center_y=10, tx=0, ty=0, img_size=256)
    assert ty0 == 0 and tx0 == 0
    assert (ty1 - ty0) == (sy1 - sy0)
    assert sy0 == 40  # top 40 rows of the face fall off the canvas


def test_pos_similarity_recovers_transform():
    rng = np.random.RandomState(0)
    x3d = rng.randn(3, 5)
    s_true, t_true = 2.5, np.array([[10.0], [20.0]])
    xp = s_true * x3d[:2] + t_true
    t, s = align.pos_similarity(xp, x3d)
    np.testing.assert_allclose(s, s_true, rtol=1e-6)
    np.testing.assert_allclose(t, t_true, atol=1e-6)


@pytest.mark.slow
def test_full_synthesis_contract(cfg, demo, tmp_path):
    synth, identity = demo
    rng = np.random.RandomState(0)
    # 3-panel image: target | render | alpha
    panel = rng.rand(S, 3 * S, 3).astype(np.float32)
    # ~0.5 s of audio -> T ≈ 13 frames
    pcm = (0.3 * np.sin(2 * np.pi * 440 *
                        np.arange(8000) / 16000)).astype(np.float32)
    frames = synth.synthesize(panel, pcm, identity,
                              out_dir=str(tmp_path / "out"))
    t = int(1 + 8000 / cfg.frame_wav_scale)
    assert frames.shape == (t, S, S, 3)
    assert frames.dtype == np.uint8
    # PNG frames written
    assert os.path.exists(tmp_path / "out" / "0.png")
    assert os.path.exists(tmp_path / "out" / f"{t - 1}.png")
    # frames differ over time (head sway + audio drive the render)
    assert frames.std(axis=0).max() > 0


@pytest.mark.slow
def test_frame_chunking_pads_tail(cfg, demo):
    synth, identity = demo
    coeff = np.asarray(
        np.random.RandomState(1).randn(5, 257), np.float32) * 0.1
    face3d_ref = np.zeros((S, S, 3), np.float32)
    fg_ref = np.zeros((S, S, 3), np.float32)
    from voicepuppet_tpu.pipeline.synthesize import constant_background
    bg = constant_background(np.zeros((S, S, 3), np.float32))
    frames = synth.render_frames(coeff, identity, face3d_ref, fg_ref, bg)
    assert frames.shape[0] == 5  # chunk=16 padded, tail trimmed


@pytest.mark.slow
def test_tail_bucket_only_changes_tail_chunk(cfg, demo):
    """The tail bucket (render_frames pads the LAST chunk to a power of
    two instead of the full chunk — 7% of serving d2h bytes, docs/PERF.md
    "Tail bucket") must leave every FULL chunk bit-identical; tail-chunk
    values may shift only by the per-batch-BN pad-count dependence
    (reference training=True BN semantics), bounded tightly."""
    synth, identity = demo
    t = 21  # chunk=16 -> one full chunk + 5-frame tail (bucketed to 8)
    coeff = np.asarray(
        np.random.RandomState(3).randn(t, 257), np.float32) * 0.1
    ref = np.zeros((S, S, 3), np.float32)
    from voicepuppet_tpu.pipeline.synthesize import constant_background

    outs = {}
    for tb in (True, False):
        synth._tail_bucket = tb
        bg = constant_background(np.zeros((S, S, 3), np.float32))
        outs[tb] = synth.render_frames(coeff, identity, ref, ref, bg)
    synth._tail_bucket = True
    a, b = outs[True], outs[False]
    assert a.shape == b.shape == (t, S, S, 3)
    np.testing.assert_array_equal(a[:16], b[:16])
    tail_diff = np.abs(a[16:].astype(int) - b[16:].astype(int))
    assert tail_diff.mean() < 3.0


def test_sat_alignment_contract():
    from voicepuppet_tpu.pipeline.detect import (CenteredFaceProvider,
                                                 sat_alignment)
    rng = np.random.RandomState(0)
    img = rng.rand(300, 400, 3).astype(np.float32)
    out = sat_alignment(img, CenteredFaceProvider())
    assert out is not None
    image, lmk, cropped, lmk_c, cx, cy, ratio = out
    assert lmk.shape == (68, 2)
    assert cropped.shape == (224, 224, 3)
    assert lmk_c.shape == (136,)
    # center is inside the image and near the face center
    assert 0 <= cx < 400 and 0 <= cy < 300
    assert abs(cx - 200) < 60 and abs(cy - 150) < 60
    assert ratio > 0
    # cropped landmarks lie inside the crop
    pts = lmk_c.reshape(68, 2)
    assert pts.min() >= -1 and pts.max() <= 225


def test_file_landmark_provider(tmp_path):
    from voicepuppet_tpu.pipeline.detect import FileLandmarkProvider
    rows = np.random.RandomState(1).rand(3, 136) * 100
    np.savetxt(tmp_path / "landmark.txt", rows, fmt="%.3f", delimiter=",")
    p = FileLandmarkProvider.from_file(str(tmp_path / "landmark.txt"))
    a = p(None)
    b = p(None)
    assert a.shape == (68, 2)
    assert not np.allclose(a, b)
    p(None)
    assert p(None) is None  # exhausted


def test_yuv420_transfer_roundtrip():
    """The on-device YUV 4:2:0 d2h packing (1.5 B/px) reconstructs smooth
    content within codec-grade error; luma is near-exact."""
    import jax.numpy as jnp
    from voicepuppet_tpu.pipeline.synthesize import (_pack_yuv420,
                                                     _unpack_yuv420)
    s = 64
    xx, yy = np.meshgrid(np.linspace(0, 1, s), np.linspace(0, 1, s))
    img = np.stack([xx, yy, 0.5 + 0.3 * np.sin(xx * 4)],
                   -1)[None].astype(np.float32)
    packed = np.asarray(_pack_yuv420(jnp.asarray(img)))
    assert packed.shape == (1, s * s * 3 // 2)  # half the bytes of RGB
    rgb = _unpack_yuv420(packed, s)
    err = np.abs(rgb.astype(np.float32) - img * 255.0)
    assert err.mean() < 2.5
    assert err.max() < 10.0
    # luma plane alone is near-exact (chroma carries the subsampling loss)
    y_orig = (0.299 * img[..., 0] + 0.587 * img[..., 1]
              + 0.114 * img[..., 2]) * 255.0
    y_got = packed[:, :s * s].reshape(1, s, s).astype(np.float32)
    assert np.abs(y_got - y_orig).max() <= 1.0


@pytest.mark.slow
def test_sharded_synthesizer_multichip(cfg, demo):
    """Frame chunks shard across the 8-device mesh (inference sequence
    parallelism) and produce the same frames as single-device."""
    from voicepuppet_tpu.face3d import bfm as bfm_mod
    from voicepuppet_tpu.parallel.mesh import make_mesh
    from voicepuppet_tpu.pipeline.synthesize import (Synthesizer,
                                                     constant_background)
    import jax.numpy as jnp
    synthd, identity = demo
    mesh = make_mesh()
    # float32 + rgb8 on both sides: this test pins sharding equivalence of
    # the compute path; the bf16 serving default adds reduction-order noise
    # beyond the ±1 uint8 bound, and the yuv420 transfer amplifies ±1
    # rounding flips in chroma by the ~1.77 unpack gain
    synth1 = Synthesizer(cfg, synthd.face_model, synthd.bfm_vars,
                         synthd.g_params, chunk=synthd.chunk,
                         gan_dtype=jnp.float32, transfer_format="rgb8")
    # same chunk size: the GAN's per-batch BN (reference training=True
    # semantics) makes outputs depend on the chunk batch, so only the
    # sharding may differ (GSPMD reduces BN moments over the full chunk)
    synthN = Synthesizer(cfg, synth1.face_model, synth1.bfm_vars,
                         synth1.g_params, chunk=synth1.chunk, mesh=mesh,
                         gan_dtype=jnp.float32, transfer_format="rgb8")
    coeff = np.asarray(np.random.RandomState(2).randn(10, 257),
                       np.float32) * 0.1
    ref = np.zeros((S, S, 3), np.float32)
    bg = np.zeros((1, S, S, 3), np.float32)
    f1 = synth1.render_frames(coeff, identity, ref, ref, bg)
    fN = synthN.render_frames(coeff, identity, ref, ref, bg)
    assert fN.shape == f1.shape
    # same computation, sharded: allow ±1 uint8 for reduction-order noise
    diff = np.abs(f1.astype(int) - fN.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.05


@pytest.mark.slow
def test_from_checkpoints_roundtrip(cfg, tmp_path):
    """Save both trainers' states and rebuild a Synthesizer from the
    checkpoint directories (the two-checkpoint compose of
    infer_bfmvid.py:207-218)."""
    from voicepuppet_tpu.face3d import bfm as bfm_mod
    from voicepuppet_tpu.pipeline.synthesize import SynthesisAssets
    from voicepuppet_tpu.train.bfmnet_trainer import BFMNetTrainer
    from voicepuppet_tpu.train.checkpoint import CheckpointManager
    from voicepuppet_tpu.train.pixrefer_trainer import PixReferTrainer

    fmodel = bfm_mod.synthetic_bfm(num_theta=16, num_phi=16, seed=1)
    bt = BFMNetTrainer(cfg, fmodel)
    bs = bt.init_state(example_t=4)
    CheckpointManager(str(tmp_path / "bfm"), 2, 1).save(1, bs)
    pt = PixReferTrainer(cfg)
    ps = pt.init_state()
    CheckpointManager(str(tmp_path / "px"), 2, 1).save(1, ps)

    synth = SynthesisAssets.from_checkpoints(
        cfg, str(tmp_path / "bfm"), str(tmp_path / "px"),
        face_model=fmodel)
    import jax
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        synth.g_params, ps.g_params)


def test_sat_alignment_degenerate_landmarks():
    from voicepuppet_tpu.pipeline.detect import (CallableLandmarkProvider,
                                                 sat_alignment)
    img = np.zeros((100, 100, 3), np.float32)
    provider = CallableLandmarkProvider(
        lambda image: np.full((68, 2), 50.0))  # all-coincident points
    out = sat_alignment(img, provider)
    assert out is not None  # no crash, degenerate box clamped
    _, _, cropped, _, cx, cy, ratio = out
    assert cropped.shape == (224, 224, 3)
    assert np.isfinite(ratio) and ratio > 0


@pytest.mark.slow
def test_identity_bgr_flag_flips_rendered_colors(cfg, demo):
    import dataclasses as dc
    synth, identity = demo
    coeff = np.asarray(np.random.RandomState(7).randn(2, 257),
                       np.float32) * 0.1
    ref = np.zeros((S, S, 3), np.float32)
    from voicepuppet_tpu.pipeline.synthesize import constant_background
    bg = np.zeros((1, S, S, 3), np.float32)
    id_rgb = identity
    id_bgr = dc.replace(identity, colors_bgr=True)
    f_rgb = synth.render_frames(coeff, id_rgb, ref, ref, bg)
    f_bgr = synth.render_frames(coeff, id_bgr, ref, ref, bg)
    assert not np.array_equal(f_rgb, f_bgr)


@pytest.mark.slow
def test_golden_frame_regression():
    """Visual end-to-end regression: fixed-seed demo synthesis on CPU must
    reproduce the committed golden frame (tests/fixtures/golden_frame.png,
    generated by gen_golden_frame.py).  Loose tolerances pass benign
    numeric drift; a black, blank, alpha-inverted, or mis-composited frame
    fails (round-1 VERDICT weakness #7: nothing would catch a silently
    broken image)."""
    import sys
    fixtures = os.path.join(os.path.dirname(__file__), "fixtures")
    sys.path.insert(0, fixtures)
    try:
        from gen_golden_frame import synthesize_fixed
    finally:
        sys.path.remove(fixtures)
    from PIL import Image

    golden_path = os.path.join(fixtures, "golden_frame.png")
    golden = np.asarray(Image.open(golden_path)).astype(np.float32)
    frames = synthesize_fixed()
    got = frames[2].astype(np.float32)
    assert got.shape == golden.shape
    diff = np.abs(got - golden)
    assert diff.mean() < 4.0, f"mean |diff| {diff.mean():.2f}"
    assert (diff > 32).mean() < 0.01, (
        f"{(diff > 32).mean() * 100:.2f}% of pixels off by >32")
    # the frame must not be blank/black (golden has real dynamic range)
    assert got.std() > 10.0


@pytest.mark.slow
def test_spatial_partitioned_synthesizer(cfg, demo):
    """mesh_partition='spatial' shards the GAN's height dim over the
    8-device mesh (GSPMD conv halo exchanges) and matches the
    single-device output — the low-latency streaming serving mode."""
    import jax.numpy as jnp
    from voicepuppet_tpu.parallel.mesh import make_mesh
    from voicepuppet_tpu.pipeline.synthesize import Synthesizer

    synthd, identity = demo
    mesh = make_mesh()
    synth1 = Synthesizer(cfg, synthd.face_model, synthd.bfm_vars,
                         synthd.g_params, chunk=4,
                         gan_dtype=jnp.float32, transfer_format="rgb8")
    synthS = Synthesizer(cfg, synthd.face_model, synthd.bfm_vars,
                         synthd.g_params, chunk=4, mesh=mesh,
                         mesh_partition="spatial",
                         gan_dtype=jnp.float32, transfer_format="rgb8")
    assert synthS.chunk == 4  # spatial mode does NOT round chunk up
    coeff = np.asarray(np.random.RandomState(4).randn(4, 257),
                       np.float32) * 0.1
    ref = np.zeros((S, S, 3), np.float32)
    bg = np.zeros((1, S, S, 3), np.float32)
    f1 = synth1.render_frames(coeff, identity, ref, ref, bg)
    fS = synthS.render_frames(coeff, identity, ref, ref, bg)
    diff = np.abs(f1.astype(int) - fS.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.05


@pytest.mark.slow
def test_estimate_chunk_compute(demo):
    """The bench's weather-independent compute probe: K frame-program
    repeats inside one jit with a carried dependence (docs/PERF.md
    'Round-3 re-profile' methodology).  Pins that it runs on the small
    demo assets and returns a sane positive per-chunk time."""
    synth, identity = demo
    # NaN means "tunnel/scheduler jitter swamped this sample" by design
    # (synthesize.py returns it instead of fabricating a rate); on the
    # loaded one-core CI host a single k-window can be preempted, so
    # retry a few times rather than flake on one bad draw
    for _ in range(4):
        per_chunk = synth.estimate_chunk_compute(identity, k=3, repeats=2)
        if np.isfinite(per_chunk):
            break
    assert per_chunk > 0.0
    assert np.isfinite(per_chunk)
