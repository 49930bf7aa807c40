"""Tools / drivers / aux-stream tests."""

import os

import numpy as np
import pytest

from voicepuppet_tpu.config import Config
from voicepuppet_tpu.data import generators as gen
from voicepuppet_tpu.tools import makelist
from voicepuppet_tpu.tools.bfm_tools import save_obj


def test_makelist_split(tmp_path):
    # build 12 complete clips (landmark + bfmcoeff + wav, like the
    # reference's makelist_bfm.py:31-33 requires)
    def rows(n, cols):
        return "\n".join(",".join(["1.0"] * cols) for _ in range(n)) + "\n"

    for i in range(12):
        d = tmp_path / f"clip{i:02d}"
        d.mkdir()
        (d / "landmark.txt").write_text(rows(5, 136))
        (d / "bfmcoeff.txt").write_text(rows(5, 257))
        (d / "audio.wav").write_bytes(b"RIFF")
    # incomplete clips must be excluded: one missing the wav, one with
    # mismatched landmark/coeff row counts
    d = tmp_path / "clip_nowav"
    d.mkdir()
    (d / "landmark.txt").write_text(rows(5, 136))
    (d / "bfmcoeff.txt").write_text(rows(5, 257))
    d = tmp_path / "clip_mismatch"
    d.mkdir()
    (d / "landmark.txt").write_text(rows(5, 136))
    (d / "bfmcoeff.txt").write_text(rows(4, 257))
    (d / "audio.wav").write_bytes(b"RIFF")

    train = tmp_path / "lists" / "train.txt"
    ev = tmp_path / "lists" / "eval.txt"  # parent dir created by writer
    n_train, n_eval = makelist.write_dataset(str(tmp_path), str(train),
                                             str(ev), mode="bfm",
                                             train_by_eval=9)
    assert n_train + n_eval == 12
    assert n_eval == 1  # every 10th clip
    line = train.read_text().splitlines()[0]
    folder, count = line.split("|")
    assert count == "5"
    listed = train.read_text() + ev.read_text()
    assert "clip_nowav" not in listed
    assert "clip_mismatch" not in listed


def test_save_obj_roundtrip(tmp_path):
    v = np.random.RandomState(0).rand(4, 3)
    f = np.array([[1, 2, 3], [2, 3, 4]])
    c = np.random.RandomState(1).rand(4, 3)
    path = tmp_path / "mesh.obj"
    save_obj(str(path), v, f, c)
    lines = path.read_text().splitlines()
    assert sum(1 for l in lines if l.startswith("v ")) == 4
    assert sum(1 for l in lines if l.startswith("f ")) == 2


def test_interpolate_features_rate_change():
    feats = np.arange(100, dtype=np.float64)[:, None]
    out = gen.interpolate_features(feats, input_rate=50.0,
                                   output_rate=25.0)
    assert out.shape[0] == 50
    # downsampling a ramp keeps the ramp (x2 step)
    np.testing.assert_allclose(np.diff(out[:, 0]), 2.0, atol=1e-9)


def test_context_windows_shape_and_padding():
    feats = np.arange(12, dtype=np.float32).reshape(6, 2)
    win = gen.context_windows(feats)
    assert win.shape == (6, 8, 2)
    # first window: 4 zero rows then rows 0..3
    assert np.all(win[0, :4] == 0)
    np.testing.assert_array_equal(win[0, 4], feats[0])


def test_audio2exp_stream():
    cfg = Config()
    rng = np.random.RandomState(0)
    clip = {"bfmcoeff": rng.randn(50, 257).astype(np.float32),
            "pcm": rng.randn(50 * 640).astype(np.float32)}

    def fake_speech_fn(pcm, sr):
        t = len(pcm) // (2 * 128)
        return rng.rand(t, 29).astype(np.float32)

    stream = iter(gen.Audio2ExpSampleStream(cfg, gen.ArraySource([clip]),
                                            fake_speech_fn))
    coeff, windows, t = next(stream)
    assert t == 25
    assert coeff.shape == (25, 257)
    assert windows.shape == (25, 8, 29)


@pytest.mark.slow
def test_eval_grid_renders(tmp_path):
    from voicepuppet_tpu.face3d import bfm as bfm_mod
    from voicepuppet_tpu.utils.viz import plot_bfm_coeff_seq
    model = bfm_mod.synthetic_bfm(num_theta=12, num_phi=12, seed=0)
    coeff = bfm_mod.demo_coeff(model, batch=6, seed=1)
    pred = np.random.RandomState(2).randn(6, 64).astype(np.float32) * 0.1
    path = plot_bfm_coeff_seq(str(tmp_path), 100, coeff, pred, model,
                              cols=3, size=64)
    assert os.path.exists(path)
    from PIL import Image
    img = np.asarray(Image.open(path))
    assert img.shape == (2 * 2 * 64, 3 * 64, 3)  # 2 seq x 2 rows of 3
    assert img.sum() > 0


def test_landmark_stroke_drawing():
    from voicepuppet_tpu.utils.viz import draw_landmarks
    canvas = np.full((64, 64, 3), 255, np.uint8)
    lmk = np.random.RandomState(0).rand(68, 2) * 60 + 2
    out = draw_landmarks(canvas, lmk, (0, 255, 0))
    assert (out != 255).any()


@pytest.mark.slow
def test_infer_bfmnet_yaw_sweep_frames():
    from voicepuppet_tpu.face3d import bfm as bfm_mod
    from voicepuppet_tpu.pipeline.infer_drivers import (
        render_coeff_video_frames)
    model = bfm_mod.synthetic_bfm(num_theta=12, num_phi=12, seed=0)
    coeff = bfm_mod.demo_coeff(model, batch=5, seed=1)
    frames = render_coeff_video_frames(coeff, model, img_size=96,
                                       yaw_shift=0.2, chunk=4)
    assert frames.shape == (5, 96, 96, 3)
    # yaw sweep: consecutive frames differ
    assert (frames[0] != frames[4]).any()


def test_prepare_schedule_step1(tmp_path):
    from voicepuppet_tpu.tools.prepare_dataset import Schedule
    cfg = Config()
    d = tmp_path / "clip"
    d.mkdir()
    rng = np.random.RandomState(0)
    lmk = rng.rand(10, 136) * 100 + 10
    np.savetxt(d / "landmark.txt", lmk, fmt="%.3f", delimiter=",")
    sched = Schedule(cfg)
    n = sched.run(1, str(tmp_path), str(tmp_path))
    assert n == 1
    ears = np.loadtxt(d / "ear.txt")
    assert ears.shape == (10,)


@pytest.mark.slow
def test_prepare_panels_rescales_landmarks_and_renders_at_size(tmp_path):
    """Panel step: the fallback alpha hull must track the landmarks after
    the image is resized from its original resolution to img_size, and the
    face panel must be rendered at img_size natively."""
    from PIL import Image
    from voicepuppet_tpu.tools.prepare_dataset import Schedule

    cfg = Config()
    src = tmp_path / "src"
    clip = src / "clip0"
    clip.mkdir(parents=True)
    rng = np.random.RandomState(0)
    t, orig = 2, 100
    for i in range(t):
        Image.fromarray((rng.rand(orig, orig, 3) * 255).astype(
            np.uint8)).save(clip / f"{i}.jpg")
    # landmarks: a hull in the top-left quadrant of the ORIGINAL 100px frame
    base = rng.rand(68, 2) * 30 + 10
    lmk = np.tile(base.reshape(1, -1), (t, 1))
    np.savetxt(clip / "landmark.txt", lmk, fmt="%.3f", delimiter=",")
    coeffs = rng.randn(t, 257).astype(np.float32) * 0.1
    np.savetxt(clip / "bfmcoeff.txt", coeffs, fmt="%.6f", delimiter=",")

    sched = Schedule(cfg)
    dst = tmp_path / "dst"
    size = 64
    n = sched._make_panels(str(src), str(dst), img_size=size)
    assert n == 1
    panel = np.asarray(Image.open(dst / "clip0" / "0.jpg"))
    assert panel.shape == (size, size * 3, 3)
    alpha = panel[:, 2 * size:, 0].astype(np.float32) / 255.0
    ys, xs = np.nonzero(alpha > 0.5)
    assert len(ys) > 0
    # hull spanned [10,40) of 100px -> [6.4,25.6) of 64px: wholly inside
    # the top-left quadrant once rescaled (it would sit at [10,40) and
    # leak past 32 if the landmarks were NOT rescaled)
    assert ys.max() < size // 2 and xs.max() < size // 2


def test_prepare_schedule_steps_3_4_need_providers(tmp_path):
    from voicepuppet_tpu.tools.prepare_dataset import Schedule
    sched = Schedule(Config())
    with pytest.raises(RuntimeError, match="landmark provider"):
        sched.run(3, str(tmp_path), str(tmp_path))
    with pytest.raises(RuntimeError, match="identity provider"):
        sched.run(4, str(tmp_path), str(tmp_path))


@pytest.mark.slow
def test_torch_prep_models_forward():
    import torch
    from voicepuppet_tpu.tools.models_torch import (DIMMatting,
                                                    UnetMobilenetV2,
                                                    predict_mask)
    seg = UnetMobilenetV2().eval()
    x = np.random.RandomState(0).rand(64, 64, 3).astype(np.float32)
    prob = predict_mask(seg, x, size=64)
    assert prob.shape == (64, 64)
    assert 0.0 <= prob.min() and prob.max() <= 1.0

    dim = DIMMatting().eval()
    rgb = torch.rand(1, 3, 32, 32)
    tm = torch.rand(1, 1, 32, 32)
    with torch.no_grad():
        alpha = dim(rgb, tm)
    assert alpha.shape == (1, 32, 32)
    assert float(alpha.min()) >= 0.0 and float(alpha.max()) <= 1.0


def test_thinresnet_backbone_shapes():
    import jax
    import jax.numpy as jnp
    from voicepuppet_tpu.models.backbone import ThinResnet
    net = ThinResnet(output_channels=64)
    x = jnp.zeros((1, 40, 80, 1))
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    y = net.apply(variables, x, train=False)
    # time mean-pooled away; freq 80 -> /2/2/2/2 = 5... with the [2,2]
    # stage-4 strides: 80 -> 40 -> 20 -> 10(x2 in s4) -> 5
    assert y.ndim == 3 and y.shape[0] == 1 and y.shape[-1] == 64


@pytest.mark.slow
def test_infer_atvgnet_end_to_end():
    import dataclasses
    from voicepuppet_tpu.config import Config
    from voicepuppet_tpu.models.atnet import synthetic_pca_component
    from voicepuppet_tpu.pipeline.infer_drivers import infer_atvgnet
    from voicepuppet_tpu.train.atnet_trainer import ATNetTrainer
    from voicepuppet_tpu.train.vgnet_trainer import VGNetTrainer
    import tempfile

    base = Config()
    cfg = dataclasses.replace(
        base,
        atnet=dataclasses.replace(base.atnet,
                                  thinresnet_output_channels=32,
                                  encode_embedding_size=32,
                                  rnn_hidden_size=32),
        vgnet=dataclasses.replace(base.vgnet, img_size=64))
    comp = synthetic_pca_component(6)
    at = ATNetTrainer(cfg, comp, width_mult=0.25)
    at_state = at.init_state(example_t=4)
    vg = VGNetTrainer(cfg)
    vg_state = vg.init_state(example_t=4)

    rng = np.random.RandomState(0)
    example_img = rng.rand(64, 64, 3).astype(np.float32)
    example_lmk = rng.rand(136).astype(np.float32) * 64
    pcm = (0.3 * np.sin(2 * np.pi * 220 *
                        np.arange(640 * 6) / 16000)).astype(np.float32)
    with tempfile.TemporaryDirectory() as td:
        frames = infer_atvgnet(cfg, at, at_state, vg, vg_state,
                               example_img, example_lmk, pcm,
                               pca_mean=np.zeros(136), pca_component=comp.T,
                               out_dir=td)
    assert frames.shape[0] == 7  # 1 + 6*640/640
    assert frames.shape[1:] == (64, 64, 3)


def test_tf_checkpoint_mapping_roundtrip(tmp_path):
    """Export a (small) BFMNet variable tree under the reference TF names
    and load it back: every mapped tensor must round-trip exactly —
    validates the name map is shape-consistent and bijective."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from voicepuppet_tpu.config import Config
    from voicepuppet_tpu.models.bfmnet import BFMNet
    from voicepuppet_tpu.tools import tf_checkpoint as tfc

    base = Config()
    cfg = dataclasses.replace(base.bfmnet, backbone_width_mult=0.25,
                              thinresnet_output_channels=32,
                              encode_embedding_size=32, rnn_hidden_size=32)
    model = BFMNet(cfg)
    rng = jax.random.PRNGKey(0)
    t = 4
    variables = model.init(
        {"params": rng, "dropout": rng}, jnp.zeros((1, t, 1)),
        jnp.zeros((1, t * 5, 80)), jnp.full((1,), t, jnp.int32),
        train=False)

    path = str(tmp_path / "bfmnet_tf.npz")
    tfc.export_bfmnet_npz(variables, path)

    # perturb a fresh tree, load the export back, compare mapped leaves
    variables2 = jax.tree_util.tree_map(lambda x: x * 0.0, dict(variables))
    out, loaded, missing = tfc.load_bfmnet_npz(path, variables)
    assert not missing, missing[:5]
    assert len(loaded) > 100  # the full backbone is covered
    for tf_name, coll, p, transform in (tfc.bfmnet_name_map()
                                        + tfc._shortcut_rows(variables)):
        want = tfc._get(variables[coll], p)
        got = tfc._get(out[coll], p)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.slow
def test_unet_resnet_forward():
    import torch
    from voicepuppet_tpu.tools.models_torch import UnetResNet
    m = UnetResNet(model="resnet34").eval()
    with torch.no_grad():
        y = m(torch.rand(1, 3, 64, 64))
    assert tuple(y.shape) == (1, 1, 64, 64)


def test_pixrefer_checkpoint_mapping_roundtrip(tmp_path):
    """PixRefer generator+discriminator TF-name mapping round-trips:
    every mapped leaf is covered, shapes agree, transposes invert."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from voicepuppet_tpu.config import Config
    from voicepuppet_tpu.models import pixrefer as px
    from voicepuppet_tpu.tools import tf_checkpoint as tfc

    cfg = dataclasses.replace(Config().pixrefer, ngf=4, ndf=4)
    g = px.PixReferNet(cfg)
    gv = g.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 6)),
                jnp.zeros((1, 256, 256, 6)), jnp.zeros((1, 256, 256, 3)))
    rows = tfc.pixrefer_generator_name_map()
    path = str(tmp_path / "g.npz")
    tfc.export_npz(gv, rows, path)
    out, loaded, missing = tfc.load_npz(path, gv, rows)
    assert not missing, missing[:4]
    # every generator param leaf is covered by the mapping
    n_leaves = len(jax.tree_util.tree_leaves(gv["params"]))
    assert len(loaded) == n_leaves
    for tf_name, coll, p, tr in rows:
        np.testing.assert_array_equal(
            np.asarray(tfc._get(out[coll], p)),
            np.asarray(tfc._get(gv[coll], p)))

    d = px.Discriminator(4)
    dv = d.init(jax.random.PRNGKey(1), jnp.zeros((1, 256, 256, 3)),
                jnp.zeros((1, 256, 256, 3)))
    drows = tfc.pixrefer_discriminator_name_map()
    dpath = str(tmp_path / "d.npz")
    tfc.export_npz(dv, drows, dpath)
    out, loaded, missing = tfc.load_npz(dpath, dv, drows)
    assert not missing
    assert len(loaded) == len(jax.tree_util.tree_leaves(dv["params"]))
