"""Certify the one-command asset converter (tools/convert_assets.py).

The end-to-end test fabricates a complete ``allmodels/``-shaped release —
BFM09 raw binaries in their real layouts (reusing the certified
test_bfm09_ingest writer), V2 TensorBundle checkpoints with the released
names (written by the TF-certified ``write_bundle``), the real-TF-written
``vgg_16.ckpt`` fixture, a frozen GraphDef with the full resnet_v1_50
Const set, and ``similarity_Lm3D_all.mat`` — then runs the sweep and
loads every produced artifact back through its consumer API.  Matches the
reference's asset contract: infer_bfmvid.py:46-50, 207-218;
train_pixrefer.py:80-92; utils/bfm_load_data.py:9-21, 45-129.
"""

import json
import os
import shutil

import numpy as np
import pytest

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "tf_binary")


def test_find_checkpoint_prefix(tmp_path):
    from voicepuppet_tpu.tools.convert_assets import find_checkpoint_prefix

    d = tmp_path / "ckpt_bfmnet"
    d.mkdir()
    for step in (1000, 65000):
        (d / f"bfmnet-{step}.index").write_bytes(b"")
        (d / f"bfmnet-{step}.data-00000-of-00001").write_bytes(b"")
    got = find_checkpoint_prefix(str(tmp_path), "bfmnet")
    assert got == str(d / "bfmnet-65000")  # highest step wins

    v1 = tmp_path / "ckpt_pixrefer"
    v1.mkdir()
    (v1 / "pixrefernet-20000").write_bytes(b"x")  # V1 single file
    assert find_checkpoint_prefix(str(tmp_path), "pixrefernet") \
        == str(v1 / "pixrefernet-20000")

    assert find_checkpoint_prefix(str(tmp_path), "atnet") is None


def test_main_on_empty_dir_reports_all_missing(tmp_path):
    from voicepuppet_tpu.tools import convert_assets as ca

    assets = tmp_path / "allmodels"
    assets.mkdir()
    out = tmp_path / "converted"
    rc = ca.main(["--assets_dir", str(assets), "--out_dir", str(out)])
    assert rc == 0  # absent assets are not a failure
    with open(out / "manifest.json") as f:
        manifest = json.load(f)
    assert set(manifest) == {"bfm", "lm3d", "bfmnet_ckpt", "pixrefer_ckpt",
                             "vgg16_ckpt", "rnet_pb", "seg_checkpoint",
                             "matting_checkpoint"}
    assert all(v["status"] == "missing" for v in manifest.values())


def test_broken_asset_fails_loudly_in_manifest(tmp_path):
    """A present-but-unparseable asset lands as ``failed`` (exit 1), never
    as a silently-skipped conversion."""
    from voicepuppet_tpu.tools import convert_assets as ca

    assets = tmp_path / "allmodels"
    assets.mkdir()
    (assets / "FaceReconModel.pb").write_bytes(b"\x01\x02not a graphdef")
    out = tmp_path / "converted"
    rc = ca.main(["--assets_dir", str(assets), "--out_dir", str(out)])
    assert rc == 1
    with open(out / "manifest.json") as f:
        manifest = json.load(f)
    assert manifest["rnet_pb"]["status"] == "failed"
    assert "error" in manifest["rnet_pb"]


def test_resolve_lm3d_prefers_converted_npy(tmp_path):
    from voicepuppet_tpu.tools.bfm_tools import resolve_lm3d

    lm = np.arange(15, dtype=np.float64).reshape(5, 3)
    np.save(tmp_path / "lm3d.npy", lm)
    np.testing.assert_array_equal(resolve_lm3d(str(tmp_path)), lm)

    np.save(tmp_path / "lm3d.npy", np.zeros((4, 2)))
    with pytest.raises(ValueError, match="expected"):
        resolve_lm3d(str(tmp_path))


def test_vgg_load_weights_strict_rejects_partial_npz(tmp_path):
    """A truncated/mis-shaped vgg16_weights.npz fails loudly instead of
    silently training the perceptual loss on random init."""
    import jax
    import jax.numpy as jnp
    from voicepuppet_tpu.models.vgg import VGG16Features, load_weights

    model = VGG16Features(widths=(4, 8, 12, 16))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3)))["params"]
    path = tmp_path / "vgg16_weights.npz"
    np.savez(path, conv1_1_kernel=np.zeros((3, 3, 3, 4), np.float32))
    with pytest.raises(ValueError, match="absent or mis-shaped"):
        load_weights(str(path), params)
    assert load_weights(str(path), params, strict=False) is not None


def _tiny_cfg():
    import dataclasses
    from voicepuppet_tpu.config import Config

    base = Config()
    return dataclasses.replace(
        base,
        bfmnet=dataclasses.replace(
            base.bfmnet, backbone_width_mult=0.25,
            thinresnet_output_channels=32, encode_embedding_size=32,
            rnn_hidden_size=32),
        pixrefer=dataclasses.replace(base.pixrefer, ngf=4, ndf=4,
                                     img_size=256))


def _rows_to_arrays(rows, variables):
    from voicepuppet_tpu.tools import tf_checkpoint as tfc

    arrays = {}
    for tf_name, coll, path, transform in rows:
        val = np.asarray(tfc._get(variables[coll], path))
        arrays[tf_name] = transform(val) if transform else val
    return arrays


def _encode_graphdef(arrays):
    """Frozen-GraphDef writer (list-join variant of test_tf_bundle's
    independent encoder — the resnet50 Const set is ~100 MB, so quadratic
    bytes-concat is not an option here)."""
    from voicepuppet_tpu.tools import tf_bundle as tb

    nodes = []
    for name, arr in arrays.items():
        arr = np.asarray(arr)
        tensor = tb._encode_field(1, 0, tb._encode_varint(
            tb._DTYPE_ENUM[arr.dtype]))
        tensor += tb._encode_bytes_field(2, tb._encode_shape(arr.shape))
        tensor += tb._encode_bytes_field(4, arr.astype(
            arr.dtype.newbyteorder("<"), copy=False).tobytes())
        attr_value = tb._encode_bytes_field(8, tensor)
        attr = tb._encode_bytes_field(1, b"value") \
            + tb._encode_bytes_field(2, attr_value)
        node = tb._encode_bytes_field(1, name.encode()) \
            + tb._encode_bytes_field(2, b"Const") \
            + tb._encode_bytes_field(5, attr)
        nodes.append(tb._encode_bytes_field(1, node))
    return b"".join(nodes)


@pytest.mark.slow
def test_convert_all_end_to_end(tmp_path):
    import jax
    import jax.numpy as jnp
    from scipy.io import savemat
    from test_bfm09_ingest import _write_fixture
    from voicepuppet_tpu.models import pixrefer as px
    from voicepuppet_tpu.models.bfmnet import BFMNet
    from voicepuppet_tpu.pipeline.rnet import (_rnet_name_rows, init_rnet,
                                               load_rnet_npz)
    from voicepuppet_tpu.tools import convert_assets as ca
    from voicepuppet_tpu.tools import tf_bundle as tb
    from voicepuppet_tpu.tools import tf_checkpoint as tfc

    cfg = _tiny_cfg()
    rng = np.random.RandomState(0)
    assets = tmp_path / "allmodels"
    assets.mkdir()
    out = tmp_path / "converted"

    # --- fabricate the release ---
    _write_fixture(str(assets), rng)  # BFM09 raw binaries, real layouts
    savemat(str(assets / "similarity_Lm3D_all.mat"),
            {"lm": rng.rand(68, 3) * 2 - 1})

    t = 4
    key = jax.random.PRNGKey(0)
    bfm_vars = BFMNet(cfg.bfmnet).init(
        {"params": key, "dropout": key}, jnp.zeros((1, t, 1)),
        jnp.zeros((1, t * 5, 80)), jnp.full((1,), t, jnp.int32),
        train=False)
    bfm_rows = tfc.bfmnet_name_map() + tfc._shortcut_rows(bfm_vars)
    bfm_arrays = _rows_to_arrays(bfm_rows, bfm_vars)
    bfm_arrays["global_step"] = np.asarray(65000, np.int64)
    tb.write_bundle(bfm_arrays, str(assets / "ckpt_bfmnet" / "bfmnet-65000"))

    s = cfg.pixrefer.img_size
    gv = px.PixReferNet(cfg.pixrefer).init(
        key, jnp.zeros((1, s, s, 6)), jnp.zeros((1, s, s, 6)),
        jnp.zeros((1, s, s, 3)))
    dv = px.Discriminator(cfg.pixrefer.ndf).init(
        jax.random.fold_in(key, 1), jnp.zeros((1, s, s, 3)),
        jnp.zeros((1, s, s, 3)))
    px_arrays = {**_rows_to_arrays(tfc.pixrefer_generator_name_map(), gv),
                 **_rows_to_arrays(tfc.pixrefer_discriminator_name_map(),
                                   dv)}
    tb.write_bundle(px_arrays,
                    str(assets / "ckpt_pixrefer" / "pixrefernet-20000"))

    vgg_dir = assets / "vgg"
    vgg_dir.mkdir()
    shutil.copyfile(os.path.join(FIX, "vgg_slim", "vgg_16.ckpt"),
                    str(vgg_dir / "vgg_16.ckpt"))

    _, rnet_vars = init_rnet()
    rnet_arrays = {tf_name: np.asarray(tfc._get(rnet_vars[coll], path))
                   for tf_name, coll, path in _rnet_name_rows()}
    (assets / "FaceReconModel.pb").write_bytes(
        _encode_graphdef(rnet_arrays))

    import torch
    from voicepuppet_tpu.tools.models_torch import (DIMMatting,
                                                    UnetMobilenetV2)
    torch.save({"state_dict": UnetMobilenetV2().state_dict()},
               str(assets / "mobilenetV2_model_checkpoint_metric.pth"))
    # the released BEST_checkpoint.tar pickles the whole DataParallel-
    # wrapped module (make_data_from_GRID.py:510-513) — mirror that layout
    import torch.nn as torch_nn
    torch.save({"model": torch_nn.DataParallel(DIMMatting())},
               str(assets / "BEST_checkpoint.tar"))

    # --- sweep ---
    manifest = ca.convert_all(str(assets), str(out), cfg=cfg)
    assert {k: v["status"] for k, v in manifest.items()} == {
        "bfm": "converted", "lm3d": "converted",
        "bfmnet_ckpt": "converted", "pixrefer_ckpt": "converted",
        "vgg16_ckpt": "converted", "rnet_pb": "converted",
        "seg_checkpoint": "validated",
        "matting_checkpoint": "validated"}, manifest

    # --- every artifact loads back through its consumer API ---
    from voicepuppet_tpu.face3d.bfm import load_bfm
    model = load_bfm(str(out))
    assert manifest["bfm"]["num_vertices"] == model.num_vertices

    lm3d = np.load(out / ca.LM3D_NPY)
    assert lm3d.shape == (5, 3)

    zeros = jax.tree_util.tree_map(lambda x: x * 0.0, dict(bfm_vars))
    back, _, missing = tfc.load_bfmnet_npz(str(out / ca.BFMNET_NPZ), zeros)
    assert not missing, missing[:5]
    probe = ("mfcc_encoder", "MfccNet_0", "Conv_0", "kernel")
    np.testing.assert_array_equal(
        np.asarray(tfc._get(back["params"], probe)),
        np.asarray(tfc._get(bfm_vars["params"], probe)))

    gz = jax.tree_util.tree_map(lambda x: x * 0.0, dict(gv))
    gback, _, gmissing = tfc.load_npz(str(out / ca.PIXREFER_G_NPZ), gz,
                                      tfc.pixrefer_generator_name_map())
    assert not gmissing, gmissing[:5]
    gprobe = ("generator", "encoder_1", "Conv_0", "kernel")
    np.testing.assert_array_equal(
        np.asarray(tfc._get(gback["params"], gprobe)),
        np.asarray(tfc._get(gv["params"], gprobe)))
    assert os.path.exists(out / ca.PIXREFER_D_NPZ)

    from voicepuppet_tpu.models.vgg import VGG16Features, load_weights
    vgg_model = VGG16Features(widths=(4, 8, 12, 16))  # fixture widths
    vgg_params = vgg_model.init(key, jnp.zeros((1, 32, 32, 3)))["params"]
    vgg_params = load_weights(str(out / ca.VGG_NPZ), vgg_params)
    np.testing.assert_array_equal(
        np.asarray(vgg_params["conv3_3"]["kernel"]),
        tb.read_checkpoint(str(vgg_dir / "vgg_16.ckpt"))
        ["vgg_16/conv3/conv3_3/weights"])

    rzeros = jax.tree_util.tree_map(lambda x: x * 0.0, dict(rnet_vars))
    rback, _, rmissing = load_rnet_npz(str(out / ca.RNET_NPZ), rzeros)
    assert not rmissing, rmissing[:5]
    np.testing.assert_array_equal(
        np.asarray(rback["params"]["conv1"]["conv"]["kernel"]),
        np.asarray(rnet_vars["params"]["conv1"]["conv"]["kernel"]))

    # the synthesize entry point composes the converted npz pair directly
    from voicepuppet_tpu.pipeline.synthesize import SynthesisAssets
    sbfm, sg = SynthesisAssets.load_npz_weights(
        cfg, str(out / ca.BFMNET_NPZ), str(out / ca.PIXREFER_G_NPZ))
    np.testing.assert_array_equal(
        np.asarray(tfc._get(sbfm["params"], probe)),
        np.asarray(tfc._get(bfm_vars["params"], probe)))
    np.testing.assert_array_equal(
        np.asarray(tfc._get(sg, gprobe)),
        np.asarray(tfc._get(gv["params"], gprobe)))

    # ...and the raw released checkpoints compose into a Synthesizer with
    # the same weights (infer_bfmvid.py:207-218), no TF and no npz step
    from voicepuppet_tpu.face3d import bfm as bfm_mod
    synth = SynthesisAssets.from_tf_checkpoints(
        cfg, str(assets / "ckpt_bfmnet" / "bfmnet-65000"),
        str(assets / "ckpt_pixrefer" / "pixrefernet-20000"),
        face_model=bfm_mod.synthetic_bfm(num_theta=8, num_phi=8))
    np.testing.assert_array_equal(
        np.asarray(tfc._get(synth.bfm_vars["params"], probe)),
        np.asarray(tfc._get(bfm_vars["params"], probe)))
    np.testing.assert_array_equal(
        np.asarray(tfc._get(synth.g_params, gprobe)),
        np.asarray(tfc._get(gv["params"], gprobe)))

    # finally the synthesize CLI runs the full product path from the
    # converted npz weights (the BFM stays the synthetic stand-in here —
    # the miniature fixture BFM is raster-proven by test_bfm09_ingest)
    from PIL import Image
    from scipy.io import wavfile
    from voicepuppet_tpu.pipeline import synthesize as synth_cli

    s_out = tmp_path / "synth_out"
    yml = tmp_path / "params.yml"
    yml.write_text(f"""
default:
  model_dir: {tmp_path}/empty_models
  bfmnet:
    backbone_width_mult: 0.25
    thinresnet_output_channels: 32
    encode_embedding_size: 32
    rnn_hidden_size: 32
  pixrefer:
    ngf: 4
    ndf: 4
    img_size: {s}
""")
    panel = (rng.rand(s, 3 * s, 3) * 255).astype(np.uint8)
    Image.fromarray(panel).save(tmp_path / "panel.jpg")
    pcm = 0.3 * np.sin(2 * np.pi * 220 * np.arange(8000) / 16000.0)
    wavfile.write(tmp_path / "in.wav", 16000,
                  (pcm * 32767).astype(np.int16))
    synth_cli.main(["--config_path", str(yml),
                    "--bfmnet_npz", str(out / ca.BFMNET_NPZ),
                    "--pixrefer_npz", str(out / ca.PIXREFER_G_NPZ),
                    "--out_dir", str(s_out),
                    str(tmp_path / "panel.jpg"), str(tmp_path / "in.wav")])
    pngs = sorted(s_out.glob("*.png"))
    assert len(pngs) >= 10
    assert np.asarray(Image.open(pngs[0])).shape == (s, s, 3)
