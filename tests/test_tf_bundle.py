"""Certify the pure-NumPy TF binary readers (tools/tf_bundle.py).

The fixtures under tests/fixtures/tf_binary/ were written by REAL
TensorFlow (tests/fixtures/gen_tf_binary_fixtures.py): a V2 TensorBundle,
a V1 single-file checkpoint, a V1 checkpoint with the released
``vgg_16.ckpt``'s exact variable names, and a frozen GraphDef.
``expected.npz`` is TF's own readback of every tensor.  Matching those
bit-for-bit here proves the readers parse the reference's released assets
(ckpt_bfmnet/bfmnet-65000, ckpt_pixrefer/pixrefernet-20000, vgg_16.ckpt,
FaceReconModel.pb — infer_bfmvid.py:207-218, 46-50,
train_pixrefer.py:80-92) without TensorFlow.  The generator script also
certified ``write_bundle`` in the other direction (TF read back every
tensor of a pure-NumPy-written bundle exactly) before these fixtures were
committed.
"""

import os

import numpy as np
import pytest

from voicepuppet_tpu.tools import tf_bundle as tb

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "tf_binary")


def _expected(tag):
    blob = np.load(os.path.join(FIX, "expected.npz"))
    out = {}
    for key in blob.files:
        t, name = key.split("|", 1)
        if t == tag:
            out[name.replace("&", "/")] = blob[key]
    return out


def _assert_trees_equal(got, want):
    assert set(got) == set(want), (
        sorted(set(want) - set(got))[:5], sorted(set(got) - set(want))[:5])
    for name in want:
        assert got[name].dtype == want[name].dtype, name
        assert got[name].shape == tuple(np.shape(want[name])), name
        np.testing.assert_array_equal(got[name], want[name], err_msg=name)


def test_read_bundle_matches_tf_readback():
    got = tb.read_bundle(os.path.join(FIX, "bundle_v2", "model"),
                         verify_crc=True)
    _assert_trees_equal(got, _expected("bundle_v2"))


def test_read_v1_checkpoint_matches_tf_readback():
    got = tb.read_v1_checkpoint(os.path.join(FIX, "v1", "model.ckpt"))
    _assert_trees_equal(got, _expected("v1"))


def test_read_checkpoint_dispatches_both_formats(tmp_path):
    v2 = tb.read_checkpoint(os.path.join(FIX, "bundle_v2", "model"))
    assert "global_step" in v2
    v1 = tb.read_checkpoint(os.path.join(FIX, "v1", "model.ckpt"))
    assert "net/scalar" in v1
    with pytest.raises(FileNotFoundError):
        tb.read_checkpoint(str(tmp_path / "nope"))


def test_corrupt_magic_fails_loudly(tmp_path):
    p = tmp_path / "bad.ckpt"
    p.write_bytes(b"\x00" * 64)
    with pytest.raises(ValueError, match="magic"):
        tb.read_v1_checkpoint(str(p))


def test_graphdef_consts_match_tf():
    got = tb.read_graphdef_consts(os.path.join(FIX, "frozen_graph.pb"))
    want = _expected("graph")
    # the string const and non-Const nodes must be skipped
    assert "format_tag" not in got and "input" not in got \
        and "output" not in got
    _assert_trees_equal(got, {k: np.asarray(v) for k, v in want.items()})
    # name_filter narrows to the R-Net subtree
    filtered = tb.read_graphdef_consts(
        os.path.join(FIX, "frozen_graph.pb"), name_filter=r"resnet_v1_50")
    assert set(filtered) == {k for k in want if "resnet_v1_50" in k}


def test_write_read_bundle_roundtrip(tmp_path):
    rng = np.random.RandomState(7)
    arrays = {
        "a/scalar": np.asarray(3, np.int32),
        "a/bool": rng.rand(5) > 0.5,
        "a/f16": rng.randn(6).astype(np.float16),
        "a/f64": rng.randn(2, 3),
        "a/i64": rng.randint(-5, 5, (4,)).astype(np.int64),
        "a/u8": rng.randint(0, 255, (3, 3)).astype(np.uint8),
    }
    # enough tensors for several 4 KB index blocks
    for i in range(300):
        arrays[f"deep/layer_{i:03d}/kernel"] = rng.randn(4, 4) \
            .astype(np.float32)
    prefix = str(tmp_path / "rt" / "model")
    tb.write_bundle(arrays, prefix)
    back = tb.read_bundle(prefix, verify_crc=True)
    _assert_trees_equal(back, arrays)


def test_vgg16_bridge_end_to_end():
    """vgg_16.ckpt (V1, real slim names) -> VGG16Features params with no
    TF and no npz step; exclude-list variables (conv5/fc/mean_rgb in the
    fixture) are ignored; every trunk conv loads exactly."""
    import jax
    import jax.numpy as jnp
    from voicepuppet_tpu.models.vgg import VGG16Features

    path = os.path.join(FIX, "vgg_slim", "vgg_16.ckpt")
    model = VGG16Features(widths=(4, 8, 12, 16))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3)))["params"]
    new_params, loaded, missing = tb.load_vgg16_checkpoint(path, params)
    assert not missing, missing
    assert len(loaded) == 20  # 10 convs x (kernel, bias)
    arrays = tb.read_checkpoint(path)
    np.testing.assert_array_equal(
        np.asarray(new_params["conv3_2"]["kernel"]),
        arrays["vgg_16/conv3/conv3_2/weights"])
    np.testing.assert_array_equal(
        np.asarray(new_params["conv1_1"]["bias"]),
        arrays["vgg_16/conv1/conv1_1/biases"])
    # the loaded trunk must run
    feats = model.apply({"params": new_params}, jnp.ones((1, 32, 32, 3)))
    assert feats[2].shape == (1, 8, 8, 12)


def test_vgg16_bridge_shape_mismatch_lands_in_missing():
    import jax
    import jax.numpy as jnp
    from voicepuppet_tpu.models.vgg import VGG16Features

    path = os.path.join(FIX, "vgg_slim", "vgg_16.ckpt")
    model = VGG16Features(widths=(8, 8, 12, 16))   # conv1 width differs
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3)))["params"]
    _, loaded, missing = tb.load_vgg16_checkpoint(path, params)
    assert "conv1_1_kernel" in missing and "conv3_3_kernel" not in missing


def test_convert_vgg16_strict_rejects_unknown_and_missing():
    arrays = tb.read_checkpoint(os.path.join(FIX, "vgg_slim",
                                             "vgg_16.ckpt"))
    ok = tb.convert_vgg16_arrays(arrays)
    assert set(ok) == {k for _, k in tb.vgg16_slim_name_map()}
    with pytest.raises(ValueError, match="unexpected variable"):
        tb.convert_vgg16_arrays({**arrays, "vgg_16/rogue/weights":
                                 np.zeros(3, np.float32)})
    incomplete = dict(arrays)
    del incomplete["vgg_16/conv2/conv2_1/weights"]
    with pytest.raises(ValueError, match="lacks"):
        tb.convert_vgg16_arrays(incomplete)


def test_bfmnet_tf_ckpt_loads_directly(tmp_path):
    """The full no-TF path for the released BFMNet checkpoint: flax tree
    -> TF names -> V2 bundle on disk -> load_bfmnet_ckpt == original."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from voicepuppet_tpu.config import Config
    from voicepuppet_tpu.models.bfmnet import BFMNet
    from voicepuppet_tpu.tools import tf_checkpoint as tfc

    cfg = dataclasses.replace(Config().bfmnet, backbone_width_mult=0.25,
                              thinresnet_output_channels=32,
                              encode_embedding_size=32, rnn_hidden_size=32)
    model = BFMNet(cfg)
    rng = jax.random.PRNGKey(0)
    t = 4
    variables = model.init(
        {"params": rng, "dropout": rng}, jnp.zeros((1, t, 1)),
        jnp.zeros((1, t * 5, 80)), jnp.full((1,), t, jnp.int32),
        train=False)

    rows = tfc.bfmnet_name_map() + tfc._shortcut_rows(variables)
    arrays = {}
    for tf_name, coll, p, transform in rows:
        val = np.asarray(tfc._get(variables[coll], p))
        arrays[tf_name] = transform(val) if transform else val
    arrays["global_step"] = np.asarray(65000, np.int64)  # present in ref
    prefix = str(tmp_path / "ckpt_bfmnet" / "bfmnet-65000")
    tb.write_bundle(arrays, prefix)

    zeros = jax.tree_util.tree_map(lambda x: x * 0.0, dict(variables))
    out, loaded, missing = tfc.load_bfmnet_ckpt(prefix, zeros)
    assert not missing, missing[:5]
    for tf_name, coll, p, _tr in rows:
        np.testing.assert_array_equal(
            np.asarray(tfc._get(out[coll], p)),
            np.asarray(tfc._get(variables[coll], p)), err_msg=tf_name)


def test_pixrefer_tf_ckpt_loads_directly(tmp_path):
    """Same no-TF path for the released PixRefer checkpoint (generator +
    discriminator in one bundle, as train_pixrefer.py saves them)."""
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
    d = px.Discriminator(4)
    dv = d.init(jax.random.PRNGKey(1), jnp.zeros((1, 256, 256, 3)),
                jnp.zeros((1, 256, 256, 3)))
    arrays = {}
    for rows, variables in ((tfc.pixrefer_generator_name_map(), gv),
                            (tfc.pixrefer_discriminator_name_map(), dv)):
        for tf_name, coll, p, transform in rows:
            val = np.asarray(tfc._get(variables[coll], p))
            arrays[tf_name] = transform(val) if transform else val
    prefix = str(tmp_path / "ckpt_pixrefer" / "pixrefernet-20000")
    tb.write_bundle(arrays, prefix)

    gz = jax.tree_util.tree_map(lambda x: x * 0.0, dict(gv))
    dz = jax.tree_util.tree_map(lambda x: x * 0.0, dict(dv))
    (gout, gl, gm), dres = tfc.load_pixrefer_ckpt(prefix, gz, dz)
    dout, dl, dm = dres
    assert not gm and not dm, (gm[:3], dm[:3])
    for tf_name, coll, p, _tr in tfc.pixrefer_generator_name_map():
        np.testing.assert_array_equal(
            np.asarray(tfc._get(gout[coll], p)),
            np.asarray(tfc._get(gv[coll], p)), err_msg=tf_name)
    for tf_name, coll, p, _tr in tfc.pixrefer_discriminator_name_map():
        np.testing.assert_array_equal(
            np.asarray(tfc._get(dout[coll], p)),
            np.asarray(tfc._get(dv[coll], p)), err_msg=tf_name)


def _encode_graphdef_consts(arrays):
    """Minimal frozen-GraphDef encoder (test-side independent writer; the
    reader itself is certified against the TF-written frozen_graph.pb)."""
    out = b""
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
        out += tb._encode_bytes_field(1, node)
    return out


@pytest.mark.slow
def test_rnet_loads_from_frozen_pb(tmp_path):
    """FaceReconModel.pb -> RNet flax tree: every resnet_v1_50 variable of
    a pb with the real frozen-graph names round-trips into the tree."""
    import jax
    from voicepuppet_tpu.pipeline import rnet as rn

    _, variables = rn.init_rnet()
    from voicepuppet_tpu.tools.tf_checkpoint import _get
    arrays = {}
    for tf_name, coll, p in rn._rnet_name_rows():
        val = np.asarray(_get(variables[coll], p))
        arrays[tf_name] = (val + 0.01).astype(np.float32)  # distinct
    pb = tmp_path / "FaceReconModel.pb"
    pb.write_bytes(_encode_graphdef_consts(arrays))
    out, loaded, missing = rn.load_rnet_graphdef(str(pb), variables)
    assert not missing, missing[:5]
    assert len(loaded) == len(arrays)
    got = np.asarray(_get(out["params"], ("conv1", "conv", "kernel")))
    np.testing.assert_array_equal(got,
                                  arrays["resnet_v1_50/conv1/weights"])
