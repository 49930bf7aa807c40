"""Generate REAL TensorFlow binary fixtures certifying tools/tf_bundle.py.

INDEPENDENT generation: this script drives actual TensorFlow (present in
this image, v2.21) to write the three binary formats the reference ships —
V2 TensorBundle checkpoints, V1 single-file checkpoints (the ``vgg_16.ckpt``
format), and frozen GraphDefs — and records TF's own readback as the
expected values.  tests/test_tf_bundle.py then checks the pure-NumPy
readers reproduce TF's readback bit-for-bit, with no TF in the test
suite.  The script also certifies the pure-NumPy *writer* in the other
direction: a bundle written by ``write_bundle`` is read back here with
``tf.train.load_checkpoint`` and must match exactly before fixtures are
accepted.

Committed outputs (tests/fixtures/tf_binary/):
  bundle_v2/model.{index,data-00000-of-00001}   TF-written V2 bundle
  v1/model.ckpt                                 TF-written V1 checkpoint
  vgg_slim/vgg_16.ckpt                          V1, real slim vgg_16 names
                                                (narrow widths 4/8/12/16)
  frozen_graph.pb                               frozen GraphDef w/ Consts
  expected.npz                                  TF readback of everything,
                                                keys '<fixture>|<name>'

Run:  python tests/fixtures/gen_tf_binary_fixtures.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import tensorflow as tf                      # noqa: E402
import tensorflow.compat.v1 as tf1           # noqa: E402

tf1.disable_eager_execution()

OUT = os.path.join(os.path.dirname(__file__), "tf_binary")
rng = np.random.RandomState(20260819)


def _save_checkpoint(variables, path, version):
    g = tf1.Graph()
    with g.as_default():
        tf_vars = []
        for name, value in variables.items():
            tf_vars.append(tf1.get_variable(
                name, initializer=value, dtype=tf.as_dtype(value.dtype)))
        saver = tf1.train.Saver(var_list=tf_vars, write_version=version)
        with tf1.Session(graph=g) as s:
            s.run(tf1.global_variables_initializer())
            saver.save(s, path, write_meta_graph=False, write_state=False)


def _readback(prefix):
    r = tf.train.load_checkpoint(prefix)
    return {name: r.get_tensor(name)
            for name in r.get_variable_to_shape_map()}


def gen_bundle_v2():
    """Many variables with long shared-prefix names (forces multiple
    ~4 KB data blocks, prefix compression, and restart arrays in the
    .index) plus every supported dtype."""
    variables = {}
    for i in range(40):
        variables[f"model/encoder/layer_{i:02d}/conv2d/kernel"] = \
            rng.randn(3, 3, 2, 4).astype(np.float32)
        variables[f"model/encoder/layer_{i:02d}/conv2d/bias"] = \
            rng.randn(4).astype(np.float32)
    variables["model/f64"] = rng.randn(5, 2)
    variables["model/i32"] = rng.randint(-9, 9, (7,)).astype(np.int32)
    variables["model/i64"] = rng.randint(-9, 9, (3, 2)).astype(np.int64)
    variables["model/bool"] = (rng.randn(6) > 0)
    variables["model/u8"] = rng.randint(0, 255, (4, 4)).astype(np.uint8)
    variables["model/f16"] = rng.randn(8).astype(np.float16)
    variables["global_step"] = np.asarray(65000, np.int64)
    prefix = os.path.join(OUT, "bundle_v2", "model")
    os.makedirs(os.path.dirname(prefix), exist_ok=True)
    _save_checkpoint(variables, prefix, tf1.train.SaverDef.V2)
    return prefix, _readback(prefix)


def gen_v1():
    variables = {
        "net/conv1/weights": rng.randn(2, 3, 4, 2).astype(np.float32),
        "net/conv1/biases": rng.randn(2).astype(np.float32),
        "net/f64": rng.randn(3, 3),
        "net/i32": rng.randint(-9, 9, (5,)).astype(np.int32),
        "net/i64": rng.randint(-9, 9, (4,)).astype(np.int64),
        "net/scalar": np.asarray(3.25, np.float32),
    }
    path = os.path.join(OUT, "v1", "model.ckpt")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    _save_checkpoint(variables, path, tf1.train.SaverDef.V1)
    return path, _readback(path)


def gen_vgg_slim():
    """A V1 checkpoint with the REAL slim vgg_16 variable names (the format
    and naming of the released vgg_16.ckpt) at narrow widths 4/8/12/16,
    including exclude-list variables (conv5, fc6-8, mean_rgb) that the
    bridge must ignore."""
    widths = {"conv1": 4, "conv2": 8, "conv3": 12, "conv4": 16,
              "conv5": 16}
    reps = {"conv1": 2, "conv2": 2, "conv3": 3, "conv4": 3, "conv5": 3}
    variables = {}
    in_ch = 3
    for stack in ("conv1", "conv2", "conv3", "conv4", "conv5"):
        ch = widths[stack]
        for j in range(1, reps[stack] + 1):
            variables[f"vgg_16/{stack}/{stack}_{j}/weights"] = \
                rng.randn(3, 3, in_ch, ch).astype(np.float32)
            variables[f"vgg_16/{stack}/{stack}_{j}/biases"] = \
                rng.randn(ch).astype(np.float32)
            in_ch = ch
    variables["vgg_16/fc6/weights"] = rng.randn(7, 7, 16, 32) \
        .astype(np.float32)
    variables["vgg_16/fc6/biases"] = rng.randn(32).astype(np.float32)
    variables["vgg_16/fc7/weights"] = rng.randn(1, 1, 32, 32) \
        .astype(np.float32)
    variables["vgg_16/fc7/biases"] = rng.randn(32).astype(np.float32)
    variables["vgg_16/fc8/weights"] = rng.randn(1, 1, 32, 10) \
        .astype(np.float32)
    variables["vgg_16/fc8/biases"] = rng.randn(10).astype(np.float32)
    variables["vgg_16/mean_rgb"] = np.float32([123.68, 116.78, 103.94])
    path = os.path.join(OUT, "vgg_slim", "vgg_16.ckpt")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    _save_checkpoint(variables, path, tf1.train.SaverDef.V1)
    return path, _readback(path)


def gen_frozen_graph():
    """Frozen-GraphDef fixture: Const weights (tensor_content form), a
    scalar Const (typed-field form), a string Const (must be skipped), and
    non-Const ops wired between them."""
    g = tf1.Graph()
    consts = {
        "resnet_v1_50/conv1/weights": rng.randn(7, 7, 3, 4)
        .astype(np.float32),
        "resnet_v1_50/conv1/BatchNorm/gamma": rng.randn(4)
        .astype(np.float32),
        "resnet_v1_50/logits/biases": rng.randn(257).astype(np.float32),
        "factor": np.asarray(2.5, np.float32),
        "sizes": np.asarray([224, 224], np.int32),
    }
    with g.as_default():
        nodes = {name: tf1.constant(value, name=name)
                 for name, value in consts.items()}
        tf1.constant("not-a-weight", name="format_tag")
        x = tf1.placeholder(tf.float32, [1, 8, 8, 3], name="input")
        y = tf1.nn.conv2d(x, nodes["resnet_v1_50/conv1/weights"],
                          strides=[1, 2, 2, 1], padding="SAME")
        tf1.multiply(y, nodes["factor"], name="output")
    path = os.path.join(OUT, "frozen_graph.pb")
    with open(path, "wb") as f:
        f.write(g.as_graph_def().SerializeToString())
    return path, consts


def certify_writer():
    """The pure-NumPy write_bundle output must read back exactly under
    real TF — certification gate for shipping converted weights."""
    from voicepuppet_tpu.tools.tf_bundle import write_bundle
    arrays = {
        "w/a": rng.randn(17, 3).astype(np.float32),
        "w/b": rng.randn(2, 2, 2).astype(np.float64),
        "w/c": rng.randint(-5, 5, (9,)).astype(np.int64),
        "w/d": rng.randint(0, 2, (4,)).astype(bool),
        "w/scalar": np.asarray(7, np.int32),
    }
    # enough variables to force several 4 KB index blocks
    for i in range(300):
        arrays[f"deep/stack/layer_{i:03d}/kernel"] = \
            rng.randn(4, 4).astype(np.float32)
    prefix = os.path.join(OUT, "_writer_check", "model")
    write_bundle(arrays, prefix)
    back = _readback(prefix)
    assert set(back) == set(arrays), (
        sorted(set(arrays) - set(back))[:5],
        sorted(set(back) - set(arrays))[:5])
    for name, want in arrays.items():
        got = back[name]
        assert got.dtype == want.dtype and got.shape == want.shape, name
        assert np.array_equal(got, want), name
    print(f"writer certification: TF read back all {len(arrays)} tensors "
          "from the pure-NumPy bundle exactly")
    # scrub the temp check dir; the in-suite roundtrip re-exercises this
    import shutil
    shutil.rmtree(os.path.dirname(prefix))


def main():
    os.makedirs(OUT, exist_ok=True)
    expected = {}
    for tag, (path, values) in {
        "bundle_v2": gen_bundle_v2(),
        "v1": gen_v1(),
        "vgg_slim": gen_vgg_slim(),
        "graph": gen_frozen_graph(),
    }.items():
        for name, value in values.items():
            expected[f"{tag}|{name.replace('/', '&')}"] = value
        print(f"{tag}: {len(values)} tensors @ {path}")
    np.savez(os.path.join(OUT, "expected.npz"), **expected)
    certify_writer()
    total = sum(os.path.getsize(os.path.join(dp, f))
                for dp, _dn, fn in os.walk(OUT) for f in fn)
    print(f"fixtures written to {OUT} ({total / 1024:.1f} KiB)")


if __name__ == "__main__":
    main()
