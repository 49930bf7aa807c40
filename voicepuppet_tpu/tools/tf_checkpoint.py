"""Reference-checkpoint weight conversion (BFMNet / PixRefer).

The reference ships TF1 checkpoints (``ckpt_bfmnet/bfmnet-65000``,
infer_bfmvid.py:217); loading them into the flax tree needs a name/layout
mapping (SURVEY.md §7 hard part #3).  The released V2 TensorBundle files
are read **directly, with no TensorFlow**, by
:mod:`voicepuppet_tpu.tools.tf_bundle` — :func:`load_bfmnet_ckpt` /
:func:`load_pixrefer_ckpt` point at the checkpoint prefix and overlay the
flax tree in one step.  An npz produced by ``tf.train.load_checkpoint``
in a TF environment remains accepted (:func:`load_bfmnet_npz`) for
compatibility with older conversion dumps.

Layout conversions handled:
  * conv kernels: TF HWIO == flax HWIO (no-op)
  * depthwise kernels: TF separable_conv2d depthwise_kernel
    [H, W, C, 1] -> flax grouped-conv kernel [H, W, 1, C]
  * dense kernels: TF [in, out] == flax (no-op)
  * GRU: TF GRUCell keeps one fused gate kernel [in+h, 2h] and candidate
    kernel [in+h, h] — identical to our TFGRUCell Dense_0/Dense_1
  * batch norm: beta -> bias; moving_mean/variance -> batch_stats

:func:`bfmnet_name_map` builds the bidirectional mapping from the flax
tree structure itself, so it stays correct under width changes.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


# reference MfccNet block schedule (tinynet.py:169-207): scope name and
# whether the stem/head ConvBN or an inverted-residual block
_MFCCNET_SCOPES = (
    ("block0_0", "conv"),
    ("block1_0", "ir"), ("block2_0", "ir"), ("block2_1", "ir"),
    ("block3_0", "ir"), ("block3_1", "ir"), ("block3_2", "ir"),
    ("block4_0", "ir"), ("block4_1", "ir"), ("block4_2", "ir"),
    ("block4_3", "ir"),
    ("block5_0", "ir"), ("block5_1", "ir"), ("block5_2", "ir"),
    ("block6_0", "ir"), ("block6_1", "ir"), ("block6_2", "ir"),
    ("block7_0", "ir"),
    ("block8_0", "conv"),
)


def _bn_entries(tf_scope: str, flax_prefix: Tuple[str, ...]):
    """tf.contrib.layers.batch_norm variables under ``tf_scope`` ->
    (params bias, batch_stats mean/var)."""
    bn = flax_prefix + ("BatchNorm_0",)
    return [
        (f"{tf_scope}/BatchNorm/beta", "params", bn + ("bias",), None),
        (f"{tf_scope}/BatchNorm/moving_mean", "batch_stats",
         bn + ("mean",), None),
        (f"{tf_scope}/BatchNorm/moving_variance", "batch_stats",
         bn + ("var",), None),
    ]


def _depthwise(x: np.ndarray) -> np.ndarray:
    # [H, W, C, 1] -> [H, W, 1, C]
    return np.transpose(x, (0, 1, 3, 2))


def bfmnet_name_map() -> List[Tuple[str, str, Tuple[str, ...], object]]:
    """(tf_name, collection, flax_path, transform) rows for BFMNet.

    flax paths follow the module names in models/bfmnet.py: the backbone
    under ``mfcc_encoder/MfccNet_0`` with ConvBN_{0,1} stem/head and
    InvertedResidual_{i}; ``rnn_in``; ``rnn_module`` (scanned TFGRUCell
    Dense_0 gates / Dense_1 candidate); ``bfm_coeff_decoder`` Dense_{0..2}.
    """
    rows: List = []
    conv_i = 0
    ir_i = 0
    net = ("mfcc_encoder", "MfccNet_0")
    for scope, kind in _MFCCNET_SCOPES:
        tf_base = f"mfcc_encoder/MfccNet/{scope}"
        if kind == "conv":
            p = net + (f"ConvBN_{conv_i}",)
            rows.append((f"{tf_base}/conv2d/conv2d/kernel", "params",
                         p + ("Conv_0", "kernel"), None))
            rows += _bn_entries(f"{tf_base}/conv2d", p + ("TFBatchNorm_0",))
            conv_i += 1
        else:
            p = net + (f"InvertedResidual_{ir_i}",)
            rows.append((f"{tf_base}/expansion_1x1_conv2d/conv2d/kernel",
                         "params", p + ("Conv_0", "kernel"), None))
            rows += _bn_entries(f"{tf_base}/expansion_1x1_conv2d",
                                p + ("TFBatchNorm_0",))
            # tf.contrib.layers.separable_conv2d (tinynet.py:88-98) opens
            # its default 'SeparableConv2d' scope and names the kernel
            # 'depthwise_weights' [H, W, C, 1] (slim naming — NOT
            # tf.layers.separable_conv2d's 'depthwise_kernel')
            rows.append((f"{tf_base}/depthwise_conv2d/SeparableConv2d/"
                         "depthwise_weights", "params",
                         p + ("Conv_1", "kernel"), _depthwise))
            rows += _bn_entries(f"{tf_base}/depthwise_conv2d",
                                p + ("TFBatchNorm_1",))
            rows.append((f"{tf_base}/projection_1x1_conv2d/conv2d/kernel",
                         "params", p + ("Conv_2", "kernel"), None))
            rows += _bn_entries(f"{tf_base}/projection_1x1_conv2d",
                                p + ("TFBatchNorm_2",))
            ir_i += 1

    # residual-shortcut 1x1 convs exist only where channels change
    # (tinynet.py:135-139); map them by probing the flax tree at load time
    # (rows added dynamically in load_bfmnet_npz).

    rows += [
        ("mfcc_encoder/dense/kernel", "params",
         ("mfcc_encoder", "Dense_0", "kernel"), None),
        ("mfcc_encoder/dense/bias", "params",
         ("mfcc_encoder", "Dense_0", "bias"), None),
        ("rnn_module/dense/kernel", "params", ("rnn_in", "kernel"), None),
        ("rnn_module/dense/bias", "params", ("rnn_in", "bias"), None),
        ("rnn_module/rnn/multi_rnn_cell/cell_0/gru_cell/gates/kernel",
         "params", ("rnn_module", "ScanTFGRUCell_0", "Dense_0", "kernel"),
         None),
        ("rnn_module/rnn/multi_rnn_cell/cell_0/gru_cell/gates/bias",
         "params", ("rnn_module", "ScanTFGRUCell_0", "Dense_0", "bias"), None),
        ("rnn_module/rnn/multi_rnn_cell/cell_0/gru_cell/candidate/kernel",
         "params", ("rnn_module", "ScanTFGRUCell_0", "Dense_1", "kernel"),
         None),
        ("rnn_module/rnn/multi_rnn_cell/cell_0/gru_cell/candidate/bias",
         "params", ("rnn_module", "ScanTFGRUCell_0", "Dense_1", "bias"), None),
        ("bfm_coeff_decoder/dense/kernel", "params",
         ("bfm_coeff_decoder", "Dense_0", "kernel"), None),
        ("bfm_coeff_decoder/dense/bias", "params",
         ("bfm_coeff_decoder", "Dense_0", "bias"), None),
        ("bfm_coeff_decoder/dense_1/kernel", "params",
         ("bfm_coeff_decoder", "Dense_1", "kernel"), None),
        ("bfm_coeff_decoder/dense_1/bias", "params",
         ("bfm_coeff_decoder", "Dense_1", "bias"), None),
        ("bfm_coeff_decoder/dense_2/kernel", "params",
         ("bfm_coeff_decoder", "Dense_2", "kernel"), None),
        ("bfm_coeff_decoder/dense_2/bias", "params",
         ("bfm_coeff_decoder", "Dense_2", "bias"), None),
    ]
    return rows


def _get(tree, path):
    for p in path:
        if p not in tree:
            return None
        tree = tree[p]
    return tree


def _set(tree, path, value):
    for p in path[:-1]:
        tree = tree.setdefault(p, {})
    tree[path[-1]] = value


def _shortcut_rows(variables) -> List[Tuple[str, str, Tuple[str, ...],
                                            object]]:
    """Inverted residuals with a channel-changing shortcut have Conv_3/
    TFBatchNorm_3 (layers.py InvertedResidual); their TF names are the
    block's ``1x1_conv2d`` scope (tinynet.py:29-44)."""
    rows: List = []
    ir_i = 0
    for scope, kind in _MFCCNET_SCOPES:
        if kind != "ir":
            continue
        p = ("mfcc_encoder", "MfccNet_0", f"InvertedResidual_{ir_i}")
        if _get(variables["params"], p + ("Conv_3",)) is not None:
            tf_base = f"mfcc_encoder/MfccNet/{scope}/1x1_conv2d"
            rows.append((f"{tf_base}/conv2d/kernel", "params",
                         p + ("Conv_3", "kernel"), None))
            rows += _bn_entries(tf_base, p + ("TFBatchNorm_3",))
        ir_i += 1
    return rows


def export_bfmnet_npz(variables, path: str):
    """Dump a flax BFMNet variable tree under the TF variable names (the
    inverse mapping) — used to validate bijectivity and to ship weights
    back toward TF tooling.  Thin wrapper over :func:`export_npz` with the
    BFMNet row set (incl. the tree-probed shortcut rows)."""
    export_npz(variables, bfmnet_name_map() + _shortcut_rows(variables),
               path)


def load_bfmnet_npz(path: str, variables):
    """Overlay a TF-named npz dump onto a flax BFMNet variable tree.
    Returns (new_variables, loaded_names, missing_names).  Thin wrapper
    over :func:`load_npz` with the BFMNet row set."""
    return load_npz(path, variables,
                    bfmnet_name_map() + _shortcut_rows(variables))


def _deep_mutable(tree):
    if isinstance(tree, dict) or hasattr(tree, "items"):
        return {k: _deep_mutable(v) for k, v in tree.items()}
    return tree


def _deconv(x: np.ndarray) -> np.ndarray:
    # TF conv2d_transpose kernel [H, W, out, in] -> flax ConvTranspose
    # [H, W, in, out]
    return np.transpose(x, (0, 1, 3, 2))


def pixrefer_generator_name_map():
    """(tf_name, collection, flax_path, transform) rows for the PixRefer
    generator (scopes from pixrefer.py:166-277; our flax modules carry the
    same scope names, and the anonymous StatelessBatchNorm_{i} numbering
    follows creation order: encoder_2..4, encoder_fg_2..4,
    merged_encoder_2..5, merged_decoder_5..2, merged2_decoder_4..2).

    The reference's batch-norm moving statistics are dropped: it always
    normalizes with batch moments (training=True, pixrefer.py:99-101), so
    the moving averages are dead state."""
    g = ("generator",)
    rows: List = []
    bn_i = 0

    def conv(scope, kind="conv2d"):
        transform = _deconv if kind == "conv2d_transpose" else None
        flax_layer = ("Conv_0" if kind == "conv2d"
                      else "ConvTranspose_0")
        rows.append((f"generator/{scope}/{kind}/kernel", "params",
                     g + (scope, flax_layer, "kernel"), transform))
        rows.append((f"generator/{scope}/{kind}/bias", "params",
                     g + (scope, flax_layer, "bias"), None))

    def bn(scope):
        nonlocal bn_i
        base = f"generator/{scope}/batch_normalization"
        rows.append((f"{base}/gamma", "params",
                     g + (f"StatelessBatchNorm_{bn_i}", "scale"), None))
        rows.append((f"{base}/beta", "params",
                     g + (f"StatelessBatchNorm_{bn_i}", "bias"), None))
        bn_i += 1

    conv("encoder_1")
    for i in (2, 3, 4):
        conv(f"encoder_{i}")
        bn(f"encoder_{i}")
    conv("encoder_fg_1")
    for i in (2, 3, 4):
        conv(f"encoder_fg_{i}")
        bn(f"encoder_fg_{i}")
    for i in (2, 3, 4, 5):
        conv(f"merged_encoder_{i}")
        bn(f"merged_encoder_{i}")
    for i in (5, 4, 3, 2):  # creation order (pixrefer.py:233-248)
        conv(f"merged_decoder_{i}", "conv2d_transpose")
        bn(f"merged_decoder_{i}")
    for i in (4, 3, 2):     # creation order (pixrefer.py:257-267)
        conv(f"merged2_decoder_{i}", "conv2d_transpose")
        bn(f"merged2_decoder_{i}")
    conv("decoder_1", "conv2d_transpose")
    return rows


def pixrefer_discriminator_name_map():
    """Rows for the PatchGAN discriminator (pixrefer.py:103-134)."""
    rows: List = []
    bn_i = 0
    for i in range(1, 6):
        rows.append((f"discriminator/layer_{i}/conv2d/kernel", "params",
                     (f"layer_{i}", "Conv_0", "kernel"), None))
        rows.append((f"discriminator/layer_{i}/conv2d/bias", "params",
                     (f"layer_{i}", "Conv_0", "bias"), None))
        if i in (2, 3, 4):
            base = f"discriminator/layer_{i}/batch_normalization"
            rows.append((f"{base}/gamma", "params",
                         (f"StatelessBatchNorm_{bn_i}", "scale"), None))
            rows.append((f"{base}/beta", "params",
                         (f"StatelessBatchNorm_{bn_i}", "bias"), None))
            bn_i += 1
    return rows


def export_npz(variables, rows, path: str):
    """Generic flax-tree -> TF-named npz export for a mapping row set."""
    blob: Dict[str, np.ndarray] = {}
    for tf_name, coll, path_, transform in rows:
        val = _get(variables[coll], path_) if coll in variables else None
        if val is None:
            continue
        val = np.asarray(val)
        if transform is not None:
            val = transform(val)  # both transforms are involutions
        blob[tf_name.replace("/", "|")] = val
    np.savez(path, **blob)


def load_arrays(available: Dict[str, np.ndarray], variables, rows):
    """Generic TF-named arrays -> flax-tree overlay for a mapping row set.
    Returns (new_variables, loaded, missing)."""
    out = {k: _deep_mutable(v) for k, v in dict(variables).items()}
    loaded, missing = [], []
    for tf_name, coll, path_, transform in rows:
        if tf_name not in available or coll not in variables:
            missing.append(tf_name)
            continue
        val = available[tf_name]
        if transform is not None:
            val = transform(val)
        target = _get(variables[coll], path_)
        if target is None or np.shape(target) != np.shape(val):
            missing.append(tf_name)
            continue
        _set(out[coll], path_, np.asarray(val, np.float32))
        loaded.append(tf_name)
    return out, loaded, missing


def load_npz(path: str, variables, rows):
    """TF-named npz (``/`` escaped as ``|`` in keys) -> flax-tree overlay."""
    blob = np.load(path)
    available = {k.replace("|", "/"): blob[k] for k in blob.files}
    return load_arrays(available, variables, rows)


def load_ckpt(prefix: str, variables, rows, verify_crc: bool = False):
    """Read a reference TF checkpoint (V2 bundle prefix or V1 single file)
    directly — no TensorFlow, no intermediate npz — and overlay the flax
    tree via a mapping row set.  Returns (new_variables, loaded, missing).
    The binary readers are certified against real-TF-written fixtures
    (tests/test_tf_bundle.py)."""
    from voicepuppet_tpu.tools.tf_bundle import read_checkpoint
    return load_arrays(read_checkpoint(prefix, verify_crc=verify_crc),
                       variables, rows)


def load_bfmnet_ckpt(prefix: str, variables, verify_crc: bool = False):
    """``ckpt_bfmnet/bfmnet-65000``-shaped checkpoint -> flax BFMNet tree,
    TF-free (matches the restore at infer_bfmvid.py:207-218)."""
    return load_ckpt(prefix, variables,
                     bfmnet_name_map() + _shortcut_rows(variables),
                     verify_crc=verify_crc)


def load_pixrefer_ckpt(prefix: str, g_variables, d_variables=None,
                       verify_crc: bool = False):
    """``ckpt_pixrefer/pixrefernet-20000``-shaped checkpoint -> flax
    PixRefer generator (and optionally discriminator) trees, TF-free.
    Returns ((g_vars, g_loaded, g_missing), (d_vars, d_loaded, d_missing))
    with the second element ``None`` when ``d_variables`` is."""
    from voicepuppet_tpu.tools.tf_bundle import read_checkpoint
    arrays = read_checkpoint(prefix, verify_crc=verify_crc)
    g = load_arrays(arrays, g_variables, pixrefer_generator_name_map())
    d = (load_arrays(arrays, d_variables, pixrefer_discriminator_name_map())
         if d_variables is not None else None)
    return g, d
