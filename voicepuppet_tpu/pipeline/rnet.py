"""Executable identity-coefficient regression (the Deep3DFace R-Net path).

The reference extracts the 257-dim identity coefficient by running the
``FaceReconModel.pb`` frozen graph per image (infer_bfmvid.py:29-74) — an
external asset this image does not ship.  Round 1 left that boundary as
file-fed providers only; this module makes the path *executable* given
converted weights:

  * :class:`RNet` — the R-Net architecture in flax: slim ``resnet_v1_50``
    (conv1 7x7/2 + maxpool + 4 bottleneck stages [3,4,6,3], strides on
    each stage's last unit, BN with moving stats) with a 257-dim 1x1-conv
    head after global pooling — the "ResNet-50 with the last
    fully-connected layer modified to 257 neurons" of Deng et al.'s
    Deep3DFace, which the frozen graph wraps.
  * :func:`load_rnet_npz` — overlays a TF-slim-named npz dump (produced
    from the frozen graph with the snippet in the docstring) onto the
    flax tree, reporting loaded/missing names so a naming mismatch fails
    loudly instead of silently scrambling a restore.
  * :class:`RNetIdentityProvider` — the full ``alignto_bfm_coeff``
    contract (infer_bfmvid.py:29-74): 68-landmark input -> 5-point set ->
    POS crop-to-224 alignment -> R-Net forward -> Identity.

To dump the reference asset in any TF1 environment::

    import tensorflow as tf, numpy as np
    gd = tf.GraphDef(); gd.ParseFromString(
        open("allmodels/FaceReconModel.pb", "rb").read())
    with tf.Graph().as_default():
        tf.import_graph_def(gd, name="")
        vals = {n.name: tf.make_ndarray(n.attr["value"].tensor)
                for n in gd.node if n.op == "Const"
                and "resnet_v1_50" in n.name}
    np.savez("rnet_tf.npz", **{k.replace("/", "|"): v
                               for k, v in vals.items()})
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class SlimBatchNorm(nn.Module):
    """slim batch_norm in inference mode: moving stats, scale+center,
    eps 1e-5 (resnet_arg_scope)."""
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        ch = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (ch,))
        beta = self.param("bias", nn.initializers.zeros, (ch,))
        mean = self.variable("batch_stats", "mean",
                             nn.initializers.zeros, None, (ch,))
        var = self.variable("batch_stats", "var",
                            nn.initializers.ones, None, (ch,))
        inv = jax.lax.rsqrt(var.value + self.epsilon)
        return (x - mean.value) * inv * gamma + beta


class ConvBN(nn.Module):
    """slim conv2d under resnet_arg_scope: no bias, BN, optional relu.
    resnet_v1 uses 'SAME'-equivalent explicit padding for stride-2 convs
    (conv2d_same: pad k-1 total, origin-biased)."""
    features: int
    kernel: int
    stride: int = 1
    relu: bool = True

    @nn.compact
    def __call__(self, x):
        k, s = self.kernel, self.stride
        if s > 1:
            pad_total = k - 1
            pad_beg = pad_total // 2
            pad_end = pad_total - pad_beg
            x = jnp.pad(x, ((0, 0), (pad_beg, pad_end),
                            (pad_beg, pad_end), (0, 0)))
            padding = "VALID"
        else:
            padding = "SAME"
        x = nn.Conv(self.features, (k, k), strides=(s, s), padding=padding,
                    use_bias=False, name="conv")(x)
        x = SlimBatchNorm(name="bn")(x)
        return nn.relu(x) if self.relu else x


class BottleneckV1(nn.Module):
    """slim bottleneck_v1: 1x1 -> 3x3(stride) -> 1x1, + shortcut
    (1x1-conv projection when depth changes, stride-subsample when not)."""
    depth: int
    depth_bottleneck: int
    stride: int

    @nn.compact
    def __call__(self, x):
        depth_in = x.shape[-1]
        if depth_in != self.depth:
            shortcut = ConvBN(self.depth, 1, self.stride, relu=False,
                              name="shortcut")(x)
        elif self.stride > 1:
            shortcut = x[:, ::self.stride, ::self.stride, :]
        else:
            shortcut = x
        y = ConvBN(self.depth_bottleneck, 1, 1, name="conv1")(x)
        y = ConvBN(self.depth_bottleneck, 3, self.stride, name="conv2")(y)
        y = ConvBN(self.depth, 1, 1, relu=False, name="conv3")(y)
        return nn.relu(y + shortcut)


# resnet_v1_50 block spec: (depth, depth_bottleneck, num_units); slim
# places the stride-2 on each block's LAST unit (block4 stays stride 1)
_BLOCKS = ((256, 64, 3, 2), (512, 128, 4, 2), (1024, 256, 6, 2),
           (2048, 512, 3, 1))


class RNet(nn.Module):
    """resnet_v1_50 trunk + 257-dim head (Deep3DFace R-Net).  Input:
    [B, 224, 224, 3] float32 BGR in 0..255 (what Preprocess feeds the
    frozen graph; bfm_load_data.py:189, infer_bfmvid.py:72)."""
    num_coeff: int = 257

    @nn.compact
    def __call__(self, x):
        x = ConvBN(64, 7, 2, name="conv1")(x)
        # slim max_pool2d 3x3/2 'SAME'
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        for b, (depth, bott, units, last_stride) in enumerate(_BLOCKS,
                                                              start=1):
            for u in range(1, units + 1):
                stride = last_stride if u == units else 1
                x = BottleneckV1(depth, bott, stride,
                                 name=f"block{b}_unit_{u}")(x)
        x = jnp.mean(x, axis=(1, 2), keepdims=True)  # global pool
        x = nn.Conv(self.num_coeff, (1, 1), name="logits")(x)
        return x[:, 0, 0, :]


def _rnet_name_rows() -> List[Tuple[str, str, Tuple[str, ...]]]:
    """(tf_name, collection, flax_path) rows for the slim checkpoint."""
    rows: List = []

    def convbn(tf_scope: str, flax: Tuple[str, ...]):
        rows.append((f"{tf_scope}/weights", "params",
                     flax + ("conv", "kernel")))
        bn = f"{tf_scope}/BatchNorm"
        rows.append((f"{bn}/gamma", "params", flax + ("bn", "scale")))
        rows.append((f"{bn}/beta", "params", flax + ("bn", "bias")))
        rows.append((f"{bn}/moving_mean", "batch_stats",
                     flax + ("bn", "mean")))
        rows.append((f"{bn}/moving_variance", "batch_stats",
                     flax + ("bn", "var")))

    r = "resnet_v1_50"
    convbn(f"{r}/conv1", ("conv1",))
    for b, (depth, bott, units, _ls) in enumerate(_BLOCKS, start=1):
        for u in range(1, units + 1):
            tf_u = f"{r}/block{b}/unit_{u}/bottleneck_v1"
            fx = (f"block{b}_unit_{u}",)
            if u == 1:  # projection shortcut on each block's first unit
                convbn(f"{tf_u}/shortcut", fx + ("shortcut",))
            for c in ("conv1", "conv2", "conv3"):
                convbn(f"{tf_u}/{c}", fx + (c,))
    rows.append((f"{r}/logits/weights", "params", ("logits", "kernel")))
    rows.append((f"{r}/logits/biases", "params", ("logits", "bias")))
    return rows


def init_rnet(seed: int = 0):
    model = RNet()
    variables = model.init(jax.random.PRNGKey(seed),
                           jnp.zeros((1, 224, 224, 3)))
    return model, variables


def load_rnet_npz(path: str, variables):
    """Overlay a slim-named npz dump onto the flax RNet tree.  Returns
    (new_variables, loaded, missing) — a wrong name or shape lands in
    ``missing`` (fail-loud; round-1 converter principle)."""
    blob = np.load(path)
    available = {k.replace("|", "/"): blob[k] for k in blob.files}
    return load_rnet_arrays(available, variables)


def load_rnet_graphdef(path: str, variables):
    """``FaceReconModel.pb`` -> flax RNet tree, TF-free: extract the
    ``resnet_v1_50`` Const weights straight from the frozen GraphDef
    (the asset the reference loads at infer_bfmvid.py:46-50) with the
    certified pure-NumPy parser.  Returns (new_variables, loaded,
    missing)."""
    from voicepuppet_tpu.tools.tf_bundle import read_graphdef_consts
    return load_rnet_arrays(
        read_graphdef_consts(path, name_filter=r"resnet_v1_50"), variables)


def load_rnet_arrays(available: Dict[str, np.ndarray], variables):
    """Core slim-named-arrays -> flax-RNet-tree overlay."""
    from voicepuppet_tpu.tools.tf_checkpoint import _deep_mutable, _get, _set
    out = {k: _deep_mutable(v) for k, v in dict(variables).items()}
    loaded, missing = [], []
    for tf_name, coll, fpath in _rnet_name_rows():
        val = available.get(tf_name)
        target = _get(variables[coll], fpath)
        if val is None or target is None or np.shape(target) != val.shape:
            missing.append(tf_name)
            continue
        _set(out[coll], fpath, np.asarray(val, np.float32))
        loaded.append(tf_name)
    return out, loaded, missing


@dataclasses.dataclass
class RNetIdentityProvider:
    """image + 68 landmarks -> Identity via the R-Net
    (the alignto_bfm_coeff contract, infer_bfmvid.py:29-74)."""
    variables: Any
    lm3d: np.ndarray          # [5, 3] standard landmarks (standard_lm3d)
    model: RNet = dataclasses.field(default_factory=RNet)

    @classmethod
    def from_npz(cls, weights_path: str, lm3d: np.ndarray):
        _, variables = init_rnet()
        variables, loaded, missing = load_rnet_npz(weights_path, variables)
        if missing:
            raise ValueError(
                f"rnet npz {weights_path}: {len(missing)} unmapped "
                f"variables, e.g. {missing[:3]}")
        return cls(variables=variables, lm3d=lm3d)

    @classmethod
    def from_pb(cls, pb_path: str, lm3d: np.ndarray):
        """Load the reference's ``FaceReconModel.pb`` directly (TF-free)."""
        _, variables = init_rnet()
        variables, loaded, missing = load_rnet_graphdef(pb_path, variables)
        if missing:
            raise ValueError(
                f"rnet pb {pb_path}: {len(missing)} unmapped variables, "
                f"e.g. {missing[:3]}")
        return cls(variables=variables, lm3d=lm3d)

    def __call__(self, image: np.ndarray, landmarks68: np.ndarray,
                 center_x: int, center_y: int, ratio: float):
        from voicepuppet_tpu.pipeline.align import (align_for_identity,
                                                    landmarks68_to_5)
        from voicepuppet_tpu.pipeline.synthesize import Identity
        lmk5 = landmarks68_to_5(np.asarray(landmarks68).reshape(-1))
        aligned, trans_params = align_for_identity(image, lmk5, self.lm3d)
        coeff = np.asarray(self.model.apply(self.variables,
                                            jnp.asarray(aligned)))
        return Identity(bfmcoeff=coeff, transform_params=trans_params,
                        center_x=center_x, center_y=center_y, ratio=ratio,
                        colors_bgr=True)
