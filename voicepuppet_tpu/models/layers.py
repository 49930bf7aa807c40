"""Shared model building blocks with TF1-reference semantics, in flax.

Re-creates the reference's layer vocabulary so architectures keep identical
shapes/receptive fields:

  * MobileNetV2-style inverted-residual blocks with expansion 6 and a
    [7, 3] depthwise kernel (ref: voicepuppet/bfmnet/tinynet.py:7-151) —
    relu6 activations for the bfmnet variant, elu for the atvgnet variant
    (voicepuppet/atvgnet/tinynet.py:9).
  * ``MfccNet``: the audio backbone treating the mel spectrogram as an image
    [B, T*5, 80, 1], downsampling frequency x64 while preserving time
    (tinynet.py:154-215).
  * ``ThinNet``: the image variant (tinynet.py:218-275 widths).
  * ``TFGRUCell`` + :func:`masked_gru`: a GRU matching tf.contrib.rnn.GRUCell
    gate math (reset applied to ``h`` *before* the candidate matmul, gate
    bias init 1.0) and ``tf.nn.dynamic_rnn``'s sequence_length *output*
    masking (outputs zeroed past each row's length; ref: bfmnet.py:52-63),
    driven by ``lax.scan``.

BatchNorm follows tf.contrib.layers.batch_norm defaults (decay .999,
epsilon 1e-3, center only, no scale; tinynet.py:25).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def xavier_uniform():
    return nn.initializers.xavier_uniform()


class TFBatchNorm(nn.Module):
    """tf.contrib.layers.batch_norm defaults (decay .999, eps 1e-3,
    center=True, scale=False).

    ``axis_name`` enables cross-replica ("sync") batch norm: moments are
    pmean-reduced over the named mesh axis inside shard_map, so data-parallel
    training is bit-for-bit the reference's single-device full-batch
    semantics instead of per-shard statistics."""
    use_running_average: Optional[bool] = None
    momentum: float = 0.999
    epsilon: float = 1e-3
    use_scale: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        ura = nn.merge_param("use_running_average",
                             self.use_running_average, use_running_average)
        # moments/normalization always in float32 (bf16 backbones cast
        # around the BN, like pixrefer's StatelessBatchNorm)
        y = nn.BatchNorm(use_running_average=ura,
                         momentum=self.momentum, epsilon=self.epsilon,
                         use_bias=True, use_scale=self.use_scale,
                         axis_name=self.axis_name if not ura else None)(
                             x.astype(jnp.float32))
        return y.astype(x.dtype)


class ConvBN(nn.Module):
    """conv2d -> BN -> activation (ref: tinynet.py:12-27; the stem conv uses
    plain relu even though blocks use relu6/elu)."""
    features: int
    kernel: Tuple[int, int]
    stride: Tuple[int, int]
    activation: Callable = nn.relu
    bn_axis: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.features, self.kernel, strides=self.stride,
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    kernel_init=xavier_uniform())(x)
        x = TFBatchNorm(axis_name=self.bn_axis)(
            x, use_running_average=not train)
        return self.activation(x)


class InvertedResidual(nn.Module):
    """MobileNetV2 inverted residual (ref: tinynet.py:120-142):
    1x1 expansion (+BN+act) -> depthwise [7,3] (+BN+act) -> 1x1 projection
    (+BN); residual added at stride 1 with a 1x1+BN shortcut when channel
    counts differ."""
    features: int
    stride: Tuple[int, int] = (1, 1)
    expansion: int = 6
    dw_kernel: Tuple[int, int] = (7, 3)
    activation: Callable = nn.relu6
    bn_axis: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, time_mask=None):
        inputs = x
        in_ch = x.shape[-1]
        # expansion_conv2d (tinynet.py:46-65)
        x = nn.Conv(in_ch * self.expansion, (1, 1), strides=(1, 1),
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    kernel_init=xavier_uniform())(x)
        x = TFBatchNorm(axis_name=self.bn_axis)(
            x, use_running_average=not train)
        x = self.activation(x)
        if time_mask is not None:
            # bucket-padding exactness (MfccNet valid_rows): the depthwise
            # conv below has temporal extent, so the padded rows the 1x1
            # expansion just made nonzero must be re-zeroed to reproduce
            # its 'SAME' padding at the true boundary
            x = jnp.where(time_mask, x, 0.0)
        # depthwise_conv2d (tinynet.py:84-103)
        ch = x.shape[-1]
        x = nn.Conv(ch, self.dw_kernel, strides=self.stride, padding="SAME",
                    feature_group_count=ch, use_bias=False,
                    dtype=self.dtype, kernel_init=xavier_uniform())(x)
        x = TFBatchNorm(axis_name=self.bn_axis)(
            x, use_running_average=not train)
        x = self.activation(x)
        # projection_conv2d (tinynet.py:67-82), no activation
        x = nn.Conv(self.features, (1, 1), strides=(1, 1), padding="SAME",
                    use_bias=False, dtype=self.dtype,
                    kernel_init=xavier_uniform())(x)
        x = TFBatchNorm(axis_name=self.bn_axis)(
            x, use_running_average=not train)

        if self.stride == (1, 1):
            if x.shape[-1] != inputs.shape[-1]:
                inputs = nn.Conv(x.shape[-1], (1, 1), strides=(1, 1),
                                 padding="SAME", use_bias=False,
                                 dtype=self.dtype,
                                 kernel_init=xavier_uniform())(inputs)
                inputs = TFBatchNorm(axis_name=self.bn_axis)(
                    inputs, use_running_average=not train)
            x = x + inputs
        return x


def max_pool_same(x, window: Tuple[int, int], stride: Tuple[int, int]):
    """tf.layers.max_pooling2d(padding='same')."""
    return nn.max_pool(x, window, strides=stride, padding="SAME")


class MfccNet(nn.Module):
    """Audio backbone over mel "images" (ref: tinynet.py:154-215).

    Input [B, T*5, 80, C]: frequency is downsampled x64 (stem conv stride
    [1,2] + four maxpools [1,2]); time is preserved.  Output channels =
    ``output_channels`` (256 for BFMNet; bfmnet.py:147)."""
    output_channels: int = 256
    activation: Callable = nn.relu6
    width_mult: float = 1.0
    bn_axis: Optional[str] = None
    # serving compute dtype for every conv (params stay f32, BN moments
    # forced f32 in TFBatchNorm); bf16 runs the stack on the MXU at 2x
    dtype: Any = jnp.float32
    # (stem, b1..b7) widths; bfmnet variant by default, the atvgnet/elu
    # variant uses MOBILENET_WIDTHS (atvgnet/tinynet.py:169-207)
    widths: Tuple[int, ...] = (32, 64, 64, 128, 192, 256, 256, 256)

    @nn.compact
    def __call__(self, x, train: bool = True, valid_rows=None):
        """``valid_rows`` (optional [B] int32): number of valid TIME rows.
        When set, activations past each row's length are re-zeroed after
        every stage, which makes a time-padded run EQUAL the exact-length
        run for valid rows: each conv then sees (values, zeros beyond) —
        exactly its 'SAME' zero padding at the true boundary — and pools
        see -inf there, exactly their 'SAME' padding.  Time is never
        downsampled in this net, so the mask is constant depth-wise.
        Serving surface for bucket-padded clip lengths
        (pipeline/synthesize.py predict_expressions)."""
        if valid_rows is None:
            tmask = None
            m0 = lambda v: v
            pool = max_pool_same
        else:
            rows = jax.lax.broadcasted_iota(jnp.int32, x.shape[:2], 1)
            tmask = (rows < valid_rows[:, None])[..., None, None]

            def m0(v):
                return jnp.where(tmask, v, 0.0)

            def pool(v, window, stride):
                neg = jnp.where(tmask, v, -jnp.inf)
                return m0(max_pool_same(neg, window, stride))

        act = self.activation
        # the bfmnet variant's stem/head conv uses plain relu even though
        # blocks use relu6 (bfmnet/tinynet.py:26); the atvgnet variant
        # applies its elu everywhere (atvgnet/tinynet.py:26)
        stem_act = nn.relu if act is nn.relu6 else act
        w = lambda f: max(8, int(f * self.width_mult))
        wd = self.widths
        ir = lambda f, e=6: InvertedResidual(w(f), (1, 1), e,
                                             activation=act,
                                             bn_axis=self.bn_axis,
                                             dtype=self.dtype)
        x = m0(x.astype(self.dtype))
        x = m0(ConvBN(w(wd[0]), (9, 5), (1, 2), activation=stem_act,
                      bn_axis=self.bn_axis,
                      dtype=self.dtype)(x, train))               # block0_0
        x = m0(ir(wd[1], 1)(x, train, tmask))                    # block1_0
        x = m0(ir(wd[2])(x, train, tmask))                       # block2_0
        x = pool(x, (2, 2), (1, 2))
        x = m0(ir(wd[2])(x, train, tmask))                       # block2_1
        x = m0(ir(wd[3])(x, train, tmask))                       # block3_0
        x = pool(x, (2, 2), (1, 2))
        x = m0(ir(wd[3])(x, train, tmask))                       # block3_1
        x = m0(ir(wd[3])(x, train, tmask))                       # block3_2
        x = m0(ir(wd[4])(x, train, tmask))                       # block4_0
        x = pool(x, (2, 2), (1, 2))
        x = m0(ir(wd[4])(x, train, tmask))                       # block4_1
        x = m0(ir(wd[4])(x, train, tmask))                       # block4_2
        x = m0(ir(wd[4])(x, train, tmask))                       # block4_3
        x = m0(ir(wd[5])(x, train, tmask))                       # block5_0
        x = m0(ir(wd[5])(x, train, tmask))                       # block5_1
        x = m0(ir(wd[5])(x, train, tmask))                       # block5_2
        x = m0(ir(wd[6])(x, train, tmask))                       # block6_0
        x = pool(x, (2, 2), (1, 2))
        x = m0(ir(wd[6])(x, train, tmask))                       # block6_1
        x = m0(ir(wd[6])(x, train, tmask))                       # block6_2
        x = m0(ir(wd[7])(x, train, tmask))                       # block7_0
        x = m0(ConvBN(self.output_channels, (1, 1), (1, 1),
                      activation=stem_act, bn_axis=self.bn_axis,
                      dtype=self.dtype)(x, train))               # block8_0
        return x.astype(jnp.float32)


# atvgnet width schedule (true MobileNetV2; atvgnet/tinynet.py:172-204)
MOBILENET_WIDTHS = (32, 16, 24, 32, 64, 96, 160, 320)


class ThinNet(nn.Module):
    """Image backbone with true-MobileNetV2 widths and spatial stride-2 stem
    (ref: voicepuppet/atvgnet/tinynet.py:218-275; elu activations per
    atvgnet/tinynet.py:9)."""
    output_channels: int = 256
    activation: Callable = nn.elu
    width_mult: float = 1.0
    bn_axis: Optional[str] = None
    # bfmnet/tinynet.py ThinNet has a stride-2 stem (tinynet.py:233);
    # the atvgnet variant preserves spatial resolution (stride [1,1],
    # atvgnet/tinynet.py:233)
    stem_stride: Tuple[int, int] = (2, 2)
    widths: Tuple[int, ...] = (32, 16, 24, 32, 64, 96, 160, 320)

    @nn.compact
    def __call__(self, x, train: bool = True):
        act = self.activation
        stem_act = nn.relu if act is nn.relu6 else act
        w = lambda f: max(8, int(f * self.width_mult))
        wd = self.widths
        ir = lambda f, e=6: InvertedResidual(w(f), (1, 1), e,
                                             activation=act,
                                             bn_axis=self.bn_axis)
        x = ConvBN(w(wd[0]), (3, 3), self.stem_stride,
                   activation=stem_act,
                   bn_axis=self.bn_axis)(x, train)
        x = ir(wd[1], 1)(x, train)
        for f, reps in ((wd[2], 2), (wd[3], 3), (wd[4], 4), (wd[5], 3),
                        (wd[6], 3)):
            for _ in range(reps):
                x = ir(f)(x, train)
        x = ir(wd[7])(x, train)
        x = ConvBN(self.output_channels, (1, 1), (1, 1),
                   activation=stem_act,
                   bn_axis=self.bn_axis)(x, train)
        return x


class TFGRUCell(nn.Module):
    """GRU with tf.contrib.rnn.GRUCell math (ref: bfmnet.py:53):

      r, u = sigmoid([x, h] @ W_g + 1.0)
      c    = tanh([x, r*h] @ W_c)
      h'   = u*h + (1-u)*c

    with orthogonal kernel init (bfmnet.py:53)."""
    num_units: int

    @nn.compact
    def __call__(self, h, x):
        concat = jnp.concatenate([x, h], axis=-1)
        gates = nn.Dense(2 * self.num_units,
                         kernel_init=nn.initializers.orthogonal(),
                         bias_init=nn.initializers.constant(1.0))(concat)
        r, u = jnp.split(jax.nn.sigmoid(gates), 2, axis=-1)
        cand_in = jnp.concatenate([x, r * h], axis=-1)
        c = jnp.tanh(nn.Dense(self.num_units,
                              kernel_init=nn.initializers.orthogonal())(
                                  cand_in))
        new_h = u * h + (1 - u) * c
        return new_h, new_h


class masked_gru(nn.Module):
    """tf.nn.dynamic_rnn(sequence_length=...) *output* semantics over a
    TFGRUCell stack (ref: bfmnet.py:44-69): scan over time, then zero the
    outputs past each row's length.  dynamic_rnn additionally freezes the
    carried state past seq_len; with ``return_state=True`` the returned
    finals reproduce that by reading the pre-mask output at t=seq_len-1
    (h0 for seq_len=0) — for a GRU the output IS the state, so this equals
    the frozen carry.  Output dropout mirrors
    tf.contrib.rnn.DropoutWrapper(output_keep_prob=1-drop_rate).

    ``initial_state`` / ``return_state`` support exact chunked streaming
    inference: the GRU recurrence is streamable by construction — running
    it chunk-by-chunk with the carried state equals the whole-clip run
    (pipeline/streaming.py)."""
    num_units: int
    num_layers: int = 1
    drop_rate: float = 0.25
    axis_name: Optional[str] = None  # set when running inside shard_map

    @nn.compact
    def __call__(self, inputs, seq_len, train: bool = True,
                 initial_state=None, return_state: bool = False):
        b, t, _ = inputs.shape
        x = inputs
        finals = []
        for layer in range(self.num_layers):
            cell = nn.scan(TFGRUCell, variable_broadcast="params",
                           split_rngs={"params": False},
                           in_axes=1, out_axes=1)(self.num_units)
            if initial_state is not None:
                h0 = initial_state[layer]
            else:
                h0 = jnp.zeros((b, self.num_units), inputs.dtype)
            if self.axis_name is not None:
                # mark the initial carry as device-varying so the scan's
                # carry types agree under shard_map VMA checking
                h0 = jax.lax.pcast(h0, self.axis_name, to="varying")
            _, outputs = cell(h0, x)
            # dynamic_rnn final-state semantics: the carry freezes at each
            # row's seq_len, i.e. final = output at t=seq_len-1 (GRU
            # output == state), falling back to h0 for empty rows
            idx = jnp.clip(seq_len.astype(jnp.int32) - 1, 0, t - 1)
            at_len = jnp.take_along_axis(outputs, idx[:, None, None],
                                         axis=1)[:, 0]
            finals.append(jnp.where((seq_len > 0)[:, None], at_len, h0))
            # dynamic_rnn masking: zero outputs past seq_len
            mask = (jnp.arange(t)[None, :] < seq_len[:, None])
            outputs = outputs * mask[..., None]
            if train and self.drop_rate > 0:
                outputs = nn.Dropout(rate=self.drop_rate,
                                     deterministic=False)(outputs)
            x = outputs
        if return_state:
            return x, finals
        return x


def leaky_relu(x):
    """tf.nn.leaky_relu default alpha=0.2."""
    return jax.nn.leaky_relu(x, negative_slope=0.2)


def l2_regularization(params, scale: float = 1e-4,
                      key_filter: str = "kernel") -> jax.Array:
    """tf.contrib.layers.l2_regularizer semantics: scale * sum(w**2)/2 over
    conv/depthwise kernels (ref: tinynet.py:10 — only the backbone convs
    carry the regularizer)."""
    from collections.abc import Mapping
    leaves = []

    def visit(tree, path):
        if isinstance(tree, Mapping):
            for k, v in tree.items():
                visit(v, path + (k,))
        else:
            if path and path[-1] == key_filter and getattr(tree, "ndim",
                                                           0) >= 4:
                leaves.append(tree)

    visit(params, ())
    if not leaves:
        return jnp.asarray(0.0, jnp.float32)
    return scale * 0.5 * sum(jnp.sum(jnp.square(w)) for w in leaves)
