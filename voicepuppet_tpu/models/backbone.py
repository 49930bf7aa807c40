"""ThinResnet — resnet-34-style audio backbone.

flax re-architecture of voicepuppet/atvgnet/backbone.py:14-164 (dead code
in the reference — no model imports it — carried for inventory parity):
7x7 stem + [4,1] max-pool, then four bottleneck sections
(48/96/128/output channels) whose 3-conv main paths apply relu after
every conv (including the last, a quirk of the reference,
backbone.py:41-48), conv blocks adding a strided 1x1-proj shortcut
(backbone.py:83-96), and a final frequency-mean pooling
(backbone.py:160)."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from voicepuppet_tpu.models.layers import TFBatchNorm


class _ConvBNRelu(nn.Module):
    features: int
    kernel: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    bn_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.features, self.kernel, strides=self.stride,
                    padding="SAME", use_bias=False,
                    kernel_init=nn.initializers.orthogonal())(x)
        x = TFBatchNorm(axis_name=self.bn_axis)(
            x, use_running_average=not train)
        return jax.nn.relu(x)


class _Block(nn.Module):
    """3-conv block; ``strides`` non-identity makes it a conv block with a
    projected shortcut (backbone.py:54-96), else an identity block
    (backbone.py:22-52)."""
    filters: Tuple[int, int, int]
    kernels: Tuple[Tuple[int, int], ...] = ((1, 1), (3, 3), (1, 1))
    strides: Optional[Tuple[Tuple[int, int], ...]] = None
    bn_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        inp = x
        strides = self.strides or ((1, 1),) * 3
        for f, k, s in zip(self.filters, self.kernels, strides):
            x = _ConvBNRelu(f, k, s, self.bn_axis)(x, train)
        if self.strides is not None:
            short = nn.Conv(self.filters[-1], self.kernels[-1],
                            strides=self.strides[1], padding="SAME",
                            use_bias=False,
                            kernel_init=nn.initializers.orthogonal())(inp)
            short = TFBatchNorm(axis_name=self.bn_axis)(
                short, use_running_average=not train)
        else:
            short = inp
        return jax.nn.relu(x + short)


class ThinResnet(nn.Module):
    """[B, T, F, C] -> [B, F', output_channels] (time mean-pooled;
    backbone.py:160)."""
    output_channels: int = 256
    bn_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        a = self.bn_axis
        x = _ConvBNRelu(64, (7, 7), (1, 1), a)(x, train)
        x = nn.max_pool(x, (4, 1), strides=(4, 1), padding="SAME")
        x = _Block((48, 48, 96),
                   strides=((1, 1), (2, 1), (1, 1)), bn_axis=a)(x, train)
        x = _Block((48, 48, 96), bn_axis=a)(x, train)
        x = _Block((96, 96, 128),
                   strides=((1, 1), (2, 1), (1, 1)), bn_axis=a)(x, train)
        x = _Block((96, 96, 128), bn_axis=a)(x, train)
        x = _Block((96, 96, 128), bn_axis=a)(x, train)
        x = _Block((128, 128, 128),
                   strides=((1, 1), (2, 2), (1, 1)), bn_axis=a)(x, train)
        x = _Block((128, 128, 128),
                   strides=((1, 1), (2, 2), (1, 1)), bn_axis=a)(x, train)
        x = _Block((128, 128, 128), bn_axis=a)(x, train)
        x = _Block((128, 128, self.output_channels),
                   strides=((1, 1), (2, 1), (1, 1)), bn_axis=a)(x, train)
        x = _Block((128, 128, self.output_channels), bn_axis=a)(x, train)
        x = _Block((128, 128, self.output_channels), bn_axis=a)(x, train)
        return jnp.mean(x, axis=1)
