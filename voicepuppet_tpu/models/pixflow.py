"""PixFlowNet — skip-free GAN driven by rendered-face feature differences.

flax re-architecture of voicepuppet/pixflow/pixflow.py:

Generator (:222-255): ``encoder_net`` embeds the reference *foreground*
(:111-131: 7x7 stride-2 stem + three 4x4 stride-2 conv+BN levels to ngf*8);
``diffnet`` (:133-152, shared weights) embeds both rendered faces and their
feature difference ``feat_cur - feat_ref`` carries the motion; two resnet
stacks (:95-109: 3x3 conv+BN+lrelu+dropout(0.5)+3x3 conv+BN + skip) process
the encoding and the difference, their SUM feeds ``decoder_net`` (:154-187:
two more resnet blocks then three 4x4 deconvs + a 7x7 deconv) -> tanh
RGB+alpha.  Composite (:260-264): ``out = rgb*α + α - 1`` — black
background, no target compositing.

Discriminator (:189-220): PatchGAN with ndf=48 (:24).

Losses (:293-312): like PixRefer but the real term is NOT doubled, and the
L1 target is the current foreground ``fg_inputs[..., 3:]``.

Same stateless always-batch-stats BN as PixRefer (:91-93).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from voicepuppet_tpu.config import PixFlowConfig
from voicepuppet_tpu.models.pixrefer import (DiscrimConv, GenConv,
                                             GenDeconv, StatelessBatchNorm,
                                             conv_init, lrelu, preprocess,
                                             deprocess)


class ResBlock(nn.Module):
    """ref: pixflow.py:95-109 (note: assumes in/out channels equal, as the
    reference does — the "out_channels" specs match the input width)."""
    features: int
    drop_rate: float = 0.5
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        bn = lambda: StatelessBatchNorm(axis_name=self.axis_name)
        y = nn.Conv(self.features, (3, 3), padding="SAME",
                    kernel_init=conv_init(), dtype=self.dtype)(x)
        y = lrelu(bn()(y))
        if train:
            y = nn.Dropout(rate=self.drop_rate, deterministic=False)(y)
        y = nn.Conv(self.features, (3, 3), padding="SAME",
                    kernel_init=conv_init(), dtype=self.dtype)(y)
        return x + bn()(y)


class EncoderNet(nn.Module):
    """ref: pixflow.py:111-131; ``stem7`` distinguishes the 7x7 stem."""
    ngf: int
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        bn = lambda: StatelessBatchNorm(axis_name=self.axis_name)
        x = nn.Conv(self.ngf, (7, 7), strides=(2, 2), padding="SAME",
                    kernel_init=conv_init(), dtype=self.dtype,
                    name="stem7")(x)
        for i, ch in enumerate((self.ngf * 2, self.ngf * 4, self.ngf * 8)):
            x = GenConv(ch, dtype=self.dtype, name=f"enc_{i + 1}")(lrelu(x))
            x = bn()(x)
        return x


class PixFlowGenerator(nn.Module):
    """ref: pixflow.py:222-255."""
    ngf: int = 64
    out_channels: int = 4
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, fg_inputs, train: bool = True):
        a = self.axis_name
        inputs = inputs.astype(self.dtype)
        fg_inputs = fg_inputs.astype(self.dtype)
        encode_feat = EncoderNet(self.ngf, a, dtype=self.dtype,
                                 name="encoder_net")(fg_inputs[..., :3])
        diff = EncoderNet(self.ngf, a, dtype=self.dtype, name="diffnet")
        feat0 = diff(inputs[..., :3])
        feat1 = diff(inputs[..., 3:])
        diff_feat = feat1 - feat0

        x = encode_feat
        for i in range(2):
            x = ResBlock(self.ngf * 8, axis_name=a, dtype=self.dtype,
                         name=f"pre_resnet_{i + 1}")(x, train)
        d = diff_feat
        for i in range(2):
            d = ResBlock(self.ngf * 8, axis_name=a, dtype=self.dtype,
                         name=f"diff_resnet_{i + 1}")(d, train)
        x = x + d

        # decoder_net (pixflow.py:154-187)
        bn = lambda: StatelessBatchNorm(axis_name=a)
        for i in range(2):
            x = ResBlock(self.ngf * 8, axis_name=a, dtype=self.dtype,
                         name=f"post_resnet_{i + 1}")(x, train)
        for i, ch in enumerate((self.ngf * 8, self.ngf * 4, self.ngf * 2)):
            x = GenDeconv(ch, dtype=self.dtype,
                          name=f"decoder_{i}")(jax.nn.relu(x))
            x = bn()(x)
        x = nn.ConvTranspose(self.out_channels, (7, 7), strides=(2, 2),
                             padding="SAME", kernel_init=conv_init(),
                             dtype=self.dtype,
                             name="final7")(jax.nn.relu(x))
        # tanh + compositing in float32 regardless of conv dtype
        return jnp.tanh(x.astype(jnp.float32))


class PixFlowNet(nn.Module):
    """Generator + composite: inputs [B,S,S,6] (render ref⊕cur),
    fg_inputs [B,S,S,6] (fg ref⊕cur), both in [-1,1].
    Returns (outputs, alphas) with black-background composite
    (ref: pixflow.py:258-267)."""
    cfg: PixFlowConfig
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, fg_inputs, train: bool = True):
        out = PixFlowGenerator(self.cfg.ngf, 4, self.axis_name,
                               dtype=self.dtype,
                               name="generator")(inputs, fg_inputs, train)
        rgb = out[..., :3]
        alpha = jnp.tile((out[..., 3:] + 1.0) / 2.0, (1, 1, 1, 3))
        outputs = rgb * alpha + alpha - 1.0
        return outputs, alpha


def pixflow_discriminator_loss(predict_real, predict_fake,
                               eps: float = 1e-12):
    """ref: pixflow.py:295-300 (single real term, unlike PixRefer)."""
    return jnp.mean(-(jnp.log(predict_real + eps)
                      + jnp.log(1.0 - predict_fake + eps)))


def pixflow_generator_loss(predict_fake, fg_cur, outputs, alphas, masks,
                           gan_weight: float, l1_weight: float,
                           eps: float = 1e-12):
    """ref: pixflow.py:302-312.  ``fg_cur`` = fg_inputs[..., 3:]."""
    gan = jnp.mean(-jnp.log(predict_fake + eps))
    l1 = (jnp.mean(jnp.abs(fg_cur - outputs))
          + jnp.mean(jnp.abs(masks - alphas)))
    return gan * gan_weight + l1 * l1_weight, gan, l1
