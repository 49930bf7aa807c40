"""PixReferNet — reference-conditioned pix2pix GAN with alpha compositing.

flax re-architecture of voicepuppet/pixrefer/pixrefer.py:

Generator (:166-277): two siamese 4-level strided-conv encoders — a
rendered-face stream (6ch: reference render ⊕ current render) and a
foreground-reference stream (3ch) — concatenated at 1/16 scale, 4 more
encoder levels to the bottleneck, then 7 deconv levels with U-Net skips
(first against the merged trunk, then against the face-stream encoder),
ending in a tanh 4-channel head: RGB + alpha.  Composite (:282-286):
``out = rgb*α + background*(1-α)``; ``out_fg = rgb*α + α - 1`` (black bg in
[-1,1] space).

Discriminator (:103-134): 70x70-style PatchGAN — pad+conv(4x4, valid)
stack with strides 2,2,2,1,1 -> sigmoid score map.  Run twice on real pairs
(reference pair & current pair, averaged) and once on the fake pair
(:295-306).

Losses (:332-354): D: ``-log(D_real)*2 - log(1-D_fake)``;
G: ``gan_weight * -log(D_fake) + l1_weight * (L1(img) + L1(α, mask) +
perceptual)`` with VGG-16 conv3_3 features (:318-328).

BatchNorm note: the reference runs ``tf.layers.batch_normalization(...,
training=True)`` unconditionally — batch statistics even at inference
(:99-101).  That makes running averages dead state, so here BN is a
*stateless* module (per-batch moments + learned scale/offset), which also
removes the mutable-variables plumbing from the GAN step.  ``axis_name``
gives cross-replica moments under data parallelism.

TPU notes: all convs are NHWC 4x4 stride-2 — XLA maps these onto the MXU
directly; at 512² with ngf=64 the generator is ~40 GFLOPs/frame, the real
compute body of the synthesis pipeline.  Inference batches T frames.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from voicepuppet_tpu.config import PixReferConfig


def conv_init():
    # tf.random_normal_initializer(0, 0.02) (ref: pixrefer.py:64, 68)
    return nn.initializers.normal(stddev=0.02)


def lrelu(x, a: float = 0.2):
    """ref: pixrefer.py:88-97."""
    return jax.nn.leaky_relu(x, negative_slope=a)


class StatelessBatchNorm(nn.Module):
    """Per-batch-moment normalization with learned scale/offset — exactly
    the reference's always-``training=True`` batch_normalization
    (pixrefer.py:99-101): eps 1e-5, gamma ~ N(1, 0.02), beta zeros; no
    running averages (they are never consumed in the reference).

    Moments are always accumulated in float32 (a bf16 mean over 512² pixels
    loses ~5 bits to accumulation error); the normalized result is returned
    in the input dtype."""
    epsilon: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        ch = x.shape[-1]
        gamma = self.param("scale",
                           lambda k, s: 1.0 + 0.02 * jax.random.normal(
                               k, s, jnp.float32), (ch,))
        beta = self.param("bias", nn.initializers.zeros, (ch,))
        xf = x.astype(jnp.float32)
        red = tuple(range(x.ndim - 1))
        mean = jnp.mean(xf, axis=red)
        mean2 = jnp.mean(jnp.square(xf), axis=red)
        if self.axis_name is not None:
            mean = jax.lax.pmean(mean, self.axis_name)
            mean2 = jax.lax.pmean(mean2, self.axis_name)
        var = mean2 - jnp.square(mean)
        inv = jax.lax.rsqrt(var + self.epsilon)
        return ((xf - mean) * inv * gamma + beta).astype(x.dtype)


class GenConv(nn.Module):
    """4x4 stride-2 'same' conv (ref: pixrefer.py:66-74)."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (4, 4), strides=(2, 2),
                       padding="SAME", kernel_init=conv_init(),
                       dtype=self.dtype)(x)


class GenDeconv(nn.Module):
    """4x4 stride-2 'same' transposed conv (ref: pixrefer.py:76-86)."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.ConvTranspose(self.features, (4, 4), strides=(2, 2),
                                padding="SAME", kernel_init=conv_init(),
                                dtype=self.dtype)(x)


class DiscrimConv(nn.Module):
    """pad-1 then 4x4 'valid' conv (ref: pixrefer.py:61-64)."""
    features: int
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        return nn.Conv(self.features, (4, 4),
                       strides=(self.stride, self.stride),
                       padding="VALID", kernel_init=conv_init(),
                       dtype=self.dtype)(x)


class Generator(nn.Module):
    """ref: pixrefer.py:166-277.  Returns the raw tanh output [B,H,W,4].

    ``dtype=bfloat16`` runs every conv on the MXU in bf16 (params stay
    float32; flax casts activations per layer) — the serving configuration.
    BN moments stay float32 regardless (StatelessBatchNorm)."""
    ngf: int = 64
    out_channels: int = 4
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, fg_ref):
        bn = lambda: StatelessBatchNorm(axis_name=self.axis_name)
        ngf = self.ngf
        inputs = inputs.astype(self.dtype)
        fg_ref = fg_ref.astype(self.dtype)

        # face-render encoder stream (encoder_1..4)
        conv = functools.partial(GenConv, dtype=self.dtype)
        deconv = functools.partial(GenDeconv, dtype=self.dtype)
        layers = [conv(ngf, name="encoder_1")(inputs)]
        for i, ch in enumerate((ngf * 2, ngf * 2, ngf * 4)):
            x = conv(ch, name=f"encoder_{i + 2}")(lrelu(layers[-1]))
            layers.append(bn()(x))

        # foreground-reference encoder stream (encoder_fg_1..4)
        fg_layers = [conv(ngf, name="encoder_fg_1")(fg_ref)]
        for i, ch in enumerate((ngf * 2, ngf * 2, ngf * 4)):
            x = conv(ch, name=f"encoder_fg_{i + 2}")(lrelu(fg_layers[-1]))
            fg_layers.append(bn()(x))

        # merged trunk (merged_encoder_2..5)
        merged = [jnp.concatenate([layers[-1], fg_layers[-1]], axis=-1)]
        for i, ch in enumerate((ngf * 4, ngf * 8, ngf * 8, ngf * 8)):
            x = conv(ch, name=f"merged_encoder_{i + 2}")(lrelu(merged[-1]))
            merged.append(bn()(x))

        # decoder against the merged trunk (merged_decoder_*), U-Net skips
        num_enc = len(merged)
        for dl, ch in enumerate((ngf * 8, ngf * 8, ngf * 4, ngf * 4)):
            skip = num_enc - dl - 1
            x = merged[-1] if dl == 0 else jnp.concatenate(
                [merged[-1], merged[skip]], axis=-1)
            x = deconv(ch, name=f"merged_decoder_{skip + 1}")(
                jax.nn.relu(x))
            merged.append(bn()(x))

        # decoder against the face-stream encoder (merged2_decoder_*)
        num_enc2 = len(layers)
        for dl, ch in enumerate((ngf * 2, ngf * 2, ngf)):
            skip = num_enc2 - dl - 1
            x = jnp.concatenate([merged[-1], layers[skip]], axis=-1)
            x = deconv(ch, name=f"merged2_decoder_{skip + 1}")(
                jax.nn.relu(x))
            merged.append(bn()(x))

        # decoder_1 -> tanh RGBA; compositing happens in float32
        x = jnp.concatenate([merged[-1], layers[0]], axis=-1)
        x = deconv(self.out_channels, name="decoder_1")(jax.nn.relu(x))
        return jnp.tanh(x.astype(jnp.float32))


class Discriminator(nn.Module):
    """PatchGAN (ref: pixrefer.py:103-134).

    ``dtype=bfloat16`` runs the conv stack on the MXU in bf16 (params stay
    float32; BN moments float32 via StatelessBatchNorm); the score map is
    computed from float32 logits so the sigmoid saturation behavior near
    0/1 — which the -log(D) losses are sensitive to — is unchanged."""
    ndf: int = 64
    n_layers: int = 3
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, d_inputs, d_targets):
        bn = lambda: StatelessBatchNorm(axis_name=self.axis_name)
        conv = functools.partial(DiscrimConv, dtype=self.dtype)
        x = jnp.concatenate([d_inputs, d_targets], axis=-1)
        x = x.astype(self.dtype)
        x = lrelu(conv(self.ndf, 2, name="layer_1")(x))
        for i in range(self.n_layers):
            ch = self.ndf * min(2 ** (i + 1), 8)
            stride = 1 if i == self.n_layers - 1 else 2
            x = conv(ch, stride, name=f"layer_{i + 2}")(x)
            x = lrelu(bn()(x))
        x = conv(1, 1, name=f"layer_{self.n_layers + 2}")(x)
        return jax.nn.sigmoid(x.astype(jnp.float32))


def composite(gen_out: jax.Array, targets: jax.Array):
    """RGB+alpha compositing (ref: pixrefer.py:282-286).  All tensors in
    [-1, 1] except alpha in [0, 1].  Returns (outputs, alphas, outputs_fg).
    """
    rgb = gen_out[..., :3]
    alpha = (gen_out[..., 3:] + 1.0) / 2.0
    alpha = jnp.tile(alpha, (1, 1, 1, 3))
    outputs = rgb * alpha + targets * (1.0 - alpha)
    outputs_fg = rgb * alpha + alpha - 1.0
    return outputs, alpha, outputs_fg


def preprocess(image):
    """[0,1] -> [-1,1] (ref: pixrefer.py:358-361)."""
    return image * 2.0 - 1.0


def deprocess(image):
    """[-1,1] -> [0,1] (ref: pixrefer.py:363-366)."""
    return (image + 1.0) / 2.0


def discriminator_loss(predict_real, predict_fake, eps: float = 1e-12):
    """ref: pixrefer.py:334-340 (the real term is doubled)."""
    return jnp.mean(-(jnp.log(predict_real + eps) * 2.0
                      + jnp.log(1.0 - predict_fake + eps)))


def generator_loss(predict_fake, targets, outputs, alphas, masks,
                   perceptual, gan_weight: float, l1_weight: float,
                   eps: float = 1e-12):
    """ref: pixrefer.py:342-354.  Returns (total, gan_term, l1_term)."""
    gan = jnp.mean(-jnp.log(predict_fake + eps))
    l1 = (jnp.mean(jnp.abs(targets - outputs))
          + jnp.mean(jnp.abs(masks - alphas))
          + jnp.mean(perceptual))
    return gan * gan_weight + l1 * l1_weight, gan, l1


class PixReferNet(nn.Module):
    """Generator-side module: inputs [B,S,S,6] (render ref⊕cur),
    fg_inputs [B,S,S,6] (fg ref⊕cur), targets/background [B,S,S,3] — all
    already preprocessed to [-1,1].  The generator only sees
    ``fg_inputs[..., :3]`` (the reference fg; pixrefer.py:281)."""
    cfg: PixReferConfig
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, fg_inputs, targets):
        gen_out = Generator(self.cfg.ngf, 4, self.axis_name,
                            dtype=self.dtype,
                            name="generator")(inputs, fg_inputs[..., :3])
        return composite(gen_out, targets)
