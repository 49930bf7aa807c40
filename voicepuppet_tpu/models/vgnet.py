"""VGNet — landmark-sequence + example-image -> video GAN (legacy ATVGNet,
ATVG/CVPR'19-style; cited at reference vgnet.py:905).

flax re-architecture of voicepuppet/atvgnet/vgnet.py (bit-rotted in the
reference — stale imports, vgnet.py:11):

Generator (:451-627):
  * ImageEncoder1/2 (:15-105): elu conv stacks to 1/4 (128ch) and 1/16
    (512ch) of the example image
  * landmark path (:108-214): dense-64 -> reshape to an (S/16)² map ->
    conv256 -> conv512, applied to both the example landmark and every
    frame of the sequence
  * per-frame attention (:155-187, :542): deconv x4 over the concat of
    frame/example landmark encodings -> sigmoid 1ch map at 1/4 scale
  * bottleneck (:217-241, :553-560): conv128 over concat(img_feature,
    lmk_feature - ex_lmk_feature)
  * Conv2dGRU (:350-448): convolutional GRU cell (3x3 convs for gates and
    candidate, batch-normalized, orthogonal init) scanned over time with
    sequence-length masking
  * video head (:468-521): GenBase (ThinNet-128 + deconv x4) fused with
    ImageEncoder1 through the landmark attention, BaseNet deconvs to full
    res, then color (tanh) ⊕ attention (sigmoid) compositing against the
    tiled example image

Discriminator (:742-808): per-frame conv encoder (no BN/activation,
:650-682) + landmark dense encoder -> GRU(256) -> per-step score (masked
mean -> sigmoid) and a landmark-regression head added to the example
landmark.

Losses (:848-934): D: -log(D_real) - log(1-D_fake) + landmark MSE on both;
G: -log(D_fake) + landmark MSE + pixel MSE weighted by (mask+0.5) *
(stop_gradient(attention)+0.5).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from voicepuppet_tpu.config import VGNetConfig
from voicepuppet_tpu.models.layers import (MOBILENET_WIDTHS, TFBatchNorm,
                                           ThinNet, masked_gru)


def _orth():
    return nn.initializers.orthogonal()


class ConvBNElu(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    bn_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding="SAME",
                    use_bias=False, kernel_init=_orth())(x)
        x = TFBatchNorm(axis_name=self.bn_axis)(
            x, use_running_average=not train)
        return jax.nn.elu(x)


class DeconvBNElu(nn.Module):
    features: int
    bn_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.ConvTranspose(self.features, (3, 3), strides=(2, 2),
                             padding="SAME", use_bias=False,
                             kernel_init=_orth())(x)
        x = TFBatchNorm(axis_name=self.bn_axis)(
            x, use_running_average=not train)
        return jax.nn.elu(x)


class StatelessCenterBN(nn.Module):
    """Per-batch-moment norm with learned offset only (tf-contrib BN shape:
    center=True, scale=False, eps 1e-3) and no running averages — used
    inside the scanned conv-GRU cell where carrying mutable BN state
    through nn.scan is ill-defined (divergence from the reference's
    moving-average eval mode; the cell normalizes per step either way at
    train time, vgnet.py:399-419)."""
    epsilon: float = 1e-3
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        beta = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        red = tuple(range(x.ndim - 1))
        mean = jnp.mean(x, axis=red)
        mean2 = jnp.mean(jnp.square(x), axis=red)
        if self.axis_name is not None:
            mean = jax.lax.pmean(mean, self.axis_name)
            mean2 = jax.lax.pmean(mean2, self.axis_name)
        var = mean2 - jnp.square(mean)
        return (x - mean) * jax.lax.rsqrt(var + self.epsilon) + beta


class Conv2dGRUCell(nn.Module):
    """Convolutional GRU (ref: vgnet.py:350-424): 3x3 gate conv producing
    r,u (each batch-normalized), candidate conv on [x, r*h], update
    ``h' = u*h + (1-u)*tanh(c)``."""
    filters: int = 512
    bn_axis: Optional[str] = None
    train: bool = True

    @nn.compact
    def __call__(self, h, x):
        inp = jnp.concatenate([x, h], axis=-1)
        y = nn.Conv(2 * self.filters, (3, 3), padding="SAME",
                    use_bias=False, kernel_init=_orth(), name="gates")(inp)
        r, u = jnp.split(y, 2, axis=-1)
        bn = lambda name: StatelessCenterBN(axis_name=self.bn_axis,
                                            name=name)
        r = jax.nn.sigmoid(bn("bn_r")(r))
        u = jax.nn.sigmoid(bn("bn_u")(u))
        cand = nn.Conv(self.filters, (3, 3), padding="SAME",
                       use_bias=False, kernel_init=_orth(),
                       name="candidate")(
            jnp.concatenate([x, r * h], axis=-1))
        cand = bn("bn_c")(cand)
        new_h = u * h + (1 - u) * jnp.tanh(cand)
        return new_h, new_h


class Conv2dGRU(nn.Module):
    """Scan the conv-GRU over [B,T,H,W,C] with dynamic_rnn masking
    (ref: vgnet.py:427-448), then BN + elu."""
    filters: int = 512
    bn_axis: Optional[str] = None

    @nn.compact
    def __call__(self, inputs, seq_len, train: bool):
        b, t, h, w, _ = inputs.shape
        cell = nn.scan(Conv2dGRUCell, variable_broadcast="params",
                       split_rngs={"params": False}, in_axes=1,
                       out_axes=1)(self.filters, self.bn_axis, train)
        h0 = jnp.zeros((b, h, w, self.filters), inputs.dtype)
        if self.bn_axis is not None:
            h0 = jax.lax.pcast(h0, self.bn_axis, to="varying")
        _, out = cell(h0, inputs)
        mask = (jnp.arange(t)[None, :] < seq_len[:, None]).astype(
            inputs.dtype)
        out = out * mask[:, :, None, None, None]
        out = TFBatchNorm(axis_name=self.bn_axis)(
            out, use_running_average=not train)
        return jax.nn.elu(out)


class VGNetGenerator(nn.Module):
    """ref: vgnet.py:451-627.  example_img [B,S,S,3],
    landmark_seq [B,T,136], example_landmark [B,136], seq_len [B] ->
    (video [B,T,S,S,3], attention [B,T,S,S,1], color [B,T,S,S,3])."""
    cfg: VGNetConfig
    bn_axis: Optional[str] = None

    @nn.compact
    def __call__(self, example_img, landmark_seq, example_landmark,
                 seq_len, train: bool = True):
        a = self.bn_axis
        b, t, _ = landmark_seq.shape
        s = example_img.shape[1]
        s16 = s // 16

        # image encoders (vgnet.py:26-105)
        x = ConvBNElu(64, 7, 1, a)(example_img, train)
        x = ConvBNElu(64, 3, 2, a)(x, train)
        img_encoding1 = ConvBNElu(128, 3, 2, a)(x, train)      # [B,S/4,.,128]
        x = ConvBNElu(256, 3, 2, a)(img_encoding1, train)
        img_feature = ConvBNElu(512, 3, 2, a)(x, train)        # [B,S/16,.,512]

        # landmark path, shared weights between example and sequence
        lmk_enc1 = nn.Dense(s16 * s16, kernel_init=_orth(),
                            name="landmark_encoder1")
        lmk_enc2 = ConvBNElu(256, 3, 1, a, name="landmark_encoder2")
        lmk_feat = ConvBNElu(512, 3, 1, a, name="landmark_feature")

        def encode_lmk(lmk_flat):
            e1 = jax.nn.elu(lmk_enc1(lmk_flat)).reshape(-1, s16, s16, 1)
            e2 = lmk_enc2(e1, train)
            return e2, lmk_feat(e2, train)

        ex_enc2, ex_feat = encode_lmk(example_landmark)        # [B,...]
        seq_enc2, seq_feat = encode_lmk(
            landmark_seq.reshape(b * t, -1))                   # [BT,...]

        # per-frame attention (vgnet.py:536-548)
        ex_enc2_t = jnp.tile(ex_enc2[:, None], (1, t, 1, 1, 1)).reshape(
            b * t, s16, s16, 256)
        att_in = jnp.concatenate([seq_enc2, ex_enc2_t], axis=-1)
        y = DeconvBNElu(256, a, name="att_deconv1")(att_in, train)
        y = DeconvBNElu(128, a, name="att_deconv2")(y, train)
        y = nn.Conv(1, (3, 3), padding="SAME", use_bias=False,
                    kernel_init=_orth(), name="att_out")(y)
        y = TFBatchNorm(axis_name=a, name="att_bn")(
            y, use_running_average=not train)
        lmk_atts = jax.nn.sigmoid(y)                           # [BT,S/4,.,1]

        # bottleneck (vgnet.py:550-560)
        img_feat_t = jnp.tile(img_feature[:, None],
                              (1, t, 1, 1, 1)).reshape(b * t, s16, s16,
                                                       512)
        ex_feat_t = jnp.tile(ex_feat[:, None],
                             (1, t, 1, 1, 1)).reshape(b * t, s16, s16, 512)
        bott_in = jnp.concatenate([img_feat_t, seq_feat - ex_feat_t],
                                  axis=-1)
        bott = ConvBNElu(128, 3, 1, a, name="bottleneck")(bott_in, train)
        bott = bott.reshape(b, t, s16, s16, 128)

        # temporal core (vgnet.py:602-603)
        gru_out = Conv2dGRU(512, a, name="conv_gru")(bott, seq_len, train)
        gru_flat = gru_out.reshape(b * t, s16, s16, 512)

        # video head (vgnet.py:468-521)
        vt = ThinNet(128, activation=jax.nn.elu, widths=MOBILENET_WIDTHS,
                     stem_stride=(1, 1), bn_axis=a,
                     name="genbase_thinnet")(gru_flat, train)
        vt = DeconvBNElu(256, a, name="genbase_deconv1")(vt, train)
        vt = DeconvBNElu(128, a, name="genbase_deconv2")(vt, train)

        img_enc1_t = jnp.tile(img_encoding1[:, None],
                              (1, t, 1, 1, 1)).reshape(b * t, s // 4,
                                                       s // 4, 128)
        vt = img_enc1_t * (1 - lmk_atts) + vt * lmk_atts

        base = DeconvBNElu(64, a, name="basenet_deconv1")(vt, train)
        base = DeconvBNElu(32, a, name="basenet_deconv2")(base, train)
        color = jnp.tanh(nn.Conv(3, (7, 7), padding="SAME", use_bias=False,
                                 kernel_init=_orth(),
                                 name="gen_color")(base))
        attention = jax.nn.sigmoid(
            nn.Conv(1, (7, 7), padding="SAME", use_bias=False,
                    kernel_init=_orth(), name="gen_attention")(base))

        ex_img_t = jnp.tile(example_img[:, None],
                            (1, t, 1, 1, 1)).reshape(b * t, s, s, 3)
        video = attention * color + (1 - attention) * ex_img_t
        return (video.reshape(b, t, s, s, 3),
                attention.reshape(b, t, s, s, 1),
                color.reshape(b, t, s, s, 3))


class VGNetDiscriminator(nn.Module):
    """ref: vgnet.py:630-808.  (img_seq [B,T,S,S,3],
    example_landmark [B,136], seq_len) -> (score [B], lmk_seq [B,T,136])."""
    cfg: VGNetConfig
    bn_axis: Optional[str] = None

    @nn.compact
    def __call__(self, img_seq, example_landmark, seq_len,
                 train: bool = True):
        b, t, s, _, _ = img_seq.shape
        # landmark encoder (vgnet.py:634-637)
        le = jax.nn.elu(nn.Dense(256, use_bias=False,
                                 name="dis_lmk_1")(example_landmark))
        le = jax.nn.elu(nn.Dense(512, use_bias=False, name="dis_lmk_2")(le))

        # per-frame image encoder — NO norm/activation between convs
        # (vgnet.py:650-682)
        x = img_seq.reshape(b * t, s, s, 3)
        for i, ch in enumerate((64, 128, 128, 256)):
            x = nn.Conv(ch, (3, 3), strides=(2, 2), padding="SAME",
                        use_bias=False, kernel_init=_orth(),
                        name=f"dis_conv_{i + 1}")(x)
        x = x.reshape(b * t, -1)
        x = jax.nn.elu(nn.Dense(512, use_bias=False, name="dis_img_fc")(x))
        x = x.reshape(b, t, 512)

        feat = jnp.concatenate(
            [x, jnp.tile(le[:, None], (1, t, 1))], axis=-1)
        drop = 0.25 if train else 0.0  # keep_prob .75 (vgnet.py:693)
        rnn = masked_gru(256, 1, drop, axis_name=self.bn_axis,
                         name="dis_rnn")(feat, seq_len, train=train)

        score = nn.Dense(1, use_bias=False, name="decision")(rnn)[..., 0]
        mask = (jnp.arange(t)[None, :] < seq_len[:, None]).astype(
            jnp.float32)
        score = jnp.sum(score * mask, axis=-1) / seq_len.astype(jnp.float32)
        score = jax.nn.sigmoid(score)

        lmk = jnp.tanh(nn.Dense(136, use_bias=False,
                                name="rnn_dense")(rnn))
        lmk = lmk + jnp.tile(example_landmark[:, None], (1, t, 1))
        return score, lmk


def vgnet_discriminator_loss(real_score, real_lmk, fake_score, fake_lmk,
                             real_landmark_seq, seq_len,
                             eps: float = 1e-12):
    """ref: vgnet.py:848-892."""
    t = real_lmk.shape[1]
    mask = (jnp.arange(t)[None, :] < seq_len[:, None]).astype(jnp.float32)
    bce1 = jnp.mean(-jnp.log(real_score + eps))
    bce2 = jnp.mean(-jnp.log(1 - fake_score + eps))
    mse_r = jnp.mean(jnp.square(real_lmk - real_landmark_seq), axis=-1)
    mse_f = jnp.mean(jnp.square(fake_lmk - real_landmark_seq), axis=-1)
    lmk1 = jnp.mean(jnp.sum(mse_r * mask, axis=-1))
    lmk2 = jnp.mean(jnp.sum(mse_f * mask, axis=-1))
    return bce1 + lmk1 + bce2 + lmk2


def vgnet_generator_loss(fake_score, fake_lmk, fake_img_seq, attention,
                         real_landmark_seq, real_mask_seq, real_img_seq,
                         seq_len, eps: float = 1e-12):
    """ref: vgnet.py:894-934 — attention is stop-gradiented in the pixel
    weight (vgnet.py:906)."""
    t = fake_lmk.shape[1]
    mask = (jnp.arange(t)[None, :] < seq_len[:, None]).astype(jnp.float32)
    bce = jnp.mean(-jnp.log(fake_score + eps))
    mse = jnp.mean(jnp.square(fake_lmk - real_landmark_seq), axis=-1)
    lmk = jnp.mean(jnp.sum(mse * mask, axis=-1))
    att = jax.lax.stop_gradient(attention)
    diff = (jnp.square(real_img_seq - fake_img_seq)
            * (real_mask_seq + 0.5) * (att + 0.5))
    pix = jnp.mean(jnp.sum(jnp.sum(diff, axis=(2, 3, 4)) * mask, axis=-1))
    return bce + lmk + pix, bce, lmk, pix
