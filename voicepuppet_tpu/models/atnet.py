"""ATNet — audio -> 68-point facial landmarks (legacy ATVGNet subsystem).

flax re-architecture of voicepuppet/atvgnet/atnet.py (note: the reference
copy is bit-rotted — stale ``papio.builder`` import at atnet.py:9 and
missing PCA asset hparams; SURVEY.md §2.4 — this rebuild is functional):

  * MfccEncoder (atnet.py:17-35): the elu/MobileNetV2-width backbone
    (atvgnet/tinynet.py) + max-pool to one 256-vec per video frame, then
    dense + BN + elu (atnet.py:214-222)
  * LandmarkEncoder (atnet.py:61-82): the example landmark is first
    projected through the 6-component PCA (atnet.py:210), tiled over time,
    dense + BN + elu
  * PoseEncoder (atnet.py:38-58): dense + BN + elu over [B,T,3] poses
  * the three embeddings are SUMMED into a GRU(128) (atnet.py:232-235)
  * LandmarkDecoder (atnet.py:113-143): dense64+BN+elu -> tanh 6-dim PCA
    code x0.9 -> concat ear -> tanh 24-dim eye offsets x0.1 ->
    ``code @ component`` + eye offsets padded into landmark dims [72, 96)

Loss (atnet.py:248-262): masked MSE per frame + temporal MSE + L2 reg.
The PCA ``component`` matrix [6, 136] is an asset input (the reference
loads ``components_file``, absent from its config — pass any [K, 136]
array; tests use a random orthonormal basis).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from voicepuppet_tpu.config import ATNetConfig
from voicepuppet_tpu.models.layers import (MfccNet, MOBILENET_WIDTHS,
                                           TFBatchNorm, masked_gru,
                                           max_pool_same)


class DenseBNElu(nn.Module):
    features: int
    bn_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Dense(self.features,
                     kernel_init=nn.initializers.xavier_uniform())(x)
        x = TFBatchNorm(axis_name=self.bn_axis)(
            x, use_running_average=not train)
        return jax.nn.elu(x)


class ATNet(nn.Module):
    """Inputs: ears [B,T,1], poses [B,T,3], mfccs [B,T*5,80],
    example_landmark [B,136], seq_len [B].  Output: landmarks [B,T,136]."""
    cfg: ATNetConfig
    component: np.ndarray  # [K, 136] PCA basis
    bn_axis: Optional[str] = None
    width_mult: float = 1.0

    @nn.compact
    def __call__(self, ears, poses, mfccs, example_landmark, seq_len,
                 train: bool = True):
        c = self.cfg
        comp = jnp.asarray(self.component, jnp.float32)
        drop = c.training.drop_rate if train else 0.0
        t = poses.shape[1]

        # mfcc_encoder (atnet.py:214-222)
        x = mfccs[..., None]
        x = MfccNet(c.thinresnet_output_channels, activation=jax.nn.elu,
                    width_mult=self.width_mult, bn_axis=self.bn_axis,
                    widths=MOBILENET_WIDTHS, name="mfcc_net")(x, train)
        x = max_pool_same(x, (5, 3), (5, 3))
        mfcc_f = DenseBNElu(c.encode_embedding_size, self.bn_axis,
                            name="mfcc_proj")(
            x.reshape(x.shape[0], -1, c.thinresnet_output_channels), train)

        # landmark_encoder: PCA-project the example then embed
        # (atnet.py:210, 73-78)
        example_code = example_landmark @ comp.T          # [B, K]
        lmk_f = DenseBNElu(c.encode_embedding_size, self.bn_axis,
                           name="landmark_encoder")(
            jnp.tile(example_code[:, None, :], (1, t, 1)), train)

        # pose_encoder (atnet.py:50-54)
        pose_f = DenseBNElu(c.encode_embedding_size, self.bn_axis,
                            name="pose_encoder")(poses, train)

        # rnn over the summed embedding (atnet.py:232-235)
        h = masked_gru(c.rnn_hidden_size, 1, drop, axis_name=self.bn_axis,
                       name="rnn_module")(mfcc_f + lmk_f + pose_f, seq_len,
                                          train=train)

        # landmark_decoder (atnet.py:130-138)
        d = DenseBNElu(64, self.bn_axis, name="dec_dense")(h, train)
        code = jnp.tanh(nn.Dense(comp.shape[0],
                                 kernel_init=nn.initializers
                                 .xavier_uniform(),
                                 name="dec_code")(d)) * 0.9
        eye = jnp.tanh(nn.Dense(24, kernel_init=nn.initializers
                                .xavier_uniform(), name="dec_eye")(
            jnp.concatenate([code, ears], axis=-1))) * 0.1
        pad = ((0, 0), (0, 0),
               (72, c.landmark_size - 72 - 24))  # eye dims [72, 96)
        return code @ comp + jnp.pad(eye, pad)


def atnet_loss(pred: jax.Array, landmarks: jax.Array,
               seq_len: jax.Array) -> jax.Array:
    """Masked MSE frame + temporal loss (ref: atnet.py:248-262)."""
    b, t, _ = pred.shape
    mask = (jnp.arange(t)[None, :] < seq_len[:, None]).astype(jnp.float32)
    frame = jnp.sum(jnp.square(landmarks - pred), axis=-1)
    loss = jnp.mean(jnp.sum(frame * mask, axis=-1))
    vmask = (jnp.arange(t - 1)[None, :] <
             (seq_len - 1)[:, None]).astype(jnp.float32)
    vid = ((pred[:, 1:] - pred[:, :-1])
           - (landmarks[:, 1:] - landmarks[:, :-1]))
    loss += jnp.mean(jnp.sum(jnp.sum(jnp.square(vid), -1) * vmask, -1))
    return loss


def synthetic_pca_component(k: int = 6, landmark_size: int = 136,
                            seed: int = 0) -> np.ndarray:
    """Random orthonormal [K, 136] basis standing in for the reference's
    absent ``components_file`` asset (SURVEY.md §2.4)."""
    rng = np.random.RandomState(seed)
    q, _ = np.linalg.qr(rng.randn(landmark_size, k))
    return q.T.astype(np.float32)
