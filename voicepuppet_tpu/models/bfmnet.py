"""BFMNet — audio -> per-frame BFM expression coefficients.

flax re-architecture of the reference model (voicepuppet/bfmnet/bfmnet.py):

  MfccEncoder (bfmnet.py:20-41): MfccNet CNN over [B, T*5, 80, 1] +
    max-pool [5, ceil(80/32)=3] 'same' -> one 256-vector per video frame ->
    dense+leaky_relu+dropout (bfmnet.py:198-200)
  RNNModule (bfmnet.py:44-69): dense -> 1-layer GRU(256, orthogonal init)
    with sequence-length masking
  BFMCoeffDecoder (bfmnet.py:112-118): dense 128 -> 64 -> bfm_coeff_size,
    with the eye-aspect-ratio injection ``ears * [-2,-2,-2,-4]`` padded into
    coefficient dims [16, 20) (bfmnet.py:117, 210)

plus the vertex-space training loss (bfmnet.py:229-271): decode
(id ⊕ predicted-exp) through the BFM PCA bases, weight mouth-region vertices
x10, L1 per-frame + L1 temporal-difference, both sequence-masked, plus the
backbone L2 regularizer.

TPU notes: the CNN/matmuls dominate and map straight onto the MXU; the GRU
runs as a ``lax.scan`` (time-serial but negligible FLOPs).  The loss decodes
only the 64 expression dims through ``exBase`` and folds the mouth-weighted
L1 into two einsums over [B*T, 64] — the id/meanshape terms cancel in both
loss branches, so the 35709x3-vertex tensors never materialize (the
reference materializes [B, T, 107127] twice; bfmnet.py:244-248).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from voicepuppet_tpu.config import BFMNetConfig
from voicepuppet_tpu.models.layers import (MfccNet, leaky_relu,
                                           l2_regularization, masked_gru,
                                           max_pool_same)


class MfccEncoder(nn.Module):
    """ref: bfmnet.py:20-41 + the dense/dropout at bfmnet.py:198-200."""
    output_channels: int = 256
    embedding_size: int = 256
    pooling: Tuple[int, int] = (5, 3)  # [frame_mfcc_scale, ceil(80/32)]
    drop_rate: float = 0.25
    width_mult: float = 1.0
    bn_axis: Optional[str] = None
    dtype: Any = jnp.float32  # CNN compute dtype (MfccNet docstring)

    @nn.compact
    def __call__(self, mfccs, train: bool = True, valid_rows=None):
        x = mfccs[..., None]  # [B, T*5, 80, 1]
        x = MfccNet(self.output_channels, width_mult=self.width_mult,
                    bn_axis=self.bn_axis,
                    dtype=self.dtype)(x, train=train,
                                      valid_rows=valid_rows)
        x = max_pool_same(x, self.pooling, self.pooling)
        b = x.shape[0]
        x = x.reshape(b, -1, self.output_channels)  # [B, T, 256]
        x = nn.Dense(self.embedding_size,
                     kernel_init=nn.initializers.xavier_uniform())(x)
        x = leaky_relu(x)
        x = nn.Dropout(rate=self.drop_rate, deterministic=not train)(x)
        return x


class BFMCoeffDecoder(nn.Module):
    """ref: bfmnet.py:112-118."""
    bfm_coeff_size: int = 64
    drop_rate: float = 0.25

    @nn.compact
    def __call__(self, x, ears, train: bool = True):
        init = nn.initializers.xavier_uniform()
        x = nn.Dense(128, kernel_init=init)(x)
        x = leaky_relu(x)
        x = nn.Dropout(rate=self.drop_rate, deterministic=not train)(x)
        x = nn.Dense(64, kernel_init=init)(x)
        x = leaky_relu(x)
        x = nn.Dropout(rate=self.drop_rate, deterministic=not train)(x)
        x = nn.Dense(self.bfm_coeff_size, kernel_init=init)(x)
        # ear injection into coeff dims [16, 20) (bfmnet.py:117):
        # tf.pad(ears, [[0,0],[0,0],[16,44]])
        pad = ((0, 0), (0, 0),
               (16, self.bfm_coeff_size - 16 - ears.shape[-1]))
        return x + jnp.pad(ears, pad)


class BFMNet(nn.Module):
    """Full network (ref: bfmnet.py:189-213).  Inputs:
      ears  [B, T, 1]   (1 - eye aspect ratio)
      mfccs [B, T*5, 80]
      seq_len [B] int32
    Output: expression coefficients [B, T, bfm_coeff_size]."""
    cfg: BFMNetConfig
    bn_axis: Optional[str] = None  # sync-BN mesh axis for DP training
    # serving compute dtype for the conv trunk (params stay f32, the GRU
    # recurrence and coefficient head stay f32 for exact streaming
    # semantics); bfloat16 halves the whole-clip coefficient pass
    dtype: Any = jnp.float32

    def setup(self):
        # setup-based (attribute names ARE the scope names, so the param
        # tree is identical to the previous nn.compact form) so streaming
        # can drive encode/decode separately (pipeline/streaming.py);
        # all dropouts honor ``train`` internally, so passing the training
        # drop rate unconditionally is equivalent to the old
        # zero-when-eval construction
        c = self.cfg
        drop = c.training.drop_rate
        self.mfcc_encoder = MfccEncoder(c.thinresnet_output_channels,
                                        c.encode_embedding_size,
                                        drop_rate=drop,
                                        width_mult=c.backbone_width_mult,
                                        bn_axis=self.bn_axis,
                                        dtype=self.dtype)
        self.rnn_in = nn.Dense(c.encode_embedding_size,
                               kernel_init=nn.initializers.xavier_uniform())
        self.rnn_module = masked_gru(c.rnn_hidden_size, c.rnn_layers,
                                     drop, axis_name=self.bn_axis)
        self.bfm_coeff_decoder = BFMCoeffDecoder(c.bfm_coeff_size, drop)

    def encode(self, mfccs, train: bool = True, valid_rows=None):
        """mfccs [B, T*5, 80] -> pre-GRU embeddings [B, T, emb]
        (the convolutional, non-recurrent trunk).  ``valid_rows`` [B]
        enables exact bucket-padding (MfccNet docstring)."""
        enc = self.mfcc_encoder(mfccs, train=train, valid_rows=valid_rows)
        return leaky_relu(self.rnn_in(enc))

    def decode(self, x, ears, seq_len, train: bool = True, rnn_state=None,
               return_rnn_state: bool = False):
        """GRU + coefficient head.  ``rnn_state``/``return_rnn_state``
        carry the hidden state across chunks — the recurrence is exactly
        streamable (pipeline/streaming.py)."""
        x = self.rnn_module(x, seq_len, train=train,
                            initial_state=rnn_state,
                            return_state=return_rnn_state)
        if return_rnn_state:
            x, new_state = x
        # ear scaling (bfmnet.py:210): ears * [-2, -2, -2, -4]
        scale = jnp.asarray([[[-2.0, -2.0, -2.0, -4.0]]], jnp.float32)
        ears4 = ears * scale
        out = self.bfm_coeff_decoder(x, ears4, train=train)
        if return_rnn_state:
            return out, new_state
        return out

    def __call__(self, ears, mfccs, seq_len, train: bool = True,
                 rnn_state=None, return_rnn_state: bool = False,
                 mask_time: bool = False):
        """``mask_time=True`` re-zeroes CNN activations past seq_len*5 at
        every stage, making a time-padded (bucketed) run equal the
        exact-length run for frames < seq_len — the serving path for
        arbitrary clip durations without per-duration recompiles.  OFF by
        default: training keeps the reference's unmasked-padding BN
        semantics (padded rows DO enter train-mode batch stats there)."""
        # mel rows per video frame = the encoder's time-pool factor
        scale = self.mfcc_encoder.pooling[0]
        valid = seq_len * scale if mask_time else None
        x = self.encode(mfccs, train=train, valid_rows=valid)
        return self.decode(x, ears, seq_len, train=train,
                           rnn_state=rnn_state,
                           return_rnn_state=return_rnn_state)


class BFMNetLoss:
    """Vertex-space sequence loss (ref: bfmnet.py:215-271).

    Mathematically identical to the reference but restructured for TPU:
    both branches compare ``exBase @ (pred_exp - true_exp)`` — the id /
    meanshape / recentering terms cancel — so we fold the x10 mouth-vertex
    weights into a single weighted basis and never build [B,T,35709*3]
    tensors.  ``weighted_ex_base`` = mouth_mask-scaled exBase [3N, 64].
    """

    def __init__(self, ex_base: np.ndarray, mouth_mask: np.ndarray):
        # mouth_mask: [N, 3] of 1s with 10s at mouth vertices
        # (ref: bfmnet.py:134-137)
        self.weighted_ex_base = jnp.asarray(
            ex_base * mouth_mask.reshape(-1, 1), jnp.float32)

    def __call__(self, pred_exp: jax.Array, true_coeff: jax.Array,
                 seq_len: jax.Array) -> jax.Array:
        """pred_exp [B,T,64]; true_coeff [B,T,257]; seq_len [B]."""
        b, t, _ = pred_exp.shape
        true_exp = true_coeff[:, :, 80:144]
        delta = (pred_exp - true_exp).reshape(b * t, -1)
        # |W_ex @ delta| summed over vertex dims -> [B, T]
        diff = jnp.einsum("ij,aj->ai", self.weighted_ex_base, delta,
                          preferred_element_type=jnp.float32)
        frame_l1 = jnp.sum(jnp.abs(diff), axis=-1).reshape(b, t)
        mask = (jnp.arange(t)[None, :] < seq_len[:, None]).astype(
            jnp.float32)
        loss = jnp.mean(jnp.sum(frame_l1 * mask, axis=-1))

        # temporal ("video") loss (bfmnet.py:262-267)
        delta_t = delta.reshape(b, t, -1)
        vid = delta_t[:, 1:, :] - delta_t[:, :-1, :]
        vid_diff = jnp.einsum("ij,abj->abi", self.weighted_ex_base, vid,
                              preferred_element_type=jnp.float32)
        vid_l1 = jnp.sum(jnp.abs(vid_diff), axis=-1)
        vid_mask = (jnp.arange(t - 1)[None, :] <
                    (seq_len - 1)[:, None]).astype(jnp.float32)
        loss += jnp.mean(jnp.sum(vid_l1 * vid_mask, axis=-1))
        return loss


def make_mouth_mask(num_vertices: int,
                    mouth_idx: Optional[np.ndarray],
                    weight: float = 10.0) -> np.ndarray:
    """ref: bfmnet.py:134-137 — ones with ``weight`` at mouth vertices."""
    mask = np.ones([num_vertices, 3], np.float32)
    if mouth_idx is not None:
        mask[np.asarray(mouth_idx, np.int64)] = weight
    return mask


def total_loss(params, loss_fn: BFMNetLoss, pred_exp, true_coeff, seq_len,
               reg_scale: float = 1e-4) -> jax.Array:
    """Sequence loss + the backbone L2 regularizer
    (ref: bfmnet.py:269-270)."""
    return (loss_fn(pred_exp, true_coeff, seq_len)
            + l2_regularization(params, reg_scale))
