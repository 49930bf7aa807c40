"""VGG-16 perceptual-feature trunk.

Re-creation of the slim VGG-16 truncated at conv4 used for PixReferNet's
perceptual loss (voicepuppet/pixrefer/vgg_simple.py:96-163): conv stacks
(2,2,3,3) of 3x3 convs with 2x2 max-pools, returning the conv1_2 / conv2_2 /
conv3_3 / conv4_3 endpoints.  The reference restores ImageNet weights from
``vgg_16.ckpt`` during graph build (pixrefer.py:318-328); here weights are a
pytree that can be loaded from a converted ``.npz`` (``load_weights``) —
when the asset is absent the trunk runs with fixed random features, which
still regularizes structure (documented divergence; the external ckpt is an
asset, not code).

The trunk is frozen (no gradient to VGG params — the reference excludes
vgg vars from both optimizers' var_lists, pixrefer.py:397-406) via
``jax.lax.stop_gradient`` on the parameters at call time.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class VGG16Features(nn.Module):
    """Returns (conv1_2, conv2_2, conv3_3, conv4_3) feature maps.

    ``dtype=bfloat16`` runs the 3x3 conv stacks on the MXU in bf16 (the
    trunk is a frozen feature extractor, so activation precision only
    perturbs the perceptual loss; the L2 reduction itself is always
    accumulated in float32 by ``perceptual_loss``).

    ``widths`` defaults to the reference VGG-16 channels; narrower widths
    exist so checkpoint-bridge tests can run end-to-end at fixture scale
    (the slim names and layer structure are width-independent)."""
    dtype: Any = jnp.float32
    widths: Tuple[int, int, int, int] = (64, 128, 256, 512)

    @nn.compact
    def __call__(self, x):
        ends = []
        x = x.astype(self.dtype)

        def stack(x, reps, ch, name):
            for i in range(reps):
                x = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype,
                            name=f"{name}_{i + 1}")(x)
                x = jax.nn.relu(x)
            return x

        x = stack(x, 2, self.widths[0], "conv1")
        ends.append(x)                                   # conv1_2
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = stack(x, 2, self.widths[1], "conv2")
        ends.append(x)                                   # conv2_2
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = stack(x, 3, self.widths[2], "conv3")
        ends.append(x)                                   # conv3_3
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = stack(x, 3, self.widths[3], "conv4")
        ends.append(x)                                   # conv4_3
        return tuple(ends)


def init_vgg(rng, image_size: int = 64):
    model = VGG16Features()
    variables = model.init(rng, jnp.zeros((1, image_size, image_size, 3)))
    return model, variables["params"]


def load_weights(npz_path: str, params, strict: bool = True):
    """Overlay converted slim-ckpt weights (saved as ``conv{i}_{j}_kernel``
    / ``conv{i}_{j}_bias`` arrays) onto the init pytree.

    ``strict`` (default): an absent or mis-shaped array for any trunk
    conv raises instead of silently leaving random init in the
    perceptual loss (fail-loud converter principle).  To load the
    released ``vgg_16.ckpt`` directly (TF-free, no npz step) use
    :func:`voicepuppet_tpu.tools.tf_bundle.load_vgg16_checkpoint`."""
    blob = np.load(npz_path)
    out = jax.tree_util.tree_map(lambda x: x, params)
    missing = []
    for name in list(out.keys()):
        for part, key in (("kernel", f"{name}_kernel"),
                          ("bias", f"{name}_bias")):
            if key not in blob or blob[key].shape != out[name][part].shape:
                missing.append(key)
                continue
            out[name][part] = jnp.asarray(blob[key])
    if strict and missing:
        raise ValueError(
            f"{npz_path}: {len(missing)} trunk arrays absent or "
            f"mis-shaped, e.g. {missing[:3]}")
    return out


def perceptual_loss(vgg_params, real_fg: jax.Array, fake_fg: jax.Array,
                    dtype: Any = jnp.float32) -> jax.Array:
    """conv3_3 L2 content loss (ref: pixrefer.py:318-328):
    ``tf.nn.l2_loss(gen_f - img_f) / size(gen_f)`` = mean(diff²)/2.

    The reference feeds ``concat([real, fake])`` through one VGG pass and
    splits conv3_3; conv/relu/pool are per-sample ops, so two passes with
    the shared frozen weights compute the identical features.  The real
    branch runs under ``stop_gradient``: in the concat formulation AD
    back-propagates a dense batch-2B cotangent through every conv even
    though the real half's cotangent is identically zero — splitting
    halves the VGG backward, which profiling measured as ~64% of the
    whole D+G step (docs/PERF.md, experiments/profile_pixrefer_step.py).
    The squared-difference reduction is always float32 regardless of the
    trunk ``dtype``."""
    params = jax.lax.stop_gradient(vgg_params)
    model = VGG16Features(dtype=dtype)
    _, _, real_f, _ = model.apply(
        {"params": params}, jax.lax.stop_gradient(real_fg))
    real_f = jax.lax.stop_gradient(real_f)
    _, _, fake_f, _ = model.apply({"params": params}, fake_fg)
    diff = (fake_f - real_f).astype(jnp.float32)
    return jnp.sum(jnp.square(diff)) / (2.0 * diff.size)
