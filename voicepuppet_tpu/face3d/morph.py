"""3DMM forward math in JAX, batched over frames.

jnp port of the reference NumPy pipeline (utils/reconstruct_mesh.py):
``Split_coeff`` (:5-13) -> ``Shape_formation`` (:20-29) -> ``Compute_norm``
(:35-52) -> ``Compute_rotation_matrix`` (:68-91) -> ``Projection_layer``
(:100-120) -> ``Illumination_layer`` (:129-168), composed by
:func:`reconstruct` (:172-194) and :func:`reconstruct_rotation` (:198-223).

TPU-first differences from the reference:
  * every function is natively batched over a leading frame axis [B, ...] —
    the reference loops frames on the host one ``[1,257]`` coeff at a time
    (infer_bfmvid.py:231-243); here a whole clip of T frames is one program.
  * the PCA decodes are einsums over the [3N, K] bases -> MXU matmuls.
  * the BFM asset is converted once into a pytree of jnp constants
    (:func:`device_bfm`) so jit treats the bases as weights.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from voicepuppet_tpu.face3d.bfm import BFMModel


class DeviceBFM(NamedTuple):
    """BFM constants prepared for device compute (0-based int32 topology).

    The optional ``corner_*`` fields (``device_bfm(corner_cache=True)``)
    are the PCA basis/mean rows pre-gathered per triangle corner: with
    them :func:`compute_norm_from_coeff` produces the per-face corner
    vertices as MXU matmuls instead of three per-frame gathers — the
    round-4 decode profile measured the gathers index-count-bound
    (~15 ns/index, 3.2 ms of the 6.5 ms decode at 16 frames x 70k
    triangles), while the same dot products as a [F·9, 144]-row matmul
    are HBM-bound at ~0.5 ms.  Costs ~370 MB of device memory at BFM
    scale; value parity with the gather path is pinned by
    tests/test_morph.py."""
    meanshape: jax.Array   # [N, 3]
    recenter: jax.Array    # [1, 3] mean of meanshape vertices
    id_base: jax.Array     # [3N, 80]
    ex_base: jax.Array     # [3N, 64]
    meantex: jax.Array     # [N, 3]
    tex_base: jax.Array    # [3N, 80]
    tri: jax.Array         # [F, 3] int32, 0-based
    point_buf: jax.Array   # [N, 8] int32, 0-based (sentinel = F)
    keypoints: jax.Array   # [68] int32, 0-based
    corner_id_base: Optional[jax.Array] = None  # [F, 3c, 3xyz, 80]
    corner_ex_base: Optional[jax.Array] = None  # [F, 3c, 3xyz, 64]
    corner_mean: Optional[jax.Array] = None     # [F, 3c, 3xyz] (raw)


def device_bfm(model: BFMModel, corner_cache: bool = False) -> DeviceBFM:
    n = model.num_vertices
    meanshape = model.meanshape.reshape(n, 3)
    corner = {}
    if corner_cache:
        tri0 = np.asarray(model.tri, np.int64) - 1
        idb = np.asarray(model.idBase, np.float32).reshape(n, 3, 80)
        exb = np.asarray(model.exBase, np.float32).reshape(n, 3, 64)
        corner = dict(
            corner_id_base=jnp.asarray(idb[tri0]),
            corner_ex_base=jnp.asarray(exb[tri0]),
            corner_mean=jnp.asarray(meanshape.astype(np.float32)[tri0]),
        )
    return DeviceBFM(
        meanshape=jnp.asarray(meanshape, jnp.float32),
        recenter=jnp.asarray(meanshape.mean(axis=0, keepdims=True),
                             jnp.float32),
        id_base=jnp.asarray(model.idBase, jnp.float32),
        ex_base=jnp.asarray(model.exBase, jnp.float32),
        meantex=jnp.asarray(model.meantex.reshape(n, 3), jnp.float32),
        tex_base=jnp.asarray(model.texBase, jnp.float32),
        tri=jnp.asarray(np.asarray(model.tri, np.int64) - 1, jnp.int32),
        point_buf=jnp.asarray(np.asarray(model.point_buf, np.int64) - 1,
                              jnp.int32),
        keypoints=jnp.asarray(model.keypoints, jnp.int32),
        **corner,
    )


def split_coeff(coeff: jax.Array):
    """[B, 257] -> (id 80, exp 64, tex 80, angles 3, gamma 27, translation 3)
    (ref: utils/reconstruct_mesh.py:5-13)."""
    return (coeff[:, :80], coeff[:, 80:144], coeff[:, 144:224],
            coeff[:, 224:227], coeff[:, 227:254], coeff[:, 254:257])


def shape_formation(id_coeff: jax.Array, ex_coeff: jax.Array,
                    fm: DeviceBFM) -> jax.Array:
    """PCA shape decode + recenter: [B,80],[B,64] -> [B,N,3]
    (ref: utils/reconstruct_mesh.py:20-29)."""
    flat = (jnp.einsum("ij,aj->ai", fm.id_base, id_coeff,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
            + jnp.einsum("ij,aj->ai", fm.ex_base, ex_coeff,
                         preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
            + fm.meanshape.reshape(1, -1))
    shape = flat.reshape(flat.shape[0], -1, 3)
    return shape - fm.recenter[None, :, :]


def texture_formation(tex_coeff: jax.Array, fm: DeviceBFM) -> jax.Array:
    """PCA albedo decode: [B,80] -> [B,N,3] RGB 0-255
    (ref: utils/reconstruct_mesh.py:58-62)."""
    flat = jnp.einsum("ij,aj->ai", fm.tex_base, tex_coeff,
                      preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    flat = flat + fm.meantex.reshape(1, -1)
    return flat.reshape(flat.shape[0], -1, 3)


def _one_ring_normals(face_norm: jax.Array, fm: DeviceBFM) -> jax.Array:
    """Per-face normals [B,F,3] -> unit one-ring vertex normals [B,N,3]:
    gathered through ``point_buf`` (each vertex lists its ≤8 adjacent
    faces; the sentinel row indexes a zero normal) — a pure gather
    formulation, no scatter needed (ref: utils/reconstruct_mesh.py:44-52).
    """
    zeros = jnp.zeros((face_norm.shape[0], 1, 3), face_norm.dtype)
    face_norm = jnp.concatenate([face_norm, zeros], axis=1)
    v_norm = jnp.sum(face_norm[:, fm.point_buf, :], axis=2)
    return v_norm / jnp.linalg.norm(v_norm, axis=2, keepdims=True)


def compute_norm(face_shape: jax.Array, fm: DeviceBFM) -> jax.Array:
    """One-ring vertex normals: [B,N,3] -> [B,N,3]
    (ref: utils/reconstruct_mesh.py:35-52)."""
    v1 = face_shape[:, fm.tri[:, 0], :]
    v2 = face_shape[:, fm.tri[:, 1], :]
    v3 = face_shape[:, fm.tri[:, 2], :]
    face_norm = jnp.cross(v1 - v2, v2 - v3)
    return _one_ring_normals(face_norm, fm)


def compute_norm_from_coeff(id_coeff: jax.Array, ex_coeff: jax.Array,
                            fm: DeviceBFM) -> jax.Array:
    """Gather-free :func:`compute_norm`: [B,80],[B,64] -> [B,N,3].

    The triangle-corner vertices come straight from the pre-gathered
    corner bases (``device_bfm(corner_cache=True)``) as MXU matmuls —
    the same dot products :func:`shape_formation` + the corner gathers
    would compute, in the same add order (id-einsum + ex-einsum + mean,
    then recenter), so values match the gather path to float32
    round-off.  The round-4 decode profile measured the three corner
    gathers at ~15 ns/index (3.2 ms of the 6.5 ms decode per 16-frame
    chunk); this formulation is HBM-bound at ~0.5 ms."""
    v = (jnp.einsum("fcxk,bk->bfcx", fm.corner_id_base, id_coeff,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
         + jnp.einsum("fcxk,bk->bfcx", fm.corner_ex_base, ex_coeff,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
         + fm.corner_mean[None])
    v = v - fm.recenter[None, None]
    face_norm = jnp.cross(v[:, :, 0] - v[:, :, 1], v[:, :, 1] - v[:, :, 2])
    return _one_ring_normals(face_norm, fm)


def rotation_matrix(angles: jax.Array) -> jax.Array:
    """XYZ euler angles [B,3] -> row-vector rotation matrices [B,3,3]
    (ref: utils/reconstruct_mesh.py:68-91; note the final transpose — the
    matrix is applied as ``shape @ R``)."""
    ax, ay, az = angles[:, 0], angles[:, 1], angles[:, 2]
    zeros = jnp.zeros_like(ax)
    ones = jnp.ones_like(ax)
    cx, sx = jnp.cos(ax), jnp.sin(ax)
    cy, sy = jnp.cos(ay), jnp.sin(ay)
    cz, sz = jnp.cos(az), jnp.sin(az)
    rot_x = jnp.stack([ones, zeros, zeros,
                       zeros, cx, -sx,
                       zeros, sx, cx], axis=-1).reshape(-1, 3, 3)
    rot_y = jnp.stack([cy, zeros, sy,
                       zeros, ones, zeros,
                       -sy, zeros, cy], axis=-1).reshape(-1, 3, 3)
    rot_z = jnp.stack([cz, -sz, zeros,
                       sz, cz, zeros,
                       zeros, zeros, ones], axis=-1).reshape(-1, 3, 3)
    rot = rot_z @ rot_y @ rot_x
    return jnp.transpose(rot, (0, 2, 1))


def projection_layer(face_shape: jax.Array, rotation: jax.Array,
                     translation: jax.Array, focal: float = 1015.0,
                     center: float = 112.0):
    """Perspective projection onto the 224² image plane
    (ref: utils/reconstruct_mesh.py:100-120).  Returns ([B,N,2], [B,N,1])."""
    camera_pos = jnp.asarray([0.0, 0.0, 10.0], jnp.float32).reshape(1, 1, 3)
    reverse_z = jnp.asarray([[1, 0, 0], [0, 1, 0], [0, 0, -1]],
                            jnp.float32).reshape(1, 3, 3)
    p_matrix = jnp.asarray([[focal, 0.0, center],
                            [0.0, focal, center],
                            [0.0, 0.0, 1.0]], jnp.float32).reshape(1, 3, 3)
    face_shape_r = face_shape @ rotation
    face_shape_t = face_shape_r + translation[:, None, :]
    face_shape_t = face_shape_t @ reverse_z + camera_pos
    aug = face_shape_t @ jnp.transpose(p_matrix, (0, 2, 1))
    face_projection = aug[:, :, 0:2] / aug[:, :, 2:3]
    z_buffer = -aug[:, :, 2:3]
    return face_projection, z_buffer


def illumination_layer(face_texture: jax.Array, norm: jax.Array,
                       gamma: jax.Array):
    """9-term SH lighting per RGB channel
    (ref: utils/reconstruct_mesh.py:129-168).  [B,N,3],[B,N,3],[B,27] ->
    (face_color [B,N,3], lighting [B,N,3])."""
    init_lit = jnp.asarray([0.8, 0, 0, 0, 0, 0, 0, 0, 0], jnp.float32)
    gamma = gamma.reshape(-1, 3, 9) + init_lit.reshape(1, 1, 9)

    a0 = np.pi
    a1 = 2 * np.pi / np.sqrt(3.0)
    a2 = 2 * np.pi / np.sqrt(8.0)
    c0 = 1 / np.sqrt(4 * np.pi)
    c1 = np.sqrt(3.0) / np.sqrt(4 * np.pi)
    c2 = 3 * np.sqrt(5.0) / np.sqrt(12 * np.pi)

    nx, ny, nz = norm[..., 0], norm[..., 1], norm[..., 2]
    Y = jnp.stack([
        jnp.full_like(nx, a0 * c0),
        -a1 * c1 * ny,
        a1 * c1 * nz,
        -a1 * c1 * nx,
        a2 * c2 * nx * ny,
        -a2 * c2 * ny * nz,
        a2 * c2 * 0.5 / np.sqrt(3.0) * (3 * jnp.square(nz) - 1),
        -a2 * c2 * nx * nz,
        a2 * c2 * 0.5 * (jnp.square(nx) - jnp.square(ny)),
    ], axis=-1)  # [B, N, 9]

    lit = jnp.einsum("bnk,bck->bnc", Y, gamma,
                     preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)  # [B, N, 3]
    face_color = lit * face_texture
    lighting = lit * 128.0
    return face_color, lighting


class Reconstruction(NamedTuple):
    face_shape: jax.Array       # [B, N, 3]
    face_texture: jax.Array     # [B, N, 3]
    face_color: jax.Array       # [B, N, 3]
    face_projection: jax.Array  # [B, N, 2] (y flipped to image coords)
    z_buffer: jax.Array         # [B, N, 1]
    landmarks_2d: jax.Array     # [B, 68, 2]


def reconstruct(coeff: jax.Array, fm: DeviceBFM,
                image_size: float = 224.0) -> Reconstruction:
    """Full coeff -> screen-space mesh decode
    (ref: utils/reconstruct_mesh.py:172-194)."""
    id_c, ex_c, tex_c, angles, gamma, translation = split_coeff(coeff)
    face_shape = shape_formation(id_c, ex_c, fm)
    face_texture = texture_formation(tex_c, fm)
    face_norm = (compute_norm_from_coeff(id_c, ex_c, fm)
                 if fm.corner_id_base is not None
                 else compute_norm(face_shape, fm))
    rotation = rotation_matrix(angles)
    face_norm_r = face_norm @ rotation
    face_projection, z_buffer = projection_layer(face_shape, rotation,
                                                 translation)
    face_projection = jnp.stack(
        [face_projection[..., 0], image_size - face_projection[..., 1]],
        axis=-1)
    landmarks_2d = face_projection[:, fm.keypoints, :]
    face_color, _ = illumination_layer(face_texture, face_norm_r, gamma)
    return Reconstruction(face_shape, face_texture, face_color,
                          face_projection, z_buffer, landmarks_2d)


def reconstruct_rotation(coeff: jax.Array, fm: DeviceBFM,
                         angles: jax.Array,
                         image_size: float = 224.0) -> Reconstruction:
    """Variant applying an external rotation to the shape itself (used by the
    inference driver for the idle head sway; ref:
    utils/reconstruct_mesh.py:198-223, infer_bfmvid.py:79-98).  ``angles``
    [B,3] overrides the coeff's own pose."""
    id_c, ex_c, tex_c, _, gamma, translation = split_coeff(coeff)
    face_shape = shape_formation(id_c, ex_c, fm)
    face_texture = texture_formation(tex_c, fm)
    face_norm = (compute_norm_from_coeff(id_c, ex_c, fm)
                 if fm.corner_id_base is not None
                 else compute_norm(face_shape, fm))
    rotation = rotation_matrix(angles)
    face_norm_r = face_norm @ rotation
    face_shape = face_shape @ rotation
    face_projection, z_buffer = projection_layer(face_shape, rotation,
                                                 translation)
    face_projection = jnp.stack(
        [face_projection[..., 0], image_size - face_projection[..., 1]],
        axis=-1)
    landmarks_2d = face_projection[:, fm.keypoints, :]
    face_color, _ = illumination_layer(face_texture, face_norm_r, gamma)
    return Reconstruction(face_shape, face_texture, face_color,
                          face_projection, z_buffer, landmarks_2d)
