"""3DMM math golden tests.

Oracle: independent float64 NumPy implementations of the published
Deep3DFace reconstruction equations, mirroring the reference semantics
(utils/reconstruct_mesh.py) — PCA decode with meanshape recentering,
one-ring normals through point_buf with sentinel zero row, XYZ euler
rotation applied as row vectors, perspective projection with focal 1015 /
center 112 / camera z 10 / reverse-z, and 9-term SH illumination with the
0.8 ambient init.
"""

import numpy as np
import pytest

from voicepuppet_tpu.face3d import bfm as bfm_mod
from voicepuppet_tpu.face3d import morph


@pytest.fixture(scope="module")
def model():
    return bfm_mod.synthetic_bfm(num_theta=16, num_phi=16, seed=3)


@pytest.fixture(scope="module")
def fm(model):
    return morph.device_bfm(model)


@pytest.fixture(scope="module")
def coeff(model):
    return bfm_mod.demo_coeff(model, batch=3, seed=7)


def oracle_shape(id_c, ex_c, model):
    flat = (model.idBase.astype(np.float64) @ id_c.astype(np.float64)
            + model.exBase.astype(np.float64) @ ex_c.astype(np.float64)
            + model.meanshape.reshape(-1).astype(np.float64))
    shape = flat.reshape(-1, 3)
    return shape - model.meanshape.reshape(-1, 3).mean(0, keepdims=True)


def oracle_rotation(angles):
    ax, ay, az = [float(a) for a in angles]
    rx = np.array([[1, 0, 0], [0, np.cos(ax), -np.sin(ax)],
                   [0, np.sin(ax), np.cos(ax)]])
    ry = np.array([[np.cos(ay), 0, np.sin(ay)], [0, 1, 0],
                   [-np.sin(ay), 0, np.cos(ay)]])
    rz = np.array([[np.cos(az), -np.sin(az), 0],
                   [np.sin(az), np.cos(az), 0], [0, 0, 1]])
    return (rz @ ry @ rx).T


def oracle_project(shape, rot, trans, focal=1015.0, center=112.0):
    pm = np.array([[focal, 0, center], [0, focal, center], [0, 0, 1.0]])
    rev = np.diag([1.0, 1.0, -1.0])
    cam = np.array([0.0, 0.0, 10.0])
    pts = shape @ rot + trans
    pts = pts @ rev + cam
    aug = pts @ pm.T
    proj = aug[:, :2] / aug[:, 2:3]
    return proj, -aug[:, 2:3]


def test_split_coeff_offsets(fm, coeff):
    parts = morph.split_coeff(np.asarray(coeff))
    dims = [p.shape[1] for p in parts]
    assert dims == [80, 64, 80, 3, 27, 3]  # ref: reconstruct_mesh.py:5-13


def test_shape_formation_matches_oracle(model, fm, coeff):
    got = np.asarray(morph.shape_formation(coeff[:, :80], coeff[:, 80:144],
                                           fm))
    for b in range(coeff.shape[0]):
        want = oracle_shape(coeff[b, :80], coeff[b, 80:144], model)
        np.testing.assert_allclose(got[b], want, atol=1e-5)


def test_rotation_matrix_matches_oracle(fm, coeff):
    got = np.asarray(morph.rotation_matrix(coeff[:, 224:227]))
    for b in range(coeff.shape[0]):
        want = oracle_rotation(coeff[b, 224:227])
        np.testing.assert_allclose(got[b], want, atol=1e-6)
        # rotations are orthonormal
        np.testing.assert_allclose(got[b] @ got[b].T, np.eye(3), atol=1e-5)


def test_projection_matches_oracle(model, fm, coeff):
    shape = morph.shape_formation(coeff[:, :80], coeff[:, 80:144], fm)
    rot = morph.rotation_matrix(coeff[:, 224:227])
    proj, zb = morph.projection_layer(shape, rot, coeff[:, 254:257])
    proj, zb = np.asarray(proj), np.asarray(zb)
    for b in range(coeff.shape[0]):
        want_p, want_z = oracle_project(np.asarray(shape[b], np.float64),
                                        np.asarray(rot[b], np.float64),
                                        coeff[b, 254:257].astype(np.float64))
        np.testing.assert_allclose(proj[b], want_p, atol=1e-3)
        np.testing.assert_allclose(zb[b], want_z, atol=1e-4)


def test_compute_norm_unit_and_oriented(model, fm, coeff):
    shape = morph.shape_formation(coeff[:, :80], coeff[:, 80:144], fm)
    n = np.asarray(morph.compute_norm(shape, fm))
    lens = np.linalg.norm(n, axis=-1)
    np.testing.assert_allclose(lens, 1.0, atol=1e-5)
    # synthetic mesh is a sphere patch around +z: normals should mostly have
    # a consistent z sign (orientation check)
    assert abs(np.mean(np.sign(n[..., 2]))) > 0.9


def test_illumination_ambient_only(fm, coeff):
    # gamma = 0 -> only the 0.8 ambient init term contributes:
    # lit = 0.8 * a0 * c0 = 0.8 * pi / sqrt(4 pi)
    tex = morph.texture_formation(coeff[:, 144:224], fm)
    shape = morph.shape_formation(coeff[:, :80], coeff[:, 80:144], fm)
    norm = morph.compute_norm(shape, fm)
    gamma = np.zeros((coeff.shape[0], 27), np.float32)
    color, lighting = morph.illumination_layer(tex, norm, gamma)
    expected_lit = 0.8 * np.pi / np.sqrt(4 * np.pi)
    np.testing.assert_allclose(np.asarray(color),
                               np.asarray(tex) * expected_lit, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(lighting),
                               expected_lit * 128.0, rtol=1e-5)


def test_reconstruct_full_pipeline(model, fm, coeff):
    rec = morph.reconstruct(coeff, fm)
    n = model.num_vertices
    b = coeff.shape[0]
    assert rec.face_shape.shape == (b, n, 3)
    assert rec.face_projection.shape == (b, n, 2)
    assert rec.landmarks_2d.shape == (b, 68, 2)
    # y was flipped into image coordinates (224 - y)
    proj_raw, _ = morph.projection_layer(
        morph.shape_formation(coeff[:, :80], coeff[:, 80:144], fm),
        morph.rotation_matrix(coeff[:, 224:227]), coeff[:, 254:257])
    np.testing.assert_allclose(np.asarray(rec.face_projection[..., 1]),
                               224.0 - np.asarray(proj_raw[..., 1]),
                               atol=1e-4)
    # a zero-translation face should project near the image center
    assert 40 < float(np.mean(np.asarray(rec.face_projection))) < 184


def test_reconstruct_rotation_overrides_pose(model, fm, coeff):
    ang = np.tile(np.array([[0.0, 0.3, 0.0]], np.float32),
                  (coeff.shape[0], 1))
    rec_a = morph.reconstruct_rotation(coeff, fm, ang)
    rec_b = morph.reconstruct_rotation(coeff, fm, np.zeros_like(ang))
    # rotated shape differs, and matches shape @ R
    assert not np.allclose(np.asarray(rec_a.face_shape),
                           np.asarray(rec_b.face_shape))
    rot = morph.rotation_matrix(ang)
    np.testing.assert_allclose(np.asarray(rec_a.face_shape),
                               np.asarray(rec_b.face_shape @ rot), atol=1e-5)


def test_corner_cache_norm_matches_gather_path(model, coeff):
    """device_bfm(corner_cache=True) swaps the compute_norm corner
    gathers for pre-gathered-basis matmuls (the round-4 decode
    optimization); the normals — and the full reconstruction built on
    them — must match the gather formulation to float32 round-off."""
    fm_g = morph.device_bfm(model)
    fm_c = morph.device_bfm(model, corner_cache=True)
    idc, exc = coeff[:, :80], coeff[:, 80:144]
    shape = morph.shape_formation(idc, exc, fm_g)
    want = np.asarray(morph.compute_norm(shape, fm_g))
    got = np.asarray(morph.compute_norm_from_coeff(idc, exc, fm_c))
    np.testing.assert_allclose(got, want, atol=1e-6)

    rec_g = morph.reconstruct(coeff, fm_g)
    rec_c = morph.reconstruct(coeff, fm_c)
    np.testing.assert_allclose(np.asarray(rec_c.face_color),
                               np.asarray(rec_g.face_color), atol=1e-4)
    # geometry does not depend on normals at all: bit-identical
    np.testing.assert_array_equal(np.asarray(rec_c.face_projection),
                                  np.asarray(rec_g.face_projection))
    np.testing.assert_array_equal(np.asarray(rec_c.z_buffer),
                                  np.asarray(rec_g.z_buffer))
