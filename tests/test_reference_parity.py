"""Golden parity against the reference's OWN NumPy 3DMM code.

test_morph.py / test_parity.py compare against a float64 oracle re-derived
from the published equations; same-author-both-sides oracles can share a
misreading, so this module imports the literal reference source —
/root/reference/utils/reconstruct_mesh.py (pure NumPy, no dependencies) —
and asserts our jnp ports against it function by function and end to end:
Shape_formation (:20-29), Compute_norm (:35-52), Compute_rotation_matrix
(:68-91), Projection_layer (:100-120), Illumination_layer (:129-168),
Reconstruction (:172-194), Reconstruction_rotation (:198-223).

Skipped when the read-only reference mount is absent.
"""

import importlib.util
import os

import numpy as np
import pytest

from voicepuppet_tpu.face3d import bfm as bfm_mod
from voicepuppet_tpu.face3d import morph

REF_PATH = "/root/reference/utils/reconstruct_mesh.py"

pytestmark = pytest.mark.skipif(not os.path.exists(REF_PATH),
                                reason="reference mount not available")


@pytest.fixture(scope="module")
def ref():
    spec = importlib.util.spec_from_file_location("ref_reconstruct_mesh",
                                                  REF_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def model():
    # synthetic stand-in with the exact BFM field layout (1-based tri /
    # point_buf, [1,3N] meanshape) — the reference functions consume it
    # directly as their `facemodel`
    return bfm_mod.synthetic_bfm(num_theta=24, num_phi=24, seed=3)


@pytest.fixture(scope="module")
def fm(model):
    return morph.device_bfm(model)


@pytest.fixture(scope="module")
def coeff(model):
    return bfm_mod.demo_coeff(model, batch=4, seed=7)


def test_shape_formation_vs_reference(ref, model, fm, coeff):
    got = np.asarray(morph.shape_formation(coeff[:, :80], coeff[:, 80:144],
                                           fm))
    for b in range(coeff.shape[0]):
        want = ref.Shape_formation(coeff[b:b + 1, :80],
                                   coeff[b:b + 1, 80:144], model)
        np.testing.assert_allclose(got[b:b + 1], want, atol=2e-4)


def test_compute_norm_vs_reference(ref, model, fm, coeff):
    shape = morph.shape_formation(coeff[:, :80], coeff[:, 80:144], fm)
    got = np.asarray(morph.compute_norm(shape, fm))
    shape = np.asarray(shape)
    for b in range(coeff.shape[0]):
        want = ref.Compute_norm(shape[b:b + 1].astype(np.float64), model)
        np.testing.assert_allclose(got[b:b + 1], want, atol=1e-4)


def test_rotation_matrix_vs_reference(ref, fm, coeff):
    got = np.asarray(morph.rotation_matrix(coeff[:, 224:227]))
    for b in range(coeff.shape[0]):
        want = ref.Compute_rotation_matrix(coeff[b:b + 1, 224:227])
        np.testing.assert_allclose(got[b:b + 1], want, atol=1e-6)


def test_projection_layer_vs_reference(ref, model, fm, coeff):
    shape = morph.shape_formation(coeff[:, :80], coeff[:, 80:144], fm)
    rot = morph.rotation_matrix(coeff[:, 224:227])
    got_p, got_z = morph.projection_layer(shape, rot, coeff[:, 254:257])
    got_p, got_z = np.asarray(got_p), np.asarray(got_z)
    shape, rot = np.asarray(shape), np.asarray(rot)
    for b in range(coeff.shape[0]):
        want_p, want_z = ref.Projection_layer(
            shape[b:b + 1].astype(np.float64),
            rot[b:b + 1].astype(np.float64),
            coeff[b:b + 1, 254:257].astype(np.float64))
        np.testing.assert_allclose(got_p[b:b + 1], want_p, atol=2e-3)
        np.testing.assert_allclose(got_z[b:b + 1], want_z, atol=2e-4)


def test_illumination_layer_vs_reference(ref, model, fm, coeff):
    tex = np.asarray(
        morph.texture_formation(coeff[:, 144:224], fm))
    shape = morph.shape_formation(coeff[:, :80], coeff[:, 80:144], fm)
    norm = np.asarray(morph.compute_norm(shape, fm))
    got, _ = morph.illumination_layer(tex, norm, coeff[:, 227:254])
    got = np.asarray(got)
    for b in range(coeff.shape[0]):
        want, _ = ref.Illumination_layer(
            tex[b:b + 1].astype(np.float64),
            norm[b:b + 1].astype(np.float64),
            coeff[b:b + 1, 227:254].astype(np.float64))
        np.testing.assert_allclose(got[b:b + 1], want, atol=2e-3)


def test_reconstruction_vs_reference(ref, model, fm, coeff):
    rec = morph.reconstruct(coeff, fm)
    for b in range(coeff.shape[0]):
        (f_shape, f_tex, f_color, f_proj, z_buf, lmk,
         _) = ref.Reconstruction(coeff[b:b + 1], model)
        np.testing.assert_allclose(np.asarray(rec.face_shape)[b:b + 1],
                                   f_shape, atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(rec.face_projection)[b:b + 1], f_proj, atol=3e-3)
        np.testing.assert_allclose(np.asarray(rec.z_buffer)[b:b + 1],
                                   z_buf, atol=2e-4)
        np.testing.assert_allclose(np.asarray(rec.face_color)[b:b + 1],
                                   f_color, atol=5e-2)
        np.testing.assert_allclose(np.asarray(rec.landmarks_2d)[b:b + 1],
                                   lmk, atol=3e-3)


def test_reconstruction_rotation_vs_reference(ref, model, fm, coeff):
    angles = (np.random.RandomState(5).randn(coeff.shape[0], 3)
              * 0.1).astype(np.float32)
    rec = morph.reconstruct_rotation(coeff, fm, angles)
    for b in range(coeff.shape[0]):
        (f_shape, f_tex, f_color, f_proj, z_buf,
         lmk) = ref.Reconstruction_rotation(coeff[b:b + 1], model,
                                            angles[b:b + 1])
        np.testing.assert_allclose(np.asarray(rec.face_shape)[b:b + 1],
                                   f_shape, atol=3e-4)
        np.testing.assert_allclose(
            np.asarray(rec.face_projection)[b:b + 1], f_proj, atol=3e-3)
        np.testing.assert_allclose(np.asarray(rec.face_color)[b:b + 1],
                                   f_color, atol=5e-2)
