"""Numerical parity report vs the reference math (BASELINE.md: BFM coeff
fidelity MAE < 1e-3).  The oracle is float64 NumPy implementing the
published Deep3DFace equations (same semantics as utils/reconstruct_mesh.py
— verified per-function in test_morph.py); here the END-TO-END coeff ->
screen-space-vertex decode is measured as one MAE number."""

import numpy as np
import pytest

from voicepuppet_tpu.face3d import bfm as bfm_mod
from voicepuppet_tpu.face3d import morph

from tests.test_morph import (oracle_project, oracle_rotation,
                              oracle_shape)


def oracle_reconstruct_vertices(coeff, model):
    """coeff [257] -> screen vertices [N, 3] in float64 (projection with
    the y-flip, ref: reconstruct_mesh.py:172-194)."""
    shape = oracle_shape(coeff[:80], coeff[80:144], model)
    rot = oracle_rotation(coeff[224:227])
    proj, z = oracle_project(shape, rot, coeff[254:257].astype(np.float64))
    proj = np.stack([proj[:, 0], 224.0 - proj[:, 1]], 1)
    return np.concatenate([proj, z], axis=1)


def test_end_to_end_vertex_mae_under_1e3():
    model = bfm_mod.synthetic_bfm(num_theta=32, num_phi=32, seed=9)
    fm = morph.device_bfm(model)
    coeff = bfm_mod.demo_coeff(model, batch=8, seed=10)
    rec = morph.reconstruct(coeff, fm)
    got = np.concatenate([np.asarray(rec.face_projection),
                          np.asarray(rec.z_buffer)], axis=2)
    maes = []
    for b in range(coeff.shape[0]):
        want = oracle_reconstruct_vertices(coeff[b].astype(np.float64),
                                           model)
        maes.append(np.abs(got[b] - want).mean())
    mae = float(np.mean(maes))
    print(f"\ncoeff->vertex decode MAE vs float64 oracle: {mae:.2e}")
    assert mae < 1e-3  # BASELINE.md fidelity target


def test_expression_delta_mae():
    """The loss-relevant path: expression-coefficient deltas through the
    exBase decode (what BFMNet optimizes) stay within target precision."""
    model = bfm_mod.synthetic_bfm(num_theta=32, num_phi=32, seed=9)
    fm = morph.device_bfm(model)
    rng = np.random.RandomState(0)
    c1 = bfm_mod.demo_coeff(model, batch=4, seed=1)
    c2 = c1.copy()
    c2[:, 80:144] += rng.randn(4, 64).astype(np.float32) * 0.3
    s1 = np.asarray(morph.shape_formation(c1[:, :80], c1[:, 80:144], fm))
    s2 = np.asarray(morph.shape_formation(c2[:, :80], c2[:, 80:144], fm))
    ex64 = model.exBase.astype(np.float64)
    want = (ex64 @ (c2[:, 80:144] - c1[:, 80:144]).astype(np.float64).T
            ).T.reshape(4, -1, 3)
    mae = float(np.abs((s2 - s1) - want).mean())
    print(f"\nexpression-delta MAE: {mae:.2e}")
    assert mae < 1e-4
