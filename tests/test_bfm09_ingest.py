"""Certify BFM09 binary ingestion against fabricated real-layout fixtures.

Round-3 gap: ``convert_bfm09`` / ``load_bfm`` mirrored the documented field
math of /root/reference/utils/bfm_load_data.py:24-114 but no test ever
constructed files in the actual binary layouts — every test ran
``synthetic_bfm``.  Here a miniature ``01_MorphableModel.mat`` +
``Exp_Pca.bin`` + ``std_exp.txt`` + ``BFM_front_idx.mat`` +
``BFM_exp_idx.mat`` + ``facemodel_info.mat`` are fabricated in the exact
reference layouts (scipy .mat v5 as loadmat reads them; Exp_Pca.bin as the
raw int32-K + float32 stream LoadExpBasis consumes, bfm_load_data.py:25-41)
and driven through convert_bfm09 -> load_bfm -> morph.reconstruct ->
raster end to end.  Expected values are RE-DERIVED INDEPENDENTLY in this
file (per-element loops, no shared code with the converter) so a
misreading of the /1e5 scaling, the first-80/64 basis crops, or the
minus-1 index conventions fails the equality assertions.
"""

import os

import numpy as np
import pytest

# miniature counts: S stands in for BFM09's 53490 vertices, E for the
# expression basis' 53215, V for the front crop's 35709.  K counts exceed
# the 80/64 retention so the crops are actually exercised.
S, E, V = 26, 20, 12
K_SHAPE, K_EXP = 85, 70


def _write_fixture(model_dir, rng):
    from scipy.io import savemat

    raw = {
        "shapeMU": rng.uniform(-8e4, 8e4, (3 * S, 1)),
        "shapePC": rng.randn(3 * S, K_SHAPE).astype(np.float32),
        "shapeEV": rng.uniform(1e2, 1e4, (K_SHAPE, 1)),
        "texMU": rng.uniform(0, 255, (3 * S, 1)),
        "texPC": rng.randn(3 * S, K_SHAPE).astype(np.float32),
        "texEV": rng.uniform(1.0, 60.0, (K_SHAPE, 1)),
    }
    savemat(os.path.join(model_dir, "01_MorphableModel.mat"), raw)

    # Exp_Pca.bin: int32 K, 3E float32 mean, K*3E float32 PC rows
    # (LoadExpBasis reads mu then pc then reshapes [K, -1].T,
    # bfm_load_data.py:27-37)
    exp_mu = rng.randn(3 * E).astype(np.float32)
    exp_pc_rows = rng.randn(K_EXP, 3 * E).astype(np.float32)
    with open(os.path.join(model_dir, "Exp_Pca.bin"), "wb") as f:
        f.write(np.asarray([K_EXP], np.int32).tobytes())
        f.write(exp_mu.tobytes())
        f.write(exp_pc_rows.tobytes())
    exp_ev = rng.uniform(0.1, 5.0, K_EXP)
    np.savetxt(os.path.join(model_dir, "std_exp.txt"), exp_ev)

    # index maps, 1-based as in the published assets (the -1 convention,
    # bfm_load_data.py:74, 77); use shuffled draws so any off-by-one
    # produces different rows, not a shifted copy
    idx_front = (rng.permutation(E)[:V] + 1).reshape(V, 1) \
        .astype(np.float64)
    trim_index = (rng.permutation(S)[:E] + 1).reshape(E, 1) \
        .astype(np.float64)
    savemat(os.path.join(model_dir, "BFM_front_idx.mat"),
            {"idx": idx_front})
    savemat(os.path.join(model_dir, "BFM_exp_idx.mat"),
            {"trimIndex": trim_index})

    # facemodel_info.mat: topology over the V front vertices.  A tiny
    # strip triangulation (each vertex in <= 3 triangles, fitting the
    # 8-wide point_buf); padded with the ntri+1 sentinel
    # (Compute_norm's zero-normal row, reconstruct_mesh.py:47-49).
    tris0 = np.asarray([[i, i + 1, i + 2] for i in range(V - 2)])
    ntri = tris0.shape[0]
    point_buf = np.full((V, 8), ntri + 1, np.float64)
    counts = np.zeros(V, np.int64)
    for t, tri in enumerate(tris0):
        for v in tri:
            point_buf[v, counts[v]] = t + 1
            counts[v] += 1
    info = {
        "tri": (tris0 + 1).astype(np.float64),
        "point_buf": point_buf,
        "keypoints": (rng.permutation(V)[:5] + 1).reshape(1, 5)
        .astype(np.float64),
        "frontmask2_idx": np.arange(1, V + 1, dtype=np.float64)
        .reshape(-1, 1),
        "skinmask": np.ones((1, V)),
        "tri_mask2": np.ones((ntri, 1)),
    }
    savemat(os.path.join(model_dir, "facemodel_info.mat"), info)
    return raw, exp_mu, exp_pc_rows, exp_ev, idx_front, trim_index, info


def _expected_bases(raw, exp_pc_rows, exp_ev, idx_front, trim_index):
    """Independent re-derivation of the reference converter math
    (bfm_load_data.py:45-98) with explicit per-vertex loops."""
    idx_exp0 = idx_front.astype(np.int64).ravel() - 1      # [V] into E
    idx_shape0 = trim_index.astype(np.int64).ravel() - 1   # [E] into S
    sel_shape = idx_shape0[idx_exp0]                       # [V] into S

    def take_rows(base_flat, sel, k):
        # base rows are xyz-interleaved: vertex v occupies rows 3v..3v+2
        out = np.zeros((3 * len(sel), k), base_flat.dtype)
        for i, v in enumerate(sel):
            out[3 * i:3 * i + 3] = base_flat[3 * v:3 * v + 3]
        return out

    id_full = (raw["shapePC"] * raw["shapeEV"].reshape(1, -1)) / 1e5
    ex_full = (exp_pc_rows.T * exp_ev.reshape(1, -1)) / 1e5
    tex_full = raw["texPC"] * raw["texEV"].reshape(1, -1)
    id_base = take_rows(id_full[:, :80], sel_shape, 80)
    ex_base = take_rows(ex_full[:, :64], idx_exp0, 64)
    tex_base = take_rows(tex_full[:, :80], sel_shape, 80)
    meanshape = np.zeros((1, 3 * len(sel_shape)))
    meantex = np.zeros((1, 3 * len(sel_shape)))
    mu_shape = raw["shapeMU"].ravel() / 1e5
    mu_tex = raw["texMU"].ravel()
    for i, v in enumerate(sel_shape):
        meanshape[0, 3 * i:3 * i + 3] = mu_shape[3 * v:3 * v + 3]
        meantex[0, 3 * i:3 * i + 3] = mu_tex[3 * v:3 * v + 3]
    return id_base, ex_base, tex_base, meanshape, meantex


def test_convert_bfm09_real_layouts_end_to_end(tmp_path):
    from voicepuppet_tpu.face3d import bfm, morph, raster
    from voicepuppet_tpu.tools.bfm_tools import convert_bfm09

    rng = np.random.RandomState(42)
    model_dir = str(tmp_path)
    raw, exp_mu, exp_pc_rows, exp_ev, idx_front, trim_index, info = \
        _write_fixture(model_dir, rng)

    convert_bfm09(model_dir)
    model = bfm.load_bfm(model_dir)

    id_base, ex_base, tex_base, meanshape, meantex = _expected_bases(
        raw, exp_pc_rows, exp_ev, idx_front, trim_index)
    # float32 cast at load; the converter math itself ran in float64
    np.testing.assert_array_equal(model.idBase,
                                  id_base.astype(np.float32))
    np.testing.assert_array_equal(model.exBase,
                                  ex_base.astype(np.float32))
    np.testing.assert_array_equal(model.texBase,
                                  tex_base.astype(np.float32))
    np.testing.assert_array_equal(model.meanshape,
                                  meanshape.astype(np.float32))
    np.testing.assert_array_equal(model.meantex,
                                  meantex.astype(np.float32))
    assert model.num_vertices == V
    np.testing.assert_array_equal(model.tri, info["tri"])
    np.testing.assert_array_equal(model.point_buf, info["point_buf"])
    np.testing.assert_array_equal(
        model.keypoints, info["keypoints"].ravel().astype(np.int32) - 1)

    # the ingested model must drive the device pipeline end to end
    fm = morph.device_bfm(model)
    coeff = bfm.demo_coeff(model, batch=2, seed=3)
    rec = morph.reconstruct(coeff, fm)
    assert np.isfinite(np.asarray(rec.face_projection)).all()
    verts = np.concatenate([np.asarray(rec.face_projection),
                            np.asarray(rec.z_buffer)], 2)
    colors = np.clip(np.asarray(rec.face_color), 0, 255).astype(np.float32)
    img, mask = raster.render_colors(verts, colors, np.asarray(fm.tri),
                                     h=64, w=64, bb=32)
    assert np.asarray(img).dtype == np.uint8
    assert np.asarray(img).shape == (2, 64, 64, 3)


def test_exp_pca_bin_truncation_fails_loudly(tmp_path):
    from voicepuppet_tpu.tools.bfm_tools import load_exp_basis

    rng = np.random.RandomState(0)
    _write_fixture(str(tmp_path), rng)
    path = os.path.join(str(tmp_path), "Exp_Pca.bin")
    blob = open(path, "rb").read()
    with open(path, "wb") as f:
        f.write(blob[:-8])   # truncate two floats
    with pytest.raises(ValueError, match="inconsistent"):
        load_exp_basis(str(tmp_path))


def test_std_exp_count_mismatch_fails_loudly(tmp_path):
    from voicepuppet_tpu.tools.bfm_tools import load_exp_basis

    rng = np.random.RandomState(0)
    _write_fixture(str(tmp_path), rng)
    np.savetxt(os.path.join(str(tmp_path), "std_exp.txt"),
               np.ones(K_EXP - 3))
    with pytest.raises(ValueError, match="eigenvalues"):
        load_exp_basis(str(tmp_path))


def test_front_idx_out_of_range_fails_loudly(tmp_path):
    from scipy.io import savemat
    from voicepuppet_tpu.tools.bfm_tools import convert_bfm09

    rng = np.random.RandomState(0)
    _write_fixture(str(tmp_path), rng)
    bad = np.arange(1, V + 1, dtype=np.float64).reshape(V, 1)
    bad[-1] = E + 7   # beyond the expression-basis vertex count
    savemat(os.path.join(str(tmp_path), "BFM_front_idx.mat"), {"idx": bad})
    with pytest.raises(ValueError, match="BFM_front_idx"):
        convert_bfm09(str(tmp_path))


def test_load_bfm_missing_and_inconsistent_fields_fail_loudly(tmp_path):
    from scipy.io import loadmat, savemat
    from voicepuppet_tpu.face3d.bfm import load_bfm
    from voicepuppet_tpu.tools.bfm_tools import convert_bfm09

    rng = np.random.RandomState(1)
    _write_fixture(str(tmp_path), rng)
    convert_bfm09(str(tmp_path))
    path = os.path.join(str(tmp_path), "BFM_model_front.mat")
    good = {k: v for k, v in loadmat(path).items()
            if not k.startswith("__")}

    missing = dict(good)
    del missing["exBase"]
    savemat(path, missing)
    with pytest.raises(ValueError, match="missing fields.*exBase"):
        load_bfm(str(tmp_path))

    wrong = dict(good)
    wrong["idBase"] = wrong["idBase"][:, :70]   # not 80 columns
    savemat(path, wrong)
    with pytest.raises(ValueError, match="idBase"):
        load_bfm(str(tmp_path))

    bad_tri = dict(good)
    bad_tri["tri"] = bad_tri["tri"].copy()
    bad_tri["tri"][0, 0] = V + 5
    savemat(path, bad_tri)
    with pytest.raises(ValueError, match="tri indices"):
        load_bfm(str(tmp_path))
