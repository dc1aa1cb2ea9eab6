"""Self-test for the real-FLAME-pickle load path of assets_io.

The production environment ships no FLAME 2020 ``generic_model.pkl`` (the
basis falls back to the synthetic stand-in), so the branch that parses a
real pickle (``assets_io.load_flame_assets`` real-pkl arm, functional spec
``head_detector/flame.py:18-24`` + ``:86-88``) would otherwise be dead code
until a user drops in the real file.  This test synthesizes a pickle in the
OFFICIAL on-disk format — float64 numpy arrays, a scipy-sparse
``J_regressor`` (the real file stores a chumpy/scipy sparse matrix, hence
the ``todense`` handling), uint32 faces, latin1-picklable — and asserts the
loader round-trips every array exactly, applies the reference's
transposed-reshape posedirs convention, and flags ``synthetic_basis=False``.
"""

import os
import pickle

import numpy as np
import pytest

from head_detector_tpu import assets_io


@pytest.fixture(scope="module")
def fake_official_pkl(tmp_path_factory):
    rng = np.random.RandomState(7)
    V, J = assets_io.NUM_VERTICES, assets_io.NUM_JOINTS
    data = {
        "v_template": rng.randn(V, 3).astype(np.float64),
        "shapedirs": rng.randn(V, 3, assets_io.NUM_BETAS).astype(np.float64),
        "posedirs": rng.randn(V, 3, assets_io.NUM_POSE_BASIS).astype(np.float64),
        "weights": rng.rand(V, J).astype(np.float64),
        "kintree_table": np.stack(
            [np.array([int(4294967295), 0, 1, 1, 1]), np.arange(5)]
        ).astype(np.uint32),
        "f": rng.randint(0, V, size=(9976, 3)).astype(np.uint32),
    }
    import scipy.sparse as sp

    jr = rng.rand(J, V)
    jr[jr < 0.99] = 0.0  # sparse like the real regressor
    data["J_regressor"] = sp.csc_matrix(jr)

    path = tmp_path_factory.mktemp("flame") / "generic_model.pkl"
    with open(path, "wb") as f:
        pickle.dump(data, f, protocol=2)  # the real file is a py2-era pickle
    assert os.path.getsize(path) > 1_000_000  # must pass the size gate
    return str(path), data


def test_real_pkl_roundtrip(fake_official_pkl):
    path, data = fake_official_pkl
    assets = assets_io.load_flame_assets(flame_path=path)
    assert assets.synthetic_basis is False

    np.testing.assert_array_equal(
        assets.v_template, data["v_template"].astype(np.float32)
    )
    np.testing.assert_array_equal(
        assets.shapedirs, data["shapedirs"].astype(np.float32)
    )
    # posedirs must be stored transposed-reshaped: [V,3,36] -> [36, V*3]
    # (the reference's flame.py:86-88 convention the decoder consumes)
    expected_posedirs = (
        data["posedirs"].reshape(-1, assets_io.NUM_POSE_BASIS).T.astype(np.float32)
    )
    np.testing.assert_array_equal(assets.posedirs, expected_posedirs)
    # sparse J_regressor densified
    np.testing.assert_allclose(
        assets.j_regressor,
        np.asarray(data["J_regressor"].todense(), dtype=np.float32),
    )
    np.testing.assert_array_equal(
        assets.lbs_weights, data["weights"].astype(np.float32)
    )
    np.testing.assert_array_equal(assets.faces, data["f"].astype(np.int32))
    # index subsets still come from the packaged asset files
    assert assets.head_indices.size > 0 and assets.face_indices.size > 0


def test_real_pkl_decodes_through_flame(fake_official_pkl):
    """The loaded bundle must drive the production decoder end to end."""
    path, _ = fake_official_pkl
    import jax.numpy as jnp

    from head_detector_tpu.flame import FlameModel, flame_vertices
    from head_detector_tpu.head_info import FlameParams, NUM_FLAME_PARAMS

    assets = assets_io.load_flame_assets(flame_path=path)
    model = FlameModel.from_assets(assets)
    params = FlameParams.from_3dmm(jnp.zeros((2, NUM_FLAME_PARAMS), jnp.float32))
    verts = np.asarray(flame_vertices(model, params))
    assert verts.shape == (2, assets_io.NUM_VERTICES, 3)
    assert np.isfinite(verts).all()


def test_size_gate_rejects_small_files(tmp_path):
    """A stray/truncated pkl below the plausibility size is ignored."""
    p = tmp_path / "generic_model.pkl"
    p.write_bytes(b"not a flame model")
    assert assets_io._find_real_pkl(str(p)) is None
