"""Golden tests for the JAX FLAME decoder against an independent numpy oracle.

The oracle implements standard SMPL/FLAME LBS math directly from the
published algorithm (blendshapes -> joint regression -> pose correctives ->
forward-kinematic skinning), with no code shared with the JAX implementation.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from head_detector_tpu.assets_io import load_flame_assets
from head_detector_tpu.flame import (
    FlameModel,
    MESH_OFFSET_Z,
    flame_vertices,
    reproject_spatial_vertices,
)
from head_detector_tpu.head_info import FLAME_CONSTS, FlameParams, NUM_FLAME_PARAMS
from head_detector_tpu.ops.rotation import rot_mat_from_6dof


def _np_rodrigues(r):
    theta = np.linalg.norm(r + 1e-8)
    axis = r / theta
    K = np.array(
        [
            [0, -axis[2], axis[1]],
            [axis[2], 0, -axis[0]],
            [-axis[1], axis[0], 0],
        ]
    )
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


def _oracle_lbs(assets, betas, full_pose):
    """Single-sample numpy LBS oracle."""
    V = assets.v_template.shape[0]
    shapedirs = assets.shapedirs.astype(np.float64)  # [V,3,400]
    v_shaped = assets.v_template.astype(np.float64) + np.einsum(
        "vck,k->vc", shapedirs, betas
    )
    J = assets.j_regressor.astype(np.float64) @ v_shaped  # [5,3]
    rots = np.stack([_np_rodrigues(full_pose[3 * i : 3 * i + 3]) for i in range(5)])
    pose_feature = (rots[1:] - np.eye(3)).reshape(-1)  # [36]
    # assets.posedirs is stored [36, V*3]
    pose_offsets = (pose_feature @ assets.posedirs.astype(np.float64)).reshape(V, 3)
    v_posed = v_shaped + pose_offsets

    parents = assets.parents
    G = np.zeros((5, 4, 4))
    for i in range(5):
        T = np.eye(4)
        T[:3, :3] = rots[i]
        T[:3, 3] = J[i] if parents[i] < 0 else J[i] - J[parents[i]]
        G[i] = T if parents[i] < 0 else G[parents[i]] @ T
    # remove rest-pose joint locations
    A = G.copy()
    for i in range(5):
        A[i, :3, 3] -= G[i, :3, :3] @ J[i]
    W = assets.lbs_weights.astype(np.float64)  # [V,5]
    Tv = np.einsum("vj,jab->vab", W, A)
    verts = np.einsum("vab,vb->va", Tv[:, :3, :3], v_posed) + Tv[:, :3, 3]
    return verts


@pytest.fixture(scope="module")
def model():
    return FlameModel.from_assets()


@pytest.fixture(scope="module")
def assets():
    return load_flame_assets()


def _random_params(rng, n):
    return FlameParams(
        shape=rng.normal(scale=1.0, size=(n, 300)).astype(np.float32),
        expression=rng.normal(scale=1.0, size=(n, 100)).astype(np.float32),
        rotation=rng.normal(size=(n, 6)).astype(np.float32),
        jaw=rng.uniform(0, 0.3, size=(n, 3)).astype(np.float32),
        eyeballs=np.zeros((n, 0), np.float32),
        neck=np.zeros((n, 0), np.float32),
        translation=rng.normal(scale=100, size=(n, 3)).astype(np.float32),
        scale=rng.uniform(50, 200, size=(n, 1)).astype(np.float32),
    )


def test_flame_vertices_match_oracle(model, assets, rng):
    n = 4
    p = _random_params(rng, n)
    verts = np.asarray(flame_vertices(model, p, zero_rot=True))
    assert verts.shape == (n, 5023, 3)

    for i in range(n):
        betas = np.concatenate([p.shape[i], p.expression[i]]).astype(np.float64)
        full_pose = np.concatenate(
            [np.zeros(3), np.zeros(3), p.jaw[i], np.zeros(6)]
        ).astype(np.float64)
        expected = _oracle_lbs(assets, betas, full_pose)
        expected[:, 2] += MESH_OFFSET_Z
        np.testing.assert_allclose(verts[i], expected, atol=2e-5)


def test_flame_rotation_applied(model, rng):
    p = _random_params(rng, 2)
    v_rot = np.asarray(flame_vertices(model, p, zero_rot=False))
    v_can = np.asarray(flame_vertices(model, p, zero_rot=True))
    R = np.asarray(rot_mat_from_6dof(jnp.asarray(p.rotation)))
    expected = np.einsum("nab,nvb->nva", R, v_can)
    np.testing.assert_allclose(v_rot, expected, atol=1e-5)


def test_reproject_spatial_vertices(model, rng):
    n = 3
    p = _random_params(rng, n)
    packed = np.asarray(p.to_3dmm_tensor())
    assert packed.shape == (n, NUM_FLAME_PARAMS)
    verts, R, proj = reproject_spatial_vertices(model, jnp.asarray(packed), to_2d=True)
    assert verts.shape == (n, 5023, 3)
    assert R.shape == (n, 3, 3)
    assert proj.shape == (n, 5023, 2)

    # projection formula check (note from_3dmm/to_3dmm jaw<->rotation shuffle:
    # compare against a decode that itself goes through from_3dmm)
    p2 = FlameParams.from_3dmm(packed)
    v_can = np.asarray(flame_vertices(model, p2, zero_rot=True))
    R2 = np.asarray(rot_mat_from_6dof(jnp.asarray(p2.rotation)))
    expected = np.einsum("nab,nvb->nva", R2, v_can)
    expected = expected * np.clip(p2.scale[:, None], 1e-8, None) + p2.translation[:, None]
    np.testing.assert_allclose(np.asarray(proj), expected[..., :2], atol=1e-4)


def test_fused_project_matches_reproject(model, rng):
    """fused_project_vertices folds 6DoF+z-offset into skinning; values must
    match the compose-after path up to float reassociation."""
    from head_detector_tpu.flame import fused_project_vertices

    n = 4
    p = _random_params(rng, n)
    packed = jnp.asarray(np.asarray(p.to_3dmm_tensor()))
    _, R_ref, proj_ref = reproject_spatial_vertices(model, packed, to_2d=False)
    R, proj = fused_project_vertices(model, packed, to_2d=False)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R_ref), atol=1e-6)
    scale = np.abs(np.asarray(proj_ref)).max()
    np.testing.assert_allclose(
        np.asarray(proj), np.asarray(proj_ref), atol=1e-4 * max(scale, 1.0)
    )

    # leading-batch shape polymorphism + to_2d, like reproject
    batched = packed.reshape(2, 2, -1)
    R2, proj2 = fused_project_vertices(model, batched, to_2d=True)
    assert proj2.shape == (2, 2, 5023, 2)
    assert R2.shape == (4, 3, 3)

    # subset_indexes parity with reproject
    subset = jnp.asarray([0, 7, 511, 5022])
    _, _, sub_ref = reproject_spatial_vertices(
        model, packed, to_2d=False, subset_indexes=subset
    )
    _, sub = fused_project_vertices(model, packed, to_2d=False, subset_indexes=subset)
    np.testing.assert_allclose(
        np.asarray(sub), np.asarray(sub_ref), atol=1e-4 * max(scale, 1.0)
    )


def test_subset_model_matches_full_decode(model, rng):
    """FlameModel.subset(idx): decode over a vertex subset must equal the
    full-model decode sliced to the same indices (joints are regressed from
    precomputed full-mesh constants — see subset() docstring)."""
    from head_detector_tpu.assets_io import get_indices
    from head_detector_tpu.flame import fused_project_vertices

    n = 3
    p = _random_params(rng, n)
    packed = jnp.asarray(np.asarray(p.to_3dmm_tensor()))
    head_idx = np.asarray(get_indices()["head"], np.int64)
    sub_model = model.subset(head_idx)
    assert sub_model.num_vertices == head_idx.size

    _, full = fused_project_vertices(model, packed, to_2d=False)
    _, sub = fused_project_vertices(sub_model, packed, to_2d=False)
    ref = np.asarray(full)[:, head_idx]
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(sub), ref, atol=1e-4 * max(scale, 1.0))

    # canonical-vertex path too (flame_vertices goes through lbs joints)
    full_canon = flame_vertices(model, p, zero_rot=True)
    sub_canon = flame_vertices(sub_model, p, zero_rot=True)
    np.testing.assert_allclose(
        np.asarray(sub_canon), np.asarray(full_canon)[:, head_idx], atol=1e-5
    )

    # remapped faces index only subset-local vertices and preserve topology
    faces = np.asarray(sub_model.faces)
    assert faces.min() >= 0 and faces.max() < head_idx.size
    full_faces = np.asarray(model.faces)
    inside = np.isin(full_faces, head_idx).all(axis=1)
    assert faces.shape[0] == int(inside.sum())


def test_reproject_empty_batch(model):
    """Zero-detections short-circuit (ref flame.py:185-189) — shape-polymorphic here."""
    empty = jnp.zeros((0, NUM_FLAME_PARAMS))
    verts, R, proj = reproject_spatial_vertices(model, empty, to_2d=False)
    assert verts.shape == (0, 5023, 3)
    assert proj.shape == (0, 5023, 3)


def test_from_to_3dmm_asymmetry():
    """The documented jaw<->rotation wire shuffle (ref head_info.py:53-107)."""
    rng = np.random.RandomState(1)
    wire = rng.normal(size=(1, NUM_FLAME_PARAMS)).astype(np.float32)
    p = FlameParams.from_3dmm(wire)
    # from_3dmm: jaw at [400:403], rotation at [403:409]
    np.testing.assert_array_equal(p.jaw, wire[:, 400:403])
    np.testing.assert_array_equal(p.rotation, wire[:, 403:409])
    np.testing.assert_array_equal(p.translation, wire[:, 409:412])
    np.testing.assert_array_equal(p.scale, wire[:, 412:413])
    # to_3dmm writes rotation first: round trip permutes those 9 floats
    wire2 = np.asarray(p.to_3dmm_tensor())
    np.testing.assert_array_equal(wire2[:, 400:406], wire[:, 403:409])
    np.testing.assert_array_equal(wire2[:, 406:409], wire[:, 400:403])
    np.testing.assert_array_equal(wire2[:, :400], wire[:, :400])


def test_shape_padding(model, rng):
    """Narrow shape/expression inputs are zero-padded (ref flame.py:131-140)."""
    n = 2
    p = _random_params(rng, n)
    p_narrow = FlameParams(
        shape=p.shape[:, :50],
        expression=p.expression[:, :10],
        rotation=p.rotation,
        jaw=p.jaw,
        eyeballs=p.eyeballs,
        neck=p.neck,
        translation=p.translation,
        scale=p.scale,
    )
    p_padded = FlameParams(
        shape=np.pad(p.shape[:, :50], ((0, 0), (0, 250))),
        expression=np.pad(p.expression[:, :10], ((0, 0), (0, 90))),
        rotation=p.rotation,
        jaw=p.jaw,
        eyeballs=p.eyeballs,
        neck=p.neck,
        translation=p.translation,
        scale=p.scale,
    )
    v1 = np.asarray(flame_vertices(model, p_narrow, zero_rot=True))
    v2 = np.asarray(flame_vertices(model, p_padded, zero_rot=True))
    np.testing.assert_allclose(v1, v2, atol=1e-6)
