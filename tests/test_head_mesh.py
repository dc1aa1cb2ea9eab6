"""HeadMesh conventions + 3DMM-space alignment transforms."""

import jax.numpy as jnp
import numpy as np

from head_detector_tpu.evaluation.head_mesh import HeadMesh
from head_detector_tpu.evaluation.transforms3dmm import (
    euler_angles_to_rotation_matrix,
    flame_params_skull_center,
    get_rotation_mat,
    vertically_align,
)
from head_detector_tpu.flame import FlameModel
from head_detector_tpu.head_info import FLAME_CONSTS, FlameParams


def _params(n=1, seed=0, scale=0.0, t=(0.0, 0.0, 0.0)):
    rng = np.random.RandomState(seed)
    p = rng.randn(n, 413).astype(np.float32) * 0.05
    p[:, 403] = 1.0  # identity 6DoF basis
    p[:, 407] = 1.0
    p[:, 404:407] = 0.0
    p[:, 408] = 0.0
    p[:, 409:412] = t
    p[:, 412] = scale
    return p


def test_head_mesh_projection_convention():
    hm = HeadMesh(image_size=256)
    params = jnp.asarray(_params())
    v3d = hm.vertices_3d(params, zero_rotation=True)
    proj = hm.reprojected_vertices(params, to_2d=True)
    # scale = 0 -> scale' = 1; identity rotation; t = 0
    want = (np.asarray(v3d)[0, :, :2] + 1.0) / 2.0 * 256.0
    np.testing.assert_allclose(np.asarray(proj)[0], want, atol=1e-3)


def test_adjust_3dmm_to_paddings_shifts_projection():
    hm = HeadMesh(image_size=256)
    params = jnp.asarray(_params())
    adjusted = hm.adjust_3dmm_to_paddings(params, [10, 0, 20, 0])  # top=10, left=20
    # adjust round-trips through to_3dmm (which permutes rotation/jaw vs
    # from_3dmm — the reference's wire asymmetry), so compare against the
    # same round trip WITHOUT the shift
    base = hm.flame_params(params).to_3dmm_tensor()
    p0 = np.asarray(hm.reprojected_vertices(jnp.asarray(base)))
    p1 = np.asarray(hm.reprojected_vertices(jnp.asarray(adjusted)))
    np.testing.assert_allclose(p1 - p0, np.broadcast_to([20.0, 10.0], p0.shape), atol=1e-3)


def test_euler_rotation_matrix_roll_only():
    r = euler_angles_to_rotation_matrix(np.pi / 2, 0, 0)
    # 90-degree in-plane rotation about z
    np.testing.assert_allclose(r @ [1, 0, 0], [0, 1, 0], atol=1e-12)


def test_vertically_align_rotates_image_and_params():
    img = np.zeros((64, 64, 3), np.uint8)
    img[10:20, 30:40] = 255
    params = FlameParams.from_3dmm(_params(t=(0.0, 0.0, 0.0)), FLAME_CONSTS)
    from head_detector_tpu.head_info import RPY

    out_img, out_params = vertically_align(img, params, RPY(30.0, 0.0, 0.0), 64)
    assert out_img.shape[0] >= 64 and out_img.shape[1] >= 64
    # rotation was premultiplied into the 6DoF params
    assert not np.allclose(np.asarray(out_params.rotation)[0, :3], [1, 0, 0])
