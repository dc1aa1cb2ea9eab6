"""Rotation ops vs scipy / torch-reference semantics."""

import numpy as np
from scipy.spatial.transform import Rotation

import jax.numpy as jnp

from head_detector_tpu.ops.rotation import (
    calculate_rpy,
    limit_angle,
    rodrigues,
    rot_mat_from_6dof,
    rotation_mats_to_rpy,
)


def test_rot_mat_from_6dof_orthonormal(rng):
    v = rng.normal(size=(16, 6)).astype(np.float32)
    R = np.asarray(rot_mat_from_6dof(jnp.asarray(v)))
    eye = np.einsum("nab,ncb->nac", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (16, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), np.ones(16), atol=1e-5)


def test_rot_mat_from_6dof_matches_spec(rng):
    """Columns are (b1, b2, b3) per the reference Gram-Schmidt (utils.py:120-128)."""
    v = rng.normal(size=(8, 6)).astype(np.float64)
    R = np.asarray(rot_mat_from_6dof(jnp.asarray(v)))
    for i in range(8):
        vx, vy = v[i, :3], v[i, 3:]
        b1 = vx / np.linalg.norm(vx)
        c = np.cross(b1, vy)
        b3 = c / np.linalg.norm(c)
        b2 = -np.cross(b1, b3)
        expected = np.stack([b1, b2, b3], axis=-1)
        np.testing.assert_allclose(R[i], expected, atol=1e-6)


def test_rodrigues_vs_scipy(rng):
    r = rng.normal(scale=1.2, size=(32, 3)).astype(np.float64)
    R = np.asarray(rodrigues(jnp.asarray(r)))
    expected = Rotation.from_rotvec(r).as_matrix()
    np.testing.assert_allclose(R, expected, atol=1e-5)


def test_rpy_vs_scipy_reference(rng):
    """rotation_mats_to_rpy replicates the scipy-based reference math
    (utils.py:146-151): euler('xyz') of R.T, pitch offset -180, wrapping."""
    v = rng.normal(size=(64, 6)).astype(np.float64)
    R = np.asarray(rot_mat_from_6dof(jnp.asarray(v)))
    got = np.asarray(rotation_mats_to_rpy(jnp.asarray(R)))
    for i in range(64):
        ang = Rotation.from_matrix(R[i].T).as_euler("xyz", degrees=True)
        exp_roll = ang[2]
        exp_pitch = ang[0] - 180
        exp_yaw = ang[1]

        def wrap(a):
            while a <= -180:
                a += 360
            while a > 180:
                a -= 360
            return a

        np.testing.assert_allclose(got[i, 0], wrap(exp_roll), atol=1e-3)
        np.testing.assert_allclose(got[i, 1], wrap(exp_pitch), atol=1e-3)
        np.testing.assert_allclose(got[i, 2], wrap(exp_yaw), atol=1e-3)


def test_limit_angle():
    vals = np.array([-350.0, -190.0, -180.0, -10.0, 0.0, 10.0, 190.0, 350.0])
    got = np.asarray(limit_angle(jnp.asarray(vals)))
    expected = np.array([10.0, 170.0, 180.0, -10.0, 0.0, 10.0, -170.0, -10.0])
    # note: the floor-based wrap maps -180 -> 180 equivalence class; both are
    # the same physical angle.  Check modulo 360 equality and range.
    np.testing.assert_allclose(
        np.minimum(np.mod(got - expected, 360), np.mod(expected - got, 360)),
        np.zeros_like(vals),
        atol=1e-4,
    )
    assert np.all(got >= -180 - 1e-4) and np.all(got <= 180 + 1e-4)


def test_calculate_rpy_host():
    rpy = calculate_rpy(np.array([1.0, 0, 0, 0, 1.0, 0]))
    # identity 6dof basis -> R with columns e1, -e3?, check consistency only
    assert np.isfinite([rpy.roll, rpy.pitch, rpy.yaw]).all()
