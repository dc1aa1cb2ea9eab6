"""Rotation math: 6DoF -> R, Rodrigues, R -> roll/pitch/yaw. Pure JAX, vmappable.

Functional specs:
* ``rot_mat_from_6dof``  — reference ``head_detector/utils.py:120-128``
  (Gram-Schmidt on two 3-vectors, columns stacked).
* ``calculate_rpy``      — reference ``head_detector/utils.py:146-156``:
  scipy ``Rotation.from_matrix(R.T).as_euler("xyz", degrees=True)`` then
  ``roll=euler[2], pitch=euler[0]-180, yaw=euler[1]`` with 180-wrapping.
* ``rodrigues``          — axis-angle to rotation matrix, as used by the
  smplx LBS the reference calls (``head_detector/flame.py:152-161``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def rot_mat_from_6dof(v: jnp.ndarray) -> jnp.ndarray:
    """Continuous 6D rotation representation -> rotation matrices.

    :param v: [..., 6]
    :return:  [..., 3, 3] with basis vectors as *columns* (stacked on dim -1),
              matching reference ``utils.py:120-128``.
    """
    vx = v[..., :3]
    vy = v[..., 3:6]

    def _normalize(x):
        # torch.nn.functional.normalize semantics: x / max(||x||, 1e-12)
        n = jnp.linalg.norm(x, axis=-1, keepdims=True)
        return x / jnp.maximum(n, 1e-12)

    b1 = _normalize(vx)
    b3 = _normalize(jnp.cross(b1, vy))
    b2 = -jnp.cross(b1, b3)
    return jnp.stack((b1, b2, b3), axis=-1)


def rodrigues(rot_vecs: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Axis-angle vectors -> rotation matrices (batched, [..., 3] -> [..., 3, 3])."""
    angle = jnp.linalg.norm(rot_vecs + eps, axis=-1, keepdims=True)  # [..., 1]
    rot_dir = rot_vecs / angle

    cos = jnp.cos(angle)[..., None]  # [..., 1, 1]
    sin = jnp.sin(angle)[..., None]

    rx, ry, rz = rot_dir[..., 0], rot_dir[..., 1], rot_dir[..., 2]
    zeros = jnp.zeros_like(rx)
    K = jnp.stack(
        [zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros], axis=-1
    ).reshape(rot_vecs.shape[:-1] + (3, 3))
    ident = jnp.eye(3, dtype=rot_vecs.dtype)
    outer = rot_dir[..., :, None] * rot_dir[..., None, :]
    return cos * ident + (1 - cos) * outer + sin * K


def _euler_xyz_extrinsic(R: jnp.ndarray) -> jnp.ndarray:
    """Extrinsic x-y-z Euler angles (radians) from rotation matrices.

    Decomposition R = Rz(c) @ Ry(b) @ Rx(a); returns [..., 3] = (a, b, c).
    Matches scipy ``Rotation.from_matrix(R).as_euler("xyz")`` away from gimbal
    lock (|b| = pi/2).
    """
    r20 = jnp.clip(R[..., 2, 0], -1.0, 1.0)
    b = -jnp.arcsin(r20)
    # gimbal-lock guard: when cos(b) ~ 0 fall back to a=0 convention
    cb = jnp.cos(b)
    safe = jnp.abs(cb) > 1e-6
    a = jnp.where(
        safe,
        jnp.arctan2(R[..., 2, 1], R[..., 2, 2]),
        jnp.arctan2(-R[..., 1, 2], R[..., 1, 1]),
    )
    c = jnp.where(safe, jnp.arctan2(R[..., 1, 0], R[..., 0, 0]), 0.0)
    return jnp.stack([a, b, c], axis=-1)


def limit_angle(angle, pi: float = 180.0):
    """Wrap an angle in degrees to [-pi, pi], reference ``utils.py:131-143``
    exactly — including its boundary quirks (multiples of +-pi map onto the
    closed endpoints depending on sign, e.g. 540 -> -180 but -900 -> +180;
    validated value-for-value in tests/test_reference_goldens.py).  The
    reference computes integer correction factors via trunc-then-floor-div;
    both branches are applied sequentially."""
    a = jnp.asarray(angle)
    t0 = jnp.trunc(a / pi)  # python int() truncates toward zero
    k_neg = -2.0 * jnp.floor(t0 / 2.0)  # python // on ints floors
    a1 = jnp.where(a < -pi, a + k_neg * pi, a)
    t1 = jnp.trunc(a1 / pi)
    k_pos = 2.0 * jnp.floor((t1 + 1.0) / 2.0)
    return jnp.where(a1 > pi, a1 - k_pos * pi, a1)


def rotation_mats_to_rpy(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices -> (roll, pitch, yaw) degrees, batched.

    Reference semantics (``utils.py:146-151``): euler = xyz-extrinsic angles of
    R^T in degrees; roll = euler[2], pitch = euler[0] - 180, yaw = euler[1],
    each wrapped to (-180, 180].
    """
    euler = _euler_xyz_extrinsic(jnp.swapaxes(R, -1, -2)) * (180.0 / jnp.pi)
    roll = limit_angle(euler[..., 2])
    pitch = limit_angle(euler[..., 0] - 180.0)
    yaw = limit_angle(euler[..., 1])
    return jnp.stack([roll, pitch, yaw], axis=-1)


def calculate_rpy(rotation_6dof: np.ndarray):
    """Host convenience: 6DoF rotation params of ONE head -> RPY namedtuple."""
    from head_detector_tpu.head_info import RPY

    R = rot_mat_from_6dof(jnp.asarray(rotation_6dof).reshape(1, 6))
    rpy = np.asarray(rotation_mats_to_rpy(R))[0]
    return RPY(roll=float(rpy[0]), pitch=float(rpy[1]), yaw=float(rpy[2]))
