"""Assert the JAX ports reproduce RECORDED outputs of the reference's own
torch code (tests/goldens/reference_utils.npz, written by
tools/record_reference_goldens.py running /root/reference's modules on CPU).

Unlike the numpy-oracle tests elsewhere, these goldens came out of the
reference binaries themselves — wire-codec slicing, Gram-Schmidt 6DoF,
scipy-based RPY, angle wrapping, and bbox algebra are checked value-for-value.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from head_detector_tpu.head_info import FLAME_CONSTS, FlameParams
from head_detector_tpu.metrics import rpy_from_flame_params
from head_detector_tpu.ops.rotation import limit_angle, rot_mat_from_6dof
from head_detector_tpu.utils import extend_bbox, extend_to_rect, refined_head_bbox

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "reference_utils.npz")


@pytest.fixture(scope="module")
def golden():
    assert os.path.isfile(GOLDEN), "run tools/record_reference_goldens.py"
    return np.load(GOLDEN)


def test_rot_mat_from_6dof_matches_reference(golden):
    got = np.asarray(rot_mat_from_6dof(jnp.asarray(golden["sixdof_in"])))
    np.testing.assert_allclose(got, golden["sixdof_rot"], atol=1e-6)


def test_flame_params_wire_codec_matches_reference(golden):
    p = FlameParams.from_3dmm(golden["wire_in"], FLAME_CONSTS)
    for name in ("shape", "expression", "rotation", "jaw", "translation", "scale"):
        np.testing.assert_array_equal(
            np.asarray(getattr(p, name)), golden[f"wire_{name}"], err_msg=name
        )
    np.testing.assert_array_equal(
        np.asarray(p.to_3dmm_tensor()), golden["wire_roundtrip"]
    )


def test_rpy_matches_reference(golden):
    wire = golden["wire_in"]
    for i in range(wire.shape[0]):
        rpy = rpy_from_flame_params(wire[i])
        np.testing.assert_allclose(
            [rpy.roll, rpy.pitch, rpy.yaw], golden["wire_rpy"][i], atol=1e-4
        )


def test_limit_angle_matches_reference(golden):
    # jnp computes in f32 (x64 disabled): 1e-3 deg absorbs roundoff at
    # 1000-degree inputs; the boundary cases (+-180/360/540 multiples) are
    # exact
    got = np.asarray([limit_angle(a) for a in golden["angles_in"]])
    np.testing.assert_allclose(got, golden["angles_limited"], atol=1e-3)
    boundary = np.isin(np.abs(golden["angles_in"]), [0.0, 180.0, 360.0, 540.0])
    np.testing.assert_array_equal(got[boundary], golden["angles_limited"][boundary])


def test_bbox_algebra_matches_reference(golden):
    boxes = golden["bbox_in"]
    np.testing.assert_allclose(
        np.stack([extend_bbox(b, 0.1) for b in boxes]),
        golden["bbox_extended"], atol=1e-9,
    )
    np.testing.assert_allclose(
        np.stack([extend_bbox(b, (0.1, 0.25, 0.1, 0.0)) for b in boxes]),
        golden["bbox_extended_tuple"], atol=1e-9,
    )
    np.testing.assert_allclose(
        np.stack([extend_to_rect(b) for b in boxes]),
        golden["bbox_rect"], atol=1e-9,
    )


def test_refined_head_bbox_matches_reference(golden):
    got = np.stack(
        [np.asarray(refined_head_bbox(v), np.float64) for v in golden["verts_in"]]
    )
    np.testing.assert_allclose(got, golden["verts_bbox"], atol=1e-9)
