"""Batched affine warp vs cv2.warpAffine (INTER_LINEAR, BORDER_CONSTANT)."""

import cv2
import numpy as np
import pytest

from head_detector_tpu.ops.warp import affine_warp, invert_affine, warp_like_cv2
import jax.numpy as jnp


@pytest.mark.parametrize("angle,scale", [(0, 1.0), (30, 1.0), (-15, 0.7), (90, 1.3)])
def test_warp_matches_cv2(angle, scale):
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (60, 80, 3), dtype=np.uint8)
    mat = cv2.getRotationMatrix2D((40.0, 30.0), angle, scale)

    want = cv2.warpAffine(img, mat, (64, 48), flags=cv2.INTER_LINEAR,
                          borderMode=cv2.BORDER_CONSTANT, borderValue=0)
    got = warp_like_cv2(img, mat, (64, 48))

    # bilinear interpolation differs by at most 1-2 uint8 levels on
    # fixed-point rounding; require near-exact agreement
    diff = np.abs(got.astype(int) - want.astype(int))
    assert np.percentile(diff, 99) <= 2
    assert diff.mean() < 1.0


def test_batched_warp_many_crops():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (50, 50, 3), dtype=np.uint8)
    mats = np.stack(
        [cv2.getRotationMatrix2D((25.0, 25.0), a, 1.0) for a in (0, 45, 90, 180)]
    )
    out = affine_warp(jnp.asarray(img), jnp.asarray(invert_affine(mats)), 32, 32)
    assert out.shape == (4, 32, 32, 3)
    # identity crop equals the top-left 32x32 patch
    np.testing.assert_allclose(np.asarray(out[0]), img[:32, :32].astype(np.float32), atol=0.6)


def test_scaled_crops_matmul_matches_gather_warp():
    from head_detector_tpu.ops.warp import scaled_crops_matmul

    rng = np.random.RandomState(2)
    img = rng.rand(60, 80, 3).astype(np.float32)
    boxes = np.array([[10.0, 5.0, 42.0, 37.0], [0.0, 0.0, 80.0, 60.0]], np.float32)

    got = np.asarray(scaled_crops_matmul(jnp.asarray(img), jnp.asarray(boxes), out_size=32))
    # reference: the gather-based affine warp with the same scale+translate
    mats = []
    for x1, y1, x2, y2 in boxes:
        s_x, s_y = (x2 - x1) / 32.0, (y2 - y1) / 32.0
        mats.append(np.array([[s_x, 0, x1 + 0.5 * s_x - 0.5],
                              [0, s_y, y1 + 0.5 * s_y - 0.5]], np.float32))
    want = np.asarray(affine_warp(jnp.asarray(img), jnp.asarray(np.stack(mats)), 32, 32))
    # interiors match bilinear exactly; borders differ (edge-clamp vs zero-fill)
    np.testing.assert_allclose(got[:, 2:-2, 2:-2], want[:, 2:-2, 2:-2], atol=2e-5)


def test_rotate_crops_matmul_matches_scipy_and_cv2():
    """Three-shear MXU rotation == direct bilinear rotation (scipy order-1 /
    cv2.getRotationMatrix2D convention verified identical) to ~1-2 gray
    levels away from the border."""
    from scipy import ndimage

    from head_detector_tpu.ops.warp import rotate_crops_matmul

    rng = np.random.RandomState(0)
    img = ndimage.gaussian_filter(rng.rand(64, 64, 3).astype(np.float32), (3, 3, 0))
    # full +-180 range: the quadrant pre-rotation keeps the shear residual
    # within +-45 deg, so large angles are as accurate as small ones
    for ang in (15.0, -30.0, 45.0, 90.0, 135.0, 180.0, -120.0, -179.0):
        got = np.asarray(
            rotate_crops_matmul(jnp.asarray(img[None]), jnp.asarray([ang]))
        )[0]
        ref = ndimage.rotate(img, ang, reshape=False, order=1, mode="constant")
        np.testing.assert_allclose(got[16:48, 16:48], ref[16:48, 16:48], atol=0.01)

    # zero angle is (near-)identity
    same = np.asarray(rotate_crops_matmul(jnp.asarray(img[None]), jnp.asarray([0.0])))[0]
    np.testing.assert_allclose(same, img, atol=1e-5)


def test_aligned_crops_matmul_shapes_and_rotation_content():
    from scipy import ndimage

    from head_detector_tpu.ops.warp import aligned_crops_matmul, scaled_crops_matmul

    rng = np.random.RandomState(3)
    img = ndimage.gaussian_filter(rng.rand(120, 160, 3).astype(np.float32), (4, 4, 0))
    boxes = np.array([[30.0, 20.0, 90.0, 80.0], [100.0, 40.0, 150.0, 100.0]], np.float32)
    angles = np.array([25.0, -40.0], np.float32)
    out = np.asarray(
        aligned_crops_matmul(jnp.asarray(img), jnp.asarray(boxes),
                             jnp.asarray(angles), out_size=64)
    )
    assert out.shape == (2, 64, 64, 3)

    # rotating the expanded crop directly must give the same result
    cx, cy = (boxes[0, 0] + boxes[0, 2]) / 2, (boxes[0, 1] + boxes[0, 3]) / 2
    half = max(boxes[0, 2] - boxes[0, 0], boxes[0, 3] - boxes[0, 1]) * 0.75
    big = np.array([[cx - half, cy - half, cx + half, cy + half]], np.float32)
    expanded = np.asarray(scaled_crops_matmul(jnp.asarray(img), jnp.asarray(big), out_size=64))[0]
    ref = ndimage.rotate(expanded, 25.0, reshape=False, order=1, mode="constant")
    np.testing.assert_allclose(out[0, 16:48, 16:48], ref[16:48, 16:48], atol=0.015)
