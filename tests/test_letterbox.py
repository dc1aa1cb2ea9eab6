"""Letterbox preprocessing vs the cv2 reference semantics
(ref head_detector/detector.py:40-52: aspect resize, symmetric pad 127, /255)."""

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from head_detector_tpu.ops.letterbox import letterbox, letterbox_batch, letterbox_spec


@pytest.mark.parametrize("h,w", [(480, 640), (640, 480), (100, 300), (640, 640)])
def test_letterbox_geometry_matches_reference(h, w):
    spec = letterbox_spec(h, w, 640)
    # reference formulas (detector.py:41-50)
    if h > w:
        new_h, new_w = 640, int(w * 640 / h)
    else:
        new_h, new_w = int(h * 640 / w), 640
    assert (spec.new_h, spec.new_w) == (new_h, new_w)
    assert spec.pad_left == (640 - new_w) // 2
    assert spec.pad_top == (640 - new_h) // 2
    assert spec.scale == 640 / max(h, w)


def test_letterbox_padding_value_and_range():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (100, 300, 3), np.uint8)
    out, (pl, pt), scale = letterbox(jnp.asarray(img), 640)
    out = np.asarray(out)[0]
    assert out.shape == (640, 640, 3)
    assert out.min() >= 0.0 and out.max() <= 1.0
    # padded rows are exactly 127/255
    np.testing.assert_allclose(out[0], 127.0 / 255.0)
    np.testing.assert_allclose(out[-1], 127.0 / 255.0)
    # content region matches cv2 INTER_LANCZOS4 to sub-LSB (the residual is
    # cv2's 14-bit fixed-point weights + uint8 rounding)
    want = cv2.resize(img, (640, int(100 * 640 / 300)), interpolation=cv2.INTER_LANCZOS4)
    got = out[pt : pt + want.shape[0]] * 255.0
    diff = np.abs(got - want.astype(np.float32))
    assert diff.mean() < 0.5 and diff.max() < 2.0


def test_lanczos4_resize_matches_cv2():
    from head_detector_tpu.ops.letterbox import lanczos4_resize

    rng = np.random.RandomState(3)
    img = rng.randint(0, 255, (77, 53, 3), np.uint8)
    want = cv2.resize(img, (440, 640), interpolation=cv2.INTER_LANCZOS4).astype(np.float32)
    got = np.clip(np.asarray(lanczos4_resize(jnp.asarray(img, jnp.float32), 640, 440)), 0, 255)
    assert np.abs(got - want).max() < 1.5


def test_letterbox_batch_shapes():
    rng = np.random.RandomState(1)
    imgs = rng.randint(0, 255, (3, 120, 80, 3), np.uint8)
    out = letterbox_batch(jnp.asarray(imgs), 64)
    assert np.asarray(out).shape == (3, 64, 64, 3)


def test_letterbox_batch_matches_single_lanczos():
    """Batched letterbox (predict_batch's one-upload path) must reproduce
    the single-image lanczos4 program row-for-row: same resampling
    matrices, batched by the einsum."""
    rng = np.random.RandomState(7)
    imgs = rng.randint(0, 255, (4, 90, 130, 3), np.uint8)
    batched = np.asarray(letterbox_batch(jnp.asarray(imgs), 64))
    for i in range(4):
        single, _, _ = letterbox(jnp.asarray(imgs[i]), 64)
        np.testing.assert_allclose(
            batched[i], np.asarray(single)[0], atol=1e-5
        )
