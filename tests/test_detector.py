"""End-to-end HeadDetector API: image in -> PredictionResult out.

Runs the real pipeline (letterbox -> model -> NMS -> FLAME -> un-letterbox)
on the smallest variant with random weights and a low confidence threshold so
detections exist; asserts the full public API surface of the reference
(``head_detector/detector.py:97-102`` + ``detection_result.py:45-78``).
"""

import numpy as np
import pytest

from head_detector_tpu.detector import HeadDetector
from head_detector_tpu.head_info import Bbox, FlameParams, RPY


@pytest.fixture(scope="module")
def detector():
    return HeadDetector(model="yolo_heads_n", image_size=64)


@pytest.fixture(scope="module")
def result(detector):
    rng = np.random.RandomState(0)
    image = rng.randint(0, 255, (80, 100, 3), dtype=np.uint8)
    return detector(image, confidence_threshold=1e-6)


def test_returns_heads(result):
    assert len(result.heads) > 0
    head = result.heads[0]
    assert isinstance(head.bbox, Bbox)
    assert isinstance(head.head_pose, RPY)
    assert isinstance(head.flame_params, FlameParams)
    assert head.vertices_3d.shape == (5023, 3)
    assert 0.0 < head.score <= 1.0
    assert np.isfinite(head.vertices_3d).all()


def test_no_detections_above_sigmoid_range(detector):
    # scores are sigmoids (< 2.0 always): an unreachable threshold must give
    # an empty result regardless of weights
    rng = np.random.RandomState(1)
    image = rng.randint(0, 255, (64, 64, 3), dtype=np.uint8)
    res = detector(image, confidence_threshold=2.0)
    assert len(res.heads) == 0


def test_deterministic(detector):
    rng = np.random.RandomState(3)
    image = rng.randint(0, 255, (72, 96, 3), dtype=np.uint8)
    a = detector(image, confidence_threshold=1e-6)
    b = detector(image, confidence_threshold=1e-6)
    assert len(a.heads) == len(b.heads)
    for ha, hb in zip(a.heads, b.heads):
        assert ha.bbox == hb.bbox
        np.testing.assert_array_equal(ha.vertices_3d, hb.vertices_3d)


def test_draw_modes(result):
    for method in ("landmarks", "points", "pose", "full", "bbox"):
        out = result.draw(method)
        assert out.shape == result.original_image.shape
        assert out.dtype == np.uint8


def test_save_meshes(result, tmp_path):
    result.save_meshes(str(tmp_path))
    files = sorted(tmp_path.glob("head_*.obj"))
    assert len(files) == len(result.heads)
    text = files[0].read_text()
    assert text.startswith("v ")
    assert "\nf " in text
    # 1-based faces
    first_face = [int(t) for t in text.split("\nf ")[1].split()[:3]]
    assert min(first_face) >= 1


def test_get_aligned_heads(result):
    crops = result.get_aligned_heads()
    assert len(crops) == len(result.heads)


def test_get_pncc(result):
    pncc = result.get_pncc()
    assert pncc.shape == result.original_image.shape
    assert pncc.dtype == result.original_image.dtype


def test_detection_count_monotone_in_threshold(detector):
    rng = np.random.RandomState(2)
    image = rng.randint(0, 255, (64, 64, 3), dtype=np.uint8)
    low = detector(image, confidence_threshold=1e-6)
    high = detector(image, confidence_threshold=0.02)
    assert len(high.heads) <= len(low.heads)


def test_compact_wire_matches_dense(detector):
    """compact_wire=M with M >= post_nms_max must produce the same head list
    as the dense six-tensor download (f32 wire: same rows, same math)."""
    compact = HeadDetector(model="yolo_heads_n", image_size=64,
                           compact_wire=100, wire_verts_dtype="f32")
    rng = np.random.RandomState(7)
    image = rng.randint(0, 255, (70, 90, 3), dtype=np.uint8)
    a = detector(image, confidence_threshold=1e-6)
    b = compact(image, confidence_threshold=1e-6)
    assert len(a.heads) == len(b.heads) > 0
    for ha, hb in zip(a.heads, b.heads):
        assert ha.bbox == hb.bbox
        assert ha.score == hb.score
        np.testing.assert_allclose(
            ha.vertices_3d, hb.vertices_3d, rtol=0, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(ha.flame_params.shape),
            np.asarray(hb.flame_params.shape),
            rtol=0, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(ha.flame_params.rotation),
            np.asarray(hb.flame_params.rotation),
            rtol=0, atol=1e-5,
        )


def test_compact_wire_truncates_to_top_m(detector):
    """A small M keeps the M highest-score detections, in dense-order prefix."""
    compact = HeadDetector(model="yolo_heads_n", image_size=64,
                           compact_wire=2, wire_verts_dtype="f16")
    rng = np.random.RandomState(7)
    image = rng.randint(0, 255, (70, 90, 3), dtype=np.uint8)
    a = detector(image, confidence_threshold=1e-6)
    b = compact(image, confidence_threshold=1e-6)
    assert len(b.heads) == min(2, len(a.heads))
    for ha, hb in zip(a.heads, b.heads):
        assert ha.bbox == hb.bbox
        # f16 vertex wire: <0.25 px quantization below 1024 px magnitude
        np.testing.assert_allclose(
            ha.vertices_3d, hb.vertices_3d, rtol=0, atol=0.5
        )


def test_predict_batch_matches_single(detector):
    """predict_batch over two different-shape images reproduces per-image
    __call__ results (up to batching roundoff in the conv forward)."""
    rng = np.random.RandomState(9)
    images = [
        rng.randint(0, 255, (80, 100, 3), dtype=np.uint8),
        rng.randint(0, 255, (64, 64, 3), dtype=np.uint8),
    ]
    batch = detector.predict_batch(images, confidence_threshold=1e-6)
    assert len(batch) == 2
    for img, bres in zip(images, batch):
        sres = detector(img, confidence_threshold=1e-6)
        assert bres.original_image.shape == img.shape
        assert len(bres.heads) == len(sres.heads) > 0
        for hb, hs in zip(bres.heads, sres.heads):
            assert abs(hb.score - hs.score) < 1e-5
            np.testing.assert_allclose(
                [hb.bbox.x, hb.bbox.y, hb.bbox.w, hb.bbox.h],
                [hs.bbox.x, hs.bbox.y, hs.bbox.w, hs.bbox.h],
                rtol=0, atol=1,
            )
            # batching changes conv reduction tiling: ~1e-4 relative to the
            # head's own vertex magnitude (random weights blow magnitudes up
            # to ~1e5, and elements near zero make plain rtol flaky)
            mag = float(np.abs(hs.vertices_3d).max())
            assert (
                float(np.abs(hb.vertices_3d - hs.vertices_3d).max())
                <= 1e-3 * mag
            )


def test_predict_batch_budget_caps_detections(detector):
    rng = np.random.RandomState(9)
    images = [rng.randint(0, 255, (64, 64, 3), dtype=np.uint8)] * 2
    batch = detector.predict_batch(
        images, confidence_threshold=1e-6, max_detections=3
    )
    assert sum(len(r.heads) for r in batch) <= 3


# ---------------------------------------------------------------------------
# WBF param fusion through the serving paths (sparse towers / compact wire /
# dense / batch).  fusion_neighbors=1 must reproduce the plain decode (the
# top-1 neighbor is the kept row itself); n>1 keeps the detection set
# identical and only moves FLAME params/vertices.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def fusion_image():
    rng = np.random.RandomState(7)
    return rng.randint(0, 255, (80, 100, 3), dtype=np.uint8)


def _heads_match(a, b, verts_atol, verts_rtol=1e-5):
    assert len(a.heads) == len(b.heads) and len(a.heads) > 0
    for ha, hb in zip(a.heads, b.heads):
        assert ha.bbox == hb.bbox
        np.testing.assert_allclose(ha.score, hb.score, atol=1e-6)
        # Untrained nets emit huge vertex magnitudes (~1e8); the batched
        # dispatch legally reorders f32 accumulation, so pair atol with a
        # relative tolerance.
        np.testing.assert_allclose(
            ha.vertices_3d, hb.vertices_3d, atol=verts_atol, rtol=verts_rtol
        )


def test_param_fusion_n1_identity_sparse(detector, fusion_image):
    fused = HeadDetector(model="yolo_heads_n", image_size=64,
                         param_fusion=True, fusion_neighbors=1)
    a = detector(fusion_image, confidence_threshold=1e-6)
    b = fused(fusion_image, confidence_threshold=1e-6)
    _heads_match(a, b, verts_atol=1e-2)


def test_param_fusion_keeps_detection_set(detector, fusion_image):
    fused = HeadDetector(model="yolo_heads_n", image_size=64,
                         param_fusion=True, fusion_neighbors=4)
    a = detector(fusion_image, confidence_threshold=1e-6)
    b = fused(fusion_image, confidence_threshold=1e-6)
    assert len(a.heads) == len(b.heads) and len(a.heads) > 0
    for ha, hb in zip(a.heads, b.heads):
        assert ha.bbox == hb.bbox
        np.testing.assert_allclose(ha.score, hb.score, atol=1e-6)
        assert np.isfinite(hb.vertices_3d).all()


def test_param_fusion_dense_path(fusion_image):
    plain = HeadDetector(model="yolo_heads_n", image_size=64, deploy=False)
    fused = HeadDetector(model="yolo_heads_n", image_size=64, deploy=False,
                         param_fusion=True, fusion_neighbors=1)
    a = plain(fusion_image, confidence_threshold=1e-6)
    b = fused(fusion_image, confidence_threshold=1e-6)
    _heads_match(a, b, verts_atol=1e-2)


def test_param_fusion_compact_wire(detector, fusion_image):
    fused = HeadDetector(model="yolo_heads_n", image_size=64,
                         param_fusion=True, fusion_neighbors=1,
                         compact_wire=16)
    a = detector(fusion_image, confidence_threshold=1e-6)
    b = fused(fusion_image, confidence_threshold=1e-6)
    _heads_match(a, b, verts_atol=1e-2)


def test_param_fusion_predict_batch(detector, fusion_image):
    fused = HeadDetector(model="yolo_heads_n", image_size=64,
                         param_fusion=True, fusion_neighbors=1)
    rng = np.random.RandomState(11)
    other = rng.randint(0, 255, (64, 64, 3), dtype=np.uint8)
    plain_res = detector.predict_batch([fusion_image, other],
                                       confidence_threshold=1e-6)
    fused_res = fused.predict_batch([fusion_image, other],
                                    confidence_threshold=1e-6)
    for a, b in zip(plain_res, fused_res):
        # Batched patch convs tile differently from the b=1 program; the
        # ~1e-6 relative wobble in fused params is amplified through the
        # untrained net's exp-scale FLAME decode, so this parity leg needs
        # a looser relative bound than the single-image one.
        _heads_match(a, b, verts_atol=1e-2, verts_rtol=2e-3)
