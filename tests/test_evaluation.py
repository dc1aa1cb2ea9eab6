"""Evaluation metric unit tests: AP, chamfer/Procrustes, Z_n, matching."""

import numpy as np
import pytest

from head_detector_tpu.evaluation.dad_metrics import (
    calc_zn,
    chamfer_distance,
    procrustes_align,
    rotation_angle_error_deg,
    rotation_frobenius_error,
)
from head_detector_tpu.evaluation.detection_ap import coco_map
from head_detector_tpu.metrics import (
    KeypointsFailureRate,
    KeypointsNME,
    match_head_boxes,
)


def test_coco_map_perfect_predictions():
    rng = np.random.RandomState(0)
    preds, gts = [], []
    for _ in range(5):
        boxes = rng.rand(3, 2) * 50
        boxes = np.concatenate([boxes, boxes + 20 + rng.rand(3, 2) * 30], axis=1)
        gts.append(boxes)
        preds.append((boxes.copy(), np.ones(3) * 0.9))
    result = coco_map(preds, gts)
    assert result["AP"] == pytest.approx(1.0, abs=1e-6)
    assert result["AP50"] == pytest.approx(1.0, abs=1e-6)


def test_coco_map_half_recall():
    gt = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], float)
    pred = (np.array([[0, 0, 10, 10]], float), np.array([0.9]))
    result = coco_map([pred], [gt])
    assert 0.4 < result["AP50"] <= 0.55


def test_coco_map_localization_quality_matters():
    gt = np.array([[0, 0, 100, 100]], float)
    loose = (np.array([[0, 0, 100, 60]], float), np.array([0.9]))  # IoU 0.6
    tight = (np.array([[0, 0, 100, 99]], float), np.array([0.9]))  # IoU 0.99
    ap_loose = coco_map([loose], [gt])["AP"]
    ap_tight = coco_map([tight], [gt])["AP"]
    assert ap_tight > ap_loose


def test_chamfer_zero_for_identical_clouds():
    rng = np.random.RandomState(0)
    pts = rng.randn(500, 3).astype(np.float32)
    assert chamfer_distance(pts, pts) < 1e-5


def test_procrustes_recovers_rigid_transform():
    rng = np.random.RandomState(1)
    src = rng.randn(100, 3)
    # random rotation + scale + translation
    q, _ = np.linalg.qr(rng.randn(3, 3))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    tgt = 1.7 * (src @ q.T) + np.array([1.0, -2.0, 3.0])
    lmk_idx = rng.choice(100, 7, replace=False)
    aligned = procrustes_align(src, src[lmk_idx], tgt[lmk_idx])
    np.testing.assert_allclose(aligned, tgt, atol=1e-8)
    assert chamfer_distance(tgt, aligned) < 1e-10


def test_zn_perfect_and_inverted():
    rng = np.random.RandomState(2)
    gt = rng.randn(1, 50, 3)
    assert calc_zn(gt.copy(), gt) == pytest.approx(1.0)
    flipped = gt.copy()
    flipped[..., 2] *= -1
    assert calc_zn(flipped, gt) < 0.6


def test_rotation_errors_zero_at_identity():
    r = np.eye(3)[None]
    assert rotation_frobenius_error(r, r) == 0.0
    assert rotation_angle_error_deg(r, r) == pytest.approx(0.0, abs=1e-4)


def test_rotation_angle_error_90deg():
    c, s = 0.0, 1.0
    rz = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])[None]
    assert rotation_angle_error_deg(rz, np.eye(3)[None]) == pytest.approx(90.0, abs=1e-3)


def test_match_head_boxes_hungarian():
    pred = np.array([[0, 0, 10, 10], [20, 20, 30, 30], [50, 50, 60, 60]], float)
    gt = np.array([[21, 21, 31, 31], [1, 1, 11, 11]], float)
    res = match_head_boxes(pred, gt, min_iou=0.5)
    assert sorted(res.tp_matches) == [(0, 1), (1, 0)]
    assert res.fp_indexes == [2]
    assert res.fn_indexes == []
