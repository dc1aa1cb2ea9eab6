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
    RPYError,
    match_head_boxes,
    reduce_metrics_across_mesh,
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


def _apply_partial_updates(metric, shard_states):
    """Write one shard's accumulated sum-states into a metric instance."""
    for f, v in zip(metric._STATE_FIELDS, shard_states):
        setattr(metric, f, float(v))
    return metric


@pytest.mark.parametrize(
    "metric_ctor",
    [
        lambda: KeypointsNME(None, indexes_subset=None),
        lambda: KeypointsFailureRate(None, indexes_subset=None),
        lambda: RPYError(None),
    ],
)
def test_metric_psum_reduction_matches_single_device(metric_ctor):
    """Per-device partial states, psum-reduced over an 8-device mesh, must
    equal a single instance that saw all the data (torchmetrics
    dist_reduce_fx="sum" parity, ref metrics/nme.py:56-58)."""
    import jax

    from head_detector_tpu.train.trainer import make_data_mesh

    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs 8 devices")
    mesh = make_data_mesh(devices[:8])

    rng = np.random.RandomState(42)
    n_fields = len(metric_ctor()._STATE_FIELDS)
    # synthetic per-shard accumulations: total >= total_tp, all non-negative
    shards = rng.rand(8, n_fields).astype(np.float32) * 10
    shards[:, 0] = shards[:, 1] + rng.rand(8) * 5  # total >= total_tp

    metrics = [
        _apply_partial_updates(metric_ctor(), shards[i]) for i in range(8)
    ]
    reduce_metrics_across_mesh(metrics, mesh)

    reference = _apply_partial_updates(metric_ctor(), shards.sum(axis=0))
    ref_value = reference.compute()
    for m in metrics:
        got = m.compute()
        if isinstance(got, dict):
            for k in got:
                assert got[k] == pytest.approx(ref_value[k], rel=1e-5)
        else:
            assert got == pytest.approx(ref_value, rel=1e-5)


def test_metric_merge_host_side():
    a = _apply_partial_updates(KeypointsNME(None, indexes_subset=None), [4.0, 2.0, 0.5])
    b = _apply_partial_updates(KeypointsNME(None, indexes_subset=None), [6.0, 3.0, 0.7])
    whole = _apply_partial_updates(
        KeypointsNME(None, indexes_subset=None), [10.0, 5.0, 1.2]
    )
    a.merge(b)
    assert a.compute() == pytest.approx(whole.compute(), rel=1e-6)


def test_competitor_protocol_with_mock_detector(tmp_path):
    """The competitor-baseline protocol (ref evaluate_fddb_if/i2p) end to
    end minus weights: FDDB label parsing, detector-callable contract, COCO
    AP — a perfect mock detector must score AP 1.0."""
    import cv2

    from head_detector_tpu.evaluation.evaluate_competitors import (
        evaluate_external_detector,
    )

    rng = np.random.RandomState(7)
    img_dir = tmp_path / "images" / "d"
    img_dir.mkdir(parents=True)
    lines = []
    truth = {}
    for i in range(3):
        name = f"d/{i}.jpg"
        cv2.imwrite(str(tmp_path / "images" / name), rng.randint(0, 255, (60, 80, 3), np.uint8))
        boxes = []
        for _ in range(2):
            x, y = rng.randint(0, 30, 2)
            w, h = rng.randint(10, 25, 2)
            boxes.append([x, y, x + w, y + h])
        truth[name] = np.asarray(boxes, float)
        lines.append(f"# {name}")
        lines += [f"{b[0]} {b[1]} {b[2]} {b[3]}" for b in boxes]
    (tmp_path / "label.txt").write_text("\n".join(lines) + "\n")

    calls = {}

    def perfect_detector(image):
        key = image.shape  # all same-shape; track via call order instead
        idx = calls.setdefault("n", 0)
        calls["n"] = idx + 1
        name = list(truth)[idx]
        return truth[name], np.full(len(truth[name]), 0.9)

    result = evaluate_external_detector(str(tmp_path), perfect_detector)
    assert result["AP50"] == pytest.approx(1.0, abs=1e-6)


def test_img2pose_artifact_parsing(tmp_path):
    from head_detector_tpu.evaluation.evaluate_competitors import (
        load_img2pose_artifacts,
    )

    np.save(tmp_path / "reference_3d_68_points_trans.npy", np.zeros((68, 3)))
    np.save(tmp_path / "WIDER_train_pose_mean_v1.npy", np.zeros(6))
    np.save(tmp_path / "WIDER_train_pose_stddev_v1.npy", np.ones(6))
    arts = load_img2pose_artifacts(str(tmp_path))
    assert arts["threed_68_points"].shape == (68, 3)

    np.save(tmp_path / "WIDER_train_pose_mean_v1.npy", np.zeros(5))
    with pytest.raises(ValueError):
        load_img2pose_artifacts(str(tmp_path))


def test_68_landmark_set_semantics():
    """The shipped iBUG-68 vertex set: unique, reproducible from the
    derivation tool, and semantically placed (eye corners straddle the nose,
    subnasale between eyes and mouth, 7-lmk Procrustes subset distinct)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from derive_68_landmarks import ASSETS, derive

    from head_detector_tpu.evaluation.dad_metrics import (
        SEVEN_LMK_INDICES,
        get_68_landmark_indices,
    )

    idx = get_68_landmark_indices()
    assert idx.shape == (68,)
    assert len(np.unique(idx)) == 68
    np.testing.assert_array_equal(idx, derive())  # tool output == shipped asset

    v = np.load(os.path.join(ASSETS, "v_template.npy"))
    pts = v[idx]
    # eye corners: 36 outer-left, 39 inner-left, 42 inner-right, 45 outer-right
    assert pts[36, 0] < pts[39, 0] < 0 < pts[42, 0] < pts[45, 0]
    # subnasale (33) sits below the eyes and above the mouth
    assert pts[33, 1] < pts[39, 1] and pts[33, 1] > pts[48, 1]
    # mouth corners straddle the center
    assert pts[48, 0] < 0 < pts[54, 0]
    assert len(np.unique(idx[SEVEN_LMK_INDICES])) == 7


def test_match_head_boxes_hungarian():
    pred = np.array([[0, 0, 10, 10], [20, 20, 30, 30], [50, 50, 60, 60]], float)
    gt = np.array([[21, 21, 31, 31], [1, 1, 11, 11]], float)
    res = match_head_boxes(pred, gt, min_iou=0.5)
    assert sorted(res.tp_matches) == [(0, 1), (1, 0)]
    assert res.fp_indexes == [2]
    assert res.fn_indexes == []


def test_68_landmark_flip_consistency_ibug():
    """Left/right flip consistency against the reference's own iBUG flip
    table (dataset_parsing.py:86-116) — VERDICT r2 item 9: each flip pair
    mirrors about x=0 and midline landmarks sit on the midline, to within
    local vertex spacing (the documented vertex-snapped-vs-barycentric
    protocol delta's symmetric component is thereby bounded at ~1% of face
    half-width)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from derive_68_landmarks import ASSETS, FLIP_PAIRS_1BASED

    from head_detector_tpu.evaluation.dad_metrics import get_68_landmark_indices

    idx = get_68_landmark_indices()
    v = np.load(os.path.join(ASSETS, "v_template.npy"))[idx]

    pairs0 = [(a - 1, b - 1) for a, b in FLIP_PAIRS_1BASED]
    for a, b in pairs0:
        assert abs(v[a, 0] + v[b, 0]) < 8e-3, (a, b, v[a], v[b])
        assert np.abs(v[a, 1:] - v[b, 1:]).max() < 8e-3, (a, b)
        # pair members sit on opposite sides of the midline
        assert v[a, 0] * v[b, 0] <= 0, (a, b)

    paired = {i for p in pairs0 for i in p}
    for m in range(68):
        if m not in paired:
            assert abs(v[m, 0]) < 8e-3, (m, v[m])

    # iBUG group ordering: the jaw arc runs ear -> chin -> ear, so its
    # endpoints sit above (template y) and on opposite x-sides of the chin
    # (landmark 8, a midline point); x is NOT monotone along the 3D arc
    # (it wraps toward the ears), so only the semantic ordering is pinned
    assert v[0, 1] > v[8, 1] and v[16, 1] > v[8, 1]
    assert v[0, 0] * v[16, 0] < 0
