"""Host-side math of tools/diagnose_recall.py: threshold sweep + buckets.

The sweep simulates higher confidence thresholds by score-filtering one
low-threshold NMS pass (exact for greedy NMS — monotone keep-sets); these
tests pin the folded-metric algebra to head_detector_tpu.metrics and the
bucket/taxonomy bookkeeping to hand-computable fixtures.
"""

import importlib.util
import math
import os
import sys

import numpy as np
import pytest

_TOOL = os.path.join(os.path.dirname(__file__), "..", "tools", "diagnose_recall.py")
spec = importlib.util.spec_from_file_location("diagnose_recall", _TOOL)
diag = importlib.util.module_from_spec(spec)
spec.loader.exec_module(diag)


def _record(scores, boxes, gt_xywh, v2d=None, gt_v2d=None, n_vert=5):
    scores = np.asarray(scores, np.float32)
    boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
    gt_xywh = np.asarray(gt_xywh, np.float32).reshape(-1, 4)
    if v2d is None:  # perfect landmarks at the gt box center
        v2d = np.zeros((len(scores), n_vert, 2), np.float32)
    if gt_v2d is None:
        gt_v2d = np.zeros((len(gt_xywh), n_vert, 2), np.float32)
    return {"scores": scores, "boxes": boxes, "v2d": np.asarray(v2d, np.float32),
            "gt_xywh": gt_xywh, "gt_v2d": np.asarray(gt_v2d, np.float32)}


def test_sweep_perfect_detection():
    # one pred exactly on one gt, perfect landmarks -> acc 1, fr 0
    rec = _record([0.9], [[10, 10, 60, 60]], [[10, 10, 50, 50]])
    rows = diag.sweep([rec], [0.5])
    r = rows[0]
    assert (r["tp"], r["fp"], r["fn"]) == (1, 0, 0)
    assert r["accuracy"] == 1.0
    assert r["folded_fr"] == 0.0
    assert r["raw_nme"] == 0.0


def test_sweep_threshold_drops_low_scores():
    # second pred below threshold disappears; as threshold rises past the
    # true match's score the tp becomes a fn
    rec = _record(
        [0.4, 0.2],
        [[10, 10, 60, 60], [200, 200, 260, 260]],
        [[10, 10, 50, 50]],
    )
    lo, hi = diag.sweep([rec], [0.1, 0.5])
    assert (lo["tp"], lo["fp"]) == (1, 1)
    assert (hi["tp"], hi["fn"]) == (0, 1)
    # folded metrics match metrics.py algebra: acc = tp/(tp+fp+fn)
    assert lo["accuracy"] == pytest.approx(0.5)
    assert lo["folded_fr"] == pytest.approx(1 - (1 - 0.0) * 0.5)


def test_sweep_folded_matches_protocol_metric():
    # landmark error past 5% of sqrt(box area) counts as raw failure
    side = 100.0
    err = 0.06 * side  # norm = sqrt(100*100) = 100
    v2d = np.full((1, 5, 2), 0.0, np.float32)
    gt_v2d = v2d + np.array([err, 0.0], np.float32)
    rec = _record([0.9], [[0, 0, 100, 100]], [[0, 0, side, side]],
                  v2d=v2d, gt_v2d=gt_v2d)
    r = diag.sweep([rec], [0.5])[0]
    assert r["raw_fr"] == 1.0
    assert r["raw_nme"] == pytest.approx(100 * err / side, rel=1e-5)
    assert r["folded_nme"] == pytest.approx(r["raw_nme"], rel=1e-5)  # acc=1


def test_buckets_recall_and_fp_taxonomy():
    # gt A (40px, matched), gt B (150px, missed); one background fp
    rec = _record(
        [0.9, 0.8],
        [[0, 0, 40, 40], [400, 400, 440, 440]],
        [[0, 0, 40, 40], [100, 100, 150, 150]],
    )
    out = diag.buckets([rec], 0.5)
    assert out["recall_by_count"]["2"]["n"] == 2
    assert out["recall_by_count"]["2"]["recall"] == pytest.approx(0.5)
    assert out["recall_by_size"]["32-64"]["recall"] == 1.0
    assert out["recall_by_size"]["128-192"]["recall"] == 0.0
    assert out["fp_taxonomy"]["background"] == 1
    assert out["fp_taxonomy"]["duplicate"] == 0


def test_buckets_duplicate_fp():
    # two preds on the same gt: one tp, one duplicate fp
    rec = _record(
        [0.9, 0.8],
        [[0, 0, 100, 100], [2, 2, 102, 102]],
        [[0, 0, 100, 100]],
    )
    out = diag.buckets([rec], 0.5)
    assert out["fp_taxonomy"]["duplicate"] == 1


def test_size_bucket_edges():
    assert diag._size_bucket(0) == "0-32"
    assert diag._size_bucket(31.9) == "0-32"
    assert diag._size_bucket(32) == "32-64"
    assert diag._size_bucket(500) == "192-inf"
