"""Competitor baselines on FDDB: insightface SCRFD and img2pose.

Functional spec: reference ``evaluation/evaluate_fddb_if.py:37-170`` and
``evaluate_fddb_i2p.py:42-193`` — run a third-party face detector over the
FDDB label set and score with the same COCO-mAP protocol used for our model.

Neither competitor's weights are hostable in this zero-egress environment;
pass any ``detector(image) -> (boxes_xyxy [N,4], scores [N])`` callable and
the protocol (annotation parsing + AP) is identical to ``evaluate_fddb``.
"""

from __future__ import annotations

import argparse
import os
from typing import Callable, Tuple

import cv2
import numpy as np

from head_detector_tpu.evaluation.detection_ap import coco_map
from head_detector_tpu.evaluation.evaluate_fddb import read_fddb_annotations


def evaluate_external_detector(
    data_dir: str,
    detector: Callable[[np.ndarray], Tuple[np.ndarray, np.ndarray]],
) -> dict:
    annotations = read_fddb_annotations(data_dir)
    preds, gts = [], []
    for rel_path, boxes in annotations.items():
        image = cv2.imread(os.path.join(data_dir, "images", rel_path))
        if image is None:
            image = cv2.imread(os.path.join(data_dir, rel_path))
        if image is None:
            continue
        image = cv2.cvtColor(image, cv2.COLOR_BGR2RGB)
        p_boxes, p_scores = detector(image)
        preds.append((np.asarray(p_boxes, np.float64), np.asarray(p_scores)))
        gts.append(np.asarray(boxes, np.float64).reshape(-1, 4))
    result = coco_map(preds, gts)
    print(f"[fddb-competitor] {result}")
    return result


def make_scrfd_detector():
    try:
        from insightface.app import FaceAnalysis
    except ImportError as e:
        raise RuntimeError(
            "insightface is not installed in this environment; supply any "
            "detector callable to evaluate_external_detector instead."
        ) from e
    app = FaceAnalysis(allowed_modules=["detection"])
    app.prepare(ctx_id=0)

    def detect(image):
        faces = app.get(image)
        boxes = np.array([f.bbox for f in faces]).reshape(-1, 4)
        scores = np.array([f.det_score for f in faces]).reshape(-1)
        return boxes, scores

    return detect


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--competitor", choices=["scrfd"], default="scrfd")
    args = ap.parse_args()
    detector = {"scrfd": make_scrfd_detector}[args.competitor]()
    evaluate_external_detector(args.data_dir, detector)


if __name__ == "__main__":
    main()
